"""GraphCast/FloeNet tests (reference model:
fme/ace/models/graphcast/test_graphcast.py)."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from ace_tpu.models.graphcast import (
    GraphCast,
    containing_triangle,
    get_mesh_hierarchy,
    latlon_to_xyz,
    max_edge_distance,
    merge_meshes,
    radius_query,
)


def test_icosphere_hierarchy():
    h = get_mesh_hierarchy(3)
    assert [len(m.vertices) for m in h] == [12, 42, 162, 642]
    assert [len(m.faces) for m in h] == [20, 80, 320, 1280]
    # unit vertices, parent prefix preserved
    for m in h:
        np.testing.assert_allclose(
            # vertices are float32 (reference-precision for graph
            # parity), so unit norms hold to f32 eps only
            np.linalg.norm(m.vertices, axis=1), 1.0, atol=1e-6
        )
    merged = merge_meshes(h)
    assert len(merged.faces) == 20 + 80 + 320 + 1280


def test_containing_triangle_contains_point():
    mesh = get_mesh_hierarchy(2)[-1]
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    tri = containing_triangle(pts, mesh)
    verts = mesh.vertices[mesh.faces[tri]]  # [N, 3, 3]
    # each point lies within its triangle: positive barycentric weights
    # of the central projection
    for i in range(len(pts)):
        v0, v1, v2 = verts[i]
        n = np.cross(v1 - v0, v2 - v0)
        t = (n @ v0) / (n @ pts[i])
        p = pts[i] * t
        w0 = np.cross(v1 - p, v2 - p) @ n
        w1 = np.cross(v2 - p, v0 - p) @ n
        w2 = np.cross(v0 - p, v1 - p) @ n
        assert min(w0, w1, w2) >= -1e-9 * max(abs(w0), abs(w1), abs(w2))


def test_radius_query_symmetric_threshold():
    mesh = get_mesh_hierarchy(1)[-1]
    grid = latlon_to_xyz(
        np.asarray([0.0, 45.0]), np.asarray([0.0, 90.0])
    )
    r = max_edge_distance(mesh)
    g, m = radius_query(grid, mesh.vertices, r)
    d = np.linalg.norm(grid[g] - mesh.vertices[m], axis=1)
    assert (d <= r + 1e-12).all()
    assert len(g) > 0


@pytest.mark.medium_duration
def test_graphcast_forward_and_registry():
    lat = np.linspace(-80, 80, 8)
    lon = np.linspace(0, 360, 16, endpoint=False)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing="ij")
    net = GraphCast(
        img_shape=(8, 16), in_chans=3, out_chans=2,
        lat2d=lat2d, lon2d=lon2d, latent_dimension=16,
        meshes=2, M0=0, processor_steps=2,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 16, 3), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 8, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))

    from ace_tpu.models.registry import ModuleSelector
    from tests.test_step_stepper import _dataset_info

    sel = ModuleSelector(
        type="FloeNet",
        config={
            "latent_dimension": 8, "meshes": 1, "M0": 0,
            "processor_steps": 1,
        },
    )
    info = _dataset_info()
    module = sel.build(3, 2, info)
    x2 = jnp.zeros((1, *info.img_shape, 3))
    p2 = module.init(jax.random.PRNGKey(0), x2)
    out2 = module.apply(p2, x2)
    assert out2.shape == (1, *info.img_shape, 2)


@pytest.mark.medium_duration
def test_graphcast_mask_zeroes_land():
    lat = np.linspace(-80, 80, 8)
    lon = np.linspace(0, 360, 16, endpoint=False)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing="ij")
    mask = np.zeros((8, 16), bool)
    mask[2:6] = True
    net = GraphCast(
        img_shape=(8, 16), in_chans=2, out_chans=1,
        lat2d=lat2d, lon2d=lon2d, latent_dimension=8,
        meshes=1, M0=0, processor_steps=1, mask=mask,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 16, 2), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), x)
    out = np.asarray(net.apply(params, x))
    assert np.all(out[0, ~mask] == 0.0)
    assert np.abs(out[0, mask]).max() > 0.0
