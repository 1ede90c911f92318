"""GraphCast-style grid->mesh->grid GNN (FloeNet backbone)
(reference: fme/ace/models/graphcast/main.py GraphCast, layers.py
Encoder/Processor/Decoder, registry/m2lines.py:60 FloeNetBuilder; the
message-passing equations follow the GraphCast SI, Lam et al. 2023).

TPU-native mapping: graphs are precomputed host-side (icosphere
hierarchy, radius and containing-triangle queries in chunked numpy — no
rtree/trimesh dependency); message passing runs as gather -> fused MLP
-> segment_sum, which XLA lowers to dense matmuls plus scatter-adds.
All edge/node counts are static, so the whole network jits once.
"""

import dataclasses
import math
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------- icosphere hierarchy (no trimesh) ----------


@dataclasses.dataclass
class TriMesh:
    vertices: np.ndarray  # [V, 3] unit vectors
    faces: np.ndarray  # [F, 3] int


def _icosahedron() -> TriMesh:
    """Regular icosahedron with DeepMind GraphCast's vertex ordering,
    normalization, and orientation (reference: graphcast/utils.py
    get_icosahedron) — reference GraphCast checkpoints are only
    transferable if the mesh (and so the node/edge enumeration and
    geometry) matches exactly."""
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    verts = []
    for c1 in (1.0, -1.0):
        for c2 in (phi, -phi):
            verts.append((c1, c2, 0.0))
            verts.append((0.0, c1, c2))
            verts.append((c2, 0.0, c1))
    vertices = np.asarray(verts, dtype=np.float32)
    vertices /= np.linalg.norm([1.0, phi])
    faces = np.array([
        (0, 1, 2), (0, 6, 1), (8, 0, 2), (8, 4, 0), (3, 8, 2),
        (3, 2, 7), (7, 2, 1), (0, 4, 6), (4, 11, 6), (6, 11, 5),
        (1, 5, 7), (4, 10, 11), (4, 8, 10), (10, 8, 3), (10, 3, 9),
        (11, 10, 9), (11, 9, 5), (5, 9, 7), (9, 3, 7), (1, 6, 5),
    ], dtype=np.int64)
    # rotate to the conventional orientation (a face antipodal to a
    # vertex along y)
    angle_between_faces = 2.0 * np.arcsin(phi / np.sqrt(3.0))
    theta = (np.pi - angle_between_faces) / 2.0
    rot_y = np.array([
        [np.cos(theta), 0.0, np.sin(theta)],
        [0.0, 1.0, 0.0],
        [-np.sin(theta), 0.0, np.cos(theta)],
    ])
    # float32 throughout, like the reference: the vertex rounding decides
    # closest-face ties in the M2G query, so graph parity (and therefore
    # checkpoint transfer) requires identical precision
    vertices = (vertices @ rot_y).astype(np.float32)
    return TriMesh(vertices, faces)


def _subdivide(mesh: TriMesh) -> TriMesh:
    """Split each triangle into 4; parent vertices keep their indices
    (so coarser meshes index a prefix of the finest vertex array).
    """
    verts = list(mesh.vertices)
    midpoint: dict[tuple[int, int], int] = {}

    def mid(a: int, b: int) -> int:
        key = (min(a, b), max(a, b))
        if key not in midpoint:
            v = (mesh.vertices[a] + mesh.vertices[b]) / 2.0
            v = v / np.linalg.norm(v)
            midpoint[key] = len(verts)
            verts.append(v.astype(np.float32))
        return midpoint[key]

    faces = []
    for a, b, c in mesh.faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    return TriMesh(np.asarray(verts), np.asarray(faces, np.int64))


def get_mesh_hierarchy(splits: int) -> list[TriMesh]:
    """(reference behavior: utils.py
    get_hierarchy_of_triangular_meshes_for_sphere)."""
    meshes = [_icosahedron()]
    for _ in range(splits):
        meshes.append(_subdivide(meshes[-1]))
    return meshes


def merge_meshes(meshes: Sequence[TriMesh]) -> TriMesh:
    """Multimesh: finest vertices, union of all levels' faces (valid
    because subdivision keeps parent vertices as an index prefix).
    """
    for m in meshes[:-1]:
        assert np.allclose(
            m.vertices, meshes[-1].vertices[: len(m.vertices)]
        )
    faces = np.concatenate([m.faces for m in meshes], axis=0)
    return TriMesh(meshes[-1].vertices, faces)


def faces_to_edges(faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Directed edges of a triangulation: one edge per face side
    (0->1, 1->2, 2->0). On a closed consistently-oriented surface every
    edge's reverse comes from the neighboring face, so the result is
    bidirectional WITHOUT duplicates (reference: graphcast/utils.py
    faces_to_edges — emitting both directions per face would
    double-count every message in the segment sums)."""
    senders = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    receivers = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    return senders, receivers


def max_edge_distance(mesh: TriMesh) -> float:
    s, r = faces_to_edges(mesh.faces)
    return float(
        np.linalg.norm(mesh.vertices[s] - mesh.vertices[r], axis=1).max()
    )


# ---------- geometry helpers ----------


def latlon_to_xyz(lat_deg, lon_deg):
    """Colatitude form, bit-identical to the reference
    (utils.py:273 _grid_lat_lon_to_coordinates) — last-ulp coordinate
    differences flip closest-face ties in the M2G query, so graph
    parity requires the exact same expression."""
    phi = np.deg2rad(lon_deg)
    theta = np.deg2rad(90.0 - lat_deg)
    return np.stack([
        np.cos(phi) * np.sin(theta),
        np.sin(phi) * np.sin(theta),
        np.cos(theta),
    ], axis=-1)


def xyz_to_latlon(xyz):
    lat = np.rad2deg(np.arcsin(np.clip(xyz[..., 2], -1, 1)))
    lon = np.rad2deg(np.arctan2(xyz[..., 1], xyz[..., 0])) % 360.0
    return lat, lon


def radius_query(grid_xyz: np.ndarray, mesh_xyz: np.ndarray,
                 radius: float, chunk: int = 4096):
    """(grid_idx, mesh_idx) pairs with chordal distance <= radius
    (reference behavior: utils.py radius_query_indices, without rtree)."""
    grid_idx, mesh_idx = [], []
    for start in range(0, len(mesh_xyz), chunk):
        block = mesh_xyz[start : start + chunk]
        d2 = (
            np.sum(grid_xyz**2, axis=1)[:, None]
            - 2.0 * grid_xyz @ block.T
            + np.sum(block**2, axis=1)[None, :]
        )
        g, m = np.nonzero(d2 <= radius**2)
        grid_idx.append(g)
        mesh_idx.append(m + start)
    return np.concatenate(grid_idx), np.concatenate(mesh_idx)


def containing_triangle(grid_xyz: np.ndarray, mesh: TriMesh,
                        chunk: int = 2048) -> np.ndarray:
    """Face index of the mesh triangle CLOSEST to each grid point
    (reference behavior: utils.py in_mesh_triangle_indices, which uses
    trimesh.proximity.closest_point). For points on the unit sphere
    against an inscribed convex triangulation this is the containing
    triangle of the central projection, except exactly on shared edges,
    where closest-face tie-breaking (lowest face index) decides —
    matching the reference is required for checkpoint transfer. Exact
    per-region point-triangle distance (Ericson, RTC ch. 5.1.5),
    vectorized [G, F] in grid-point chunks.
    """
    # f64 internally, like trimesh (it stores vertices as float64): the
    # f32 mesh coordinates are widened exactly, then all distance
    # arithmetic happens at f64 so near-tie argmins match
    tri = mesh.vertices.astype(np.float64)[mesh.faces]  # [F, 3, 3]
    a, b, c = tri[None, :, 0], tri[None, :, 1], tri[None, :, 2]
    ab, ac, bc = b - a, c - a, c - b

    def dot(u, v):
        return np.einsum("gfc,gfc->gf", u, v)

    out = np.zeros(len(grid_xyz), np.int64)
    for start in range(0, len(grid_xyz), chunk):
        p = grid_xyz[start : start + chunk][:, None, :]  # [G, 1, 3]
        ap, bp, cp = p - a, p - b, p - c
        d1, d2 = dot(ab, ap), dot(ac, ap)
        d3, d4 = dot(ab, bp), dot(ac, bp)
        d5, d6 = dot(ab, cp), dot(ac, cp)
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ab = np.nan_to_num(d1 / (d1 - d3))
            t_ac = np.nan_to_num(d2 / (d2 - d6))
            t_bc = np.nan_to_num((d4 - d3) / ((d4 - d3) + (d5 - d6)))
            denom = va + vb + vc
            v_in = np.nan_to_num(vb / denom)
            w_in = np.nan_to_num(vc / denom)
        conds = [
            (d1 <= 0) & (d2 <= 0),                        # vertex a
            (d3 >= 0) & (d4 <= d3),                       # vertex b
            (vc <= 0) & (d1 >= 0) & (d3 <= 0),            # edge ab
            (d6 >= 0) & (d5 <= d6),                       # vertex c
            (vb <= 0) & (d2 >= 0) & (d6 <= 0),            # edge ac
            (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0),  # edge bc
        ]
        cands = [
            a,
            b,
            a + t_ab[..., None] * ab,
            c,
            a + t_ac[..., None] * ac,
            b + t_bc[..., None] * bc,
        ]
        closest = a + v_in[..., None] * ab + w_in[..., None] * ac
        for cond, cand in zip(reversed(conds), reversed(cands)):
            closest = np.where(cond[..., None], cand, closest)
        d = np.linalg.norm(closest - p, axis=-1)  # [G, F]
        out[start : start + chunk] = np.argmin(d, axis=1)
    return out


def _receiver_local_relative_positions(xyz, lat_deg, lon_deg, senders,
                                       receivers):
    """Sender positions in each receiver's local frame (receiver rotated
    to lat=0, lon=0), minus the receiver position (reference behavior:
    utils.py get_relative_position_in_receiver_local_coordinates).
    """
    phi = np.deg2rad(lon_deg)[receivers]
    theta = np.deg2rad(90.0 - lat_deg)[receivers]
    rel = xyz[senders]
    # Rz(-phi)
    cosp, sinp = np.cos(-phi), np.sin(-phi)
    x = rel[:, 0] * cosp - rel[:, 1] * sinp
    y = rel[:, 0] * sinp + rel[:, 1] * cosp
    z = rel[:, 2]
    # Ry(pi/2 - theta) brings the receiver to the x-axis
    alpha = np.pi / 2.0 - theta
    cosa, sina = np.cos(alpha), np.sin(alpha)
    x2 = x * cosa + z * sina
    z2 = -x * sina + z * cosa
    rotated = np.stack([x2, y, z2], axis=-1)
    return rotated - np.array([1.0, 0.0, 0.0])


def node_features(lat_deg, lon_deg) -> np.ndarray:
    """[cos(theta), cos(phi), sin(phi)] (reference: utils.py:438)."""
    phi = np.deg2rad(lon_deg)
    theta = np.deg2rad(90.0 - lat_deg)
    return np.stack(
        [np.cos(theta), np.cos(phi), np.sin(phi)], axis=-1
    ).astype(np.float32)


def edge_features(xyz, lat_deg, lon_deg, senders, receivers) -> np.ndarray:
    """[norm, dx, dy, dz] normalized by the max norm
    (reference: utils.py:455 edge feature construction).
    """
    rel = _receiver_local_relative_positions(
        xyz, lat_deg, lon_deg, senders, receivers
    )
    norm = np.linalg.norm(rel, axis=-1, keepdims=True)
    scale = max(float(norm.max()), 1e-12)
    return np.concatenate([norm / scale, rel / scale], axis=-1).astype(
        np.float32
    )


@dataclasses.dataclass
class GraphCastGraphs:
    """All static graph tensors, precomputed host-side."""

    n_grid: int
    n_mesh: int
    grid_node_feats: np.ndarray
    mesh_node_feats: np.ndarray
    g2m_senders: np.ndarray
    g2m_receivers: np.ndarray
    g2m_edge_feats: np.ndarray
    m2m_senders: np.ndarray
    m2m_receivers: np.ndarray
    m2m_edge_feats: np.ndarray
    m2g_senders: np.ndarray
    m2g_receivers: np.ndarray
    m2g_edge_feats: np.ndarray


def build_graphs(lat2d: np.ndarray, lon2d: np.ndarray, meshes: int = 6,
                 M0: int = 4, radius_fraction: float = 1.0,
                 mask: np.ndarray | None = None) -> GraphCastGraphs:
    """(reference: main.py init_G2M/M2M/M2G_graph). ``mask`` selects the
    active grid points (FloeNet's ocean mask); mesh nodes keep full
    coverage.
    """
    hierarchy = get_mesh_hierarchy(meshes)[min(M0, meshes):]
    fine = hierarchy[-1]
    if mask is None:
        mask = np.ones(lat2d.shape, bool)
    grid_lat = lat2d[mask].ravel()
    grid_lon = lon2d[mask].ravel()
    grid_xyz = latlon_to_xyz(grid_lat, grid_lon)
    mesh_lat, mesh_lon = xyz_to_latlon(fine.vertices)

    radius = max_edge_distance(fine) * radius_fraction
    g2m_s, g2m_r = radius_query(grid_xyz, fine.vertices, radius)

    merged = merge_meshes(hierarchy)
    m2m_s, m2m_r = faces_to_edges(merged.faces)

    tri = containing_triangle(grid_xyz, fine)
    m2g_s = fine.faces[tri].ravel()  # 3 mesh senders per grid point
    m2g_r = np.repeat(np.arange(len(grid_xyz)), 3)

    return GraphCastGraphs(
        n_grid=len(grid_xyz),
        n_mesh=len(fine.vertices),
        grid_node_feats=node_features(grid_lat, grid_lon),
        mesh_node_feats=node_features(mesh_lat, mesh_lon),
        g2m_senders=g2m_s,
        g2m_receivers=g2m_r,
        g2m_edge_feats=_bipartite_edge_feats(
            grid_xyz, grid_lat, grid_lon, fine.vertices, mesh_lat,
            mesh_lon, g2m_s, g2m_r,
        ),
        m2m_senders=m2m_s,
        m2m_receivers=m2m_r,
        m2m_edge_feats=edge_features(
            fine.vertices, mesh_lat, mesh_lon, m2m_s, m2m_r
        ),
        m2g_senders=m2g_s,
        m2g_receivers=m2g_r,
        m2g_edge_feats=_bipartite_edge_feats(
            fine.vertices, mesh_lat, mesh_lon, grid_xyz, grid_lat,
            grid_lon, m2g_s, m2g_r,
        ),
    )


def _bipartite_edge_feats(s_xyz, s_lat, s_lon, r_xyz, r_lat, r_lon,
                          senders, receivers):
    xyz = np.concatenate([s_xyz, r_xyz], axis=0)
    lat = np.concatenate([s_lat, r_lat], axis=0)
    lon = np.concatenate([s_lon, r_lon], axis=0)
    return edge_features(
        xyz, lat, lon, senders, receivers + len(s_xyz)
    )


# ---------- flax message-passing model ----------


class GnnMLP(nn.Module):
    """Linear -> SiLU -> LayerNorm -> Linear
    (reference: layers.py:11 mlp)."""

    hidden: int
    out: int
    use_layernorm: bool = True
    use_bias: bool = True
    activation: str = "silu"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        h = nn.Dense(self.hidden, use_bias=self.use_bias, name="fc0")(x)
        h = act(h)
        if self.use_layernorm:
            h = nn.LayerNorm(name="norm")(h)
        return nn.Dense(self.out, use_bias=self.use_bias, name="fc1")(h)


class GraphCast(nn.Module):
    """(reference: main.py:21 GraphCast). Input/output
    [B, H, W, C] (channels-last); masked grid points carry zeros.
    """

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    lat2d: Any  # np [H, W]
    lon2d: Any
    latent_dimension: int = 256
    activation: str = "silu"
    meshes: int = 6
    M0: int = 4
    use_bias: bool = True
    radius_fraction: float = 1.0
    layernorm: bool = True
    processor_steps: int = 4
    residual: bool = True
    mask: Any = None  # optional np bool [H, W] (FloeNet ocean mask)

    def setup(self):
        self.graphs = build_graphs(
            np.asarray(self.lat2d), np.asarray(self.lon2d),
            meshes=self.meshes, M0=self.M0,
            radius_fraction=self.radius_fraction,
            mask=None if self.mask is None else np.asarray(self.mask),
        )
        if self.mask is not None:
            self._flat_idx = np.nonzero(
                np.asarray(self.mask).ravel()
            )[0]
        else:
            self._flat_idx = None

    def _mlp(self, name):
        return GnnMLP(
            hidden=self.latent_dimension, out=self.latent_dimension,
            use_layernorm=self.layernorm, use_bias=self.use_bias,
            activation=self.activation, name=name,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        g = self.graphs
        b, hh, ww, c = x.shape
        flat = x.reshape(b, hh * ww, c)
        if self._flat_idx is not None:
            flat = jnp.take(flat, jnp.asarray(self._flat_idx), axis=1)

        grid_struct = jnp.asarray(g.grid_node_feats)
        mesh_struct = jnp.asarray(g.mesh_node_feats)

        # --- encoder (SI Eqs 6-10) ---
        grid_in = jnp.concatenate(
            [flat, jnp.broadcast_to(
                grid_struct, (b, *grid_struct.shape)
            )],
            axis=-1,
        )
        vg = self._mlp("grid_node_embed")(grid_in)
        vm = self._mlp("mesh_node_embed")(
            jnp.broadcast_to(mesh_struct, (b, *mesh_struct.shape))
        )
        e_g2m = self._mlp("g2m_edge_embed")(
            jnp.broadcast_to(
                jnp.asarray(g.g2m_edge_feats),
                (b, *g.g2m_edge_feats.shape),
            )
        )
        s, r = jnp.asarray(g.g2m_senders), jnp.asarray(g.g2m_receivers)
        msg = self._mlp("g2m_message")(jnp.concatenate(
            [e_g2m, jnp.take(vg, s, axis=1), jnp.take(vm, r, axis=1)],
            axis=-1,
        ))
        e_g2m = e_g2m + msg if self.residual else msg
        agg = jax.vmap(
            lambda e: jax.ops.segment_sum(e, r, num_segments=g.n_mesh)
        )(e_g2m)
        update = self._mlp("g2m_node_update")(
            jnp.concatenate([vm, agg], axis=-1)
        )
        vm = vm + update if self.residual else update
        g_update = self._mlp("grid_update")(vg)
        vg = vg + g_update if self.residual else g_update

        e_m2m = self._mlp("m2m_edge_embed")(
            jnp.asarray(g.m2m_edge_feats)
        )
        e_m2m = jnp.broadcast_to(e_m2m, (b, *e_m2m.shape))
        e_m2g = self._mlp("m2g_edge_embed")(
            jnp.asarray(g.m2g_edge_feats)
        )

        # --- processor (SI Eqs 11-13) ---
        s_m, r_m = jnp.asarray(g.m2m_senders), jnp.asarray(g.m2m_receivers)
        for i in range(self.processor_steps):
            msg = self._mlp(f"m2m_message_{i}")(jnp.concatenate(
                [e_m2m, jnp.take(vm, s_m, axis=1),
                 jnp.take(vm, r_m, axis=1)],
                axis=-1,
            ))
            e_m2m = e_m2m + msg if self.residual else msg
            agg = jax.vmap(
                lambda e: jax.ops.segment_sum(
                    e, r_m, num_segments=g.n_mesh
                )
            )(e_m2m)
            update = self._mlp(f"m2m_node_update_{i}")(
                jnp.concatenate([vm, agg], axis=-1)
            )
            vm = vm + update if self.residual else update

        # --- decoder (SI Eqs 14-17) ---
        s_d, r_d = jnp.asarray(g.m2g_senders), jnp.asarray(g.m2g_receivers)
        e_m2g = jnp.broadcast_to(e_m2g, (b, *e_m2g.shape))
        msg = self._mlp("m2g_message")(jnp.concatenate(
            [e_m2g, jnp.take(vm, s_d, axis=1),
             jnp.take(vg, r_d, axis=1)],
            axis=-1,
        ))
        e_m2g = e_m2g + msg if self.residual else msg
        agg = jax.vmap(
            lambda e: jax.ops.segment_sum(e, r_d, num_segments=g.n_grid)
        )(e_m2g)
        update = self._mlp("grid_node_update")(
            jnp.concatenate([vg, agg], axis=-1)
        )
        vg = vg + update if self.residual else update
        out = GnnMLP(
            hidden=self.latent_dimension, out=self.out_chans,
            use_layernorm=False, use_bias=self.use_bias,
            activation=self.activation, name="out_head",
        )(vg)

        if self._flat_idx is not None:
            full = jnp.zeros((b, hh * ww, self.out_chans), out.dtype)
            full = full.at[:, jnp.asarray(self._flat_idx)].set(out)
            out = full
        return out.reshape(b, hh, ww, self.out_chans)
