"""Swin U-Net tests (reference model:
fme/core/models/swin_transformer/test_swin_transformer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.models.registry import ModuleSelector
import pytest

from ace_tpu.models.swin import (
    SwinTransformerNet,
    earth_pad,
    mirror_pad,
    window_partition,
    window_reverse,
)


def _small_net(**kw):
    defaults = dict(
        out_channels=3, img_shape=(8, 16), embed_dim=8,
        num_heads=(2, 2, 2, 2), window_size=(2, 4), drop_path_rate=0.0,
    )
    defaults.update(kw)
    return SwinTransformerNet(**defaults)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 16 * 3, dtype=jnp.float32).reshape(2, 8, 16, 3)
    win = window_partition(x, 4, 8)
    assert win.shape == (2 * 2 * 2, 32, 3)
    back = window_reverse(win, 4, 8, 8, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.medium_duration
def test_swin_forward_and_grads():
    model = _small_net()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16, 5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 8, 16, 3)
    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.medium_duration
def test_swin_non_multiple_shape_is_padded():
    """Shapes not divisible by 2x the window are zero-padded and cropped."""
    model = _small_net(img_shape=(7, 13))
    x = jnp.zeros((1, 7, 13, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 7, 13, 3)


def test_swin_no_skip_changes_decoder_width():
    model = _small_net(use_skip=False)
    x = jnp.zeros((1, 8, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 8, 16, 3)
    # final_linear consumes embed_dim (not 2x) without the skip concat
    k = params["params"]["final_linear"]["kernel"]
    assert k.shape[0] == 8


def test_swin_swiglu_mlp():
    model = _small_net(mlp_layer="swiglu")
    x = jnp.zeros((1, 8, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 8, 16, 3)


def test_earth_padding_roundtrip_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16, 2))
    padded = earth_pad(x, (2, 2), (3, 3))
    assert padded.shape == (1, 12, 22, 2)
    # pole rows come from the 180-degree-rolled flip
    np.testing.assert_allclose(
        np.asarray(padded[0, 1, 3:19]),
        np.asarray(jnp.roll(x[0, 0], 8, axis=0)),
    )
    m = mirror_pad(x, (2, 2), (3, 3))
    assert m.shape == (1, 12, 22, 2)


@pytest.mark.medium_duration
def test_swin_cos_lat_cpb_changes_output():
    """cos-lat CPB scaling must alter the bias (vs plain Swin V2 CPB)."""
    lat = tuple(np.linspace(-82.5, 82.5, 8).tolist())
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 16, 2), jnp.float32)
    m1 = _small_net(lat_coords=lat)
    params = m1.init(jax.random.PRNGKey(0), x)
    # perturb the zero-init CPB output layer so the bias is nonzero
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    params = flax.traverse_util.unflatten_dict({
        k: (v + 0.3 if "cpb_fc2" in "/".join(map(str, k)) else v)
        for k, v in flat.items()
    })
    m2 = _small_net(lat_coords=None)
    y1 = m1.apply(params, x)
    y2 = m2.apply(params, x)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.medium_duration
def test_swin_via_registry():
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(8),
            lon=np.linspace(0, 360, 16, endpoint=False),
        )
    )
    sel = ModuleSelector(type="SwinTransformer", config={
        "embed_dim": 16, "num_heads": [2, 2, 2, 2],
        "window_size": [2, 4],
    })
    model = sel.build(4, 3, info)
    x = jnp.zeros((1, 8, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 8, 16, 3)


@pytest.mark.medium_duration
def test_noise_conditioned_swin_is_stochastic():
    import flax

    net = _small_net(
        out_channels=2, conditioning="cln", noise_embed_dim=4,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 16, 3), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), x)
    # conditioning weights are zero-init; perturb them so noise matters
    flat = flax.traverse_util.flatten_dict(params)
    perturbed = {
        k: (v + 0.1 if "w_scale_2d" in "/".join(map(str, k)) else v)
        for k, v in flat.items()
    }
    params = flax.traverse_util.unflatten_dict(perturbed)
    o1 = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    o2 = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert o1.shape == (1, 8, 16, 2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # no rng -> deterministic zero-noise path
    o3 = net.apply(params, x)
    o4 = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o4))


def test_noise_conditioned_swin_registry():
    from tests.test_step_stepper import _dataset_info

    sel = ModuleSelector(
        type="NoiseConditionedSwinTransformer",
        config={
            "embed_dim": 8, "depth_multiplier": 1,
            "num_heads": [2, 2, 2, 2], "window_size": [2, 4],
            "noise_embed_dim": 4,
        },
    )
    info = _dataset_info()
    net = sel.build(3, 2, info)
    x = jnp.zeros((1, *info.img_shape, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert out.shape == (1, *info.img_shape, 2)
