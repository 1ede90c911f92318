"""Swin transformer tests (reference model:
fme/core/models/swin_transformer/test_swin_transformer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.models.registry import ModuleSelector
from ace_tpu.models.swin import SwinTransformerNet, window_partition, window_reverse


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 16 * 3, dtype=jnp.float32).reshape(2, 8, 16, 3)
    win = window_partition(x, 4, 8)
    assert win.shape == (2 * 2 * 2, 32, 3)
    back = window_reverse(win, 4, 8, 8, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_forward_and_grads():
    model = SwinTransformerNet(
        out_channels=3, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=(4, 8),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16, 5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 8, 16, 3)
    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_swin_longitude_periodicity():
    """Shift-window attention wraps along lon; rolling input by a window
    multiple rolls the output."""
    model = SwinTransformerNet(
        out_channels=2, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=(4, 8),
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    y_roll = model.apply(params, jnp.roll(x, 8, axis=2))
    np.testing.assert_allclose(
        np.asarray(jnp.roll(y, 8, axis=2)), np.asarray(y_roll), atol=1e-4
    )


def test_swin_via_registry():
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(8),
            lon=np.linspace(0, 360, 16, endpoint=False),
        )
    )
    sel = ModuleSelector(type="SwinTransformer", config={
        "embed_dim": 16, "num_heads": [2, 2, 2, 2],
    })
    model = sel.build(4, 3, info)
    x = jnp.zeros((1, 8, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 8, 16, 3)


def test_noise_conditioned_swin_is_stochastic():
    import flax

    from ace_tpu.models.swin import SwinTransformerNet

    net = SwinTransformerNet(
        out_channels=2, embed_dim=8, depths=(2,), num_heads=(2,),
        window_size=(4, 8), noise_embed_dim=4,
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
    from ace_tpu.models.registry import ModuleSelector
    from tests.test_step_stepper import _dataset_info

    sel = ModuleSelector(
        type="NoiseConditionedSwinTransformer",
        config={
            "embed_dim": 8, "depth_multiplier": 1,
            "num_heads": [2, 2, 2, 2], "window_size": [4, 8],
            "noise_embed_dim": 4,
        },
    )
    info = _dataset_info()
    net = sel.build(3, 2, info)
    x = jnp.zeros((1, *info.img_shape, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert out.shape == (1, *info.img_shape, 2)
