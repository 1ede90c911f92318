"""Torch<->flax SFNO parameter mapping tests: the mapping round-trips
exactly and covers every parameter of the flax SFNO (validates name/shape
correspondence with the reference modulus SFNO layout,
fme/ace/models/modulus/sfnonet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet
from ace_tpu.utils.torch_convert import flax_sfno_to_torch, torch_sfno_to_flax
import pytest


@pytest.mark.medium_duration
def test_roundtrip_mapping_covers_all_params():
    model = SphericalFourierNeuralOperatorNet(
        img_shape=(8, 16), in_chans=4, out_chans=3, embed_dim=12,
        num_layers=2, operator_type="dhconv",
    )
    x = jnp.zeros((1, 8, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    torch_style = flax_sfno_to_torch(params)
    # expected reference naming present
    assert "blocks.0.filter.filter.weight" in torch_style
    assert "encoder.0.weight" in torch_style
    assert torch_style["encoder.0.weight"].shape == (12, 4, 1, 1)
    assert "pos_embed" in torch_style
    assert torch_style["pos_embed"].shape == (1, 12, 8, 16)

    back = torch_sfno_to_flax(torch_style, num_layers=2, encoder_layers=1)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    names_a = {"/".join(str(k.key) for k in p) for p, _ in flat_a}
    names_b = {"/".join(str(k.key) for k in p) for p, _ in flat_b}
    assert names_a == names_b
    by_name_a = {"/".join(str(k.key) for k in p): v for p, v in flat_a}
    by_name_b = {"/".join(str(k.key) for k in p): v for p, v in flat_b}
    for name in by_name_a:
        np.testing.assert_array_equal(
            np.asarray(by_name_a[name]), np.asarray(by_name_b[name]),
            err_msg=name,
        )


def test_converted_params_run_forward():
    model = SphericalFourierNeuralOperatorNet(
        img_shape=(8, 16), in_chans=2, out_chans=2, embed_dim=8,
        num_layers=1, operator_type="diagonal",
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y0 = model.apply(params, x)
    restored = torch_sfno_to_flax(
        flax_sfno_to_torch(params), num_layers=1, encoder_layers=1
    )
    y1 = model.apply(jax.tree_util.tree_map(jnp.asarray, restored), x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
