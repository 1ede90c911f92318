"""HEALPix padding/UNet tests. Padding is validated against the torch
reference implementation loaded standalone as an oracle
(reference: fme/ace/models/healpix/healpix_paddings.py:239 HEALPixPadding).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.models.healpix import HEALPixUNet, healpix_pad

REFERENCE_PADDINGS = (
    "/root/reference/fme/ace/models/healpix/healpix_paddings.py"
)


def _load_reference_paddings():
    spec = importlib.util.spec_from_file_location(
        "hpx_pad_ref", REFERENCE_PADDINGS
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("p", [1, 2])
def test_healpix_pad_matches_reference(p):
    import torch

    ref = _load_reference_paddings()
    rng = np.random.RandomState(0)
    B, C, H = 2, 3, 8
    data = rng.randn(B, 12, C, H, H).astype(np.float32)

    # reference operates on folded [B*12, C, H, W]
    torch_in = torch.as_tensor(data.reshape(B * 12, C, H, H))
    ref_pad = ref.HEALPixPadding(padding=p)
    expected = ref_pad(torch_in).numpy().reshape(B, 12, C, H + 2 * p, H + 2 * p)

    # ours is channels-last [B, 12, H, W, C]
    ours_in = jnp.asarray(np.moveaxis(data, 2, -1))
    ours = np.asarray(healpix_pad(ours_in, p))
    ours_cf = np.moveaxis(ours, -1, 2)
    np.testing.assert_allclose(ours_cf, expected, atol=1e-6)


@pytest.mark.medium_duration
def test_healpix_unet_shapes_and_grads():
    from ace_tpu.models.healpix import (
        AvgPoolDownsamplingBlockConfig,
        BasicConvBlockConfig,
        CappedGELUConfig,
        ConvNeXtBlockConfig,
        TransposedConvUpsampleBlockConfig,
        UNetDecoderConfig,
        UNetEncoderConfig,
    )

    model = HEALPixUNet(
        out_channels=3,
        encoder=UNetEncoderConfig(
            conv_block=ConvNeXtBlockConfig(activation=CappedGELUConfig()),
            down_sampling_block=AvgPoolDownsamplingBlockConfig(),
            n_channels=[8, 16], n_layers=[1, 1],
        ),
        decoder=UNetDecoderConfig(
            conv_block=ConvNeXtBlockConfig(activation=CappedGELUConfig()),
            up_sampling_block=TransposedConvUpsampleBlockConfig(),
            output_layer=BasicConvBlockConfig(kernel_size=1, n_layers=1),
            n_channels=[16, 8], n_layers=[1, 1],
        ),
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 12, 8, 8, 4), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 12, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(y)))
    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(g)
    )
