"""SongUNet v2 architecture parity: the flax port and the reference's
own vendored torch code (reference:
fme/downscaling/modules/physicsnemo_unets_v2/unets.py:88 SongUNetv2)
produce matching forwards with shared weights, so HiRO-ACE reference
checkpoints convert directly."""

import importlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_reference_forward_parity as parity

from ace_tpu.downscaling.song_unet import SongUNetV2
from ace_tpu.utils.torch_convert import torch_songunet_v2_to_flax


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def _load_reference_songunet():
    parity._install_csfno_stubs()
    for name, path in [
        ("fme", "/root/reference/fme"),
        ("fme.downscaling", "/root/reference/fme/downscaling"),
        ("fme.downscaling.modules",
         "/root/reference/fme/downscaling/modules"),
    ]:
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        m.__path__ = [path]
    return importlib.import_module(
        "fme.downscaling.modules.physicsnemo_unets_v2"
    )


CONFIGS = {
    "standard": dict(encoder_type="standard", decoder_type="standard",
                     embedding_type="positional"),
    "skip_fourier": dict(encoder_type="skip", decoder_type="skip",
                         embedding_type="fourier"),
    "residual": dict(encoder_type="residual", decoder_type="standard",
                     embedding_type="positional"),
}


@pytest.mark.parametrize("variant", sorted(CONFIGS))
def test_forward_matches_reference_songunet_v2(variant):
    import torch

    pkg = _load_reference_songunet()
    torch.manual_seed(0)

    kw = dict(
        img_resolution=16,
        in_channels=5,  # 2 latents + 3 conditioning
        out_channels=2,
        model_channels=8,
        channel_mult=[1, 2, 2],
        channel_mult_emb=4,
        num_blocks=2,
        attn_resolutions=[8],
        dropout=0.0,  # parity forward must be deterministic
        use_apex_gn=False,
        amp_mode=False,
        **CONFIGS[variant],
    )
    ref = pkg.SongUNetv2(**kw)
    # train() so GroupNorm uses F.group_norm (biased variance), the same
    # statistics as training/Apex and as this port
    ref.train()

    flax_kw = dict(kw)
    flax_kw.pop("amp_mode")
    flax_kw.pop("use_apex_gn")
    net = SongUNetV2(**flax_kw)
    params = torch_songunet_v2_to_flax(ref.state_dict())

    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 2).astype(np.float32)
    cond = rng.randn(2, 16, 16, 3).astype(np.float32)
    noise = rng.randn(2).astype(np.float32)

    with torch.no_grad():
        x_t = torch.as_tensor(
            np.concatenate([x, cond], axis=-1).transpose(0, 3, 1, 2)
        )
        expected = ref(
            x_t, torch.as_tensor(noise), class_labels=None
        ).numpy().transpose(0, 2, 3, 1)

    # init gives the structure; converted params must cover it exactly
    init_params = net.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(cond), jnp.asarray(noise))
    flat_init = {
        "/".join(str(k.key) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]
    }
    flat_conv = {
        "/".join(str(k.key) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert flat_init == flat_conv

    actual = net.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x), jnp.asarray(cond), jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        np.asarray(actual), expected, atol=5e-5, rtol=5e-4
    )


def test_songunet_v2_registered_as_downscaling_backbone():
    """The {type, config} selector builds a DiffusionModel around the
    SongUNetV2 and the EDM loss/sampler run end to end."""
    import datetime

    from ace_tpu.core.config import from_dict
    from ace_tpu.core.coordinates import (
        LatLonCoordinates,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.downscaling.models import DiffusionModelConfig

    cfg = from_dict(DiffusionModelConfig, {
        "in_names": ["a", "b"],
        "out_names": ["c"],
        "normalization": {
            "coarse": {"means": {"a": 0.0, "b": 0.0},
                       "stds": {"a": 1.0, "b": 1.0}},
            "fine": {"means": {"c": 0.0}, "stds": {"c": 1.0}},
        },
        "module": {"type": "unet_diffusion_song_v2", "config": {
            "model_channels": 8, "channel_mult": [1, 2],
            "num_blocks": 1, "attn_resolutions": [8],
            "dropout": 0.1,
        }},
        "downscale_factor": 2,
        "num_diffusion_generation_steps": 2,
    })
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=np.linspace(-45, 45, 8),
            lon=np.linspace(0, 360, 16, endpoint=False),
        ),
        timestep=datetime.timedelta(hours=6),
    )
    model = cfg.build(info)
    model.init_params(jax.random.PRNGKey(0))
    coarse = {
        k: jnp.asarray(np.random.RandomState(0).randn(1, 8, 16),
                       jnp.float32)
        for k in ["a", "b"]
    }
    fine = {"c": jnp.asarray(
        np.random.RandomState(1).randn(1, 16, 32), jnp.float32
    )}
    loss = model.loss_fn(model.params, coarse, fine, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    out = model.generate(coarse, jax.random.PRNGKey(3), n_samples=1)
    assert out["c"].shape == (1, 1, 16, 32)
    assert np.isfinite(np.asarray(out["c"])).all()
