"""Downscaling generation metrics vs the torch reference as oracle
(reference: fme/downscaling/metrics_and_maths.py, piq.py,
test_metrics_and_maths.py).
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.downscaling import metrics as m


def _load_reference():
    for name in ["fme", "fme.core", "fme.downscaling"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = ["/root/reference/" + name.replace(".", "/")]
            sys.modules[name] = mod
    import fme.downscaling.metrics_and_maths as mm  # noqa: E402
    import fme.downscaling.piq as piq  # noqa: E402

    return mm, piq


@pytest.mark.medium_duration
def test_crps_and_mae_error_match_reference():
    import torch

    mm, _ = _load_reference()
    rng = np.random.RandomState(0)
    target = rng.randn(2, 8, 16).astype(np.float32)
    pred = rng.randn(2, 5, 8, 16).astype(np.float32)
    expected = mm.compute_crps(
        torch.from_numpy(target).unsqueeze(1), torch.from_numpy(pred)
    ).numpy()
    got = np.asarray(m.compute_crps(target, pred))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    expected = mm.compute_mae_error(
        torch.from_numpy(target).unsqueeze(1), torch.from_numpy(pred)
    ).numpy()
    got = np.asarray(m.compute_mae_error(target, pred))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_single_sample_mae_estimate_is_nan():
    pred = np.zeros((2, 1, 4, 4), np.float32)
    assert np.isnan(np.asarray(m.get_sample_mae_estimate(pred))).all()


def test_psnr_matches_reference():
    """Oracle is piq.psnr on correctly joint-normalized inputs — the
    reference's compute_psnr wrapper has a typo (its _normalize_tensors
    returns the normalized x twice, metrics_and_maths.py:79-84) that we
    deliberately do not replicate."""
    import torch

    mm, piq = _load_reference()
    rng = np.random.RandomState(1)
    pred = rng.randn(3, 16, 32).astype(np.float32) * 4 + 2
    tgt = rng.randn(3, 16, 32).astype(np.float32) * 4 + 2
    mn = min(pred.min(), tgt.min())
    mx = max(pred.max(), tgt.max())
    pn = torch.from_numpy((pred - mn) / (mx - mn)).unsqueeze(1)
    tn = torch.from_numpy((tgt - mn) / (mx - mn)).unsqueeze(1)
    expected = float(piq.psnr(pn, tn))
    got = float(m.compute_psnr(pred, tgt, add_channel_dim=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 24, 48), (1, 300, 300)])
def test_ssim_matches_reference(shape):
    """Small grid runs without downsampling; 300x300 exercises the
    avg-pool pre-downsampling branch (f = round(300/256) > 1)."""
    import torch

    mm, _ = _load_reference()
    rng = np.random.RandomState(2)
    pred = rng.randn(*shape).astype(np.float32)
    tgt = (pred + 0.3 * rng.randn(*shape)).astype(np.float32)
    mn = min(pred.min(), tgt.min())
    mx = max(pred.max(), tgt.max())
    pn = torch.from_numpy((pred - mn) / (mx - mn)).unsqueeze(1)
    tn = torch.from_numpy((tgt - mn) / (mx - mn)).unsqueeze(1)
    expected = float(mm.piq.ssim(pn, tn))
    got = float(m.compute_ssim(pred, tgt, add_channel_dim=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_zonal_power_spectrum_matches_reference():
    import torch

    mm, _ = _load_reference()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 12, 24).astype(np.float32)
    expected = mm.compute_zonal_power_spectrum(torch.from_numpy(x)).numpy()
    got = np.asarray(m.compute_zonal_power_spectrum(x))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_rank_matches_reference():
    import torch

    mm, _ = _load_reference()
    rng = np.random.RandomState(4)
    target = rng.randn(2, 8, 16).astype(np.float32)
    pred = rng.randn(2, 7, 8, 16).astype(np.float32)
    expected = mm.compute_rank(
        torch.from_numpy(target).unsqueeze(1), torch.from_numpy(pred)
    ).numpy()
    got = np.asarray(m.compute_rank(target, pred))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.medium_duration
def test_generation_metrics_aggregator():
    rng = np.random.RandomState(5)
    factor = 2
    b, s, hf, wf = 1, 4, 16, 32
    agg = m.GenerationMetricsAggregator(downscale_factor=factor)
    for _ in range(3):
        target = {"var": rng.randn(b, hf, wf).astype(np.float32)}
        pred = {"var": rng.randn(b, s, hf, wf).astype(np.float32)}
        coarse = {
            "var": rng.randn(b, hf // factor, wf // factor).astype(np.float32)
        }
        agg.record_batch(target, pred, coarse)
    logs = agg.get_logs("gen")
    for key in [
        "gen/metrics/crps/var",
        "gen/metrics/rmse/var",
        "gen/metrics/psnr/var",
        "gen/metrics/ssim/var",
        "gen/metrics/relative_crps_bicubic/var",
        "gen/metrics/relative_mse_bicubic/var",
    ]:
        assert np.isfinite(logs[key]), key
    diags = agg.get_diagnostics()
    assert diags["rank_histogram-var"].sum() == 3 * b * hf * wf
    assert diags["zonal_power_spectrum_prediction-var"].shape == (wf // 2 + 1,)
    assert diags["zonal_power_spectrum_coarse-var"].shape == (wf // 2 + 1,)


def test_streaming_moments_match_numpy():
    """The event-ensemble streaming mean/std must equal the batch
    statistics regardless of group sizes (regression: a constant count
    within a group corrupted both)."""
    from ace_tpu.downscaling.predict import StreamingMoments

    rng = np.random.RandomState(3)
    data = rng.randn(23, 4, 6)
    m = StreamingMoments()
    for chunk in (data[:8], data[8:16], data[16:]):
        m.update(chunk)
    np.testing.assert_allclose(m.mean, data.mean(0), rtol=1e-12)
    np.testing.assert_allclose(m.std, data.std(0, ddof=1), rtol=1e-12)


@pytest.mark.medium_duration
def test_swinir_pads_non_multiple_inputs():
    import jax
    import jax.numpy as jnp

    from ace_tpu.downscaling.swinir import SwinIR

    model = SwinIR(out_channels=2, upscale_factor=2, embed_dim=16,
                   depths=(1,), num_heads=2, window_size=(4, 8))
    x = jnp.zeros((1, 10, 12, 3))  # not multiples of (4, 8)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 20, 24, 2)


def test_diffusion_residual_base():
    """predict_residual trains/generates against the bilinear coarse
    base (reference models.py:513/:602)."""
    import jax.numpy as jnp

    from ace_tpu.core.config import from_dict
    from ace_tpu.core.coordinates import LatLonCoordinates
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.downscaling.models import DiffusionModelConfig

    nlat, nlon, f = 4, 8, 2
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=np.linspace(-60, 60, nlat * f),
            lon=np.linspace(0, 360, nlon * f, endpoint=False),
        )
    )
    cfg = from_dict(DiffusionModelConfig, {
        "in_names": ["a"], "out_names": ["a"],
        "normalization": {
            "coarse": {"means": {"a": 1.0}, "stds": {"a": 2.0}},
            "fine": {"means": {"a": 1.0}, "stds": {"a": 2.0}},
        },
        "downscale_factor": f,
        "predict_residual": True,
        "module": {"base_channels": 8, "channel_mults": [1],
                   "num_res_blocks": 1},
    })
    model = cfg.build(info)
    coarse = {"a": jnp.asarray(
        np.arange(nlat * nlon, dtype=np.float32).reshape(1, nlat, nlon)
    )}
    base = model._residual_base(coarse)
    assert base.shape == (1, nlat * f, nlon * f, 1)
    # center value preserved by bilinear upsampling of the normalized map
    norm = (np.asarray(coarse["a"]) - 1.0) / 2.0
    np.testing.assert_allclose(
        float(base[0, 0, 0, 0]), norm[0, 0, 0], rtol=1e-5
    )
