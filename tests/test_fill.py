"""SmoothFloodFill tests vs the torch reference as oracle
(reference: fme/core/fill.py SmoothFloodFill, test_fill.py).
"""

import sys
import types

import numpy as np
import pytest

from ace_tpu.core.fill import SmoothFloodFill


def _load_reference_fill():
    for name in ["fme", "fme.core"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = ["/root/reference/" + name.replace(".", "/")]
            sys.modules[name] = mod
    import fme.core.fill as fill  # noqa: E402

    return fill


def _field_with_mask(rng, b, t, h, w):
    x = rng.randn(b, t, h, w).astype(np.float32)
    # a blob of NaNs with interior deeper than num_steps, plus one
    # touching the longitude seam to exercise circular padding
    mask = np.zeros((h, w), bool)
    mask[5:17, 6:20] = True
    mask[2:5, -3:] = True
    mask[2:5, :2] = True
    x[:, :, mask] = np.nan
    return x


@pytest.mark.parametrize("num_steps,ksize,sigma", [(4, 5, 1.0), (2, 3, 0.7)])
def test_flood_fill_matches_reference(num_steps, ksize, sigma):
    import torch

    fill_ref = _load_reference_fill()
    rng = np.random.RandomState(0)
    x = _field_with_mask(rng, 2, 3, 24, 48)

    ref = fill_ref.SmoothFloodFill(
        num_steps=num_steps, blur_kernel_size=ksize, blur_sigma=sigma
    )
    expected = ref(torch.from_numpy(x), "var").numpy()

    ours = SmoothFloodFill(
        num_steps=num_steps, blur_kernel_size=ksize, blur_sigma=sigma
    )
    got = np.asarray(ours(x, "var"))

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_flood_fill_no_nans_passthrough():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 8, 16).astype(np.float32)
    fill = SmoothFloodFill()
    np.testing.assert_array_equal(np.asarray(fill(x, "v")), x)


def test_flood_fill_mask_cached_per_name():
    rng = np.random.RandomState(0)
    x = _field_with_mask(rng, 1, 1, 24, 48)
    fill = SmoothFloodFill()
    a = np.asarray(fill(x, "v"))
    b = np.asarray(fill(x.copy(), "v"))  # second call uses cached masks
    np.testing.assert_array_equal(a, b)


def test_spectrum_aggregator_fills_nans():
    """Spectrum of a masked field must be finite (mask filled pre-SHT)."""
    from ace_tpu.aggregator.inference import SpectrumAggregator

    rng = np.random.RandomState(0)
    nlat, nlon = 24, 48
    x = _field_with_mask(rng, 1, 2, nlat, nlon)
    agg = SpectrumAggregator(nlat, nlon, grid="equiangular")
    agg.record_batch({"sst": x}, {"sst": x.copy()})
    diags = agg.get_diagnostics()
    assert np.isfinite(diags["gen_power-sst"]).all()
    logs = agg.get_logs()
    assert np.isfinite(logs["spectrum/mean_abs_norm_bias/sst"])
