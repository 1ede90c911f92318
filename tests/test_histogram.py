"""Histogram + annual aggregator tests (reference: fme/core/test_histogram.py)."""

import numpy as np

from ace_tpu.aggregator.histogram import (
    DynamicHistogram,
    GlobalMeanAnnualAggregator,
    HistogramAggregator,
)
from ace_tpu.core.gridded_ops import LatLonOperations
from ace_tpu.core.metrics import spherical_area_weights
from ace_tpu.data.time import TimeCoord
import pytest


def test_dynamic_histogram_range_doubling():
    hist = DynamicHistogram(n_bins=100)
    hist.add(np.random.RandomState(0).uniform(0, 1, 1000))
    edges0 = (hist.bin_edges[0], hist.bin_edges[-1])
    hist.add(np.asarray([5.0]))  # out of range -> doubles right
    assert hist.bin_edges[-1] >= 5.0
    assert hist.counts.sum() == 1001
    hist.add(np.asarray([-7.0]))  # doubles left
    assert hist.bin_edges[0] <= -7.0
    assert hist.counts.sum() == 1002


def test_dynamic_histogram_percentile():
    hist = DynamicHistogram(n_bins=200)
    hist.add(np.linspace(0, 100, 10001))
    p50 = hist.percentile(50)
    assert abs(p50 - 50.0) < 2.0


def test_histogram_aggregator_logs():
    agg = HistogramAggregator(percentiles=[50.0])
    agg.record_batch({"t": np.random.RandomState(0).randn(2, 3, 4, 5)})
    logs = agg.get_logs()
    assert "histogram/50th-percentile/t" in logs
    assert np.isfinite(logs["histogram/50th-percentile/t"])


def test_histogram_tails_and_frac_of_target():
    """Two-tailed variables emit both tails; targets produce
    prediction_frac_of_target ratios near 1 for identical data
    (reference: fme/core/histogram.py ComparedDynamicTailsHistograms).
    """
    rng = np.random.RandomState(0)
    data = rng.randn(4, 8, 8) * 5 + 100
    agg = HistogramAggregator(
        percentiles=[99.0], two_tailed_variables=["wind"],
        left_tailed_variables=["pressure"],
    )
    gen = {"wind": data, "pressure": data, "temp": data}
    agg.record_batch(gen, target={k: v.copy() for k, v in gen.items()})
    logs = agg.get_logs()
    assert "histogram/99th-percentile/wind" in logs
    assert "histogram/1th-percentile/wind" in logs  # lower tail too
    assert "histogram/1th-percentile/pressure" in logs
    assert "histogram/99th-percentile/pressure" not in logs
    assert "histogram/99th-percentile/temp" in logs  # default upper
    frac = logs["histogram/prediction_frac_of_target/99th-percentile/temp"]
    np.testing.assert_allclose(frac, 1.0, rtol=1e-6)


def test_annual_aggregator_groups_by_year():
    nlat, nlon = 4, 8
    ops = LatLonOperations(
        spherical_area_weights(np.linspace(-60, 60, nlat), nlon)
    )
    agg = GlobalMeanAnnualAggregator(ops)
    # 8 steps spanning a year boundary (1-day steps from Dec 29)
    time = TimeCoord.from_range("2000-12-29", 8, 86400)
    time = TimeCoord(time.values[None, :], time.calendar)  # [1, 8]
    data = {"t": np.ones((1, 8, nlat, nlon), np.float32)}
    data["t"][:, 4:] = 3.0  # Jan 2 2001 onward... boundary at step 3
    agg.record_batch(data, time)
    diags = agg.get_diagnostics()
    years = diags["annual_mean_years-t"]
    assert list(years) == [2000, 2001]
    means = diags["annual_mean-t"]
    # 2000 covers steps 0-2 (Dec 29-31) => all 1.0
    assert abs(means[0] - 1.0) < 1e-6
    # 2001 covers steps 3-7 (Jan 1-5): values [1, 3, 3, 3, 3] => 2.6
    assert abs(means[1] - 2.6) < 1e-6


def test_seasonal_aggregator():
    from ace_tpu.aggregator.seasonal import SeasonalAggregator

    agg = SeasonalAggregator()
    # monthly steps over one year
    time = TimeCoord.from_range("2000-01-15", 12, 30 * 86400)
    # use actual month starts instead to keep months aligned
    import numpy as _np

    from ace_tpu.data.time import encode_time

    micros = _np.asarray([
        int(encode_time(_np.asarray([2000]), m, 15)[0]) for m in range(1, 13)
    ])
    time = TimeCoord(micros[None, :])
    data = _np.arange(1, 13, dtype=_np.float32)[None, :, None, None] * _np.ones(
        (1, 12, 2, 2), _np.float32
    )
    agg.record_batch({"t": data}, time)
    diags = agg.get_diagnostics()
    # JJA = months 6,7,8 -> mean 7
    _np.testing.assert_allclose(diags["seasonal_mean-JJA-t"], 7.0)
    # DJF = months 12,1,2 -> mean (12+1+2)/3 = 5
    _np.testing.assert_allclose(diags["seasonal_mean-DJF-t"], 5.0)


def test_near_zero_fraction():
    from ace_tpu.aggregator.seasonal import NearZeroFractionAggregator

    agg = NearZeroFractionAggregator(threshold=0.5)
    data = _zeros = np.zeros((1, 2, 4, 4), np.float32)
    data = data.copy()
    data[..., :2] = 10.0
    agg.record_batch({"p": data})
    logs = agg.get_logs()
    assert abs(logs["near_zero_fraction/p"] - 0.5) < 1e-6


def test_video_aggregator():
    from ace_tpu.aggregator.video import VideoAggregator

    rng = np.random.RandomState(0)
    agg = VideoAggregator(n_timesteps=4, enable_extended_videos=True)
    gen1 = {"a": rng.randn(2, 2, 4, 8)}
    tgt1 = {"a": rng.randn(2, 2, 4, 8)}
    gen2 = {"a": rng.randn(2, 2, 4, 8)}
    tgt2 = {"a": rng.randn(2, 2, 4, 8)}
    agg.record_batch(gen1, tgt1)
    agg.record_batch(gen2, tgt2)
    diags = agg.get_diagnostics()
    assert diags["video-gen-a"].shape == (4, 4, 8)
    np.testing.assert_allclose(
        diags["video-gen-a"][0], gen1["a"][:, 0].mean(axis=0), rtol=1e-5
    )
    np.testing.assert_allclose(
        diags["video-gen-a"][2], gen2["a"][:, 0].mean(axis=0), rtol=1e-5
    )
    err = gen1["a"][:, 1] - tgt1["a"][:, 1]
    np.testing.assert_allclose(
        diags["video-rmse-a"][1],
        np.sqrt((err**2).mean(axis=0)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        diags["video-min_err-a"][1], err.min(axis=0), rtol=1e-5
    )
    assert "video-bias-a" in diags
    assert "video-gen_var-a" in diags


def test_trend_aggregator_recovers_slope():
    from ace_tpu.aggregator.trend import TrendAggregator
    from ace_tpu.data.time import TimeCoord

    agg = TrendAggregator()
    # 2 K/year trend over 3 years, monthly steps, plus per-cell offsets
    n_time = 36
    time = TimeCoord.from_range(
        "2000-01-01T00:00", n_time, 30 * 24 * 3600
    )
    years = (
        np.asarray(time.values, np.float64)
        - time.values[0]
    ) / 1e6 / (365.25 * 24 * 3600)
    base = np.random.RandomState(0).randn(4, 8)
    field = base[None] + 2.0 * years[:, None, None]
    # feed in two chunks of [1, T/2, H, W]
    half = n_time // 2
    agg.record_batch(
        {"t2m": field[None, :half]},
        TimeCoord(time.values[None, :half], time.calendar),
        {"t2m": field[None, :half] * 0.5},
    )
    agg.record_batch(
        {"t2m": field[None, half:]},
        TimeCoord(time.values[None, half:], time.calendar),
        {"t2m": field[None, half:] * 0.5},
    )
    diags = agg.get_diagnostics()
    np.testing.assert_allclose(diags["trend-gen-t2m"], 2.0, rtol=1e-4)
    np.testing.assert_allclose(
        diags["trend-target-t2m"], 1.0, rtol=1e-4
    )


@pytest.mark.medium_duration
def test_ensemble_one_step_aggregator_calibration():
    import jax.numpy as jnp

    from ace_tpu.aggregator.one_step import EnsembleOneStepAggregator
    from ace_tpu.core.gridded_ops import LatLonOperations
    from ace_tpu.core.metrics import spherical_area_weights

    rng = np.random.RandomState(0)
    ops = LatLonOperations(
        spherical_area_weights(np.linspace(-80, 80, 8), 16)
    )
    agg = EnsembleOneStepAggregator(ops)
    # perfectly calibrated: target and members drawn from the same
    # distribution around a shared signal. The SSR is a mean of
    # per-cell spread/skill ratios (reference SSRBiasMetric), so the
    # per-cell skill estimate needs enough batch samples to converge.
    signal = rng.randn(64, 8, 16)
    target = signal + rng.randn(64, 8, 16)
    gen = signal[:, None] + rng.randn(64, 16, 8, 16)
    agg.record_batch(
        {"a": jnp.asarray(gen)}, {"a": jnp.asarray(target)}
    )
    logs = agg.get_logs()
    assert abs(logs["ensemble/spread_skill_ratio_bias/a"]) < 0.15
    assert logs["ensemble/crps/a"] > 0
    # underdispersed: zero spread -> strongly negative SSR bias
    agg2 = EnsembleOneStepAggregator(ops)
    gen0 = np.repeat(signal[:, None], 4, axis=1)[:8]
    target = target[:8]
    gen0 = gen0 + 1e-3 * rng.randn(*gen0.shape)
    agg2.record_batch(
        {"a": jnp.asarray(gen0)}, {"a": jnp.asarray(target)}
    )
    assert agg2.get_logs()["ensemble/spread_skill_ratio_bias/a"] < -0.9


def test_annual_excludes_partial_years_and_pairs_targets():
    """Incomplete first/last years are excluded from annual/mean; paired
    targets yield annual/rmse (reference annual.py min-samples drop)."""
    import jax.numpy as jnp

    from ace_tpu.aggregator.histogram import GlobalMeanAnnualAggregator
    from ace_tpu.core.gridded_ops import LatLonOperations
    from ace_tpu.core.metrics import spherical_area_weights
    from ace_tpu.data.time import TimeCoord

    ops = LatLonOperations(
        spherical_area_weights(np.linspace(-80, 80, 4), 8)
    )
    agg = GlobalMeanAnnualAggregator(ops)
    # daily steps: half of year 1, all of year 2, half of year 3
    n = 730
    time = TimeCoord.from_range("2000-07-02T00:00", n, 86400)
    time = TimeCoord(time.values[None, :], time.calendar)
    gen = {"x": jnp.ones((1, n, 4, 8))}
    tgt = {"x": 3.0 * jnp.ones((1, n, 4, 8))}
    agg.record_batch(gen, time, tgt)
    logs = agg.get_logs()
    # only 2001 is complete; means computed over complete years only
    np.testing.assert_allclose(logs["annual/mean/x"], 1.0)
    np.testing.assert_allclose(logs["annual/rmse/x"], 2.0, rtol=1e-6)
    # diagnostics still expose every year
    diags = agg.get_diagnostics()
    assert len(diags["annual_mean_years-x"]) == 3


def test_dynamic_histogram_percentile_interpolates():
    from ace_tpu.aggregator.histogram import DynamicHistogram

    h = DynamicHistogram(n_bins=4)
    # uniform data over [0, 4): percentile q should be ~q/100*4
    h.add(np.linspace(0.0, 4.0, 10001)[:-1])
    for q in (10.0, 50.0, 90.0):
        got = h.percentile(q)
        assert abs(got - q / 100.0 * 4.0) < 0.05, (q, got)


def test_enso_index_removes_seasonal_cycle():
    """A pure seasonal SST cycle must produce a ~zero ENSO index
    (reference subtracts the monthly climatology before the index)."""
    from ace_tpu.aggregator.enso import EnsoIndexAggregator
    from ace_tpu.core.coordinates import LatLonCoordinates
    from ace_tpu.data.time import TimeCoord

    nlat, nlon = 8, 16
    coords = LatLonCoordinates(
        lat=np.linspace(-80, 80, nlat),
        lon=np.linspace(0, 360, nlon, endpoint=False),
    )
    agg = EnsoIndexAggregator(coords)
    n = 48  # 4 years of ~monthly steps
    time = TimeCoord.from_range("2000-01-15T00:00", n, 30 * 86400)
    time = TimeCoord(time.values[None, :], time.calendar)
    months = time.components()["month"][0]
    seasonal = 2.0 * np.sin(2 * np.pi * (months - 1) / 12.0)
    sst = 300.0 + seasonal[None, :, None, None] * np.ones(
        (1, n, nlat, nlon)
    )
    agg.record_batch({"surface_temperature": sst}, time=time)
    logs = agg.get_logs()
    # the seasonal cycle (std ~1.4K) must be removed by the climatology
    assert logs["enso/index_std"] < 0.2
