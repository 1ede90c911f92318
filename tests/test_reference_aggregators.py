"""Reference-data comparison aggregators: monthly_reference_data (annual
R2 vs an offline simulation) and time_mean_reference_data (bias/RMSE of
the generated time-mean vs offline maps).

Reference: fme/ace/aggregator/inference/main.py:284-285,
annual.py:285-309 (process_monthly_reference, get_r2),
time_mean.py:190-205 (ref_bias/ref_rmse).
"""

import numpy as np
import pytest

from ace_tpu.aggregator.inference import (
    InferenceAggregatorConfig,
    StepMeanEntry,
    load_monthly_reference,
    load_time_mean_reference,
)
from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.data.store import write_h5
from ace_tpu.data.time import TimeCoord, encode_time

NLAT, NLON = 8, 16


@pytest.fixture
def dataset_info():
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(NLAT),
            lon=np.linspace(0, 360, NLON, endpoint=False),
        ),
    )


def _monthly_time(n_months: int, n_samples: int) -> TimeCoord:
    micros = np.asarray([
        encode_time(2000 + i // 12, i % 12 + 1, 15)
        for i in range(n_months)
    ])
    return TimeCoord(
        np.broadcast_to(micros[None], (n_samples, n_months)).copy(),
        "proleptic_gregorian",
    )


def _write_monthly_reference(path, field, counts, time: TimeCoord):
    """field: [sample, month, lat, lon]; counts: [sample, month]."""
    from ace_tpu.data.store import encode_cf_time

    vals, units, calendar = encode_cf_time(time)
    write_h5(
        str(path),
        data={
            "prog_a": field,
            "counts": counts,
            "valid_time": vals,
        },
        dims={
            "prog_a": ("sample", "month", "lat", "lon"),
            "counts": ("sample", "month"),
            "valid_time": ("sample", "month"),
        },
        attrs={"valid_time": {"units": units, "calendar": calendar}},
    )


def test_load_monthly_reference_annual_coarsening(dataset_info, tmp_path):
    """Count-weighted annual means from monthly reference data match a
    hand computation; constant fields give exact annual values."""
    n_samples, n_months = 2, 24
    time = _monthly_time(n_months, n_samples)
    rng = np.random.RandomState(0)
    # spatially constant per (sample, month) so the global mean is known
    month_vals = rng.rand(n_samples, n_months).astype(np.float32)
    field = np.broadcast_to(
        month_vals[..., None, None],
        (n_samples, n_months, NLAT, NLON),
    ).astype(np.float32)
    counts = rng.randint(1, 10, (n_samples, n_months)).astype(np.float64)
    path = tmp_path / "monthly.nc"
    _write_monthly_reference(path, field, counts, time)

    ref = load_monthly_reference(
        str(path), dataset_info.gridded_operations
    )
    assert set(ref["prog_a"]) == {2000, 2001}
    for year_idx, year in enumerate((2000, 2001)):
        sl = slice(12 * year_idx, 12 * (year_idx + 1))
        expect = np.mean(
            np.sum(month_vals[:, sl] * counts[:, sl], axis=1)
            / np.sum(counts[:, sl], axis=1)
        )
        np.testing.assert_allclose(
            ref["prog_a"][year], expect, rtol=1e-5
        )


def test_annual_r2_against_monthly_reference(dataset_info, tmp_path):
    """An inference run whose annual means equal the reference's gets
    R2 = 1; a constant-offset run gets R2 < 1."""
    from ace_tpu.aggregator.histogram import GlobalMeanAnnualAggregator

    ops = dataset_info.gridded_operations
    n_samples, n_months = 1, 36
    time = _monthly_time(n_months, n_samples)
    # distinct yearly levels 1.0/2.0/3.0
    month_vals = np.repeat(
        np.asarray([1.0, 2.0, 3.0], np.float32), 12
    )[None]
    field = np.broadcast_to(
        month_vals[..., None, None], (n_samples, n_months, NLAT, NLON)
    ).astype(np.float32)
    counts = np.ones((n_samples, n_months))
    path = tmp_path / "monthly.nc"
    _write_monthly_reference(path, field, counts, time)
    ref = load_monthly_reference(str(path), ops)

    def run(offset: float) -> dict:
        agg = GlobalMeanAnnualAggregator(
            ops, timestep_seconds=6 * 3600.0, monthly_reference=ref
        )
        # 4x daily samples over 3 years, value = year level + offset
        steps_per_year = 4 * 365
        for year_idx in range(3):
            micros = encode_time(2000 + year_idx, 1, 1) + (
                np.arange(steps_per_year, dtype=np.int64)
                * 6 * 3600 * 1_000_000
            )
            t = TimeCoord(micros[None], "proleptic_gregorian")
            gen = {"prog_a": np.full(
                (1, steps_per_year, NLAT, NLON),
                year_idx + 1.0 + offset, np.float32,
            )}
            agg.record_batch(gen, t)
        return agg.get_logs("annual")

    logs = run(0.0)
    assert logs["annual/r2/prog_a_gen"] == pytest.approx(1.0, abs=1e-5)
    logs_off = run(0.5)
    assert logs_off["annual/r2/prog_a_gen"] < logs["annual/r2/prog_a_gen"]


def test_time_mean_reference(dataset_info, tmp_path):
    """ref_bias/ref_rmse vs an offline time-mean map, end to end through
    the aggregator config."""
    rng = np.random.RandomState(1)
    ref_map = rng.randn(NLAT, NLON).astype(np.float32)
    path = tmp_path / "time_mean.nc"
    write_h5(
        str(path), data={"prog_a": ref_map},
        dims={"prog_a": ("lat", "lon")},
    )
    loaded = load_time_mean_reference(str(path))
    np.testing.assert_array_equal(loaded["prog_a"], ref_map)

    config = InferenceAggregatorConfig(
        log_spectra=False, log_zonal_mean_images=False,
        log_annual_means=False, log_global_mean_time_series=False,
        time_mean_reference_data=str(path),
    )
    agg = config.build(dataset_info, n_timesteps=4)
    gen = {"prog_a": np.broadcast_to(
        ref_map + 1.0, (2, 4, NLAT, NLON)
    ).astype(np.float32)}
    agg.record_batch(gen, None)
    logs = agg.get_logs()
    assert logs["time_mean/ref_bias/prog_a"] == pytest.approx(1.0, abs=1e-5)
    assert logs["time_mean/ref_rmse/prog_a"] == pytest.approx(1.0, abs=1e-5)


def test_step_mean_entries_and_norm_series(dataset_info):
    """log_step_means logs per-variable metrics at the selected rollout
    step, and the normalized global-mean series runs on normalized
    fields (reference: main.py:422 log_step_means, :239 mean_norm)."""
    from ace_tpu.core.normalizer import StandardNormalizer

    normalizer = StandardNormalizer(
        means={"prog_a": 2.0}, stds={"prog_a": 4.0}
    )
    config = InferenceAggregatorConfig(
        log_spectra=False, log_zonal_mean_images=False,
        log_annual_means=False,
        log_step_means=[
            StepMeanEntry(step=2), StepMeanEntry(step=4, name="final"),
        ],
    )
    agg = config.build(dataset_info, n_timesteps=4, normalizer=normalizer)
    # two windows of 2 steps; gen = target + 1 at every step; gen value
    # ramps 10, 20, 30, 40 across the rollout
    for w in range(2):
        vals = np.asarray([10.0 * (2 * w + 1), 10.0 * (2 * w + 2)],
                          np.float32)
        gen = {"prog_a": np.broadcast_to(
            vals[None, :, None, None], (1, 2, NLAT, NLON)
        ).astype(np.float32)}
        target = {"prog_a": gen["prog_a"] - 1.0}
        agg.record_batch(gen, target)
    logs = agg.get_logs()
    assert logs["mean_step_2/weighted_mean_gen/prog_a"] == pytest.approx(
        20.0, abs=1e-4
    )
    assert logs["mean_step_2/weighted_rmse/prog_a"] == pytest.approx(
        1.0, abs=1e-5
    )
    assert logs["final/weighted_mean_gen/prog_a"] == pytest.approx(
        40.0, abs=1e-3
    )
    assert logs["final/weighted_bias/prog_a"] == pytest.approx(
        1.0, abs=1e-5
    )


def test_step_means_beyond_rollout_are_skipped(dataset_info):
    """The default step-20 entry is skipped (with a warning) on short
    rollouts instead of crashing or silently lying."""
    config = InferenceAggregatorConfig(
        log_spectra=False, log_zonal_mean_images=False,
        log_annual_means=False,
    )
    agg = config.build(dataset_info, n_timesteps=4)
    gen = {"prog_a": np.zeros((1, 4, NLAT, NLON), np.float32)}
    agg.record_batch(gen, None)
    logs = agg.get_logs()
    assert not any("mean_step_20" in k for k in logs)


def test_norm_series_diagnostics(dataset_info):
    """Normalized series diagnostics divide out the configured std."""
    from ace_tpu.core.normalizer import StandardNormalizer

    normalizer = StandardNormalizer(
        means={"prog_a": 0.0}, stds={"prog_a": 4.0}
    )
    config = InferenceAggregatorConfig(
        log_spectra=False, log_zonal_mean_images=False,
        log_annual_means=False, log_step_means=[],
    )
    agg = config.build(dataset_info, n_timesteps=2, normalizer=normalizer)
    gen = {"prog_a": np.full((1, 2, NLAT, NLON), 8.0, np.float32)}
    agg.record_batch(gen, None)
    import os
    import tempfile

    out_dir = tempfile.mkdtemp()
    agg.flush_diagnostics(out_dir)
    from ace_tpu.data.store import open_file_dataset

    ds = open_file_dataset(
        os.path.join(out_dir, "mean_norm_diagnostics.nc")
    )
    series = ds["weighted_mean_gen_series-prog_a"].read(())
    np.testing.assert_allclose(series, 2.0, atol=1e-6)


def test_record_after_finalize_keeps_accumulating(dataset_info):
    """The jitted pending/drain design (aggregator/inference.py module
    docstring) must behave like plain accumulation even when get_logs /
    get_diagnostics (which drain device state) interleave with further
    record_batch calls."""
    rng = np.random.RandomState(0)
    time = _monthly_time(4, 1)

    def batch(seed):
        r = np.random.RandomState(seed)
        return {"prog_a": r.randn(1, 4, NLAT, NLON).astype(np.float32)}

    cfg = InferenceAggregatorConfig(
        log_histograms=True, log_seasonal_means=True,
        log_near_zero_fraction=True, log_trends=True, log_video=True,
    )
    # interleaved: drain (get_logs) between the two windows
    agg_a = cfg.build(dataset_info, n_timesteps=8)
    agg_a.record_batch(batch(1), batch(11), time=time)
    mid_logs = agg_a.get_logs()
    assert np.isfinite(mid_logs["time_mean/rmse/prog_a"])
    agg_a.record_batch(batch(2), batch(12), time=time)
    # uninterrupted control
    agg_b = cfg.build(dataset_info, n_timesteps=8)
    agg_b.record_batch(batch(1), batch(11), time=time)
    agg_b.record_batch(batch(2), batch(12), time=time)
    logs_a, logs_b = agg_a.get_logs(), agg_b.get_logs()
    assert set(logs_a) == set(logs_b)
    for k in logs_b:
        np.testing.assert_allclose(
            logs_a[k], logs_b[k], rtol=1e-6, err_msg=k
        )
    diags_a, diags_b = {}, {}
    for agg, out in ((agg_a, diags_a), (agg_b, diags_b)):
        for label, sub in agg._aggregators.items():
            if hasattr(sub, "get_diagnostics"):
                for k, v in sub.get_diagnostics().items():
                    out[f"{label}/{k}"] = np.asarray(v)
    assert set(diags_a) == set(diags_b)
    for k in diags_b:
        np.testing.assert_allclose(
            diags_a[k], diags_b[k], rtol=1e-6, err_msg=k
        )
