"""ETL companion tools: monthly netCDF conversion, repeating forcing,
window averaging, ENSO index (reference:
scripts/data_process/convert_to_monthly_netcdf.py,
compute_repeating_forcing.py, create_window_avg_dataset.py,
scripts/compute_enso_index/compute_enso_index.py)."""

import numpy as np
import pytest
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5, write_zarr
from ace_tpu.data.time import TimeCoord

NY, NX = 4, 8


def _write_zarr_series(path, n_time, start="1999-12-25T00:00",
                       step=21600, extra=None):
    rng = np.random.RandomState(0)
    time = TimeCoord.from_range(start, n_time, step)
    arrays = {
        "a": rng.randn(n_time, NY, NX).astype(np.float32),
        "b": rng.randn(n_time, NY, NX).astype(np.float32),
        "static": rng.randn(NY, NX).astype(np.float32),
        "lat": np.linspace(-60, 60, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }
    if extra:
        arrays.update(extra)
    dims = {
        "a": ("time", "lat", "lon"), "b": ("time", "lat", "lon"),
        "static": ("lat", "lon"), "lat": ("lat",), "lon": ("lon",),
    }
    if extra:
        dims.update({k: ("time", "lat", "lon") for k in extra})
    write_zarr(str(path), arrays, dims, time=time)
    return arrays, time


def test_monthly_netcdf_groups_and_prepend(tmp_path):
    from ace_tpu.data_process.monthly_netcdf import (
        convert_to_monthly_netcdf,
    )

    # 40 six-hourly steps from Dec 25: spans Dec 1999 and Jan 2000
    arrays, time = _write_zarr_series(tmp_path / "in.zarr", 40)
    out = tmp_path / "monthly"
    written = convert_to_monthly_netcdf(str(tmp_path / "in.zarr"), str(out))
    assert [p.split("/")[-1] for p in written] == [
        "1999120100.nc", "2000010100.nc"
    ]
    dec = open_file_dataset(written[0])
    jan = open_file_dataset(written[1])
    # Dec 25..31 is 28 steps
    assert dec["a"].shape == (28, NY, NX)
    assert jan["a"].shape == (12, NY, NX)
    np.testing.assert_array_equal(dec["a"].read(()), arrays["a"][:28])
    np.testing.assert_array_equal(jan["a"].read(()), arrays["a"][28:])
    # static variables appear in each monthly file
    np.testing.assert_array_equal(
        dec["static"].read(()), arrays["static"]
    )
    assert len(jan.read_time()) == 12

    # prepend-nans shifts in a NaN initial step one dt earlier
    out2 = tmp_path / "monthly2"
    written2 = convert_to_monthly_netcdf(
        str(tmp_path / "in.zarr"), str(out2), prepend_nans=True
    )
    first = open_file_dataset(written2[0])
    a = first["a"].read(())
    assert a.shape[0] == 29
    assert np.isnan(a[0]).all()
    np.testing.assert_array_equal(a[1:], arrays["a"][:28])

    # date subsetting is inclusive of the end date
    out3 = tmp_path / "monthly3"
    written3 = convert_to_monthly_netcdf(
        str(tmp_path / "in.zarr"), str(out3),
        start_date="2000-01-01", end_date="2000-01-01",
    )
    assert len(written3) == 1
    assert open_file_dataset(written3[0])["a"].shape[0] == 4


def test_repeating_forcing(tmp_path):
    from ace_tpu.data_process.monthly_netcdf import (
        convert_to_monthly_netcdf,
    )
    from ace_tpu.data_process.repeating_forcing import (
        compute_repeating_forcing,
    )

    arrays, time = _write_zarr_series(
        tmp_path / "in.zarr", 8, start="2000-01-01T00:00"
    )
    nc_dir = tmp_path / "nc"
    convert_to_monthly_netcdf(str(tmp_path / "in.zarr"), str(nc_dir))
    out = tmp_path / "repeat"
    written = compute_repeating_forcing(
        str(nc_dir), str(out), n_times=2, repeat_variables=["a"]
    )
    ds = open_file_dataset(written[0])
    # repeated variable: each timestep duplicated consecutively
    # (np.repeat semantics, matching the reference script)
    a = ds["a"].read(())
    assert a.shape[0] == 16
    np.testing.assert_array_equal(a, np.repeat(arrays["a"], 2, axis=0))
    # time extends at the original spacing
    t = ds.read_time()
    assert len(t) == 16
    dt = np.diff(t.values)
    assert (dt == dt[0]).all()
    # non-repeated time-varying variable becomes an initial condition
    assert ds["b"].dims[0] == "initial_condition"
    np.testing.assert_array_equal(ds["b"].read(())[0], arrays["b"][0])
    # static variable passes through
    np.testing.assert_array_equal(ds["static"].read(()), arrays["static"])


def test_window_average(tmp_path):
    from ace_tpu.data_process.window_avg import (
        CreateWindowAvgDatasetConfig, window_average,
    )

    arrays, time = _write_zarr_series(
        tmp_path / "in.zarr", 12, start="2000-01-01T06:00"
    )
    cfg = {
        "input_dataset": {"zarr_path": str(tmp_path / "in.zarr")},
        "window_avg": {
            "window_timedelta": "24h",
            "first_timestamp": "2000-01-01T06:00:00",
        },
        "output_zarr_path": str(tmp_path / "out.zarr"),
    }
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    config = CreateWindowAvgDatasetConfig.from_file(str(path))
    window_average(
        config.window_avg, config.input_dataset.zarr_path,
        config.output_zarr_path,
    )
    ds = open_file_dataset(str(tmp_path / "out.zarr"))
    a = ds["a"].read(())
    # right-closed 24h windows with origin one window before
    # first_timestamp (reference semantics): the first bin holds only the
    # first sample, then steps [1..4], [5..8], [9..11] (partial)
    assert a.shape == (4, NY, NX)
    np.testing.assert_allclose(a[0], arrays["a"][0], rtol=1e-5)
    np.testing.assert_allclose(
        a[1], arrays["a"][1:5].mean(axis=0), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        a[3], arrays["a"][9:].mean(axis=0), rtol=1e-5, atol=1e-7
    )
    # right-labeled: labels at first_timestamp + k*window
    t = ds.read_time()
    assert len(t) == 4
    assert (np.diff(t.values) == 24 * 3600 * 10**6).all()
    # static variables pass through un-averaged
    np.testing.assert_array_equal(ds["static"].read(()), arrays["static"])

    # midpoint shift moves labels back half a window
    cfg["window_avg"]["shift_timestamps_to_avg_interval_midpoint"] = True
    cfg["output_zarr_path"] = str(tmp_path / "out2.zarr")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    config = CreateWindowAvgDatasetConfig.from_file(str(path))
    window_average(
        config.window_avg, config.input_dataset.zarr_path,
        config.output_zarr_path,
    )
    t2 = open_file_dataset(str(tmp_path / "out2.zarr")).read_time()
    assert (t.values - t2.values == 12 * 3600 * 10**6).all()


def test_enso_index(tmp_path):
    from ace_tpu.data_process.enso_index import compute_enso_index

    # 4 years of monthly SST with a known sinusoidal ENSO-like signal in
    # the nino3.4 box and a flat tropical background
    n_time = 48
    time = TimeCoord.from_range("2000-01-15T00:00", n_time,
                                30 * 86400)
    lat = np.linspace(-20, 20, 9)
    lon = np.linspace(0, 360, 18, endpoint=False)
    sst = np.full((n_time, 9, 18), 300.0)
    in_box = ((lat >= -5) & (lat <= 5))[:, None] & (
        (lon >= 190) & (lon <= 240)
    )[None, :]
    signal = 2.0 * np.sin(2 * np.pi * np.arange(n_time) / 16)
    sst += signal[:, None, None] * in_box[None]
    write_h5(
        str(tmp_path / "sst.nc"),
        {"sea_surface_temperature": sst.astype(np.float32),
         "lat": lat, "lon": lon},
        {"sea_surface_temperature": ("time", "lat", "lon"),
         "lat": ("lat",), "lon": ("lon",)},
        time=time,
    )
    labels, values = compute_enso_index(str(tmp_path / "sst.nc"))
    assert len(values) >= 15  # ~16 quarterly values over 4 years
    # index must track the imposed oscillation: strong positive/negative
    # swings of roughly the right magnitude survive the 3-month mean
    assert values.max() > 0.5
    assert values.min() < -0.5
    # anomalies are centered
    assert abs(values.mean()) < 0.3
    # labels are (year, month, day) tuples at season starts
    years = {y for (y, m, d) in labels}
    assert years >= {2000, 2001, 2002, 2003}
    assert all(m in (1, 4, 7, 10) for (_, m, _) in labels)


def test_consolidate_zarrs(tmp_path):
    """consolidate_dataset merges variables from two sources, preserves
    source attrs, and raises on mismatched time axes."""
    from ace_tpu.data.store import write_zarr as _wz
    from ace_tpu.data_process.consolidate_zarrs import (
        ConsolidateDatasetConfig,
        SourceConfig,
        consolidate_dataset,
    )

    _write_zarr_series(tmp_path / "src1.zarr", 8)
    rng = np.random.RandomState(1)
    time = TimeCoord.from_range("1999-12-25T00:00", 8, 21600)
    _wz(
        str(tmp_path / "src2.zarr"),
        {"c": rng.randn(8, NY, NX).astype(np.float32),
         "lat": np.linspace(-60, 60, NY),
         "lon": np.linspace(0, 360, NX, endpoint=False)},
        {"c": ("time", "lat", "lon"), "lat": ("lat",), "lon": ("lon",)},
        attrs={"c": {"units": "K", "long_name": "temperature"}},
        time=time,
    )
    cfg = ConsolidateDatasetConfig(
        name="merged",
        sources=[
            SourceConfig(path=str(tmp_path / "src1.zarr"),
                         variables=["a"], renaming={"a": "alpha"}),
            SourceConfig(path=str(tmp_path / "src2.zarr"), variables=["c"]),
        ],
    )
    out = consolidate_dataset(cfg, str(tmp_path / "out"))
    ds = open_file_dataset(out)
    assert set(ds.keys()) >= {"alpha", "c", "time", "lat", "lon"}
    assert ds["c"].attrs["units"] == "K"
    assert ds["c"].attrs["source_variable"] == "c"
    assert np.array_equal(ds.read_time().values, time.values)
    ds.close()

    # mismatched time axis in a later source must raise, not silently
    # write against the first source's axis
    _write_zarr_series(tmp_path / "src3.zarr", 6)
    bad = ConsolidateDatasetConfig(
        name="bad",
        sources=[
            SourceConfig(path=str(tmp_path / "src1.zarr"), variables=["a"]),
            SourceConfig(path=str(tmp_path / "src3.zarr"), variables=["b"]),
        ],
    )
    with pytest.raises(ValueError, match="time axis"):
        consolidate_dataset(bad, str(tmp_path / "out_bad"))


def test_sample_data_extraction(tmp_path):
    """checkpoint-publication sample extraction: per-year forcing files
    + first-of-month IC snapshots (reference:
    scripts/checkpoint_publication/get_sample_era5_data.py)."""
    import numpy as np
    import yaml

    from ace_tpu.data.store import open_file_dataset, write_zarr
    from ace_tpu.data.time import TimeCoord
    from ace_tpu.data_process.sample_data import main

    rng = np.random.RandomState(0)
    ny, nx = 4, 8
    # two years of daily data
    n_time = 731
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 86400)
    arrays = {
        "lat": np.linspace(-60, 60, ny),
        "lon": np.linspace(0, 360, nx, endpoint=False),
        "DSWRFtoa": rng.rand(n_time, ny, nx).astype(np.float32),
        "PRESsfc": rng.rand(n_time, ny, nx).astype(np.float32) + 1.0,
        "HGTsfc": rng.rand(ny, nx).astype(np.float32),
        "ak_0": np.float64(100.0),
    }
    dims = {
        "lat": ("lat",), "lon": ("lon",),
        "DSWRFtoa": ("time", "lat", "lon"),
        "PRESsfc": ("time", "lat", "lon"),
        "HGTsfc": ("lat", "lon"), "ak_0": (),
    }
    src = str(tmp_path / "train.zarr")
    write_zarr(src, arrays, dims, time=time)

    cfg = {
        "input_path": src,
        "output_dir": str(tmp_path / "sample"),
        "forcing_names": ["DSWRFtoa", "HGTsfc", "ak_0"],
        "prognostic_names": ["PRESsfc"],
        "forcing_start_time": "2000-01-01T00:00:00",
        "forcing_end_time": "2001-12-31T00:00:00",
        "ic_years": [2001],
    }
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    main(["--yaml", str(tmp_path / "cfg.yaml"), "--debug"])
    main(["--yaml", str(tmp_path / "cfg.yaml")])

    out_dir = tmp_path / "sample"
    for year in (2000, 2001):
        f = out_dir / "forcing_data" / f"forcing_{year}.nc"
        ds = open_file_dataset(str(f))
        t = ds.read_time()
        assert len(t) in (365, 366), (year, len(t))
        assert ds["DSWRFtoa"].shape[0] == len(t)
        # static + scalar fields are in every file
        assert ds["HGTsfc"].shape == (ny, nx)
        assert float(ds["ak_0"].read(())) == 100.0
        ds.close()
    ic = open_file_dataset(str(out_dir / "initial_conditions" / "ic_2001.nc"))
    t = ic.read_time()
    assert len(t) == 12  # one snapshot per month
    comp = t.components()
    assert set(comp["day"].tolist()) == {1}
    assert comp["month"].tolist() == list(range(1, 13))
    ic.close()
