"""Dataset/store/loader tests (reference model: fme/core/dataset/test_xarray.py
and fme/ace/data_loading tests — window reads, multi-file concat, loader
shuffling/sharding).
"""

import numpy as np
import pytest

from ace_tpu.core.config import from_dict
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.data.loading import DataLoader, DataLoaderConfig, WindowDataset
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.data.store import (
    decode_cf_time,
    open_file_dataset,
    write_h5,
    write_zarr,
)
from ace_tpu.data.time import TimeCoord
from ace_tpu.testing import SyntheticData, save_nd_file, save_stats_files

NAMES = ["var_a", "var_b", "PRESsfc"]


def test_cf_time_decode():
    tc = decode_cf_time(
        np.asarray([0.0, 6.0, 12.0]),
        "hours since 2000-01-01 00:00:00", "noleap",
    )
    comp = tc.components()
    assert list(comp["hour"]) == [0, 6, 12]
    assert tc.calendar == "noleap"


@pytest.mark.parametrize("fmt", ["h5", "zarr"])
def test_store_roundtrip(tmp_path, fmt):
    path = tmp_path / ("d.nc" if fmt == "h5" else "d.zarr")
    rng = np.random.RandomState(0)
    arr = rng.randn(4, 3, 5).astype(np.float32)
    time = TimeCoord.from_range("2001-06-01", 4, 3600)
    writer = write_h5 if fmt == "h5" else write_zarr
    writer(
        str(path), {"temp": arr}, {"temp": ("time", "lat", "lon")},
        coords={"lat": np.arange(3.0), "lon": np.arange(5.0)},
        attrs={"temp": {"units": "K"}}, time=time,
    )
    ds = open_file_dataset(str(path))
    assert ds["temp"].dims == ("time", "lat", "lon")
    np.testing.assert_allclose(ds["temp"].read(()), arr)
    np.testing.assert_allclose(
        ds["temp"].read((slice(1, 3),)), arr[1:3]
    )
    assert ds["temp"].attrs["units"] == "K"
    t2 = ds.read_time()
    np.testing.assert_array_equal(t2.values, time.values)


@pytest.mark.parametrize("fmt", ["h5", "zarr"])
def test_dataset_window_reads(tmp_path, fmt):
    data = SyntheticData(tmp_path, NAMES, n_time=10, n_files=3, fmt=fmt)
    cfg = XarrayDataConfig(
        data_path=str(data.data_dir),
        file_pattern="*.nc" if fmt == "h5" else "*.zarr",
    )
    ds = cfg.build()
    assert ds.n_times == 10
    assert ds.timestep.total_seconds() == 21600
    # window crossing a file boundary (files have 3,3,4 steps)
    window, time = ds.get_window(2, 4, ["var_a", "x"])
    assert window["var_a"].shape == (4, 8, 16)
    assert window["x"].shape == (4, 8, 16)
    assert len(time) == 4
    # compare with single-step reads
    for j in range(4):
        w1, _ = ds.get_window(2 + j, 1, ["var_a"])
        np.testing.assert_array_equal(window["var_a"][j], w1["var_a"][0])
    # vertical coordinate detected
    assert len(ds.vertical_coordinate) == 3  # nz=2 -> 3 interfaces
    info = ds.dataset_info
    assert info.img_shape == (8, 16)
    assert "var_a" in info.variable_metadata


def test_dataset_subset(tmp_path):
    data = SyntheticData(tmp_path, NAMES, n_time=10)
    cfg = from_dict(XarrayDataConfig, {
        "data_path": str(data.data_dir),
        "subset": {"start": 2, "stop": 8},
    })
    ds = cfg.build()
    assert ds.n_times == 6


def test_loader_batches_and_shuffling(tmp_path):
    data = SyntheticData(tmp_path, NAMES, n_time=12)
    cfg = XarrayDataConfig(data_path=str(data.data_dir))
    gridded = DataLoaderConfig(
        dataset=cfg, batch_size=3, num_data_workers=2
    ).build(DataRequirements(names=["var_a", "var_b"], n_timesteps=2))
    assert gridded.n_samples == 11
    assert gridded.n_batches == 3
    batches = list(gridded)
    assert len(batches) == 3
    b = batches[0]
    assert b.data["var_a"].shape == (3, 2, 8, 16)
    assert b.time.values.shape == (3, 2)
    # epoch changes shuffle order; same epoch reproduces
    gridded.set_epoch(0)
    first = [np.asarray(b.data["var_a"]) for b in gridded]
    gridded.set_epoch(0)
    again = [np.asarray(b.data["var_a"]) for b in gridded]
    for a, c in zip(first, again):
        np.testing.assert_array_equal(a, c)
    gridded.set_epoch(1)
    other = [np.asarray(b.data["var_a"]) for b in gridded]
    assert any(
        not np.array_equal(a, c) for a, c in zip(first, other)
    )


def test_loader_unshuffled_windows_are_sequential(tmp_path):
    data = SyntheticData(tmp_path, NAMES, n_time=6)
    ds = XarrayDataConfig(data_path=str(data.data_dir)).build()
    window = WindowDataset(
        ds, DataRequirements(names=["var_a"], n_timesteps=2)
    )
    loader = DataLoader(window, batch_size=1, shuffle=False, num_workers=1)
    seen = [b.time.values[0, 0] for b in loader]
    assert list(seen) == sorted(seen)


def test_stats_files_load(tmp_path):
    save_stats_files(tmp_path / "m.nc", tmp_path / "s.nc", NAMES)
    from ace_tpu.core.normalizer import get_normalizer

    norm = get_normalizer(tmp_path / "m.nc", tmp_path / "s.nc", NAMES)
    assert set(norm.names) == set(NAMES)


def test_n_repeats(tmp_path):
    data = SyntheticData(tmp_path, NAMES, n_time=4)
    cfg = XarrayDataConfig(data_path=str(data.data_dir), n_repeats=3)
    ds = cfg.build()
    assert ds.n_times == 12
    w0, t0 = ds.get_window(0, 2, ["var_a"])
    w1, t1 = ds.get_window(4, 2, ["var_a"])
    np.testing.assert_array_equal(w0["var_a"], w1["var_a"])
    assert t1.values[0] > t0.values[-1]


def test_overwrite_config(tmp_path):
    data = SyntheticData(tmp_path, NAMES, n_time=4)
    cfg = from_dict(XarrayDataConfig, {
        "data_path": str(data.data_dir),
        "overwrite": {
            "constant": {"var_a": 7.0},
            "multiply_scalar": {"var_b": 2.0},
        },
    })
    ds = cfg.build()
    w, _ = ds.get_window(0, 2, ["var_a", "var_b"])
    np.testing.assert_array_equal(w["var_a"], 7.0)
    base = XarrayDataConfig(data_path=str(data.data_dir)).build()
    w0, _ = base.get_window(0, 2, ["var_b"])
    np.testing.assert_allclose(w["var_b"], 2.0 * w0["var_b"])


def test_merged_dataset(tmp_path):
    from ace_tpu.data.dataset import MergeDatasetConfig
    from ace_tpu.testing import save_nd_file

    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    save_nd_file(d1 / "x.nc", ["var_a", "shared"], n_time=4, seed=0)
    save_nd_file(d2 / "y.nc", ["var_b", "shared"], n_time=4, seed=1)
    merged = MergeDatasetConfig(merge=[
        XarrayDataConfig(data_path=str(d1)),
        XarrayDataConfig(data_path=str(d2)),
    ]).build()
    assert {"var_a", "var_b", "shared"} <= set(merged.names)
    w, t = merged.get_window(1, 2, ["var_a", "var_b", "shared"])
    assert w["var_a"].shape == (2, 8, 16)
    # "shared" comes from the first source
    first = XarrayDataConfig(data_path=str(d1)).build()
    w1, _ = first.get_window(1, 2, ["shared"])
    np.testing.assert_array_equal(w["shared"], w1["shared"])


def test_time_buffer_sliding_window_loader(tmp_path):
    from ace_tpu.data.loading import DataLoaderConfig
    from ace_tpu.data.requirements import DataRequirements
    from ace_tpu.testing import SyntheticData

    data = SyntheticData(tmp_path / "d", ["a"], n_time=20)
    req = DataRequirements(names=["a"], n_timesteps=3)
    cfg = DataLoaderConfig(
        dataset={"data_path": str(data.data_dir)},
        batch_size=2,
        num_data_workers=1,
        time_buffer=2,
        time_buffer_pool_size=2,
    )
    from ace_tpu.core.config import from_dict

    cfg = from_dict(DataLoaderConfig, {
        "dataset": {"data_path": str(data.data_dir)},
        "batch_size": 2,
        "num_data_workers": 1,
        "time_buffer": 2,
        "time_buffer_pool_size": 2,
    })
    gridded = cfg.build(req, train=True, seed=0)
    batches = list(gridded.loader)
    # windows of length 5 with stride 3: starts 0,3,6,9,12,15 -> 6 windows
    # -> 3 input batches of 2 -> 9 output batches of 3 sub-windows... 
    # each input batch yields time_buffer+1 = 3 sub-batches
    assert len(batches) == len(gridded.loader)
    assert len(batches) > 0
    for b in batches:
        assert b.data["a"].shape[1] == 3
        assert b.time.values.shape[1] == 3
    # deterministic (eval) mode emits offsets in order with no skipped
    # samples across the first window
    cfg_eval = from_dict(DataLoaderConfig, {
        "dataset": {"data_path": str(data.data_dir)},
        "batch_size": 1,
        "num_data_workers": 1,
        "time_buffer": 2,
    })
    gridded_eval = cfg_eval.build(req, train=False, seed=0)
    eval_batches = list(gridded_eval.loader)
    t0 = np.asarray(eval_batches[0].time.values[0])
    t1 = np.asarray(eval_batches[1].time.values[0])
    # consecutive sub-windows advance by one timestep within a window
    assert t1[0] == t0[1]


def test_time_buffer_pool_requires_buffer():
    import pytest

    from ace_tpu.core.config import from_dict
    from ace_tpu.data.loading import DataLoaderConfig

    with pytest.raises(ValueError):
        from_dict(DataLoaderConfig, {
            "dataset": {"data_path": "/nonexistent"},
            "time_buffer_pool_size": 4,
        })


def test_data_loading_benchmark_runs():
    from ace_tpu.benchmark.data_loading import run_data_loading_benchmark

    result = run_data_loading_benchmark(
        n_time=20, nlat=8, nlon=16, n_vars=2, batch_size=2,
        num_workers=1,
    )
    assert result["samples_per_sec"] > 0
    assert result["n_batches"] > 0


def test_time_slice_and_repeated_interval_subsets(tmp_path):
    from ace_tpu.core.config import from_dict
    from ace_tpu.data.dataset import XarrayDataConfig
    from ace_tpu.testing import SyntheticData

    data = SyntheticData(tmp_path / "d", ["a"], n_time=16)  # 6-hourly
    # TimeSlice: select one day inclusive
    cfg = from_dict(XarrayDataConfig, {
        "data_path": str(data.data_dir),
        "subset": {
            "start_time": "2000-01-02T00:00",
            "stop_time": "2000-01-02T18:00",
        },
    })
    ds = cfg.build()
    assert ds.n_times == 4
    from ace_tpu.data.time import format_time

    # subsetting restricts sample STARTS; windows stay contiguous at the
    # base timestep (reference XarraySubset semantics)
    window, t = ds.get_window(0, 3, ["a"])
    assert format_time(int(t.values[0])).startswith("2000-01-02T00")
    assert format_time(int(t.values[2])).startswith("2000-01-02T12")
    np.testing.assert_array_equal(
        np.diff(t.values), 6 * 3600 * 10**6
    )

    # RepeatedInterval: first 2 of every 4 steps
    cfg2 = from_dict(XarrayDataConfig, {
        "data_path": str(data.data_dir),
        "subset": {
            "interval_length": 2, "start": 0, "block_length": 4,
        },
    })
    ds2 = cfg2.build()
    assert ds2.n_times == 8
    # a window from an interval start runs contiguously past the
    # interval (it restricts starts, not content)
    _, t2 = ds2.get_window(1, 4, ["a"])
    np.testing.assert_array_equal(
        np.diff(t2.values), 6 * 3600 * 10**6
    )
    # timedelta-string variant: 12h of every 24h
    cfg3 = from_dict(XarrayDataConfig, {
        "data_path": str(data.data_dir),
        "subset": {
            "interval_length": "12h", "start": "0h",
            "block_length": "24h",
        },
    })
    assert cfg3.build().n_times == 8


def test_concat_dataset_config(tmp_path):
    from ace_tpu.core.config import from_dict
    from ace_tpu.data.loading import DataLoaderConfig
    from ace_tpu.data.requirements import DataRequirements
    from ace_tpu.testing import SyntheticData

    d1 = SyntheticData(tmp_path / "a", ["v"], n_time=6)
    d2 = SyntheticData(tmp_path / "b", ["v"], n_time=4)
    cfg = from_dict(DataLoaderConfig, {
        "dataset": {"concat": [
            {"data_path": str(d1.data_dir)},
            {"data_path": str(d2.data_dir)},
        ]},
        "batch_size": 2,
        "num_data_workers": 1,
    })
    gridded = cfg.build(
        DataRequirements(names=["v"], n_timesteps=2), train=False
    )
    assert gridded.dataset.n_times == 10
    batches = list(gridded.loader)
    assert sum(b.data["v"].shape[0] for b in batches) > 0
    for b in batches:
        assert b.data["v"].shape[1:] == (2, 8, 16)


def test_loader_raises_with_zero_batches(tmp_path):
    """A dataset smaller than the batch size must error, not silently
    train zero batches (reference dataloader.py:63)."""
    from ace_tpu.data.loading import DataLoaderConfig

    data = SyntheticData(tmp_path / "d", ["var_a"], n_time=4)
    cfg = DataLoaderConfig(
        dataset=XarrayDataConfig(data_path=str(data.data_dir)),
        batch_size=16,
    )
    try:
        cfg.build(DataRequirements(names=["var_a"], n_timesteps=2))
    except ValueError as e:
        assert "no batches" in str(e)
    else:
        raise AssertionError("expected zero-batch error")


def test_loader_surfaces_producer_errors(tmp_path):
    """Read errors inside the prefetch thread must raise in the consumer
    rather than hanging the training loop forever."""
    from ace_tpu.data.loading import DataLoader

    class BrokenDataset:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            raise RuntimeError("corrupt chunk")

    loader = DataLoader(BrokenDataset(), batch_size=2, shuffle=False,
                        num_workers=1)
    try:
        list(loader)
    except RuntimeError as e:
        assert "corrupt chunk" in str(e)
    else:
        raise AssertionError("expected the producer error to surface")


def test_rotation_augmentation_wired_from_config(tmp_path):
    """augmentation: in the loader config must actually modify training
    batches (reference data_loading/config.py:63)."""
    from ace_tpu.core.config import from_dict
    from ace_tpu.data.loading import DataLoaderConfig

    data = SyntheticData(tmp_path / "d", ["var_a"], n_time=8)
    cfg = from_dict(DataLoaderConfig, {
        "dataset": {"data_path": str(data.data_dir)},
        "batch_size": 2,
        "num_data_workers": 1,
        "augmentation": {"rotate_probability": 1.0},
    })
    gridded = cfg.build(
        DataRequirements(names=["var_a"], n_timesteps=2)
    )
    rotated = np.concatenate(
        [np.asarray(b.data["var_a"]) for b in gridded], axis=0
    )
    plain = cfg.build(
        DataRequirements(names=["var_a"], n_timesteps=2), train=False
    )
    raw = np.concatenate(
        [np.asarray(b.data["var_a"]) for b in plain], axis=0
    )
    # every training batch is pole-rotated: lat and lon are flipped
    # (the 180-degree rotation); validation batches are untouched
    assert rotated.shape == raw.shape
    assert not np.allclose(rotated, raw)


def test_concat_windows_never_span_segments(tmp_path):
    from ace_tpu.core.config import from_dict
    from ace_tpu.data.dataset import ConcatDatasetConfig
    from ace_tpu.data.loading import WindowDataset

    d1 = SyntheticData(tmp_path / "a", ["var_a"], n_time=5)
    d2 = SyntheticData(tmp_path / "b", ["var_a"], n_time=7)
    cfg = from_dict(ConcatDatasetConfig, {"concat": [
        {"data_path": str(d1.data_dir)},
        {"data_path": str(d2.data_dir)},
    ]})
    ds = cfg.build()
    window = WindowDataset(
        ds, DataRequirements(names=["var_a"], n_timesteps=3)
    )
    # valid windows: (5-3+1) + (7-3+1) = 8 (no boundary spanners)
    assert len(window) == 8
    for i in range(len(window)):
        _, t, _ = window[i]
        # contiguous 6-hourly steps within one segment
        np.testing.assert_array_equal(
            np.diff(t.values), 6 * 3600 * 10**6
        )


def test_360_day_and_all_leap_calendars():
    from ace_tpu.data.time import (
        decode_time,
        encode_time,
        fractional_day_of_year,
        parse_datetime_string,
    )

    # 360_day: every month has 30 days, years are 360 days
    us = encode_time(5, 3, 30, 12, calendar="360_day")
    c = decode_time(np.asarray([us]), "360_day")
    assert (int(c["year"][0]), int(c["month"][0]), int(c["day"][0]),
            int(c["hour"][0])) == (5, 3, 30, 12)
    assert int(c["day_of_year"][0]) == 2 * 30 + 30  # 1-based
    # Feb 30 exists in 360_day
    us2 = parse_datetime_string("2001-02-30", calendar="360_day")
    c2 = decode_time(np.asarray([us2]), "360_day")
    assert int(c2["month"][0]) == 2 and int(c2["day"][0]) == 30
    # consecutive years are exactly 360 days apart
    y1 = encode_time(2, 1, 1, calendar="360_day")
    y2 = encode_time(3, 1, 1, calendar="360_day")
    assert (y2 - y1) == 360 * 86400 * 10**6

    # all_leap: every year has 366 days; Feb 29 always exists
    us3 = encode_time(2001, 2, 29, calendar="all_leap")
    c3 = decode_time(np.asarray([us3]), "all_leap")
    assert (int(c3["year"][0]), int(c3["month"][0]),
            int(c3["day"][0])) == (2001, 2, 29)
    y1 = encode_time(2001, 1, 1, calendar="all_leap")
    y2 = encode_time(2002, 1, 1, calendar="all_leap")
    assert (y2 - y1) == 366 * 86400 * 10**6
    # Mar 1 is day-of-year 61 (0-based: 31 + 29 + 0)
    frac = fractional_day_of_year(
        np.asarray([encode_time(2001, 3, 1, calendar="all_leap")]),
        "all_leap",
    )
    assert frac[0] == 60.0

    # round-trip across a spread of encoded dates in both calendars
    for cal in ("360_day", "all_leap"):
        for (y, m, d) in [(1, 1, 1), (1999, 12, 30), (500, 7, 15)]:
            us = encode_time(y, m, d, 6, 30, 15, calendar=cal)
            c = decode_time(np.asarray([us]), cal)
            got = (int(c["year"][0]), int(c["month"][0]), int(c["day"][0]),
                   int(c["hour"][0]), int(c["minute"][0]),
                   int(c["second"][0]))
            assert got == (y, m, d, 6, 30, 15), (cal, got)


def test_remote_netcdf_fetch(tmp_path, monkeypatch):
    """Remote netCDF paths open via an inter-filesystem copy
    (reference: fme/core/cloud.py:48). Uses a memory:// fsspec URL so no
    real network is touched."""
    import fsspec

    from ace_tpu.data.store import open_file_dataset, write_h5

    local = tmp_path / "ic.nc"
    write_h5(
        str(local), {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        {"a": ("y", "x")},
    )
    with open(local, "rb") as f:
        payload = f.read()
    mem = fsspec.filesystem("memory")
    with mem.open("/bucket/ic.nc", "wb") as f:
        f.write(payload)

    ds = open_file_dataset("memory://bucket/ic.nc")
    np.testing.assert_array_equal(
        ds["a"].read(()), np.arange(6, dtype=np.float32).reshape(2, 3)
    )
    ds.close()


def test_cloud_helpers(tmp_path):
    from ace_tpu.data import cloud

    assert cloud.is_local(str(tmp_path))
    assert cloud.is_local("file:///a/b.nc")
    assert not cloud.is_local("gs://bucket/b.nc")
    p = tmp_path / "x.txt"
    p.write_text("hi")
    assert cloud.exists(str(p))
    assert not cloud.exists(str(tmp_path / "missing"))
    cloud.inter_filesystem_copy(str(p), str(tmp_path / "y.txt"))
    assert (tmp_path / "y.txt").read_text() == "hi"
