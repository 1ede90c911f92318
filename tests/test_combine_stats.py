"""combine_stats / merge_stats (reference:
scripts/data_process/combine_stats.py, merge_stats.py): the
sample-weighted ensemble combination must reproduce the stats of the
concatenated data, and merging unions variables across directories."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.compute_stats import ComputeStatsConfig, compute_stats

NY, NX = 4, 8


def _member(tmp_path, name, n_time, rng):
    d = tmp_path / name
    d.mkdir()
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    arr = (rng.randn(n_time, NY, NX) * (1 + rng.rand()) + rng.randn()
           ).astype(np.float32)
    write_h5(
        str(d / "data.nc"),
        {"a": arr, "lat": np.linspace(-60, 60, NY),
         "lon": np.linspace(0, 360, NX, endpoint=False)},
        {"a": ("time", "lat", "lon"), "lat": ("lat",), "lon": ("lon",)},
        time=time,
    )
    return d, arr


def test_combine_stats_matches_pooled_data(tmp_path):
    from ace_tpu.data_process.combine_stats import combine_stats

    rng = np.random.RandomState(0)
    stats_root = tmp_path / "stats"
    stats_root.mkdir()
    all_arrays = []
    roots = []
    for i, n_time in enumerate([8, 12]):  # unequal weights matter
        d, arr = _member(tmp_path, f"run{i}", n_time, rng)
        out = stats_root / f"run{i}"
        compute_stats(ComputeStatsConfig(
            dataset=XarrayDataConfig(data_path=str(d)),
            output_dir=str(out), names=["a"],
        ))
        all_arrays.append(arr.astype(np.float64))
        roots.append(str(out))

    combine_stats(roots, str(stats_root))
    combined = open_file_dataset(str(stats_root / "combined" /
                                     "stats-mean.nc"))
    pooled = np.concatenate(all_arrays, axis=0)
    np.testing.assert_allclose(
        combined["a"].read(()), pooled.mean(), rtol=1e-5
    )
    std = open_file_dataset(str(stats_root / "combined" / "stats-std.nc"))
    np.testing.assert_allclose(
        std["a"].read(()), pooled.std(), rtol=1e-4
    )
    assert combined.attrs["input_samples"] == 20.0
    # time-mean pools with sample weights
    tm = open_file_dataset(str(stats_root / "combined" / "time-mean.nc"))
    expected_tm = (
        all_arrays[0].mean(0) * 8 + all_arrays[1].mean(0) * 12
    ) / 20
    np.testing.assert_allclose(tm["a"].read(()), expected_tm, rtol=1e-5)


def test_merge_stats_unions_variables(tmp_path):
    from ace_tpu.data_process.combine_stats import (
        MergeStatsConfig, RenameStatConfig, merge_stats,
    )

    for i, var in enumerate(["a", "b"]):
        d = tmp_path / f"in{i}"
        d.mkdir()
        for fname in ["stats-mean.nc", "stats-std.nc",
                      "stats-residual-std.nc", "time-mean.nc"]:
            write_h5(
                str(d / fname), {var: np.float32(i + 1.0)}, {var: ()},
                global_attrs={"input_samples": 10.0 * (i + 1)},
            )
    merge_stats(MergeStatsConfig(
        input_directories=[str(tmp_path / "in0"), str(tmp_path / "in1")],
        output_directory=str(tmp_path / "merged"),
        rename=[RenameStatConfig(data_var="b", new_name="b2", drop=True)],
    ))
    ds = open_file_dataset(str(tmp_path / "merged" / "stats-mean.nc"))
    np.testing.assert_allclose(ds["a"].read(()), 1.0)
    np.testing.assert_allclose(ds["b2"].read(()), 2.0)
    assert "b" not in ds
    assert ds.attrs["input_samples"] == 10.0
