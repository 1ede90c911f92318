"""append_dataset ETL (reference: scripts/data_process/
append_dataset.py): adds only missing variables to an existing zarr,
with renaming and history extension."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord

NT, NY, NX = 6, 4, 8


def test_append_dataset(tmp_path):
    rng = np.random.RandomState(0)
    time = TimeCoord.from_range("2000-01-01T00:00", NT, 21600)
    lat = np.linspace(-60, 60, NY)
    lon = np.linspace(0, 360, NX, endpoint=False)
    base = {"a": rng.randn(NT, NY, NX).astype(np.float32),
            "lat": lat, "lon": lon}
    dims = {"a": ("time", "lat", "lon"), "lat": ("lat",), "lon": ("lon",)}
    write_zarr(str(tmp_path / "store.zarr"), base, dims, time=time)

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    extra = {
        "a": rng.randn(NT, NY, NX).astype(np.float32),  # exists: skipped
        "b": rng.randn(NT, NY, NX).astype(np.float32),
        "static_c": rng.randn(NY, NX).astype(np.float32),
        "lat": lat, "lon": lon,
    }
    edims = {"a": ("time", "lat", "lon"), "b": ("time", "lat", "lon"),
             "static_c": ("lat", "lon"), "lat": ("lat",), "lon": ("lon",)}
    write_zarr(str(run_dir / "extra.zarr"), extra, edims, time=time)

    cfg = {"variable_sources": {"extra.zarr": ["a", "b", "static_c"]},
           "renaming": {"b": "b_renamed"}}
    cfg_path = tmp_path / "append.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.data_process.append_dataset import main

    main(["--append-config", str(cfg_path),
          "--run-directory", str(run_dir),
          "--append-store", str(tmp_path / "store.zarr")])

    ds = open_file_dataset(str(tmp_path / "store.zarr"))
    # pre-existing variable untouched (append's 'a' differs)
    np.testing.assert_array_equal(ds["a"].read(()), base["a"])
    np.testing.assert_array_equal(
        ds["b_renamed"].read(()), extra["b"]
    )
    np.testing.assert_array_equal(
        ds["static_c"].read(()), extra["static_c"]
    )
    assert "b_renamed" in ds.attrs["history"]
    # idempotent: second run appends nothing
    from ace_tpu.data_process.append_dataset import (
        DatasetAppendConfig, append_dataset,
    )

    added = append_dataset(
        DatasetAppendConfig.from_file(str(cfg_path)),
        str(run_dir), str(tmp_path / "store.zarr"),
    )
    assert added == []
