"""Synthetic dataset factories for tests
(reference: fme/ace/testing/fv3gfs_data.py save_nd_netcdf :63,
save_stats_netcdfs :111).
"""

import dataclasses
import pathlib

import numpy as np

from ace_tpu.data.store import write_h5, write_zarr
from ace_tpu.data.time import TimeCoord


def save_nd_file(
    filename,
    variable_names: list[str],
    n_time: int = 8,
    nlat: int = 8,
    nlon: int = 16,
    nz: int = 2,
    start: str = "2000-01-01T00:00",
    timestep_seconds: int = 21600,
    calendar: str = "proleptic_gregorian",
    save_vertical_coordinate: bool = True,
    static_names: list[str] | None = None,
    fmt: str = "h5",
    seed: int = 0,
    values: dict[str, np.ndarray] | None = None,
):
    """Write a synthetic dataset file with random fields."""
    rng = np.random.RandomState(seed)
    lat = np.linspace(-88.0, 88.0, nlat)
    lon = np.linspace(0.0, 360.0 - 360.0 / nlon, nlon)
    time = TimeCoord.from_range(start, n_time, timestep_seconds, calendar)
    data, dims, attrs = {}, {}, {}
    for name in variable_names:
        if values is not None and name in values:
            data[name] = np.asarray(values[name], dtype=np.float32)
        else:
            data[name] = rng.randn(n_time, nlat, nlon).astype(np.float32)
        dims[name] = ("time", "lat", "lon")
        attrs[name] = {"units": "m", "long_name": name.replace("_", " ")}
    for name in static_names or []:
        data[name] = rng.randn(nlat, nlon).astype(np.float32)
        dims[name] = ("lat", "lon")
    if save_vertical_coordinate:
        ak = np.concatenate(
            [np.linspace(100.0, 2000.0, nz // 2 + 1),
             np.linspace(2000.0, 0.0, nz - nz // 2)]
        )[: nz + 1]
        bk = np.linspace(0.0, 1.0, nz + 1)
        for k in range(nz + 1):
            data[f"ak_{k}"] = np.float32(ak[k])
            data[f"bk_{k}"] = np.float32(bk[k])
            dims[f"ak_{k}"] = ()
            dims[f"bk_{k}"] = ()
    writer = write_h5 if fmt == "h5" else write_zarr
    writer(
        str(filename), data, dims,
        coords={"lat": lat, "lon": lon},
        attrs=attrs, time=time,
    )


def save_stats_files(mean_filename, std_filename, variable_names):
    """Paired mean/std stats files (means ~0, stds ~1)
    (reference: fv3gfs_data.py:111 save_stats_netcdfs).
    """
    rng = np.random.RandomState(0)
    means = {n: np.float32(0.1 * rng.randn()) for n in variable_names}
    stds = {n: np.float32(1.0 + 0.1 * np.abs(rng.randn()))
            for n in variable_names}
    for path, stats in [(mean_filename, means), (std_filename, stds)]:
        write_h5(
            str(path), {k: np.asarray(v) for k, v in stats.items()},
            dims={k: () for k in stats},
        )


@dataclasses.dataclass
class SyntheticData:
    """Test fixture bundling a data dir + stats files
    (reference analog: fme/ace/testing/fv3gfs_data.py:148 FV3GFSData).
    """

    path: pathlib.Path
    names: list[str]
    n_time: int = 8
    nlat: int = 8
    nlon: int = 16
    nz: int = 2
    timestep_seconds: int = 21600
    n_files: int = 1
    fmt: str = "h5"

    def __post_init__(self):
        self.data_dir = self.path / "data"
        self.data_dir.mkdir(parents=True, exist_ok=True)
        per_file = self.n_time // self.n_files
        t0 = TimeCoord.from_range(
            "2000-01-01T00:00", self.n_time, self.timestep_seconds
        )
        from ace_tpu.data.time import format_time

        for i in range(self.n_files):
            start_idx = i * per_file
            n = per_file if i < self.n_files - 1 else (
                self.n_time - start_idx
            )
            suffix = ".nc" if self.fmt == "h5" else ".zarr"
            save_nd_file(
                self.data_dir / f"data_{i:04d}{suffix}",
                self.names,
                n_time=n,
                nlat=self.nlat,
                nlon=self.nlon,
                nz=self.nz,
                start=format_time(int(t0.values[start_idx])),
                timestep_seconds=self.timestep_seconds,
                fmt=self.fmt,
                seed=i,
            )
        save_stats_files(
            self.path / "stats-mean.nc", self.path / "stats-std.nc",
            self.names,
        )

    @property
    def mean_path(self):
        return self.path / "stats-mean.nc"

    @property
    def std_path(self):
        return self.path / "stats-std.nc"
