"""Create a window-averaged (time-coarsened) dataset from a zarr store.

Reference: scripts/data_process/create_window_avg_dataset.py +
time_utils.py. Windows are right-closed/right-labeled with the origin
one window before ``first_timestamp``; ``shift_timestamps_to_avg_
interval_midpoint`` moves labels back half a window (used for models
whose timestamps mark the end of an averaging period).

CLI:
    python -m ace_tpu.data_process.window_avg --yaml cfg.yaml \
        [--debug] [--subsample]
"""

import argparse
import dataclasses
import logging
import os
from typing import Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord, parse_datetime_string

logger = logging.getLogger(__name__)

_UNIT_MICROS = {
    "h": 3600 * 10**6, "m": 60 * 10**6, "s": 10**6,
    "ms": 10**3, "us": 1,
}


def parse_timedelta_micros(s: str) -> int:
    """'120h' / '30m' / '21600s' -> microseconds (tick-like units only,
    matching the reference's pandas Timedelta restriction)."""
    for unit in ("ms", "us", "h", "m", "s"):
        if s.endswith(unit):
            return int(float(s[: -len(unit)]) * _UNIT_MICROS[unit])
    raise ValueError(f"cannot parse timedelta {s!r}; use h/m/s/ms/us units")


@dataclasses.dataclass
class WindowAvgDatasetConfig:
    """Window averaging parameters (reference
    create_window_avg_dataset.py:25-52)."""

    window_timedelta: str
    first_timestamp: Optional[str] = None
    last_timestamp: Optional[str] = None
    shift_timestamps_to_avg_interval_midpoint: bool = False
    time_dim: str = "time"
    subset_names: Optional[Sequence[str]] = None


@dataclasses.dataclass
class WindowAvgInputDatasetConfig:
    zarr_path: str
    time_chunk_size: int = 160


@dataclasses.dataclass
class CreateWindowAvgDatasetConfig:
    input_dataset: WindowAvgInputDatasetConfig
    window_avg: WindowAvgDatasetConfig
    output_zarr_path: str

    @classmethod
    def from_file(cls, path: str) -> "CreateWindowAvgDatasetConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data.pop("output_writer", None)  # dask/xpartition knobs: unused
        return from_dict(cls, data)


def window_bins(config: WindowAvgDatasetConfig, time: TimeCoord):
    """Right-closed/right-labeled window assignment for a time coord.

    Returns (bin_index, valid mask, unique bins, output TimeCoord)."""
    window = parse_timedelta_micros(config.window_timedelta)
    if config.first_timestamp is not None:
        origin = parse_datetime_string(
            config.first_timestamp, time.calendar
        ) - window
    else:
        origin = int(time.values[0]) - window
    # right-closed, right-labeled bins: label k covers
    # (origin + (k-1)*window, origin + k*window]
    offset = time.values - origin
    bin_index = np.ceil(offset / window).astype(np.int64)
    valid = offset > 0
    labels = origin + bin_index * window
    if config.last_timestamp is not None:
        valid &= labels <= parse_datetime_string(
            config.last_timestamp, time.calendar
        )
    uniq = np.unique(bin_index[valid])
    out_times = origin + uniq * window
    if config.shift_timestamps_to_avg_interval_midpoint:
        out_times = out_times - window // 2
    return bin_index, valid, uniq, TimeCoord(out_times, time.calendar)


def window_average_arrays(
    config: WindowAvgDatasetConfig,
    arrays: dict,
    time: TimeCoord,
) -> tuple:
    """Window-average in-memory [T, ...] arrays; non-time-leading arrays
    (no matching first dim) pass through. ``config.subset_names``
    restricts which variables are processed and returned (the reference
    subsets the dataset before averaging,
    create_window_avg_dataset.py:55-57). Returns (arrays, TimeCoord)."""
    if config.subset_names is not None:
        keep = set(config.subset_names)
        arrays = {k: v for k, v in arrays.items() if k in keep}
    bin_index, valid, uniq, out_time = window_bins(config, time)
    out = {}
    for name, arr in arrays.items():
        if arr.shape[:1] != (len(time),):
            out[name] = arr
            continue
        acc = np.zeros((len(uniq),) + arr.shape[1:], np.float64)
        for j, b in enumerate(uniq):
            sel = valid & (bin_index == b)
            acc[j] = arr[sel].astype(np.float64).mean(axis=0)
        out[name] = acc.astype(arr.dtype)
    return out, out_time


def window_average(
    config: WindowAvgDatasetConfig,
    input_path: str,
    output_path: str,
    subsample: bool = False,
    debug: bool = False,
) -> None:
    ds = open_file_dataset(input_path)
    time = ds.read_time(config.time_dim)

    bin_index, valid, uniq, out_time = window_bins(config, time)
    out_times = out_time.values
    if subsample:
        uniq, out_times = uniq[:73], out_times[:73]

    names = list(ds.keys())
    if config.subset_names is not None:
        names = [n for n in names if n in set(config.subset_names)
                 or len(ds[n].dims) == 1]
    time_vars = [
        n for n in names
        if ds[n].dims and ds[n].dims[0] == config.time_dim
        and n != config.time_dim
    ]
    static_vars = [
        n for n in names if n != config.time_dim and n not in time_vars
    ]
    coords = {
        n: ds[n].read(()) for n in static_vars if ds[n].dims == (n,)
    }
    static_vars = [n for n in static_vars if n not in coords]

    if not time_vars:
        raise ValueError("no time-varying variables in the dataset")

    if debug:
        for n in time_vars:
            logger.info("%s: %s -> %d windows", n, ds[n].shape, len(uniq))
        return

    arrays, dims = {}, {}
    for n in time_vars:
        var = ds[n]
        out = np.zeros((len(uniq),) + var.shape[1:], np.float64)
        for j, b in enumerate(uniq):
            sel = np.nonzero(valid & (bin_index == b))[0]
            out[j] = var.read((sel,)).astype(np.float64).mean(axis=0)
        arrays[n] = out.astype(var.dtype)
        dims[n] = var.dims
    for n in static_vars:
        arrays[n] = ds[n].read(())
        dims[n] = ds[n].dims

    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_zarr(
        output_path, arrays, dims, coords=coords,
        time=TimeCoord(out_times, time.calendar),
    )
    ds.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Create a window-averaged dataset from a zarr store."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--subsample", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = CreateWindowAvgDatasetConfig.from_file(args.yaml)
    output = config.output_zarr_path
    if args.subsample:
        output = output.replace(".zarr", "-subsample.zarr")
    window_average(
        config.window_avg, config.input_dataset.zarr_path, output,
        subsample=args.subsample, debug=args.debug,
    )


if __name__ == "__main__":
    main()
