"""Convert a zarr store to monthly netCDF files.

Reference: scripts/data_process/convert_to_monthly_netcdf.py. Output files
are named YYYYMMDDHH.nc after the month start, matching the layout the
inference forcing loader consumes.

CLI:
    python -m ace_tpu.data_process.monthly_netcdf INPUT_ZARR OUTPUT_DIR \
        [--start-date 2016-01-01] [--end-date 2016-12-31] [--prepend-nans]
"""

import argparse
import os

import numpy as np

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord, encode_time, parse_datetime_string


def month_groups(time: TimeCoord) -> list:
    """Split a time coordinate into runs of equal (year, month).

    Returns a list of (label_micros, index_array) with the label at the
    month start (reference resamples with time="MS")."""
    comp = time.components()
    ym = comp["year"] * 12 + (comp["month"] - 1)
    groups = []
    for key in np.unique(ym):
        idx = np.nonzero(ym == key)[0]
        label = encode_time(
            int(key // 12), int(key % 12 + 1), 1, calendar=time.calendar
        )
        groups.append((label, idx))
    return groups


def convert_to_monthly_netcdf(
    input_zarr: str,
    output_directory: str,
    start_date: str | None = None,
    end_date: str | None = None,
    prepend_nans: bool = False,
) -> list:
    os.makedirs(output_directory, exist_ok=True)
    ds = open_file_dataset(input_zarr)
    time = ds.read_time()

    time_vars = [
        v for v in ds.keys()
        if ds[v].dims and ds[v].dims[0] == "time" and v != "time"
    ]
    static_vars = [
        v for v in ds.keys() if v != "time" and v not in time_vars
    ]

    prepend = 0
    if prepend_nans:
        # the baseline datasets are missing the initial condition; shift
        # time back one step and write a NaN leading step (reference
        # convert_to_monthly_netcdf.py:42-50)
        dt = int(time.values[1] - time.values[0])
        time = TimeCoord(
            np.concatenate([[time.values[0] - dt], time.values]),
            time.calendar,
        )
        prepend = 1

    sel = np.arange(len(time))
    if start_date is not None:
        sel = sel[time.values[sel] >= parse_datetime_string(
            start_date, time.calendar
        )]
    if end_date is not None:
        # inclusive through the end of the given date (reference uses
        # xarray label slicing, which is inclusive)
        end = parse_datetime_string(end_date, time.calendar)
        sel = sel[time.values[sel] < end + 86400 * 10**6]

    coords = {
        v: ds[v].read(()) for v in ds.keys()
        if len(ds[v].dims) == 1 and ds[v].dims[0] == v and v != "time"
    }
    static_vars = [v for v in static_vars if v not in coords]

    written = []
    for label, idx in month_groups(time[sel]):
        gsel = sel[idx]
        arrays, dims = {}, {}
        for v in time_vars:
            var = ds[v]
            fsel = gsel - prepend
            valid = fsel >= 0
            if valid.all():
                arr = var.read((fsel,))
            else:
                arr = np.full((len(gsel),) + var.shape[1:], np.nan,
                              var.dtype)
                if valid.any():
                    arr[valid] = var.read((fsel[valid],))
            arrays[v] = arr
            dims[v] = ("time",) + var.dims[1:]
        for v in static_vars:
            arrays[v] = ds[v].read(())
            dims[v] = ds[v].dims
        comp = TimeCoord(
            np.asarray([label]), time.calendar
        ).components()
        fname = (
            f"{int(comp['year'][0]):04d}{int(comp['month'][0]):02d}"
            f"{int(comp['day'][0]):02d}{int(comp['hour'][0]):02d}.nc"
        )
        path = os.path.join(output_directory, fname)
        write_h5(path, arrays, dims, coords=coords,
                 time=time[gsel])
        written.append(path)
    ds.close()
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Save a zarr store as monthly netCDF files."
    )
    parser.add_argument("input_zarr")
    parser.add_argument("output_directory")
    parser.add_argument("--start-date")
    parser.add_argument("--end-date")
    parser.add_argument("--prepend-nans", action="store_true")
    args = parser.parse_args(argv)
    written = convert_to_monthly_netcdf(
        args.input_zarr, args.output_directory,
        start_date=args.start_date, end_date=args.end_date,
        prepend_nans=args.prepend_nans,
    )
    for path in written:
        print(path)


if __name__ == "__main__":
    main()
