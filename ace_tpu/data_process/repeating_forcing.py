"""Create a forcing dataset with selected variables repeated in time.

Reference: scripts/data_process/compute_repeating_forcing.py. Repeated
variables use ``np.repeat`` along time (each timestep duplicated
n_times consecutively, matching the reference's semantics exactly);
the time coordinate is extended at the original spacing. Variables that
are neither repeated nor time-invariant are kept only at the initial
time with a leading ``initial_condition`` dimension, and appear only in
the first monthly file. Output is monthly netCDF files named
YYYYMMDDHH.nc.

CLI:
    python -m ace_tpu.data_process.repeating_forcing \
        --input_dir DIR --output_dir DIR --n_times 2 \
        -f DSWRFtoa -f surface_temperature
"""

import argparse
import glob
import os

import numpy as np

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord

from ace_tpu.data_process.monthly_netcdf import month_groups


def compute_repeating_forcing(
    input_dir: str,
    output_dir: str,
    n_times: int,
    repeat_variables: list,
) -> list:
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(input_dir, "*.nc")))
    if not files:
        raise FileNotFoundError(f"no .nc files in {input_dir}")
    datasets = [open_file_dataset(f) for f in files]

    time = datasets[0].read_time()
    for ds in datasets[1:]:
        time = time.concat(ds.read_time())
    n_in = len(time)
    dt = int(time.values[1] - time.values[0])
    new_time = TimeCoord(
        time.values[0] + dt * np.arange(n_in * n_times), time.calendar
    )

    first = datasets[0]
    static = {
        v: first[v].read(()) for v in first.keys()
        if "time" not in first[v].dims and v != "time"
    }
    static_dims = {v: first[v].dims for v in static}
    coords = {
        v: arr for v, arr in static.items()
        if static_dims[v] == (v,)
    }
    for v in coords:
        del static[v], static_dims[v]

    def read_full(name):
        parts = [ds[name].read(()) for ds in datasets if name in ds]
        return np.concatenate(parts, axis=0)

    time_vars = [
        v for v in first.keys()
        if first[v].dims and first[v].dims[0] == "time" and v != "time"
    ]
    repeated, ic_arrays = {}, {}
    for v in time_vars:
        if v in repeat_variables:
            repeated[v] = np.repeat(read_full(v), n_times, axis=0)
        else:
            # initial condition only, with a leading IC dim (reference
            # compute_repeating_forcing.py:79-88)
            ic_arrays[v] = datasets[0][v].read((slice(0, 1),))

    written = []
    for i, (label, idx) in enumerate(month_groups(new_time)):
        arrays, dims = {}, {}
        for v, arr in repeated.items():
            arrays[v] = arr[idx]
            dims[v] = ("time",) + first[v].dims[1:]
        for v, arr in static.items():
            arrays[v] = arr
            dims[v] = static_dims[v]
        if i == 0:
            for v, arr in ic_arrays.items():
                arrays[v] = arr
                dims[v] = ("initial_condition",) + first[v].dims[1:]
        comp = TimeCoord(np.asarray([label]), new_time.calendar).components()
        fname = (
            f"{int(comp['year'][0]):04d}{int(comp['month'][0]):02d}"
            f"{int(comp['day'][0]):02d}{int(comp['hour'][0]):02d}.nc"
        )
        path = os.path.join(output_dir, fname)
        write_h5(path, arrays, dims, coords=coords, time=new_time[idx])
        written.append(path)
    for ds in datasets:
        ds.close()
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Repeat forcing variables n times along the time axis."
    )
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--n_times", type=int, required=True)
    parser.add_argument(
        "-f", "--repeat_variables", action="append",
        default=None,
        help="Variables to repeat (default: surface_temperature)",
    )
    args = parser.parse_args(argv)
    repeat = args.repeat_variables or ["surface_temperature"]
    written = compute_repeating_forcing(
        args.input_dir, args.output_dir, args.n_times, repeat
    )
    for path in written:
        print(path)


if __name__ == "__main__":
    main()
