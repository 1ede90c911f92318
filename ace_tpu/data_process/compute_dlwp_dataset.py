"""Restructure a HEALPix zarr into a channel-stacked DLWP dataset.

Reference: scripts/data_process/compute_dlwp_dataset.py. Takes the
output of compute_hpx_dataset and reshapes it into the DLWP training
layout: a ``constants`` array [channel_c, face, height, width] from the
time-invariant variables and ``inputs``/``targets`` arrays
[time, channel, face, height, width] stacking every time-dependent
(face, height, width) variable, with channel-name coordinate arrays.

CLI:
    python -m ace_tpu.data_process.compute_dlwp_dataset INPUT_ZARR \
        OUTPUT_ZARR [--time-chunk 4]
"""

import argparse
import logging

import numpy as np

from ace_tpu.data.store import open_file_dataset
from ace_tpu.data_process.compute_dataset import ZarrRegionWriter

logger = logging.getLogger(__name__)

HPX_DIMS = ("face", "height", "width")


def infer_channel_vars(ds) -> list:
    """Time-dependent (time, face, height, width) variables (reference
    compute_dlwp_dataset.py:26-32)."""
    return [
        v for v in ds.keys()
        if set(ds[v].dims) == {"time", *HPX_DIMS}
    ]


def infer_constants(ds) -> list:
    return [
        v for v in ds.keys() if set(ds[v].dims) == set(HPX_DIMS)
        and v not in ("lat", "lon")
    ]


def convert_to_dlwp(
    input_zarr: str,
    output_zarr: str,
    time_chunk: int = 4,
    slab_steps: int = 16,
) -> None:
    ds = open_file_dataset(input_zarr)
    time = ds.read_time()
    n_times = len(time)
    channel_vars = infer_channel_vars(ds)
    constants = infer_constants(ds)
    if not channel_vars:
        raise ValueError("no (time, face, height, width) variables found")
    first = ds[channel_vars[0]]
    nface, nh, nw = first.shape[-3:]

    writer = ZarrRegionWriter(output_zarr, attrs={
        "history": (
            "Dataset computed by ace_tpu.data_process."
            f"compute_dlwp_dataset from {input_zarr}."
        ),
        # channel-name coordinates; stored as attributes because
        # tensorstore's zarr v2 driver has no native string dtype (the
        # reference writes zarr v3 StringDType coords)
        "channel_c": list(constants),
        "channel_in": list(channel_vars),
        "channel_out": list(channel_vars),
    })
    from ace_tpu.data.store import encode_cf_time

    tvals, tunits, tcal = encode_cf_time(time)
    writer.create("time", (n_times,), tvals.dtype, ("time",),
                  chunks=[time_chunk],
                  attrs={"units": tunits, "calendar": tcal})
    writer.write("time", tvals)
    for cname, cvals in [("face", np.arange(nface)),
                         ("height", np.arange(nh)),
                         ("width", np.arange(nw))]:
        writer.create(cname, cvals.shape, cvals.dtype, (cname,))
        writer.write(cname, cvals)
    for cname in ("lat", "lon"):
        if cname in ds:
            arr = ds[cname].read(())
            writer.create(cname, arr.shape, arr.dtype, HPX_DIMS)
            writer.write(cname, arr)
    if constants:
        const = np.stack(
            [ds[v].read(()).astype(np.float32) for v in constants]
        )
        writer.create("constants", const.shape, np.float32,
                      ("channel_c",) + HPX_DIMS,
                      attrs={"channel_c": list(constants)})
        writer.write("constants", const)

    n_ch = len(channel_vars)
    for name, ch_dim in [("inputs", "channel_in"),
                         ("targets", "channel_out")]:
        writer.create(
            name, (n_times, n_ch, nface, nh, nw), np.float32,
            ("time", ch_dim) + HPX_DIMS,
            chunks=[time_chunk, n_ch, nface, nh, nw],
            attrs={ch_dim: list(channel_vars)},
        )
    for start in range(0, n_times, slab_steps):
        stop = min(n_times, start + slab_steps)
        stacked = np.stack(
            [
                ds[v].read((slice(start, stop),)).astype(np.float32)
                for v in channel_vars
            ],
            axis=1,
        )  # [T, C, face, h, w]
        writer.write("inputs", stacked, t0=start)
        writer.write("targets", stacked, t0=start)
        logger.info("stacked steps [%d, %d) of %d", start, stop, n_times)
    ds.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Restructure a HEALPix zarr into the DLWP "
        "channel-stacked layout."
    )
    parser.add_argument("input_zarr")
    parser.add_argument("output_zarr")
    parser.add_argument("--time-chunk", type=int, default=4)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    convert_to_dlwp(args.input_zarr, args.output_zarr,
                    time_chunk=args.time_chunk)


if __name__ == "__main__":
    main()
