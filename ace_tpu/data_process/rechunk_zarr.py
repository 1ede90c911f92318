"""Rechunk a zarr store along the time dimension.

Reference: scripts/time_rechunk/rechunk_zarr.py (an xarray-beam /
apache-beam pipeline). Here: a direct tensorstore-to-tensorstore
streaming copy — time-dependent variables are rewritten slab by slab
with the new chunking; time-invariant variables and coordinates are
copied through unchanged.

CLI:
    python -m ace_tpu.data_process.rechunk_zarr SRC DST TIME_CHUNK
"""

import argparse
import logging

import numpy as np

from ace_tpu.data.store import open_file_dataset
from ace_tpu.data_process.compute_dataset import ZarrRegionWriter

logger = logging.getLogger(__name__)


def rechunk_zarr(
    source_path: str,
    destination_path: str,
    time_chunk_size: int,
    time_dim: str = "time",
    slab_steps: int | None = None,
) -> None:
    ds = open_file_dataset(source_path)
    writer = ZarrRegionWriter(destination_path, attrs=dict(ds.attrs))
    slab = slab_steps or max(time_chunk_size, 1)
    for name in ds.keys():
        var = ds[name]
        time_dependent = var.dims and var.dims[0] == time_dim
        chunks = None
        if time_dependent:
            chunks = [time_chunk_size] + list(var.shape[1:])
        writer.create(name, var.shape, var.dtype, var.dims,
                      chunks=chunks, attrs=dict(var.attrs))
        if not time_dependent:
            writer.write(name, var.read(()))
            continue
        n = var.shape[0]
        for start in range(0, n, slab):
            stop = min(n, start + slab)
            writer.write(name, var.read((slice(start, stop),)), t0=start)
        logger.info("rechunked %s: %s -> time chunk %d",
                    name, var.shape, time_chunk_size)
    ds.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Rechunk a zarr store along time."
    )
    parser.add_argument("source_path")
    parser.add_argument("destination_path")
    parser.add_argument("time_chunk_size", type=int)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    rechunk_zarr(
        args.source_path, args.destination_path, args.time_chunk_size
    )


if __name__ == "__main__":
    main()
