"""Append new variables to an existing zarr dataset.

Reference: scripts/data_process/append_dataset.py. Variables from the
run directory's stores that are not already present in the target zarr
group are streamed in with the requested time chunking; variables that
already exist are skipped; the group's history attribute is extended.

CLI:
    python -m ace_tpu.data_process.append_dataset \
        --append-config append.yaml --run-directory RUN \
        --append-store existing.zarr [--time-chunk 1] [--debug]
with append.yaml fields: variable_sources {store: [names...]},
optional renaming {}.
"""

import argparse
import dataclasses
import json
import logging
import os
from typing import Mapping, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset
from ace_tpu.data_process.compute_dataset import ZarrRegionWriter

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DatasetAppendConfig:
    """(reference append_dataset.py:18-33)"""

    variable_sources: Mapping[str, Sequence[str]]
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_file(cls, path: str) -> "DatasetAppendConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data.pop("dataset_computation", None)
        return from_dict(cls, data)


def append_dataset(
    config: DatasetAppendConfig,
    run_directory: str,
    append_store: str,
    time_chunk: int = 1,
    slab_steps: int = 64,
    debug: bool = False,
) -> list:
    target = open_file_dataset(append_store)
    existing = set(target.keys())
    target_attrs = dict(target.attrs)
    n_times = len(target.read_time())
    target.close()

    to_append = {}
    for store_name, names in config.variable_sources.items():
        store = open_file_dataset(
            os.path.join(run_directory, store_name)
        )
        for v in names:
            out_name = config.renaming.get(v, v)
            if out_name in existing:
                logger.info("%s already exists, skipping", out_name)
                continue
            to_append[out_name] = (store, v)
    if not to_append:
        logger.info("No new variables to append.")
        return []
    if debug:
        for out_name, (store, v) in to_append.items():
            logger.info("%s: %s %s", out_name, store[v].shape,
                        store[v].dtype)
        return list(to_append)

    # point the region writer at the existing group; only the new
    # arrays are created, nothing else is touched
    writer = ZarrRegionWriter(append_store, create_group=False)
    for out_name, (store, v) in to_append.items():
        var = store[v]
        time_dep = var.dims and var.dims[0] == "time"
        if time_dep and var.shape[0] != n_times:
            raise ValueError(
                f"{v} has {var.shape[0]} time steps; store has {n_times}"
            )
        chunks = ([time_chunk] + list(var.shape[1:])) if time_dep else None
        writer.create(out_name, var.shape, var.dtype, var.dims,
                      chunks=chunks, attrs=dict(var.attrs))
        if time_dep:
            for start in range(0, var.shape[0], slab_steps):
                stop = min(var.shape[0], start + slab_steps)
                writer.write(
                    out_name, var.read((slice(start, stop),)), t0=start
                )
        else:
            writer.write(out_name, var.read(()))
        logger.info("appended %s", out_name)

    note = (
        "Dataset extended by ace_tpu.data_process.append_dataset, "
        f"adding: {', '.join(to_append)}."
    )
    target_attrs["history"] = (
        target_attrs.get("history", "") + " " + note
    ).strip()
    with open(os.path.join(append_store, ".zattrs"), "w") as f:
        json.dump(target_attrs, f)
    return list(to_append)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Append variables to an existing zarr dataset."
    )
    parser.add_argument("--append-config", required=True)
    parser.add_argument("--run-directory", required=True)
    parser.add_argument("--append-store", required=True)
    parser.add_argument("--time-chunk", type=int, default=1)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = DatasetAppendConfig.from_file(args.append_config)
    for name in append_dataset(
        config, args.run_directory, args.append_store,
        time_chunk=args.time_chunk, debug=args.debug,
    ):
        print(name)


if __name__ == "__main__":
    main()
