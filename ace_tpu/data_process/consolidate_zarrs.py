"""Consolidate variables from multiple source stores into one zarr.

Reference: scripts/downscaling/process_from_raw_zarrs.py — standardizes
raw multi-resolution simulation output for downscaling experiments by
selecting variables from one or more source zarrs, renaming variables
and dimensions, and writing a single output zarr with source-path
tracking attributes. The reference hardcodes SHiELD AMIP GCS paths and
uses dask/obstore; here the same semantics are config-driven and run on
the native store layer (tensorstore zarr / HDF5).

CLI:
    python -m ace_tpu.data_process.consolidate_zarrs --yaml cfg.yaml

Config:
    output_store: out.zarr
    datasets:
      - name: 100km
        sources:
          - path: /raw/run1.zarr
            variables: [PRATEsfc, TB]
            renaming: {TB: TMPlowest}
        dim_renaming: {grid_xt: lon, grid_yt: lat}
    variables: [PRATEsfc]   # optional global filter after renaming
"""

import argparse
import dataclasses
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SourceConfig:
    """One source store and the variables to take from it."""

    path: str
    variables: List[str]
    renaming: Dict[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class ConsolidateDatasetConfig:
    """One output dataset consolidated from one or more sources
    (reference: process_from_raw_zarrs.py SingleDatasetLoader /
    MultiFileDatasetLoader)."""

    name: str
    sources: List[SourceConfig]
    dim_renaming: Dict[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class ConsolidateZarrsConfig:
    output_store: str
    datasets: List[ConsolidateDatasetConfig]
    variables: Optional[List[str]] = None
    time_chunk: int = 160


def consolidate_dataset(
    config: ConsolidateDatasetConfig,
    output_store: str,
    variables: Optional[List[str]] = None,
    time_chunk: int = 160,
    dry_run: bool = False,
) -> Optional[str]:
    out_path = os.path.join(output_store, f"{config.name}.zarr")
    data, dims, coords, attrs = {}, {}, {}, {}
    time = None
    for src in config.sources:
        ds = open_file_dataset(src.path)
        missing = [v for v in src.variables if v not in ds.keys()]
        if missing:
            raise KeyError(
                f"variables {missing} not in {src.path}; "
                f"available: {sorted(ds.keys())[:20]}..."
            )
        if "time" in ds.keys():
            src_time = ds.read_time()
            if time is None:
                time = src_time
            elif (len(src_time) != len(time)
                  or not np.array_equal(src_time.values, time.values)):
                # xr.merge in the reference would align or raise; without
                # alignment, silently writing against the first source's
                # time axis would mislabel every sample.
                raise ValueError(
                    f"{src.path}: time axis (length {len(src_time)}) does "
                    f"not match the first source's (length {len(time)})"
                )
        for v in src.variables:
            out_name = src.renaming.get(v, v)
            if variables is not None and out_name not in variables:
                continue
            var_dims = tuple(
                config.dim_renaming.get(d, d) for d in ds[v].dims
            )
            if dry_run:
                logger.info(
                    "[dry run] %s: %s -> %s dims=%s from %s",
                    config.name, v, out_name, var_dims, src.path,
                )
                continue
            data[out_name] = np.asarray(ds[v].read(()))
            dims[out_name] = var_dims
            attrs[out_name] = {
                **{k: (a.tolist() if isinstance(a, np.ndarray) else a)
                   for k, a in ds[v].attrs.items()
                   if k != "_ARRAY_DIMENSIONS"},
                "source_path": src.path,
                "source_variable": v,
            }
        for c in ds.keys():
            if ds[c].dims == (c,) and c != "time":
                out_c = config.dim_renaming.get(c, c)
                if out_c not in coords and not dry_run:
                    coords[out_c] = np.asarray(ds[c].read(()))
        ds.close()
    if dry_run:
        return None
    if not data:
        raise ValueError(f"{config.name}: no variables selected")
    chunks = {
        v: [min(time_chunk, arr.shape[0])] + list(arr.shape[1:])
        for v, arr in data.items() if dims[v] and dims[v][0] == "time"
    }
    write_zarr(out_path, data, dims, coords=coords, attrs=attrs,
               time=time, chunks=chunks)
    logger.info("wrote %s (%d variables)", out_path, len(data))
    return out_path


def consolidate_zarrs(config: ConsolidateZarrsConfig,
                      dataset_names: Optional[List[str]] = None,
                      dry_run: bool = False) -> List[str]:
    os.makedirs(config.output_store, exist_ok=True)
    written = []
    for ds_cfg in config.datasets:
        if dataset_names and ds_cfg.name not in dataset_names:
            continue
        out = consolidate_dataset(
            ds_cfg, config.output_store, config.variables,
            config.time_chunk, dry_run,
        )
        if out:
            written.append(out)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Consolidate variables from source stores into zarr."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--datasets", nargs="*", default=None,
                        help="subset of dataset names to process")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import yaml

    with open(args.yaml) as f:
        config = from_dict(ConsolidateZarrsConfig, yaml.safe_load(f))
    consolidate_zarrs(config, args.datasets, args.dry_run)


if __name__ == "__main__":
    main()
