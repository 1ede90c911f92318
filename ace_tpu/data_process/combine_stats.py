"""Combine and merge normalization-statistics directories.

Reference: scripts/data_process/combine_stats.py + merge_stats.py.

``combine_stats`` pools per-run stats across an ensemble, weighted by
each run's ``input_samples``: means are weighted averages; residual
standard deviations are combined as variances; full-field standard
deviations additionally include the between-run variance of the means
(the law of total variance, reference combine_stats.py:104-160).

``merge_stats`` takes the variable-wise union of several stats
directories (e.g. separate atmosphere and ocean stats for coupled
training), keeping the first occurrence of duplicated names, with
optional per-variable renames (reference merge_stats.py:42-111).

File names follow this repo's compute_stats outputs: stats-mean.nc,
stats-std.nc, stats-residual-std.nc, time-mean.nc.

CLI:
    python -m ace_tpu.data_process.combine_stats combine cfg.yaml
    python -m ace_tpu.data_process.combine_stats merge cfg.yaml
"""

import argparse
import dataclasses
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_h5

logger = logging.getLogger(__name__)

MEAN_FILES = ("stats-mean.nc", "time-mean.nc")
STD_FILES = ("stats-std.nc", "stats-residual-std.nc")
ALL_FILES = MEAN_FILES + STD_FILES


def _load_dir(path: str, fname: str):
    ds = open_file_dataset(os.path.join(path, fname))
    data = {v: ds[v].read(()) for v in ds.keys()}
    dims = {v: ds[v].dims for v in ds.keys()}
    samples = float(ds.attrs.get("input_samples", 1.0))
    ds.close()
    return data, dims, samples


def combine_stats(
    stats_roots: List[str],
    output_directory: str,
    subdirectory: str = "combined",
    history: Optional[str] = None,
) -> str:
    out_dir = os.path.join(output_directory, subdirectory)
    if os.path.exists(os.path.join(out_dir, "stats-mean.nc")):
        logger.info("combined stats already exist at %s; skipping",
                    out_dir)
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def weighted(values, weights):
        w = np.asarray(weights, np.float64)
        return sum(v * wi for v, wi in zip(values, w)) / w.sum()

    gattrs = {"history": history} if history else {}
    centering: Dict[str, np.ndarray] = {}
    for fname in ("stats-mean.nc", "time-mean.nc",
                  "stats-residual-std.nc"):
        loaded = [_load_dir(root, fname) for root in stats_roots]
        names = loaded[0][0].keys()
        samples = [s for _, _, s in loaded]
        out = {}
        for n in names:
            vals = [d[n].astype(np.float64) for d, _, _ in loaded]
            if fname == "stats-residual-std.nc":
                # stds pool as variances
                out[n] = np.sqrt(
                    weighted([v**2 for v in vals], samples)
                )
            else:
                out[n] = weighted(vals, samples)
        if fname == "stats-mean.nc":
            centering = out
        write_h5(
            os.path.join(out_dir, fname),
            {n: v.astype(np.float32) for n, v in out.items()},
            {n: loaded[0][1][n] for n in names},
            global_attrs={
                **gattrs, "input_samples": float(np.sum(samples)),
            },
        )

    # full-field stds include the between-run variance of the means
    # (law of total variance; reference get_combined_stats)
    loaded = [_load_dir(root, "stats-std.nc") for root in stats_roots]
    cent = [_load_dir(root, "stats-mean.nc")[0] for root in stats_roots]
    samples = [s for _, _, s in loaded]
    out = {}
    for n in loaded[0][0].keys():
        within = [d[n].astype(np.float64) ** 2 for d, _, _ in loaded]
        mean_n = centering[n]
        between = [
            (c[n].astype(np.float64) - mean_n) ** 2 for c in cent
        ]
        total = [w + b for w, b in zip(within, between)]
        out[n] = np.sqrt(weighted(total, samples))
    write_h5(
        os.path.join(out_dir, "stats-std.nc"),
        {n: v.astype(np.float32) for n, v in out.items()},
        {n: loaded[0][1][n] for n in out},
        global_attrs={
            **gattrs, "input_samples": float(np.sum(samples)),
        },
    )
    logger.info("wrote combined stats to %s", out_dir)
    return out_dir


@dataclasses.dataclass
class RenameStatConfig:
    """(reference merge_stats.py:21-39)"""

    data_var: str
    new_name: str
    drop: bool = False


@dataclasses.dataclass
class MergeStatsConfig:
    """(reference merge_stats.py:42-58)"""

    input_directories: List[str]
    output_directory: str
    rename: List[RenameStatConfig] = dataclasses.field(
        default_factory=list
    )
    exclude_names: List[str] = dataclasses.field(default_factory=list)


def merge_stats(config: MergeStatsConfig) -> None:
    os.makedirs(config.output_directory, exist_ok=True)
    for fname in ALL_FILES:
        data: Dict[str, np.ndarray] = {}
        dims: Dict[str, tuple] = {}
        first_samples = None
        for path in config.input_directories:
            loaded, ldims, samples = _load_dir(path, fname)
            if first_samples is None:
                first_samples = samples
            for name, arr in loaded.items():
                if name in config.exclude_names:
                    continue
                if name in data:
                    logger.warning(
                        "%s duplicated; keeping the first occurrence",
                        name,
                    )
                    continue
                data[name] = arr
                dims[name] = ldims[name]
        for rn in config.rename:
            data[rn.new_name] = data[rn.data_var].copy()
            dims[rn.new_name] = dims[rn.data_var]
            if rn.drop:
                del data[rn.data_var], dims[rn.data_var]
        write_h5(
            os.path.join(config.output_directory, fname), data, dims,
            global_attrs={"input_samples": first_samples},
        )
    logger.info("wrote merged stats to %s", config.output_directory)


@dataclasses.dataclass
class CombineStatsCLIConfig:
    """YAML schema for the combine subcommand (reference
    combine_stats.py:45-50: per-run stats under
    <output_directory>/<run>/)."""

    runs: Dict[str, str]
    output_directory: str
    exclude_runs: List[str] = dataclasses.field(default_factory=list)
    subdirectory: str = "combined"


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Combine (ensemble-pool) or merge (variable-union) "
        "stats directories."
    )
    parser.add_argument("mode", choices=["combine", "merge"])
    parser.add_argument("config_yaml")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import yaml

    with open(args.config_yaml) as f:
        data = yaml.safe_load(f)
    if args.mode == "combine":
        config = from_dict(CombineStatsCLIConfig, data)
        roots = [
            os.path.join(config.output_directory, run)
            for run in config.runs
            if run not in config.exclude_runs
        ]
        combine_stats(
            roots, config.output_directory, config.subdirectory,
            history=(
                "Combined by ace_tpu.data_process.combine_stats from "
                f"{args.config_yaml}"
            ),
        )
    else:
        merge_stats(from_dict(MergeStatsConfig, data))


if __name__ == "__main__":
    main()
