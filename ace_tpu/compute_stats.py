"""Dataset statistics CLI: ``python -m ace_tpu.compute_stats <yaml>``.

Computes the normalization statistics a training config consumes
(reference: scripts/data_process/get_stats.py — centering.nc,
scaling-full-field.nc, scaling-residual.nc, time-mean.nc):

- ``stats-mean.nc``     scalar per-variable mean over (time, space)
- ``stats-std.nc``      scalar per-variable std over (time, space)
- ``stats-residual-std.nc``  std of one-step time differences, the
  residual-loss scaling (reference normalizer: fme/core/normalizer.py:318)
- ``time-mean.nc``      per-variable time-mean map

Everything streams over time windows in float64 host accumulators, so
arbitrarily long datasets fit in memory. Config YAML:

.. code-block:: yaml

    dataset:
      data_path: /data/train
    output_dir: /data/train-stats
    names: [PRESsfc, ...]   # optional; default = all time-dependent vars
    window: 16              # optional time chunk size
"""

import argparse
import dataclasses
import logging
import os

import numpy as np

from ace_tpu.core.cli import prepare_config
from ace_tpu.core.config import from_dict
from ace_tpu.data.dataset import XarrayDataConfig


@dataclasses.dataclass
class ComputeStatsConfig:
    dataset: XarrayDataConfig
    output_dir: str
    names: list[str] | None = None
    window: int = 16


def compute_stats(config: ComputeStatsConfig) -> dict[str, dict[str, float]]:
    from ace_tpu.data.store import write_h5

    ds = config.dataset.build()
    names = config.names or [
        n for n in ds.names if n in getattr(ds, "_time_dependent", ds.names)
    ]
    n_times = ds.n_times
    sums = {n: 0.0 for n in names}
    sumsqs = {n: 0.0 for n in names}
    res_sums = {n: 0.0 for n in names}
    res_sumsqs = {n: 0.0 for n in names}
    time_sums: dict[str, np.ndarray] = {}
    counts = {n: 0 for n in names}
    res_counts = {n: 0 for n in names}
    prev_last: dict[str, np.ndarray] = {}

    start = 0
    while start < n_times:
        n = min(config.window, n_times - start)
        window, _ = ds.get_window(start, n, names)
        for name in names:
            arr = np.asarray(window[name], np.float64)
            sums[name] += arr.sum()
            sumsqs[name] += (arr * arr).sum()
            counts[name] += arr.size
            time_sums[name] = time_sums.get(name, 0.0) + arr.sum(axis=0)
            # one-step residuals, continuous across window boundaries
            if name in prev_last:
                seq = np.concatenate([prev_last[name][None], arr], axis=0)
            else:
                seq = arr
            diff = np.diff(seq, axis=0)
            res_sums[name] += diff.sum()
            res_sumsqs[name] += (diff * diff).sum()
            res_counts[name] += diff[0].size * diff.shape[0]
            prev_last[name] = arr[-1]
        start += n
        logging.info("stats: %d/%d timesteps", start, n_times)

    means = {n: sums[n] / counts[n] for n in names}
    stds = {
        n: float(np.sqrt(max(sumsqs[n] / counts[n] - means[n] ** 2, 0.0)))
        for n in names
    }
    res_means = {n: res_sums[n] / max(res_counts[n], 1) for n in names}
    res_stds = {
        n: float(np.sqrt(max(
            res_sumsqs[n] / max(res_counts[n], 1) - res_means[n] ** 2, 0.0
        )))
        for n in names
    }
    time_means = {
        n: (time_sums[n] / n_times).astype(np.float32) for n in names
    }

    os.makedirs(config.output_dir, exist_ok=True)
    scalar_dims = {n: () for n in names}
    # input_samples enables sample-weighted ensemble combination
    # (reference get_stats.py writes the same attribute for
    # combine_stats.py to consume)
    gattrs = {"input_samples": float(n_times)}
    write_h5(
        os.path.join(config.output_dir, "stats-mean.nc"),
        {n: np.float32(means[n]) for n in names}, scalar_dims,
        global_attrs=gattrs,
    )
    write_h5(
        os.path.join(config.output_dir, "stats-std.nc"),
        {n: np.float32(stds[n]) for n in names}, scalar_dims,
        global_attrs=gattrs,
    )
    write_h5(
        os.path.join(config.output_dir, "stats-residual-std.nc"),
        {n: np.float32(res_stds[n]) for n in names}, scalar_dims,
        global_attrs=gattrs,
    )
    spatial = tuple(
        f"dim{i}" for i in range(next(iter(time_means.values())).ndim)
    )
    write_h5(
        os.path.join(config.output_dir, "time-mean.nc"),
        time_means, {n: spatial for n in names}, global_attrs=gattrs,
    )
    return {
        "mean": {n: float(means[n]) for n in names},
        "std": stds,
        "residual_std": res_stds,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute normalization statistics for a dataset"
    )
    parser.add_argument("config", help="YAML config path")
    parser.add_argument("--override", nargs="*", default=[])
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    data = prepare_config(args.config, args.override)
    config = from_dict(ComputeStatsConfig, data)
    stats = compute_stats(config)
    logging.info("wrote stats for %d variables to %s",
                 len(stats["mean"]), config.output_dir)
    return stats


if __name__ == "__main__":
    main()
