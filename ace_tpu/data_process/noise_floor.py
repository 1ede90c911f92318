"""Noise-floor statistics from a reference ensemble.

Reference: scripts/noise_floor/generate_stats.py. From an ensemble of
reference runs, computes the mean and standard deviation of the pattern
RMSE implied by averaging windows of 1/2/5/10 years — the irreducible
"noise floor" any emulator's time-mean bias is compared against (used
by scripts/interpolate_models and train reports).

CLI:
    python -m ace_tpu.data_process.noise_floor cfg.yaml
with YAML fields: paths (ensemble member stores), stats_path,
years_per_ensemble, is_amip, optional start_date/end_date.
"""

import argparse
import dataclasses
import logging
import os
from typing import List, Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import parse_datetime_string

logger = logging.getLogger(__name__)

WINDOW_SIZES = (1, 2, 5, 10)


@dataclasses.dataclass
class DataConfig:
    """(reference generate_stats.py:18-33)"""

    paths: List[str]
    stats_path: str
    years_per_ensemble: int
    is_amip: bool
    start_date: Optional[str] = None
    end_date: Optional[str] = None


def annual_means(
    path: str,
    names: Sequence[str],
    time_dim: str = "time",
    start_date: Optional[str] = None,
    end_date: Optional[str] = None,
) -> tuple:
    """Per-calendar-year means of each variable: {name: [year, Y, X]}."""
    ds = open_file_dataset(path)
    time = ds.read_time(time_dim)
    sel = np.arange(len(time))
    if start_date:
        sel = sel[time.values[sel] >= parse_datetime_string(
            start_date, time.calendar
        )]
    if end_date:
        sel = sel[time.values[sel] <= parse_datetime_string(
            end_date, time.calendar
        )]
    years = time.components()["year"][sel]
    uniq = np.unique(years)
    out = {}
    for name in names:
        var = ds[name]
        acc = []
        for y in uniq:
            idx = sel[years == y]
            arr = var.read((slice(int(idx[0]), int(idx[-1]) + 1),))
            acc.append(arr.astype(np.float64).mean(axis=0))
        out[name] = np.stack(acc)
    lat = ds["grid_yt"].read(()) if "grid_yt" in ds else ds["lat"].read(())
    ds.close()
    return out, uniq, lat


def window_pattern_rmse(
    annual: np.ndarray,
    window_size: int,
    years_per_ensemble: int,
    ensemble_members: int,
    area: np.ndarray,
    amip: bool,
) -> np.ndarray:
    """Pattern RMSE of window-mean bias maps (reference
    generate_stats.py:57-94). ``annual`` is [sample, year, Y, X].

    Non-AMIP: bias is relative to the all-sample all-year mean, with a
    sqrt(n/(n-1)) small-sample correction over the total window count.
    AMIP: each window is centered on its own cross-sample mean and the
    correction uses the member count.
    """
    n_windows = years_per_ensemble // window_size
    rmses = []
    if not amip:
        bias = annual - annual.mean(axis=(0, 1), keepdims=True)
    else:
        bias = annual
    w = area / area.sum()
    for i in range(n_windows):
        window = bias[:, i * window_size:(i + 1) * window_size]
        if amip:
            window = window - window.mean(axis=(0, 1), keepdims=True)
        maps = window.mean(axis=1)  # [sample, Y, X]
        rmse = np.sqrt((maps**2 * w).sum(axis=(-2, -1)))
        if amip:
            rmse = rmse * np.sqrt(
                ensemble_members / (ensemble_members - 1.0)
            )
        else:
            total = n_windows * ensemble_members
            rmse = rmse * np.sqrt(total / (total - 1.0))
        rmses.append(rmse)
    return np.stack(rmses)  # [window, sample]


def generate_noise_floor(config: DataConfig) -> dict:
    first = open_file_dataset(config.paths[0])
    names = [
        v for v in first.keys()
        if first[v].dims and first[v].dims[0] == "time"
        and len(first[v].dims) == 3 and v != "time"
    ]
    first.close()

    members = []
    lat = None
    for path in config.paths:
        annual, years, lat = annual_means(
            path, names, start_date=config.start_date,
            end_date=config.end_date,
        )
        if len(years) < config.years_per_ensemble:
            logger.warning(
                "%s has %d years, expected %d",
                path, len(years), config.years_per_ensemble,
            )
        members.append(annual)

    area = np.cos(np.deg2rad(lat))[:, None] * np.ones(
        (1, members[0][names[0]].shape[-1])
    )
    n_members = len(members)
    means, stds, annual_out = {}, {}, {}
    for name in names:
        annual = np.stack(
            [m[name][: config.years_per_ensemble] for m in members]
        )
        annual_out[name] = annual.astype(np.float32)
        mean_per_w, std_per_w = [], []
        for ws in WINDOW_SIZES:
            rmse = window_pattern_rmse(
                annual, ws, config.years_per_ensemble, n_members,
                area, config.is_amip,
            )
            mean_per_w.append(rmse.mean())
            std_per_w.append(rmse.std())
        means[name] = np.asarray(mean_per_w)
        stds[name] = np.asarray(std_per_w)

    os.makedirs(config.stats_path, exist_ok=True)
    dims = {n: ("window_size",) for n in names}
    coords = {"window_size": np.asarray(WINDOW_SIZES)}
    write_h5(os.path.join(config.stats_path, "rmse_means.nc"),
             means, dims, coords=coords)
    write_h5(os.path.join(config.stats_path, "rmse_stdevs.nc"),
             stds, dims, coords=coords)
    write_h5(
        os.path.join(config.stats_path, "annual_means.nc"),
        annual_out,
        {n: ("sample", "year", "lat", "lon") for n in names},
    )
    return {"means": means, "stds": stds}


def fit_inverse_sqrt(x: np.ndarray, y: np.ndarray):
    """Least-squares fit of y = c/sqrt(x) + b; returns the fitted callable
    (reference generate_train_report.py:32-45 uses scipy.curve_fit for
    the same model, which is linear in (c, b))."""
    basis = np.stack([1.0 / np.sqrt(np.asarray(x, np.float64)),
                      np.ones(len(x))], axis=1)
    (c, b), *_ = np.linalg.lstsq(basis, np.asarray(y, np.float64),
                                 rcond=None)
    return lambda w: c / np.sqrt(w) + b


def noise_floor_report(
    stats_path: str,
    names: Optional[Sequence[str]] = None,
    window_years: int = 10,
) -> dict:
    """Extrapolate the 1/2/5/10-year noise-floor stats to ``window_years``
    via the c/sqrt(w)+b fit and return {name: (floor, std)} — the
    reference lines its train dashboards plot
    (reference: scripts/noise_floor/generate_train_report.py).
    ``names=None`` reports every variable in the stats files."""
    if window_years <= 0:
        raise ValueError(f"window_years must be positive, got {window_years}")
    means_ds = open_file_dataset(os.path.join(stats_path,
                                              "rmse_means.nc"))
    stds_ds = open_file_dataset(os.path.join(stats_path,
                                             "rmse_stdevs.nc"))
    try:
        available = [v for v in means_ds.keys() if v != "window_size"]
        if names is None:
            names = available
        missing = sorted(set(names) - set(available))
        if missing:
            raise ValueError(
                f"variables {missing} not in {stats_path}; "
                f"available: {sorted(available)}"
            )
        # each file carries its own window_size coordinate (they can
        # come from different generation runs)
        mean_w = means_ds["window_size"].read(())
        std_w = stds_ds["window_size"].read(())
        report = {}
        for name in names:
            floor = fit_inverse_sqrt(
                mean_w, means_ds[name].read(())
            )(window_years)
            spread = fit_inverse_sqrt(
                std_w, stds_ds[name].read(())
            )(window_years)
            report[name] = (float(floor), float(spread))
        return report
    finally:
        means_ds.close()
        stds_ds.close()


@dataclasses.dataclass
class ReportConfig:
    """Minimal YAML for report mode: only the stats location (and
    optionally names) is needed (reference generate_train_report.py
    DataConfig)."""

    stats_path: str
    names: Optional[List[str]] = None


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute ensemble noise-floor pattern-RMSE statistics, "
        "or report the extrapolated floor for a window length."
    )
    parser.add_argument("data_config")
    parser.add_argument(
        "--report-window-years", type=int, default=None,
        help="Instead of computing stats, extrapolate existing stats at "
        "stats_path to this window length and print the floor per "
        "variable (reference generate_train_report.py)",
    )
    parser.add_argument("--report-names", nargs="*", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import yaml

    with open(args.data_config) as f:
        raw = yaml.safe_load(f)
    if args.report_window_years is not None:
        if args.report_window_years <= 0:
            parser.error("--report-window-years must be positive")
        # report mode needs only stats_path (+ optional names)
        config = from_dict(ReportConfig, {
            k: v for k, v in raw.items()
            if k in ("stats_path", "names")
        })
        report = noise_floor_report(
            config.stats_path,
            args.report_names or config.names,
            args.report_window_years,
        )
        for name, (floor, spread) in report.items():
            print(f"{name}: noise_floor={floor:.6g} +/- {spread:.6g}")
        return report
    if args.report_names:
        parser.error(
            "--report-names requires --report-window-years (stats "
            "generation would ignore it and overwrite existing stats)"
        )
    return generate_noise_floor(from_dict(DataConfig, raw))


if __name__ == "__main__":
    main()
