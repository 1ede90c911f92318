"""Compute a Nino3.4 ENSO index from SST forcing data.

Reference: scripts/compute_enso_index/compute_enso_index.py. Pipeline:
Nino3.4 regional-mean SST minus tropical ocean-masked mean SST ->
anomalies relative to the monthly climatology -> optional linear
detrend -> centered 3-month running mean (45-day shift + quarterly
means, as in the reference) -> a Python file of ((y, m, d), value)
tuples compatible with the reference's committed index files.

CLI:
    python -m ace_tpu.data_process.enso_index --sst-dataset sst.nc \
        [--sst-var sea_surface_temperature] [--ocean-mask-source ds.zarr] \
        [--start-time 1940-01-01] [--stop-time 2021-01-01] [--detrend] \
        [--output-file index.py]
"""

import argparse

import numpy as np

from ace_tpu.data.store import open_file_dataset
from ace_tpu.data.time import TimeCoord, parse_datetime_string

NINO_REGION_BOUNDS = dict(lat=(-5.0, 5.0), lon=(190.0, 240.0))
TROPICAL_REGION_BOUNDS = dict(lat=(-5.0, 5.0), lon=(0.0, 360.0))

_DAY = 86400 * 10**6


def regional_average(field, lat, lon, bounds, extra_weight=None):
    """Area-weighted mean over a lat/lon box; field [..., Y, X]."""
    lat_in = (lat >= bounds["lat"][0]) & (lat <= bounds["lat"][1])
    lon_ = lon % 360.0
    lo, hi = bounds["lon"][0] % 360.0, bounds["lon"][1] % 360.0
    if lo < hi:
        lon_in = (lon_ >= lo) & (lon_ <= hi)
    elif lo == hi:  # full circle (e.g. 0..360)
        lon_in = np.ones(lon.shape, bool)
    else:  # wraps the date line
        lon_in = (lon_ >= lo) | (lon_ <= hi)
    w = np.cos(np.deg2rad(lat))[:, None] * (
        lat_in[:, None] & lon_in[None, :]
    )
    if extra_weight is not None:
        w = w * extra_weight
    # skip NaN cells (land in SST datasets), like xarray's
    # weighted().mean() in the reference (compute_enso_index.py:26-33)
    finite = np.isfinite(field)
    filled = np.where(finite, field, 0.0)
    weights = finite * w
    return (filled * weights).sum(axis=(-2, -1)) / weights.sum(
        axis=(-2, -1)
    )


def monthly_anomalies(series: np.ndarray, months: np.ndarray) -> np.ndarray:
    """Subtract the per-calendar-month climatology (reference
    get_anomalies, compute_enso_index.py:76-81)."""
    out = series.astype(np.float64).copy()
    for m in range(1, 13):
        sel = months == m
        if sel.any():
            out[sel] -= out[sel].mean()
    return out


def detrend(series: np.ndarray) -> np.ndarray:
    x = np.arange(len(series))
    coeff = np.polyfit(x, series, deg=1)
    return series - (coeff[0] * x + coeff[1])


def centered_three_month_mean(series: np.ndarray, time: TimeCoord):
    """Shift timestamps +45 days then take quarterly (3-month) means; the
    label is the first month of each season (reference get_time_average,
    compute_enso_index.py:68-74)."""
    shifted = TimeCoord(time.values + 45 * _DAY, time.calendar)
    comp = shifted.components()
    season = (comp["month"] - 1) // 3  # 0..3 within the year
    key = comp["year"] * 4 + season
    labels, values = [], []
    for k in np.unique(key):
        sel = key == k
        labels.append(
            (int(k // 4), int((k % 4) * 3 + 1), 1)
        )
        values.append(float(series[sel].mean()))
    return labels, np.asarray(values)


def interp_mask_to_grid(mask, mask_lat, mask_lon, lat, lon):
    """Nearest-neighbor regrid of an ocean mask onto the SST grid
    (the reference bilinearly interpolates then thresholds at 0.5;
    nearest-neighbor of a {0,1} field equals that for aligned grids)."""
    yi = np.abs(mask_lat[:, None] - lat[None, :]).argmin(axis=0)
    xi = np.abs(
        (mask_lon[:, None] - lon[None, :] + 180.0) % 360.0 - 180.0
    ).argmin(axis=0)
    return mask[np.ix_(yi, xi)]


def compute_enso_index(
    sst_dataset: str,
    sst_var: str = "sea_surface_temperature",
    ocean_mask_source: str | None = None,
    ocean_mask_var: str = "ocean_fraction",
    lat_dim: str = "lat",
    lon_dim: str = "lon",
    mask_lat_dim: str = "grid_yt",
    mask_lon_dim: str = "grid_xt",
    start_time: str | None = None,
    stop_time: str | None = None,
    do_detrend: bool = False,
):
    ds = open_file_dataset(sst_dataset)
    time = ds.read_time()
    lat = ds[lat_dim].read(())
    lon = ds[lon_dim].read(())

    sel = np.arange(len(time))
    if start_time:
        sel = sel[time.values[sel] >= parse_datetime_string(
            start_time, time.calendar
        )]
    if stop_time:
        sel = sel[time.values[sel] <= parse_datetime_string(
            stop_time, time.calendar
        )]
    sst = ds[sst_var].read((sel,)).astype(np.float64)
    time = time[sel]

    ocean_weight = None
    if ocean_mask_source:
        mask_ds = open_file_dataset(ocean_mask_source)
        frac = mask_ds[ocean_mask_var]
        arr = frac.read(
            (slice(frac.shape[0] - 1, frac.shape[0]),)
        )[0] if frac.dims and frac.dims[0] == "time" else frac.read(())
        ocean_weight = interp_mask_to_grid(
            (arr > 0.5).astype(np.float64),
            mask_ds[mask_lat_dim].read(()),
            mask_ds[mask_lon_dim].read(()),
            lat, lon,
        )
        mask_ds.close()

    nino34 = regional_average(sst, lat, lon, NINO_REGION_BOUNDS)
    tropical = regional_average(
        sst, lat, lon, TROPICAL_REGION_BOUNDS, extra_weight=ocean_weight
    )
    anom = nino34 - tropical
    anom = monthly_anomalies(anom, time.components()["month"])
    if do_detrend:
        anom = detrend(anom)
    labels, values = centered_three_month_mean(anom, time)
    ds.close()
    return labels, values


def write_index_file(path: str, labels, values) -> None:
    with open(path, "w") as f:
        print(
            "# Nino3.4 index anomaly from tropical SST average, "
            "3-monthly centered running mean [K]",
            file=f,
        )
        print(
            "# computed by ace_tpu.data_process.enso_index",
            file=f,
        )
        print("NINO34_INDEX = [", file=f)
        for (y, m, d), v in zip(labels, values):
            print(f"    (({y}, {m}, {d}), {v:0.3f}),", file=f)
        print("]", file=f)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sst-dataset", required=True)
    parser.add_argument("--sst-var", default="sea_surface_temperature")
    parser.add_argument("--ocean-mask-source")
    parser.add_argument("--lat-dim", default="lat")
    parser.add_argument("--lon-dim", default="lon")
    parser.add_argument("--ocean-mask-var", default="ocean_fraction")
    parser.add_argument("--ocean-mask-lat-dim", default="grid_yt")
    parser.add_argument("--ocean-mask-lon-dim", default="grid_xt")
    parser.add_argument("--start-time")
    parser.add_argument("--stop-time")
    parser.add_argument("--detrend", action="store_true")
    parser.add_argument("--output-file", default="./index.py")
    args = parser.parse_args(argv)
    labels, values = compute_enso_index(
        args.sst_dataset, sst_var=args.sst_var,
        ocean_mask_source=args.ocean_mask_source,
        ocean_mask_var=args.ocean_mask_var,
        lat_dim=args.lat_dim, lon_dim=args.lon_dim,
        mask_lat_dim=args.ocean_mask_lat_dim,
        mask_lon_dim=args.ocean_mask_lon_dim,
        start_time=args.start_time, stop_time=args.stop_time,
        do_detrend=args.detrend,
    )
    write_index_file(args.output_file, labels, values)


if __name__ == "__main__":
    main()
