"""Compute a HEALPix (DLWP-style) training dataset from lat-lon data.

Reference: scripts/data_process/compute_hpx_dataset.py (earth2grid
bilinear regridding + fixed corner-NaN fill table + xpartition writes).
Here: HEALPix pixel centers come from this repo's analytic ring
decomposition (ops/hpx.py, validated against the earth2grid reorder
tables), the bilinear regridder is a host-side numpy gather with
periodic longitude, NaN fill is a dynamic within-face neighbor-mean
sweep (generalizing the reference's hard-coded level-6 index table),
and output streams through the chunked zarr writer.

CLI:
    python -m ace_tpu.data_process.compute_hpx_dataset --config cfg.yaml \
        --run-directory RUN --output-store out.zarr [--level 6] \
        [--debug] [--subsample]
"""

import argparse
import logging
import os
from typing import Optional, Sequence

import numpy as np

from ace_tpu.data.store import open_file_dataset
from ace_tpu.data_process.compute_dataset import (
    DatasetComputationConfig,
    DatasetConfig,
    ZarrRegionWriter,
)
from ace_tpu.ops.hpx import ring_decomposition, xy_to_ring_indices

logger = logging.getLogger(__name__)


def healpix_latlon_xy(nside: int) -> tuple:
    """Pixel-center (lat, lon) in degrees, flat-XY order [12, n, n]
    (matches earth2grid.healpix.Grid(..., HEALPIX_PAD_XY).lat/lon)."""
    nphi, start, theta, phi0 = ring_decomposition(nside)
    npix = 12 * nside * nside
    lat_ring = np.empty(npix)
    lon_ring = np.empty(npix)
    for t in range(len(nphi)):
        n, s = int(nphi[t]), int(start[t])
        lat_ring[s:s + n] = 90.0 - np.rad2deg(theta[t])
        lon_ring[s:s + n] = np.rad2deg(
            phi0[t] + 2.0 * np.pi * np.arange(n) / n
        ) % 360.0
    # x_ring = x_xy[xy_to_ring]  =>  x_xy[xy_to_ring] = x_ring
    xy2ring = xy_to_ring_indices(nside)
    lat_xy = np.empty(npix)
    lon_xy = np.empty(npix)
    lat_xy[xy2ring] = lat_ring
    lon_xy[xy2ring] = lon_ring
    return (
        lat_xy.reshape(12, nside, nside),
        lon_xy.reshape(12, nside, nside),
    )


class BilinearRegridder:
    """Bilinear interpolation from a (lat, lon) grid to scattered points,
    with periodic longitude; points poleward of the first/last latitude
    row are NaN (the behavior the reference gets from
    earth2grid.get_regridder)."""

    def __init__(self, src_lat, src_lon, tgt_lat, tgt_lon):
        src_lat = np.asarray(src_lat, np.float64)
        src_lon = np.asarray(src_lon, np.float64) % 360.0
        self._flip = src_lat[0] > src_lat[-1]
        lat = src_lat[::-1] if self._flip else src_lat
        if np.any(np.diff(lat) <= 0):
            raise ValueError("source latitudes must be monotonic")
        if np.any(np.diff(src_lon) <= 0):
            raise ValueError("source longitudes must be ascending")
        ny, nx = len(lat), len(src_lon)
        t_lat = np.asarray(tgt_lat, np.float64).ravel()
        t_lon = np.asarray(tgt_lon, np.float64).ravel() % 360.0

        iy = np.searchsorted(lat, t_lat) - 1
        self._oob = (t_lat < lat[0]) | (t_lat > lat[-1])
        iy = np.clip(iy, 0, ny - 2)
        wy = (t_lat - lat[iy]) / (lat[iy + 1] - lat[iy])
        self._iy0, self._iy1 = iy, iy + 1
        self._wy = np.clip(wy, 0.0, 1.0)

        # periodic longitude cell search: append the wrapped first node
        lon_ext = np.concatenate([src_lon, [src_lon[0] + 360.0]])
        t_lon_adj = np.where(t_lon < src_lon[0], t_lon + 360.0, t_lon)
        ix = np.searchsorted(lon_ext, t_lon_adj) - 1
        ix = np.clip(ix, 0, nx - 1)
        denom = lon_ext[ix + 1] - lon_ext[ix]
        self._wx = (t_lon_adj - lon_ext[ix]) / denom
        self._ix0 = ix % nx
        self._ix1 = (ix + 1) % nx
        self._shape = None

    def __call__(self, field: np.ndarray) -> np.ndarray:
        """field [..., Y, X] -> [..., n_points] (with NaN out of range)."""
        if self._flip:
            field = field[..., ::-1, :]
        f00 = field[..., self._iy0, self._ix0]
        f01 = field[..., self._iy0, self._ix1]
        f10 = field[..., self._iy1, self._ix0]
        f11 = field[..., self._iy1, self._ix1]
        wx, wy = self._wx, self._wy
        out = (
            f00 * (1 - wy) * (1 - wx)
            + f01 * (1 - wy) * wx
            + f10 * wy * (1 - wx)
            + f11 * wy * wx
        )
        out[..., self._oob] = np.nan
        return out


def fill_nans_with_neighbors(arr: np.ndarray, max_sweeps: int = 8):
    """Replace NaNs with the mean of their in-face 4-neighbors, sweeping
    until none remain (reference compute_hpx_dataset.py:120-139 uses a
    hard-coded index table for level 6; this generalizes it)."""
    out = arr.copy()
    for _ in range(max_sweeps):
        nan_mask = np.isnan(out)
        if not nan_mask.any():
            return out
        padded = np.pad(
            out, [(0, 0)] * (out.ndim - 2) + [(1, 1), (1, 1)],
            constant_values=np.nan,
        )
        stacked = np.stack([
            padded[..., :-2, 1:-1], padded[..., 2:, 1:-1],
            padded[..., 1:-1, :-2], padded[..., 1:-1, 2:],
        ])
        with np.errstate(invalid="ignore"):
            neigh = np.nanmean(stacked, axis=0)
        out = np.where(nan_mask, neigh, out)
    if np.isnan(out).any():
        raise ValueError("NaN regions too large to neighbor-fill")
    return out


def run(
    config: DatasetComputationConfig,
    run_directory: str,
    output_store: str,
    level: int = 6,
    subsample: bool = False,
    debug: bool = False,
    lat_dim: Optional[str] = None,
    lon_dim: Optional[str] = None,
    regrid_exclude: Sequence[str] = (),
) -> None:
    names = config.standard_names
    lat_dim = lat_dim or names.latitude_dim
    lon_dim = lon_dim or names.longitude_dim
    nside = 2**level

    stores = {
        s: open_file_dataset(os.path.join(run_directory, s))
        for s in config.variable_sources
    }
    var_to_store = {}
    for s, vnames in config.variable_sources.items():
        for v in vnames:
            if v not in (lat_dim, lon_dim, names.time_dim):
                var_to_store[v] = stores[s]
    first = next(iter(stores.values()))
    time = first.read_time(names.time_dim)
    t_offset, n_times = 0, len(time)
    if subsample:
        t_offset = min(10, max(0, n_times - 2))
        n_times = min(3, n_times - t_offset)
    time = time[t_offset:t_offset + n_times]

    src_lat = first[lat_dim].read(())
    src_lon = first[lon_dim].read(())
    hpx_lat, hpx_lon = healpix_latlon_xy(nside)
    regrid = BilinearRegridder(src_lat, src_lon, hpx_lat, hpx_lon)

    if debug:
        for v, store in var_to_store.items():
            logger.info("%s: %s -> (time, 12, %d, %d)", v,
                        store[v].shape, nside, nside)
        return

    from ace_tpu.data.store import encode_cf_time

    writer = ZarrRegionWriter(output_store, attrs={
        "history": (
            "Dataset computed by ace_tpu.data_process.compute_hpx_dataset "
            f"from run directory {run_directory} at HEALPix level {level}."
        ),
    })
    tvals, tunits, tcal = encode_cf_time(time)
    t_chunk = getattr(config.chunking, "time_dim", 1)
    dims4 = ("time", "face", "height", "width")
    writer.create("time", (n_times,), tvals.dtype, ("time",),
                  chunks=[t_chunk],
                  attrs={"units": tunits, "calendar": tcal})
    writer.write("time", tvals)
    for cname, cvals in [("face", np.arange(12)),
                         ("height", np.arange(nside)),
                         ("width", np.arange(nside))]:
        writer.create(cname, cvals.shape, cvals.dtype, (cname,))
        writer.write(cname, cvals)
    for cname, cvals in [("lat", hpx_lat), ("lon", hpx_lon)]:
        writer.create(cname, cvals.shape, np.float64, dims4[1:])
        writer.write(cname, cvals)

    dropped = set(names.dropped_variables)
    skipped = sorted(set(var_to_store) & dropped)
    if skipped:
        # matches the reference CLI, which drops dropped_variables from
        # the regridded output (compute_hpx_dataset.py:301-302)
        logger.info("dropping %s (standard_names.dropped_variables)",
                    skipped)
    out_names = {}
    hpx_shape = (12, nside, nside)
    for v in var_to_store:
        if v in dropped:
            continue
        out_names[v] = config.renaming.get(v, v)
        var = var_to_store[v][v]
        time_dep = var.dims and var.dims[0] == names.time_dim
        # middle dims (e.g. a vertical level axis) carry through:
        # [T, Z, Y, X] -> [T, Z, face, height, width]
        mid = var.shape[1:-2] if time_dep else var.shape[:-2]
        mid_dims = (var.dims[1:-2] if time_dep else var.dims[:-2])
        shape = ((n_times,) if time_dep else ()) + mid + hpx_shape
        dims = (("time",) if time_dep else ()) + mid_dims + dims4[1:]
        chunks = (
            [t_chunk] + list(mid) + list(hpx_shape) if time_dep else None
        )
        writer.create(out_names[v], shape, np.float32, dims,
                      chunks=chunks, attrs=dict(var.attrs))

    slab = max(1, int(np.ceil(n_times / max(1, config.n_split))))
    for v, store in var_to_store.items():
        if v in dropped:
            continue
        var = store[v]
        if not (var.dims and var.dims[0] == names.time_dim):
            arr = regrid(var.read(()).astype(np.float64))
            arr = fill_nans_with_neighbors(
                arr.reshape(var.shape[:-2] + hpx_shape)
            )
            writer.write(out_names[v], arr.astype(np.float32))
            continue
        for start in range(0, n_times, slab):
            stop = min(n_times, start + slab)
            raw = var.read(
                (slice(t_offset + start, t_offset + stop),)
            ).astype(np.float64)
            arr = regrid(raw).reshape(raw.shape[:-2] + hpx_shape)
            arr = fill_nans_with_neighbors(arr)
            writer.write(
                out_names[v], arr.astype(np.float32), t0=start
            )
        logger.info("regridded %s", v)
    for store in stores.values():
        store.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Regrid a lat-lon dataset to a HEALPix training "
        "dataset."
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--run-directory", required=True)
    parser.add_argument("--output-store", required=True)
    parser.add_argument("--level", type=int, default=6)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--subsample", action="store_true")
    parser.add_argument("--lat-dim")
    parser.add_argument("--lon-dim")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = DatasetConfig.from_file(args.config).dataset_computation
    run(
        config, args.run_directory, args.output_store,
        level=args.level, subsample=args.subsample, debug=args.debug,
        lat_dim=args.lat_dim, lon_dim=args.lon_dim,
    )


if __name__ == "__main__":
    main()
