"""UFS-replay -> ocean/ice training dataset ingestion.

Native equivalent of the reference's Dataflow pipeline
(/root/reference/scripts/ufs-replay/pipeline/ufs-replay-pipeline.py):
reads UFS GEFSv13-replay-format zarrs (MOM6 ocean at 6-hourly, FV3
atmosphere at 3-hourly), thickness-weights the 75 native ocean levels
onto coarse layers at native horizontal resolution, conservatively
regrids to a Gaussian F-grid with adaptive masking, derives the
ocean-emulator variable set (sst/ssu/ssv/wfo/hfds/stresses, sea-ice
volume), applies per-level land masks and a nearest-neighbour coastal
fill, and writes one training zarr with the DepthCoordinate invariants
(idepth_N/mask_N/deptho) the ocean loaders expect.

CLI:
    python -m ace_tpu.data_process.ufs_replay --yaml cfg.yaml [--debug]
"""

import argparse
import dataclasses
import logging
from typing import Mapping, Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord, parse_datetime_string
from ace_tpu.data_process.era5_ingest import _Regridder

logger = logging.getLogger(__name__)

OCEAN_TIME_STEP = 6
ATMO_TIME_STEP = 3

VARS_3D = ("thetao", "so", "uo", "vo")
OCEAN_RENAME = {"temp": "thetao", "SSH": "zos"}
STRESS_RENAME = {
    "taux": "eastward_surface_wind_stress",
    "tauy": "northward_surface_wind_stress",
}
ATMO_FORCING_VARS = {
    "dlwrf_ave": "DLWRFsfc", "dswrf_ave": "DSWRFsfc",
    "ulwrf_ave": "ULWRFsfc", "uswrf_ave": "USWRFsfc",
    "lhtfl_ave": "LHTFLsfc", "shtfl_ave": "SHTFLsfc",
    "prateb_ave": "PRATEsfc",
}
FROZEN_PRECIP_ACCUM_VARS = ("frozrb", "tsnowpb")
ICE_VARS = {"icec": "ocean_sea_ice_fraction", "icetk": "HI"}
WFO_COMPONENTS = ("evap", "lprec", "fprec", "lrunoff")
HFDS_COMPONENTS = ("SW", "LW", "latent", "sensible", "Heat_PmE")

# 75 MOM6 levels -> 19 coarse layers (reference :94)
DEFAULT_VERTICAL_COARSENING_INDICES = [
    [0, 3], [3, 8], [8, 13], [13, 17], [17, 20], [20, 25], [25, 29],
    [29, 33], [33, 37], [37, 41], [41, 44], [44, 47], [47, 50],
    [50, 53], [53, 56], [56, 60], [60, 64], [64, 68], [68, 72],
]


# ---------------------------------------------------------------------
# ocean math (reference :256-352)
# ---------------------------------------------------------------------

def ocean_weighted_mean(var, weights, axis=0):
    """Thickness-weighted mean over ``axis``; NaN cells contribute
    nothing and all-NaN columns stay NaN (reference :256)."""
    var = np.asarray(var, np.float64)
    w = np.where(np.isnan(var), 0.0, np.asarray(weights, np.float64))
    num = (np.nan_to_num(var) * w).sum(axis=axis)
    den = w.sum(axis=axis)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / np.where(den > 0, den, np.nan)
    return out


def vertical_coarsen_ocean(var, ho, index_pairs):
    """[L, H, W] -> list of [H, W] thickness-weighted layers."""
    return [
        ocean_weighted_mean(var[s:e], ho[s:e], axis=0)
        for s, e in index_pairs
    ]


def build_masks(ref_3d, index_pairs):
    """(mask per coarse level, surface mask) from the NaN pattern of a
    reference 3-D ocean field (1 = ocean; reference :310-352)."""
    valid = (~np.isnan(np.asarray(ref_3d))).astype(np.float32)
    level_masks = {
        f"mask_{i}": valid[s:e].max(axis=0)
        for i, (s, e) in enumerate(index_pairs)
    }
    return level_masks, valid[0]


def compute_nn_fill_indices(sample, ocean_mask):
    """(fill_flat, src_flat) index pairs filling coastal NaN over ocean
    from the nearest valid cell (reference :354)."""
    from scipy.ndimage import distance_transform_edt

    sample = np.asarray(sample)
    need = np.isnan(sample) & (np.asarray(ocean_mask) > 0)
    if not need.any():
        return None
    valid = ~np.isnan(sample)
    _, nn_idx = distance_transform_edt(
        ~valid, return_distances=True, return_indices=True
    )
    shape = sample.shape
    fill_flat = np.ravel_multi_index(np.where(need), shape)
    src_flat = np.ravel_multi_index(
        (nn_idx[0][need], nn_idx[1][need]), shape
    )
    return fill_flat, src_flat


def apply_nn_fill(arr, fill):
    if fill is None:
        return arr
    fill_flat, src_flat = fill
    flat = arr.reshape(arr.shape[0], -1)
    flat[:, fill_flat] = flat[:, src_flat]
    return arr


# ---------------------------------------------------------------------
# streams
# ---------------------------------------------------------------------

def extract_invariants(ocean0: Mapping[str, np.ndarray], depths,
                       index_pairs, regrid):
    """Invariant fields from one native ocean timestep (reference :866):
    idepth scalars, fractional sea/land fraction from the regridded
    native binary mask, per-level binary masks from the regridded NaN
    pattern, deptho."""
    scalars = {"idepth_0": 0.0}
    for i, (s, e) in enumerate(index_pairs):
        scalars[f"idepth_{i + 1}"] = float(np.asarray(depths)[e - 1])

    ref = ocean0.get("thetao", ocean0.get("so"))
    if ref is None:
        raise ValueError("need thetao or so to build ocean masks")
    native_mask = (~np.isnan(np.asarray(ref[0]))).astype(np.float64)
    sea_fraction = np.clip(regrid(native_mask), 0.0, 1.0)
    fields = {
        "sea_surface_fraction": sea_fraction,
        "land_fraction": (1.0 - sea_fraction).astype(np.float32),
    }
    ref_reg = regrid(np.asarray(ref, np.float64), skipna=True,
                     na_thres=1.0)
    level_masks, mask_2d = build_masks(ref_reg, index_pairs)
    fields.update(level_masks)
    fields["mask_2d"] = mask_2d
    if "deptho" in ocean0:
        fields["deptho"] = regrid(
            np.asarray(ocean0["deptho"], np.float64), skipna=True,
            na_thres=1.0,
        )
    return scalars, fields


def process_ocean_step(arrays: Mapping[str, np.ndarray], index_pairs,
                       regrid, invariants, nn_fill):
    """One native 6-hourly ocean step: 3-D fields [L, H, W], 2-D fields
    [H, W] (already renamed) -> regridded/derived dict (reference
    :576)."""
    if "ho" not in arrays:
        raise ValueError("'ho' is required for thickness-weighted "
                         "coarsening")
    ho = np.asarray(arrays["ho"], np.float64)
    out = {}
    for name in VARS_3D:
        if name not in arrays:
            continue
        for i, layer in enumerate(
            vertical_coarsen_ocean(arrays[name], ho, index_pairs)
        ):
            out[f"{name}_{i}"] = layer
    for name, val in arrays.items():
        if name in VARS_3D or name == "ho":
            continue
        out[name] = np.asarray(val, np.float64)
    out = {k: regrid(v, skipna=True, na_thres=1.0)
           for k, v in out.items()}

    if "thetao_0" in out:
        out["sst"] = out["thetao_0"] + 273.15
    if "uo_0" in out:
        out["ssu"] = out["uo_0"]
    if "vo_0" in out:
        out["ssv"] = out["vo_0"]
    if "eastward_surface_wind_stress" in out:
        out["tauuo"] = out["eastward_surface_wind_stress"]
    if "northward_surface_wind_stress" in out:
        out["tauvo"] = out["northward_surface_wind_stress"]
    if all(v in out for v in WFO_COMPONENTS):
        out["wfo"] = sum(out[c] for c in WFO_COMPONENTS)
    if all(v in out for v in HFDS_COMPONENTS):
        out["hfds"] = sum(out[c] for c in HFDS_COMPONENTS)
    for c in WFO_COMPONENTS + HFDS_COMPONENTS:
        out.pop(c, None)

    # NaN on land: per-level mask for coarsened fields, surface mask
    # for the rest (reference :676)
    for name, val in out.items():
        level = name.rsplit("_", 1)[-1]
        mask = invariants.get(
            f"mask_{level}" if level.isdigit() else "mask_2d",
            invariants["mask_2d"],
        )
        out[name] = np.where(mask > 0, val, np.nan)
    if "hfds" in out:
        out["hfds_total_area"] = (
            out["hfds"] * invariants["sea_surface_fraction"]
        )
    if nn_fill:
        level_prefixes = tuple(f"{v}_" for v in VARS_3D)
        for name in out:
            if name.startswith(level_prefixes):
                continue  # sub-seafloor NaN is legitimate
            if name in nn_fill:
                out[name] = apply_nn_fill(
                    out[name][None], nn_fill[name]
                )[0]
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def process_atmo_window(arrays: Mapping[str, np.ndarray], regrid,
                        invariants, nn_fill):
    """One PAIR of 3-hourly atmosphere steps [2, H, W] -> one 6-hourly
    output step (reference :750): bucket-accum frozen precip -> rate,
    pair average, regrid, rename, ice masking."""
    a = {k: np.asarray(v, np.float64) for k, v in arrays.items()}
    accum = [v for v in FROZEN_PRECIP_ACCUM_VARS if v in a]
    if accum:
        dt = ATMO_TIME_STEP * 3600.0
        rate = np.clip(sum(a.pop(v) for v in accum) / dt, 0.0, None)
        a["total_frozen_precipitation_rate"] = rate
    mean = {k: v.mean(axis=0) for k, v in a.items()}
    reg = {k: regrid(v, skipna=True, na_thres=1.0)
           for k, v in mean.items()}
    rename = {**ATMO_FORCING_VARS, **ICE_VARS}
    out = {rename.get(k, k): v for k, v in reg.items()}
    mask = invariants["mask_2d"]
    # sea-ice fields are ocean-only; atmosphere forcings stay global
    if "ocean_sea_ice_fraction" in out:
        out["ocean_sea_ice_fraction"] = np.where(
            mask > 0, out["ocean_sea_ice_fraction"], np.nan
        )
    if "HI" in out:
        hi = np.where(mask > 0, out["HI"], np.nan)
        if "ocean_sea_ice_fraction" in out:
            hi = np.where(
                out["ocean_sea_ice_fraction"] > 0, hi, 0.0
            )
        hi = np.where(mask > 0, hi, np.nan)
        out["HI"] = hi
        out["sea_ice_volume"] = hi
    if nn_fill:
        for name in out:
            if name in nn_fill:
                out[name] = apply_nn_fill(
                    out[name][None], nn_fill[name]
                )[0]
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


# ---------------------------------------------------------------------
# CLI driver
# ---------------------------------------------------------------------

@dataclasses.dataclass
class UfsReplayConfig:
    ocean_path: str
    atmo_path: Optional[str]
    output_path: str
    start_time: str
    end_time: str
    output_grid: str = "F90"
    vertical_coarsening_indices: Sequence[Sequence[int]] = (
        dataclasses.field(
            default_factory=lambda: [
                list(p) for p in DEFAULT_VERTICAL_COARSENING_INDICES
            ]
        )
    )
    time_dim: str = "time"
    vdim: str = "z_l"
    nn_fill: bool = True
    output_time_chunk: int = 20

    @classmethod
    def from_file(cls, path: str) -> "UfsReplayConfig":
        import yaml

        with open(path) as f:
            return from_dict(cls, yaml.safe_load(f))


# variables the ocean stream consumes, post-rename (reference
# OCEAN_LOAD_VARS, :150); anything else in the store is skipped with a
# warning rather than crashing mid-ingest or silently mis-shaping
_OCEAN_EXPECTED = (
    set(VARS_3D) | {"ho", "zos"} | set(STRESS_RENAME.values())
    | set(WFO_COMPONENTS) | set(HFDS_COMPONENTS)
)
_WARNED_SKIPS: set = set()


def _read_ocean_step(ds, idx, config):
    """Read + rename one native timestep's expected ocean variables."""
    out = {}
    for name in ds.keys():
        if name in (config.time_dim, "latitude", "longitude", "lat",
                    "lon", config.vdim, "deptho"):
            continue
        var = ds[name]
        renamed = OCEAN_RENAME.get(name, STRESS_RENAME.get(name, name))
        if renamed not in _OCEAN_EXPECTED:
            if name not in _WARNED_SKIPS:
                _WARNED_SKIPS.add(name)
                logger.warning(
                    "skipping unexpected ocean variable %r", name
                )
            continue
        if (var.dims and var.dims[0] == config.time_dim
                and len(var.dims) >= 3):
            out[renamed] = var.read((np.asarray([idx]),))[0]
    return out


def run(config: UfsReplayConfig, debug: bool = False) -> None:
    pairs = [tuple(p) for p in config.vertical_coarsening_indices]
    ocean = open_file_dataset(config.ocean_path)
    otime = ocean.read_time(config.time_dim)
    cal = otime.calendar
    start = parse_datetime_string(config.start_time, cal)
    end = parse_datetime_string(config.end_time, cal)
    sel = np.nonzero((otime.values >= start) & (otime.values <= end))[0]
    if sel.size == 0:
        raise ValueError("no ocean times in range")
    lat_name = "lat" if "lat" in ocean.keys() else "latitude"
    lon_name = "lon" if "lon" in ocean.keys() else "longitude"
    lat_in = ocean[lat_name].read(())
    lon_in = ocean[lon_name].read(())
    if lat_in.ndim != 1 or lon_in.ndim != 1:
        raise NotImplementedError(
            "the ocean store has 2-D (curvilinear/tripolar) "
            "coordinates; the conservative regridder is rectilinear — "
            "regrid the native MOM6 output to a regular lat-lon grid "
            "first (the reference's source stores are 0.25-degree "
            "rectilinear)"
        )
    regrid = _Regridder(lat_in, lon_in, config.output_grid)
    ny, nx = len(regrid.lat_out), len(regrid.lon_out)
    depths = ocean[config.vdim].read(())
    logger.info("%d ocean steps -> %s (%dx%d), %d coarse levels",
                sel.size, config.output_grid, ny, nx, len(pairs))
    if debug:
        ocean.close()
        return

    step0 = _read_ocean_step(ocean, sel[0], config)
    if "deptho" in ocean.keys():
        step0["deptho"] = ocean["deptho"].read(())
    scalars, invariants = extract_invariants(
        step0, depths, pairs, regrid
    )

    out_time = TimeCoord(otime.values[sel], cal)
    n_time = sel.size
    arrays: dict[str, np.ndarray] = {}
    dims: dict[str, tuple] = {}
    for name, val in scalars.items():
        arrays[name] = np.float64(val)
        dims[name] = ()
    for name, val in invariants.items():
        arrays[name] = np.asarray(val, np.float32)
        dims[name] = ("lat", "lon")

    nn_fill_ocean: dict = {}
    for k in range(n_time):
        step = _read_ocean_step(ocean, sel[k], config)
        step.pop("deptho", None)
        res = process_ocean_step(
            step, pairs, regrid, invariants,
            nn_fill_ocean if config.nn_fill else None,
        )
        if k == 0 and config.nn_fill:
            level_prefixes = tuple(f"{v}_" for v in VARS_3D)
            for name, val in res.items():
                if name.startswith(level_prefixes):
                    continue
                fill = compute_nn_fill_indices(
                    val, invariants["mask_2d"]
                )
                if fill is not None:
                    nn_fill_ocean[name] = fill
            # re-run step 0 with the fill pattern applied
            res = process_ocean_step(
                step, pairs, regrid, invariants, nn_fill_ocean
            )
        for name, val in res.items():
            if name not in arrays:
                arrays[name] = np.zeros((n_time, ny, nx), np.float32)
                dims[name] = (config.time_dim, "lat", "lon")
            arrays[name][k] = val
        logger.info("ocean %d/%d", k + 1, n_time)
    ocean.close()

    if config.atmo_path is not None:
        atmo = open_file_dataset(config.atmo_path)
        atime = atmo.read_time(config.time_dim)
        atmo_names = [
            n for n in atmo.keys()
            if n != config.time_dim
            and atmo[n].dims and atmo[n].dims[0] == config.time_dim
            and len(atmo[n].dims) >= 3
        ]
        nn_fill_atmo: dict = {}
        for k in range(n_time):
            t_target = otime.values[sel[k]]
            win = np.nonzero(
                (atime.values > t_target - OCEAN_TIME_STEP * 3600 * 10**6)
                & (atime.values <= t_target)
            )[0]
            if win.size != OCEAN_TIME_STEP // ATMO_TIME_STEP:
                raise ValueError(
                    f"atmosphere window for ocean step {k} has "
                    f"{win.size} 3-hourly samples, need "
                    f"{OCEAN_TIME_STEP // ATMO_TIME_STEP} — the atmo "
                    "store must cover every ocean output time"
                )
            block = {n: atmo[n].read((win,)) for n in atmo_names}
            res = process_atmo_window(
                block, regrid, invariants,
                nn_fill_atmo if config.nn_fill else None,
            )
            if k == 0 and config.nn_fill:
                for name, val in res.items():
                    fill = compute_nn_fill_indices(
                        val, invariants["mask_2d"]
                    )
                    if fill is not None:
                        nn_fill_atmo[name] = fill
                res = process_atmo_window(
                    block, regrid, invariants, nn_fill_atmo
                )
            for name, val in res.items():
                if name not in arrays:
                    arrays[name] = np.zeros(
                        (n_time, ny, nx), np.float32
                    )
                    dims[name] = (config.time_dim, "lat", "lon")
                arrays[name][k] = val
            logger.info("atmo %d/%d", k + 1, n_time)
        atmo.close()

    coords = {"lat": regrid.lat_out, "lon": regrid.lon_out}
    tchunk = min(config.output_time_chunk, n_time)
    chunks = {
        n: [tchunk] + list(arrays[n].shape[1:])
        for n, d in dims.items() if d and d[0] == config.time_dim
    }
    write_zarr(config.output_path, arrays, dims, coords=coords,
               time=out_time, chunks=chunks)
    logger.info("wrote %s (%d vars, %d steps)", config.output_path,
                len(arrays), n_time)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="UFS-replay -> ocean training dataset ingestion."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run(UfsReplayConfig.from_file(args.yaml), debug=args.debug)


if __name__ == "__main__":
    main()
