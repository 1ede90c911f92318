"""AIMIP forcing-dataset creation tools.

TPU-native equivalents of the reference's scripts/aimip_forcing/ tree
(regrid_aimip_forcing.py, interpolate_aimip_forcing.py,
prepend_first_timestep_forcing.py, create_aimip_ic_datasets.py):

- ``regrid``: conservative regrid of monthly AIMIP SST / sea-ice /
  land fractions onto the ACE2 target grid, with the reference's
  ocean-fraction derivation and adaptive land-mask SST regrid
  (reference regrid_aimip_forcing.py:16-21,92-133). Uses the native
  ConservativeRegridder instead of xesmf.
- ``interpolate``: linear time interpolation of the monthly forcing to
  a 6-hourly coordinate extending an existing ERA5 forcing store, with
  SST masked to the static ocean mask and insolation (DSWRFtoa)
  repeated from the final source years over the extension period
  (reference interpolate_aimip_forcing.py:46-260).
- ``prepend``: repeat the first forcing timestep under an earlier
  timestamp (reference prepend_first_timestep_forcing.py).
- ``create-ics``: extract IC datasets at chosen timestamps, all
  relabeled to one target timestamp (reference
  create_aimip_ic_datasets.py).

CLI:
    python -m ace_tpu.data_process.aimip_forcing <subcommand> --yaml cfg.yaml
"""

import argparse
import dataclasses
import logging
import os
from typing import List, Optional

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import encode_cf_time, open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord, parse_datetime_string
from ace_tpu.data_process.compute_dataset import ZarrRegionWriter
from ace_tpu.ops.conservative_regrid import ConservativeRegridder

logger = logging.getLogger(__name__)

MICROS_PER_SECOND = 1_000_000


def derive_ocean_fraction(land_fraction: np.ndarray,
                          sea_ice_fraction: np.ndarray):
    """ocean = 1 - land - ice, clipped at zero with the deficit folded
    back into the sea-ice fraction (reference
    regrid_aimip_forcing.py:16-21)."""
    ocean = 1.0 - land_fraction - sea_ice_fraction
    negative = np.where(ocean < 0, ocean, 0.0)
    return np.where(ocean > 0, ocean, 0.0), sea_ice_fraction + negative


def _read_all(ds, name):
    return np.asarray(ds[name].read(()))


def _grid_coords(ds):
    for lat_name in ("latitude", "lat", "grid_yt"):
        if lat_name in ds.keys():
            break
    else:
        raise ValueError("no latitude coordinate found")
    for lon_name in ("longitude", "lon", "grid_xt"):
        if lon_name in ds.keys():
            break
    else:
        raise ValueError("no longitude coordinate found")
    return (np.asarray(ds[lat_name].read(())),
            np.asarray(ds[lon_name].read(())), lat_name, lon_name)


@dataclasses.dataclass
class AimipRegridConfig:
    """Conservative regrid of AIMIP monthly forcing to the target grid.

    ``target_path`` names any dataset carrying the destination
    latitude/longitude coordinates (the reference reads them from the
    ACE2-ERA5 zarr, regrid_aimip_forcing.py:108-115).
    """

    input_path: str
    output_path: str
    target_path: str
    land_threshold: float = 1.0
    sst_name: str = "sea_surface_temperature"
    sea_ice_name: str = "sea_ice_cover"
    land_name: str = "land_sea_mask"


def regrid_aimip_forcing(config: AimipRegridConfig) -> str:
    src = open_file_dataset(config.input_path)
    tgt = open_file_dataset(config.target_path)
    lat_in, lon_in, _, _ = _grid_coords(src)
    lat_out, lon_out, _, _ = _grid_coords(tgt)
    tgt.close()
    regrid = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)

    time = src.read_time()
    land = _read_all(src, config.land_name)
    # sea ice has NaNs over land: fill with 0 (reference :92-95)
    ice = np.nan_to_num(_read_all(src, config.sea_ice_name), nan=0.0)
    sst = _read_all(src, config.sst_name)
    ocean, ice = derive_ocean_fraction(land, ice)
    # regrid SST only over ocean points, renormalizing over the valid
    # area so land never dilutes coastal SSTs (reference :129-133)
    mask = land < config.land_threshold
    sst_masked = np.where(mask, sst, np.nan)

    out = {
        "land_fraction": regrid(land),
        "ocean_fraction": regrid(ocean),
        "sea_ice_fraction": regrid(ice),
        "surface_temperature": regrid(
            sst_masked, skipna=True, na_thres=config.land_threshold
        ),
    }
    tdim = ("time", "latitude", "longitude")
    dims = {k: tdim if v.ndim == 3 else ("latitude", "longitude")
            for k, v in out.items()}
    write_h5(
        config.output_path, out, dims,
        coords={"latitude": lat_out.astype(np.float32),
                "longitude": lon_out.astype(np.float32)},
        time=time,
    )
    src.close()
    logger.info("wrote regridded AIMIP forcing to %s", config.output_path)
    return config.output_path


def interp_time(values: np.ndarray, t_src: np.ndarray,
                t_dst: np.ndarray) -> np.ndarray:
    """Linear interpolation along a leading time axis; NaN outside the
    source range (xarray .interp semantics)."""
    t_src = np.asarray(t_src, dtype=np.float64)
    t_dst = np.asarray(t_dst, dtype=np.float64)
    hi = np.searchsorted(t_src, t_dst, side="left")
    inside = (t_dst >= t_src[0]) & (t_dst <= t_src[-1])
    hi = np.clip(hi, 1, len(t_src) - 1)
    lo = hi - 1
    w = (t_dst - t_src[lo]) / (t_src[hi] - t_src[lo])
    w = w.reshape((-1,) + (1,) * (values.ndim - 1))
    out = (1.0 - w) * values[lo] + w * values[hi]
    out[~inside] = np.nan
    return out.astype(values.dtype)


@dataclasses.dataclass
class AimipInterpolateConfig:
    """Monthly AIMIP forcing -> 6-hourly forcing zarr.

    The output time axis runs ``start_time..end_time`` at
    ``timestep_seconds``. Over [start_time, extension_start) the
    insolation comes straight from ``era5_forcing_path``; from
    ``extension_start`` on it repeats the ERA5 window
    [repeat_source_start, repeat_source_end] (reference
    interpolate_aimip_forcing.py:133-160,240-255).
    """

    input_path: str
    era5_forcing_path: str
    output_path: str
    start_time: str = "1978-10-01T00:00:00"
    end_time: str = "2024-12-31T18:00:00"
    extension_start: str = "2023-01-01T00:00:00"
    repeat_source_start: str = "2020-12-31T00:00:00"
    repeat_source_end: str = "2022-12-31T18:00:00"
    timestep_seconds: int = 21600
    monthly_variables: List[str] = dataclasses.field(
        default_factory=lambda: [
            "sea_ice_fraction", "land_fraction", "ocean_fraction",
            "surface_temperature",
        ]
    )
    era5_variables: List[str] = dataclasses.field(
        default_factory=lambda: ["HGTsfc", "DSWRFtoa"]
    )
    insolation_name: str = "DSWRFtoa"
    time_chunk: int = 1460


def _var_attrs(var) -> dict:
    """JSON-safe copy of a source variable's attrs (units, long_name, …)."""
    return {
        k: (v.tolist() if isinstance(v, np.ndarray) else v)
        for k, v in var.attrs.items()
        if k != "_ARRAY_DIMENSIONS"
    }


def interpolate_aimip_forcing(config: AimipInterpolateConfig) -> str:
    """Streamed per-variable, per-time-slab: at production scale the
    6-hourly output is ~17 GB per float32 variable, so nothing larger
    than one (time_chunk, lat, lon) slab is ever held in memory — the
    reference writes one variable at a time for the same reason
    (interpolate_aimip_forcing.py:46-260)."""
    monthly = open_file_dataset(config.input_path)
    era5 = open_file_dataset(config.era5_forcing_path)
    m_time = monthly.read_time()
    e_time = era5.read_time()
    cal = e_time.calendar

    t0 = parse_datetime_string(config.start_time, cal)
    t1 = parse_datetime_string(config.end_time, cal)
    step = config.timestep_seconds * MICROS_PER_SECOND
    out_vals = np.arange(t0, t1 + 1, step, dtype=np.int64)
    out_time = TimeCoord(out_vals, cal)
    n_out = len(out_vals)

    lat, lon, _, _ = _grid_coords(monthly)
    e_lat, e_lon, _, _ = _grid_coords(era5)
    if not (lat.shape == e_lat.shape and lon.shape == e_lon.shape
            and np.allclose(lat, e_lat) and np.allclose(lon, e_lon)):
        raise ValueError(
            "ERA5 forcing grid does not match the regridded monthly grid: "
            f"monthly ({len(lat)}, {len(lon)}) vs "
            f"ERA5 ({len(e_lat)}, {len(e_lon)})"
        )
    nlat, nlon = len(lat), len(lon)
    tchunk = min(config.time_chunk, n_out)
    spatial_dims = ("time", "latitude", "longitude")

    writer = ZarrRegionWriter(config.output_path)
    cf_vals, cf_units, cf_cal = encode_cf_time(out_time)
    writer.create("time", (n_out,), cf_vals.dtype, ("time",),
                  attrs={"units": cf_units, "calendar": cf_cal})
    writer.write("time", cf_vals)
    for cname, cvals in (("latitude", lat), ("longitude", lon)):
        cvals = cvals.astype(np.float32)
        writer.create(cname, cvals.shape, cvals.dtype, (cname,))
        writer.write(cname, cvals)

    # SST mask: ocean points are those with any valid SST in the
    # monthly record; land is filled with -999 before interpolation so
    # coastal interpolation never mixes NaN (reference :46-63,215-224)
    sst = _read_all(monthly, "surface_temperature")
    sst_mask = np.isfinite(sst).sum(axis=0) > 0

    # monthly variables: source stays at monthly resolution (small);
    # only one interpolated output slab exists at a time
    for v in config.monthly_variables:
        var = monthly[v]
        vals = _read_all(monthly, v)
        if v == "surface_temperature" and vals.ndim == 3:
            vals = np.nan_to_num(vals, nan=-999.0)
        writer.create(v, (n_out, nlat, nlon), np.float32, spatial_dims,
                      chunks=[tchunk, nlat, nlon], attrs=_var_attrs(var))
        for s0 in range(0, n_out, tchunk):
            s1 = min(s0 + tchunk, n_out)
            if vals.ndim == 2:  # static field: broadcast over time
                slab = np.broadcast_to(
                    vals[None], (s1 - s0,) + vals.shape
                ).astype(np.float32)
            else:
                slab = interp_time(vals, m_time.values, out_vals[s0:s1])
                if v == "surface_temperature":
                    slab = np.where(sst_mask[None], slab, np.nan)
            writer.write(v, np.ascontiguousarray(slab, np.float32), t0=s0)

    # existing ERA5 forcing over the pre-extension period + repeated
    # insolation over the extension
    def _contiguous_slice(mask):
        nz = np.nonzero(mask)[0]
        if len(nz) == 0:
            raise ValueError("requested ERA5 time window is empty")
        return slice(int(nz[0]), int(nz[-1]) + 1)

    ext0 = parse_datetime_string(config.extension_start, cal)
    keep = _contiguous_slice((e_time.values >= t0) & (e_time.values < ext0))
    rs0 = parse_datetime_string(config.repeat_source_start, cal)
    rs1 = parse_datetime_string(config.repeat_source_end, cal)
    src_sel = _contiguous_slice(
        (e_time.values >= rs0) & (e_time.values <= rs1)
    )
    n_ext = int((out_vals >= ext0).sum())
    n_base = keep.stop - keep.start
    if n_base + n_ext != n_out:
        raise ValueError(
            f"ERA5 base period ({n_base}) + extension ({n_ext}) does not "
            f"cover the output time axis ({n_out})"
        )
    n_repeat = src_sel.stop - src_sel.start
    for v in config.era5_variables:
        var = era5[v]
        if not (var.dims and var.dims[0] == "time"):
            static = np.asarray(var.read(()))
            writer.create(v, static.shape, static.dtype,
                          ("latitude", "longitude"), attrs=_var_attrs(var))
            writer.write(v, static)
            continue
        if v == config.insolation_name and n_repeat < n_ext:
            raise ValueError(
                "insolation repeat window shorter than extension"
            )
        writer.create(v, (n_out, nlat, nlon), np.float32, spatial_dims,
                      chunks=[tchunk, nlat, nlon], attrs=_var_attrs(var))
        last_base = None
        for s0 in range(0, n_out, tchunk):
            s1 = min(s0 + tchunk, n_out)
            parts = []
            if s0 < n_base:  # base period straight from ERA5
                b1 = min(s1, n_base)
                parts.append(np.asarray(var.read(
                    (slice(keep.start + s0, keep.start + b1),)
                )))
            if s1 > n_base:  # extension period
                e0, e1 = max(s0, n_base) - n_base, s1 - n_base
                if v == config.insolation_name:
                    parts.append(np.asarray(var.read(
                        (slice(src_sel.start + e0, src_sel.start + e1),)
                    )))
                else:
                    # non-repeated vars carry their final value forward
                    if last_base is None:
                        last_base = np.asarray(var.read(
                            (slice(keep.stop - 1, keep.stop),)
                        ))
                    parts.append(np.repeat(last_base, e1 - e0, axis=0))
            slab = parts[0] if len(parts) == 1 else np.concatenate(parts)
            writer.write(v, np.ascontiguousarray(slab, np.float32), t0=s0)

    monthly.close()
    era5.close()
    logger.info("wrote interpolated AIMIP forcing to %s", config.output_path)
    return config.output_path


@dataclasses.dataclass
class PrependFirstTimestepConfig:
    """Repeat the forcing's first step under an earlier timestamp
    (reference prepend_first_timestep_forcing.py:15-17)."""

    input_path: str
    output_path: str
    input_timestamp: str = "1978-10-01T00:00:00"
    output_timestamp: str = "1978-09-30T18:00:00"
    time_chunk: int = 1460


def prepend_first_timestep(config: PrependFirstTimestepConfig) -> str:
    """Streamed per-variable, per-time-slab (a full 6-hourly forcing
    variable is ~17 GB at production scale; see interpolate above)."""
    ds = open_file_dataset(config.input_path)
    time = ds.read_time()
    src_us = parse_datetime_string(config.input_timestamp, time.calendar)
    idx = int(np.searchsorted(time.values, src_us))
    if idx >= len(time) or time.values[idx] != src_us:
        raise ValueError(f"{config.input_timestamp} not in dataset")
    new_us = parse_datetime_string(config.output_timestamp, time.calendar)
    if new_us >= time.values[0]:
        raise ValueError("output_timestamp must precede the time axis")
    out_time = TimeCoord(
        np.concatenate([[new_us], time.values]), time.calendar
    )
    n_in = len(time)
    tchunk = min(config.time_chunk, n_in + 1)

    writer = ZarrRegionWriter(config.output_path)
    cf_vals, cf_units, cf_cal = encode_cf_time(out_time)
    writer.create("time", (n_in + 1,), cf_vals.dtype, ("time",),
                  attrs={"units": cf_units, "calendar": cf_cal})
    writer.write("time", cf_vals)
    for v in ds.keys():
        var = ds[v]
        if v == "time":
            continue
        attrs = _var_attrs(var)
        if var.dims == (v,):  # coordinate
            cvals = np.asarray(var.read(()))
            writer.create(v, cvals.shape, cvals.dtype, (v,), attrs=attrs)
            writer.write(v, cvals)
        elif var.dims and var.dims[0] == "time":
            shape = (n_in + 1,) + tuple(var.shape[1:])
            writer.create(v, shape, var.dtype, var.dims,
                          chunks=[tchunk] + list(shape[1:]), attrs=attrs)
            writer.write(v, np.asarray(var.read((slice(idx, idx + 1),))))
            for s0 in range(0, n_in, tchunk):
                s1 = min(s0 + tchunk, n_in)
                slab = np.asarray(var.read((slice(s0, s1),)))
                writer.write(v, slab, t0=s0 + 1)
        else:
            static = np.asarray(var.read(()))
            writer.create(v, static.shape, static.dtype, var.dims,
                          attrs=attrs)
            writer.write(v, static)
    ds.close()
    logger.info("wrote prepended forcing to %s", config.output_path)
    return config.output_path


@dataclasses.dataclass
class CreateAimipICsConfig:
    """Extract IC datasets at several source timestamps, all relabeled
    to one target timestamp (reference create_aimip_ic_datasets.py)."""

    input_path: str
    output_dir: str
    ic_timestamps: List[str]
    target_timestamp: str = "1978-09-30T18:00:00"
    variables: Optional[List[str]] = None


def create_aimip_ics(config: CreateAimipICsConfig) -> List[str]:
    ds = open_file_dataset(config.input_path)
    time = ds.read_time()
    os.makedirs(config.output_dir, exist_ok=True)
    names = config.variables or [
        v for v in ds.keys()
        if v != "time" and ds[v].dims and ds[v].dims[0] == "time"
    ]
    coords = {
        v: np.asarray(ds[v].read(())) for v in ds.keys()
        if v != "time" and ds[v].dims == (v,)
    }
    target_us = parse_datetime_string(
        config.target_timestamp, time.calendar
    )
    target_date = config.target_timestamp.split("T")[0]
    written = []
    for i, stamp in enumerate(config.ic_timestamps):
        us = parse_datetime_string(stamp, time.calendar)
        idx = int(np.searchsorted(time.values, us))
        if idx >= len(time) or time.values[idx] != us:
            raise ValueError(f"timestamp {stamp} not in dataset")
        data = {
            v: np.asarray(ds[v].read((slice(idx, idx + 1),)))
            for v in names
        }
        dims = {v: ds[v].dims for v in names}
        path = os.path.join(config.output_dir, f"{target_date}_IC{i}.nc")
        write_h5(path, data, dims, coords=coords,
                 time=TimeCoord(np.array([target_us]), time.calendar))
        written.append(path)
        logger.info("wrote IC %d (%s) to %s", i, stamp, path)
    ds.close()
    return written


_SUBCOMMANDS = {
    "regrid": (AimipRegridConfig, regrid_aimip_forcing),
    "interpolate": (AimipInterpolateConfig, interpolate_aimip_forcing),
    "prepend": (PrependFirstTimestepConfig, prepend_first_timestep),
    "create-ics": (CreateAimipICsConfig, create_aimip_ics),
}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="AIMIP forcing dataset tools."
    )
    parser.add_argument("subcommand", choices=sorted(_SUBCOMMANDS))
    parser.add_argument("--yaml", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import yaml

    with open(args.yaml) as f:
        raw = yaml.safe_load(f)
    config_cls, fn = _SUBCOMMANDS[args.subcommand]
    fn(from_dict(config_cls, raw))


if __name__ == "__main__":
    main()
