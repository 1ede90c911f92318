"""Compute an ocean/sea-ice training dataset from preprocessed output.

Reference: scripts/data_process/compute_ocean_dataset.py. The
reference's chain is: ocean_emulators CM4 preprocessing -> vector
rotation -> (optional) gcm-filters spatial filter -> xesmf conservative
regrid to the target lat-lon grid -> this script's own post-processing.
The first three stages live in external CUDA/dask packages
(ocean_emulators, gcm-filters, xesmf) and handle the curvilinear
tripolar grid; here the input is expected on a rectilinear grid — use
the optional built-in bilinear regrid for rectilinear sources, or
regrid curvilinear data upstream. Everything downstream of the regrid
is ported one-to-one:

- velocity/stress vector rotation by the local grid angle,
- vertical level splitting to '{name}_{i}' + 'mask_{i}'/'mask_2d',
- interface depths as scalar 'idepth_{i}',
- ice velocities NaN where no modeled sea ice, sea-ice fraction NaN on
  land, thickness zeroed where no ice and converted to ice volume,
- 'sst' in Kelvin from the surface temperature,
- NaNs inserted on the land surface for all non-mask variables,
- optional supplemental coarsened dataset merge, timestamp midpoint
  shift, renaming, and chunked zarr output.

Unlike compute_dataset (which streams time slabs), this pipeline holds
the variables in memory: vector rotation and the per-level mask logic
couple variables across the time axis only elementwise, but the coarsen
merge and midpoint shift are simpler whole-array; size the run (or
pre-slice the inputs in time) accordingly.

CLI:
    python -m ace_tpu.data_process.compute_ocean_dataset --config c.yaml \
        --run-directory RUN --output-store out.zarr [--debug] [--subsample]
"""

import argparse
import dataclasses
import logging
import os
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class OceanStandardNameMapping:
    """(reference compute_ocean_dataset.py:41-103)"""

    longitude_dim: str = "x"
    latitude_dim: str = "y"
    time_dim: str = "time"
    vertical_dim: str = "lev"
    vertical_idim: str = "ilev"
    rotation_angle: str = "angle"
    sea_water_x_velocity: str = "uo"
    sea_water_y_velocity: str = "vo"
    sea_water_salinity: str = "so"
    sea_water_potential_temperature: str = "thetao"
    surface_temperature: str = "tos"
    surface_downward_x_stress: str = "tauuo"
    surface_downward_y_stress: str = "tauvo"
    sea_ice_x_velocity: str = "UI"
    sea_ice_y_velocity: str = "VI"
    sea_ice_modeled: str = "EXT"
    sea_ice_fraction: str = "sea_ice_fraction"
    sea_ice_thickness: str = "HI"
    sea_ice_volume: str = "sea_ice_volume"
    land_fraction: str = "land_fraction"
    wetmask: str = "wetmask"
    cell_area: str = "areacello"
    surface_mask: str = "mask_2d"
    sea_surface_fraction: str = "sea_surface_fraction"

    @property
    def rotated_vars(self) -> Sequence[Tuple[str, str]]:
        return (
            (self.sea_water_x_velocity, self.sea_water_y_velocity),
            (self.sea_ice_x_velocity, self.sea_ice_y_velocity),
            (self.surface_downward_x_stress,
             self.surface_downward_y_stress),
        )

    @property
    def vars_3d(self) -> Sequence[str]:
        return (
            self.sea_water_x_velocity,
            self.sea_water_y_velocity,
            self.sea_water_salinity,
            self.sea_water_potential_temperature,
        )


def rotate_vectors(x, y, angle_rad):
    """Rotate grid-relative vector components to east/north by the local
    grid angle (the ocean_emulators.preprocessing.rotate_vectors step):
    u_east = x cos(a) - y sin(a); v_north = x sin(a) + y cos(a)."""
    cos_a, sin_a = np.cos(angle_rad), np.sin(angle_rad)
    return x * cos_a - y * sin_a, x * sin_a + y * cos_a


@dataclasses.dataclass
class CoarseningConfig:
    """Supplemental higher-frequency dataset, time-coarsened and merged
    (reference compute_ocean_dataset.py:111-133)."""

    zarr: str
    n_coarsen: int
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class RegridConfig:
    """Optional built-in bilinear regrid to a target rectilinear grid
    (replaces the reference's external xesmf step for rectilinear
    sources)."""

    target_lat: List[float]
    target_lon: List[float]


@dataclasses.dataclass
class OceanDatasetComputationConfig:
    """(reference compute_ocean_dataset.py:213-283; the external
    preprocessing knobs — nc_grid/mosaic paths, spatial filter, e3sm
    file lists — are upstream concerns here)."""

    ocean_zarr: str
    ice_zarr: Optional[str] = None
    interface_depths: List[float] = dataclasses.field(
        default_factory=list
    )
    coarsen: Optional[CoarseningConfig] = None
    regrid: Optional[RegridConfig] = None
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)
    standard_names: OceanStandardNameMapping = dataclasses.field(
        default_factory=OceanStandardNameMapping
    )
    shift_timestamps_to_avg_interval_midpoint: bool = False


@dataclasses.dataclass
class OceanDatasetConfig:
    dataset_computation: OceanDatasetComputationConfig

    # reference-config keys handled by the upstream preprocessing stack
    # (ocean_emulators / gcm-filters / xesmf / dask); stripped with a
    # loud warning so the reference's committed YAMLs load verbatim
    # without silently implying those steps ran here
    UPSTREAM_KEYS = (
        "nc_grid_path", "nc_mosaic_path", "nc_target_grid_path",
        "ocean_static", "land_static", "chunking", "sharding",
        "spatial_filter", "outer_chunks",
        "ocean_dataset_nc_files",
        "ocean_dataset_monthly_layer_thickness_files",
        "ocean_dataset_monthly_depth_file",
        "compute_e3sm_surface_downward_heat_flux",
        "ice_dataset_nc_files",
        "ocean_vertical_target_layer_levels",
        "ocean_vertical_target_interface_levels",
        "n_split",
    )

    @classmethod
    def from_file(cls, path: str) -> "OceanDatasetConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data = {k: v for k, v in data.items()
                if k in {f.name for f in dataclasses.fields(cls)}}
        dc = data.get("dataset_computation")
        if isinstance(dc, dict):
            stripped = sorted(set(dc) & set(cls.UPSTREAM_KEYS))
            if stripped:
                logger.warning(
                    "upstream-preprocessing config keys %s are handled "
                    "by the reference's pre-regrid stack (xesmf/dask/"
                    "gcm-filters) and are IGNORED here: this CLI expects "
                    "already-regridded input", stripped,
                )
            for k in stripped:
                dc.pop(k)
            sn = dc.get("standard_names")
            if isinstance(sn, dict):
                ours = {
                    f.name for f in dataclasses.fields(
                        OceanStandardNameMapping
                    )
                }
                extra = sorted(set(sn) - ours)
                if extra:
                    logger.info(
                        "ignoring standard_names keys %s", extra
                    )
                for k in extra:
                    sn.pop(k)
        return from_dict(cls, data)


def insert_nans_on_land_surface(data: dict, names) -> dict:
    """NaN out the land surface everywhere except fractions/masks
    (reference compute_ocean_dataset.py:296-313)."""
    sfc_mask = data[names.surface_mask]
    for name, arr in data.items():
        if (name == names.land_fraction or "mask_" in name
                or "idepth_" in name or name == names.surface_mask):
            continue
        data[name] = np.where(sfc_mask > 0, arr, np.nan)
    if names.sea_surface_fraction in data:
        data[names.sea_surface_fraction] = np.nan_to_num(
            data[names.sea_surface_fraction]
        )
    return data


def process_arrays(
    data: dict, config: OceanDatasetComputationConfig
) -> dict:
    """The post-regrid pipeline on a dict of numpy arrays: 3-D vars are
    [T, Z, Y, X], 2-D are [T, Y, X], wetmask is [Z, Y, X]."""
    names = config.standard_names
    out = dict(data)

    angle = out.pop(names.rotation_angle, None)
    if angle is not None:
        for xn, yn in names.rotated_vars:
            if xn in out and yn in out:
                out[xn], out[yn] = rotate_vectors(out[xn], out[yn], angle)

    wetmask = out.pop(names.wetmask).astype(np.float32)
    vars_3d = [v for v in names.vars_3d if v in out]
    nz = wetmask.shape[0]
    for i in range(nz):
        for var in vars_3d:
            out[f"{var}_{i}"] = out[var][:, i]
        out[f"mask_{i}"] = wetmask[i]
    out[names.surface_mask] = wetmask[0]
    for var in vars_3d:
        del out[var]

    for i, depth in enumerate(config.interface_depths):
        out[f"idepth_{i}"] = np.asarray(depth, np.float64)

    # ice velocities are NaN where there is no modeled sea ice
    if names.sea_ice_modeled in out:
        cond = out[names.sea_ice_modeled] > 0.0
        for var in [names.sea_ice_x_velocity, names.sea_ice_y_velocity]:
            if var in out:
                out[var] = np.where(cond, out[var], np.nan)

    mask0 = out["mask_0"]
    if names.sea_ice_fraction in out:
        out[names.sea_ice_fraction] = np.where(
            mask0 > 0, np.nan_to_num(out[names.sea_ice_fraction]), np.nan
        )
    if names.sea_ice_thickness in out:
        sif = out[names.sea_ice_fraction]
        thickness = np.where(sif > 0, out[names.sea_ice_thickness], 0.0)
        thickness = np.where(mask0 > 0, thickness, np.nan)
        out[names.sea_ice_thickness] = thickness
        if names.cell_area in out:
            out[names.sea_ice_volume] = (
                thickness * out[names.cell_area] * sif / 1000.0**3
            )
        else:
            logger.warning(
                "cell area not found; sea ice volume not added"
            )

    out["sst"] = out[names.surface_temperature] + 273.15
    out = insert_nans_on_land_surface(out, names)
    return {config.renaming.get(k, k): v for k, v in out.items()}


def run(
    config: OceanDatasetComputationConfig,
    run_directory: str,
    output_store: str,
    subsample: bool = False,
    debug: bool = False,
) -> None:
    names = config.standard_names
    lat_dim, lon_dim = names.latitude_dim, names.longitude_dim

    def load(path):
        ds = open_file_dataset(path)
        data = {}
        for v in ds.keys():
            if v in (lat_dim, lon_dim, "time", names.vertical_dim,
                     names.vertical_idim):
                continue
            data[v] = ds[v].read(())
        time = ds.read_time(names.time_dim)
        lat = ds[lat_dim].read(())
        lon = ds[lon_dim].read(())
        ds.close()
        return data, time, lat, lon

    data, time, lat, lon = load(
        os.path.join(run_directory, config.ocean_zarr)
    )
    if config.ice_zarr:
        ice_data, ice_time, _, _ = load(
            os.path.join(run_directory, config.ice_zarr)
        )
        if not np.array_equal(ice_time.values, time.values):
            raise ValueError("ocean and ice time coordinates differ")
        data.update(ice_data)

    if config.coarsen is not None:
        sup, sup_time, _, _ = load(
            os.path.join(run_directory, config.coarsen.zarr)
        )
        n = config.coarsen.n_coarsen
        for k, v in sup.items():
            if v.shape[:1] == (len(sup_time),):
                n_out = v.shape[0] // n
                v = v[: n_out * n].reshape((n_out, n) + v.shape[1:])
                v = v.mean(axis=1)
            data[config.coarsen.renaming.get(k, k)] = v

    if subsample:
        n_orig = len(time)
        keep = min(3, n_orig)
        time = time[:keep]
        data = {
            k: (v[:keep] if v.shape[:1] == (n_orig,) else v)
            for k, v in data.items()
        }

    if config.regrid is not None:
        from ace_tpu.data_process.compute_hpx_dataset import (
            BilinearRegridder,
        )

        tgt_lat = np.asarray(config.regrid.target_lat)
        tgt_lon = np.asarray(config.regrid.target_lon)
        grid_lat, grid_lon = np.meshgrid(tgt_lat, tgt_lon, indexing="ij")
        regrid = BilinearRegridder(lat, lon, grid_lat, grid_lon)
        shape = (len(tgt_lat), len(tgt_lon))
        data = {
            k: regrid(v.astype(np.float64)).reshape(
                v.shape[:-2] + shape
            ).astype(v.dtype)
            for k, v in data.items()
        }
        lat, lon = tgt_lat, tgt_lon

    out = process_arrays(data, config)

    if config.shift_timestamps_to_avg_interval_midpoint:
        dt = int(time.values[1] - time.values[0])
        time = TimeCoord(time.values - dt // 2, time.calendar)

    if debug:
        for k, v in out.items():
            logger.info("%s: %s %s", k, np.shape(v), np.asarray(v).dtype)
        return
    dims: Dict[str, tuple] = {}
    n_times = len(time)
    for k, v in out.items():
        v = np.asarray(v)
        if v.ndim == 0:
            dims[k] = ()
        elif v.shape[:1] == (n_times,):
            dims[k] = ("time", lat_dim, lon_dim)[: v.ndim]
        else:
            dims[k] = (lat_dim, lon_dim)[-v.ndim:]
    write_zarr(
        output_store, out, dims,
        coords={lat_dim: lat, lon_dim: lon}, time=time,
    )
    logger.info("wrote %s (%d variables)", output_store, len(out))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute an ocean training dataset from preprocessed "
        "(rectilinear) ocean/ice output."
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--run-directory", required=True)
    parser.add_argument("--output-store", required=True)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--subsample", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = OceanDatasetConfig.from_file(args.config).dataset_computation
    run(config, args.run_directory, args.output_store,
        subsample=args.subsample, debug=args.debug)


if __name__ == "__main__":
    main()
