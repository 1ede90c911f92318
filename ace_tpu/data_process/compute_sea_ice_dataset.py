"""Compute a sea-ice training dataset from preprocessed SIS2-style output.

Reference: scripts/data_process/compute_sea_ice_dataset.py. As with the
ocean ETL, the curvilinear preprocessing/regridding stages (the
ocean_emulators sis2_preprocessing + mosaic supergrid conversion +
xesmf regrid) are upstream concerns; this port covers the reference's
own post-regrid pipeline for rectilinear inputs:

- rotation of the air-stress-on-ice vector pair by the grid angle
  (with the optional built-in bilinear regrid for rectilinear sources),
- sea-ice fraction NaN fill to 0,
- sea-surface fraction taken from a static ocean mask, NaN-filled to 0,
- NaN insertion everywhere the sea-surface fraction is 0,
- float32 output with lat/lon dim renames.

CLI:
    python -m ace_tpu.data_process.compute_sea_ice_dataset --config c.yaml \
        --run-directory RUN --output-store out.zarr [--debug]
"""

import argparse
import dataclasses
import logging
import os
from typing import List, Mapping, Optional, Sequence, Tuple

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data_process.compute_ocean_dataset import rotate_vectors

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SeaIceStandardNameMapping:
    """(reference compute_sea_ice_dataset.py:24-42)"""

    longitude_dim: str = "x"
    latitude_dim: str = "y"
    time_dim: str = "time"
    rotation_angle: str = "angle"
    air_stress_on_ice_x_component: str = "FA_X"
    air_stress_on_ice_y_component: str = "FA_Y"
    sea_ice_fraction: str = "sea_ice_fraction"
    sea_surface_fraction: str = "sea_surface_fraction"
    sea_surface_mask: str = "wet"

    @property
    def rotated_vars(self) -> Sequence[Tuple[str, str]]:
        return ((self.air_stress_on_ice_x_component,
                 self.air_stress_on_ice_y_component),)


@dataclasses.dataclass
class StaticDataConfig:
    """Static (ocean mask) source (reference
    compute_ocean_dataset.py:135-154)."""

    zarr: str
    names: List[str] = dataclasses.field(default_factory=list)
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)
    zarr_directory: Optional[str] = None
    grid: str = "original"


@dataclasses.dataclass
class SeaIceDatasetComputationConfig:
    """(reference compute_sea_ice_dataset.py:45-68; upstream mosaic /
    target-grid paths belong to the pre-regrid stack and are stripped
    with a loud warning in :meth:`SeaIceDatasetConfig.from_file`)."""

    ice_zarr: str
    ocean_static: StaticDataConfig
    standard_names: SeaIceStandardNameMapping = dataclasses.field(
        default_factory=SeaIceStandardNameMapping
    )
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class SeaIceDatasetConfig:
    dataset_computation: SeaIceDatasetComputationConfig

    UPSTREAM_KEYS = ("nc_mosaic_path", "nc_target_grid_path",
                     "outer_chunks")

    @classmethod
    def from_file(cls, path: str) -> "SeaIceDatasetConfig":
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
        return from_dict(cls, data)


def run(
    config: SeaIceDatasetComputationConfig,
    run_directory: str,
    output_store: str,
    debug: bool = False,
) -> None:
    names = config.standard_names
    lat_dim, lon_dim = names.latitude_dim, names.longitude_dim
    ds = open_file_dataset(os.path.join(run_directory, config.ice_zarr))
    time = ds.read_time(names.time_dim)
    data = {}
    for v in ds.keys():
        if v in (lat_dim, lon_dim, names.time_dim):
            continue
        data[v] = ds[v].read(())
    lat = ds[lat_dim].read(())
    lon = ds[lon_dim].read(())
    ds.close()

    angle = data.pop(names.rotation_angle, None)
    if angle is not None:
        for xn, yn in names.rotated_vars:
            if xn in data and yn in data:
                data[xn], data[yn] = rotate_vectors(
                    data[xn], data[yn], angle
                )

    if names.sea_ice_fraction in data:
        data[names.sea_ice_fraction] = np.nan_to_num(
            data[names.sea_ice_fraction]
        )

    static_dir = config.ocean_static.zarr_directory or run_directory
    static_ds = open_file_dataset(
        os.path.join(static_dir, config.ocean_static.zarr)
    )
    mask_name = config.ocean_static.renaming.get(
        names.sea_surface_mask, names.sea_surface_mask
    )
    wet = static_ds[
        names.sea_surface_mask if names.sea_surface_mask in static_ds
        else mask_name
    ].read(())
    static_ds.close()
    if wet.ndim == 3:  # [Z, Y, X] wetmask: surface level
        wet = wet[0]
    sfrac = np.nan_to_num(wet).astype(np.float64)
    data[names.sea_surface_fraction] = sfrac

    # NaN everywhere there is no sea surface, except the fraction itself
    for name, arr in data.items():
        if name == names.sea_surface_fraction:
            continue
        data[name] = np.where(sfrac > 0, arr, np.nan)

    data = {config.renaming.get(k, k): v.astype(np.float32)
            for k, v in data.items()}
    if debug:
        for k, v in data.items():
            logger.info("%s: %s %s", k, v.shape, v.dtype)
        return
    n_times = len(time)
    dims = {
        k: (("time", "lat", "lon")[: v.ndim]
            if v.shape[:1] == (n_times,) else ("lat", "lon")[-v.ndim:])
        for k, v in data.items()
    }
    write_zarr(output_store, data, dims,
               coords={"lat": lat, "lon": lon}, time=time)
    logger.info("wrote %s (%d variables)", output_store, len(data))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute a sea-ice training dataset from preprocessed "
        "(rectilinear) SIS2-style output."
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--run-directory", required=True)
    parser.add_argument("--output-store", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = SeaIceDatasetConfig.from_file(
        args.config
    ).dataset_computation
    run(config, args.run_directory, args.output_store, debug=args.debug)


if __name__ == "__main__":
    main()
