"""Create coupled atmosphere-ocean(-sea-ice) training datasets.

Reference: scripts/data_process/create_coupled_datasets.py +
coupled_dataset_utils.py. The three-stage dependency chain is the same:

    compute_coupled_sea_ice -> compute_coupled_ocean
        -> compute_coupled_atmosphere

operating here on in-memory dicts of [T, Y, X] numpy arrays read through
the ace_tpu store layer (the reference uses dask-lazy xarray). Coupling
science ports one-to-one: sea-surface/land/ice fraction reconciliation
and sea-ice concentration, time-mean-SST (or precomputed) sea-ice masks
with per-variable fill values, window-averaged surface fluxes at the
ocean timestep, hfds scaled to total area, and the three surface-
temperature blending modes (solid_ts, interpolate_sst, threshold).

CLI:
    python -m ace_tpu.data_process.coupled_datasets --yaml cfg.yaml \
        [--debug] [--subsample]
"""

import argparse
import dataclasses
import logging
import os
from typing import Dict, List, Literal, Optional, Union

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord, parse_datetime_string
from ace_tpu.data_process.window_avg import (
    WindowAvgDatasetConfig,
    window_average_arrays,
)

logger = logging.getLogger(__name__)


# ----- lightweight in-memory dataset -----


class ArrayDataset:
    """dict of numpy arrays + a TimeCoord + grid coordinates."""

    def __init__(self, data: dict, time: TimeCoord, lat, lon):
        self.data = data
        self.time = time
        self.lat = np.asarray(lat)
        self.lon = np.asarray(lon)

    @classmethod
    def from_store(cls, path: str, first_timestamp=None,
                   last_timestamp=None, lat_dim="lat", lon_dim="lon"):
        ds = open_file_dataset(path)
        time = ds.read_time()
        sel = np.arange(len(time))
        if first_timestamp:
            sel = sel[time.values[sel] >= parse_datetime_string(
                first_timestamp, time.calendar
            )]
        if last_timestamp:
            sel = sel[time.values[sel] <= parse_datetime_string(
                last_timestamp, time.calendar
            )]
        data = {}
        for v in ds.keys():
            var = ds[v]
            if v in (lat_dim, lon_dim, "time"):
                continue
            if var.dims and var.dims[0] == "time":
                data[v] = var.read((slice(int(sel[0]),
                                          int(sel[-1]) + 1),))
            else:
                data[v] = var.read(())
        lat = ds[lat_dim].read(())
        lon = ds[lon_dim].read(())
        ds.close()
        return cls(data, time[sel], lat, lon)

    def reindex_ffill(self, target: TimeCoord) -> "ArrayDataset":
        idx = np.clip(
            np.searchsorted(self.time.values, target.values,
                            side="right") - 1,
            0, len(self.time) - 1,
        )
        data = {
            k: (v[idx] if v.shape[:1] == (len(self.time),) else v)
            for k, v in self.data.items()
        }
        return ArrayDataset(data, target, self.lat, self.lon)

    def sel_times(self, target: TimeCoord) -> "ArrayDataset":
        idx = np.searchsorted(self.time.values, target.values)
        found = (idx < len(self.time)) & (
            self.time.values[np.minimum(idx, len(self.time) - 1)]
            == target.values
        )
        if not found.all():
            raise ValueError(
                f"{int((~found).sum())} target times not present in "
                "dataset (first missing: "
                f"{target.values[~found][0]})"
            )
        data = {
            k: (v[idx] if v.shape[:1] == (len(self.time),) else v)
            for k, v in self.data.items()
        }
        return ArrayDataset(data, target, self.lat, self.lon)

    def write(self, path: str):
        dims = {}
        for k, v in self.data.items():
            if v.shape[:1] == (len(self.time),):
                dims[k] = ("time", "lat", "lon")[: v.ndim]
                if v.ndim == 3:
                    dims[k] = ("time", "lat", "lon")
            else:
                dims[k] = ("lat", "lon")[: v.ndim]
        write_zarr(
            path, self.data, dims,
            coords={"lat": self.lat, "lon": self.lon}, time=self.time,
        )


# ----- coupling primitives (reference coupled_dataset_utils.py) -----


def _interpolate_sst(ts, sst, ofrac, thresh: float = 1.0):
    """(1 - ofrac) ts + ofrac sst with ofrac >= thresh treated as 1
    (reference coupled_dataset_utils.py:116-123)."""
    ofrac = np.where(ofrac < thresh, ofrac, 1.0)
    return (1.0 - ofrac) * ts + ofrac * sst


def _minmax_coastal_solid_temp(ts, sst, ofrac, cutoff: float = 0.4):
    """Time-min/max of (ts - sst) on coastal cells scaled by solid
    fraction (reference coupled_dataset_utils.py:85-113)."""
    coastal = np.where((ofrac > 0.0) & (ofrac < 1.0), ts - sst, np.nan)
    with np.errstate(invalid="ignore"):
        alpha = np.nanmin(coastal, axis=0)
        beta = np.nanmax(coastal, axis=0)
    solid_frac = np.where(ofrac < cutoff, 1.0 - ofrac, 1.0 - cutoff)
    return sst + alpha / solid_frac, sst + beta / solid_frac


@dataclasses.dataclass
class CoupledSurfaceTemperatureConfig:
    """Surface-temperature blending for the coupled atmosphere
    (reference coupled_dataset_utils.py:144-211)."""

    how: Literal["solid_ts", "interpolate_sst", "threshold"]
    ocean_fraction_threshold: float = 1.0
    timedelta: str = "6h"

    def apply_sst_to_ts(self, ts, sst, ofrac):
        thresh = self.ocean_fraction_threshold
        if self.how == "solid_ts":
            solid_frac = np.where(ofrac < thresh, 1.0 - ofrac, np.nan)
            with np.errstate(invalid="ignore", divide="ignore"):
                solid_ts = (ts - ofrac * np.nan_to_num(sst)) / solid_frac
            solid_ts = np.where(np.isnan(solid_ts), sst, solid_ts)
            lo, hi = _minmax_coastal_solid_temp(solid_ts, sst, ofrac)
            coastal = (ofrac > 0) & (ofrac < thresh)
            ts_mod = np.where(
                coastal, np.clip(solid_ts, lo, hi), np.nan
            )
        elif self.how == "interpolate_sst":
            ts_mod = _interpolate_sst(ts, sst, ofrac, thresh)
        else:
            ts_mod = np.where(ofrac < thresh, ts, sst)
        return np.where(np.isnan(ts_mod), ts, ts_mod)


@dataclasses.dataclass
class PrecomputedSeaIceMaskConfig:
    zarr_path: str
    name: str = "mask_sea_ice_fraction"

    def get_sea_ice_mask(self) -> np.ndarray:
        ds = open_file_dataset(self.zarr_path)
        mask = ds[self.name].read(())
        ds.close()
        if mask.ndim != 2:
            raise ValueError("expected a 2D precomputed sea ice mask")
        return mask


@dataclasses.dataclass
class CoupledSeaSurfaceConfig:
    """Sea-ice masking + windowed flux averages for the coupled ocean
    (reference coupled_dataset_utils.py:228-321)."""

    surface_flux_window_avg: WindowAvgDatasetConfig
    sst_threshold: Optional[float] = None
    ocean_extra_masked_names: List[str] = dataclasses.field(
        default_factory=list
    )
    ocean_extra_fill_values: Dict[str, float] = dataclasses.field(
        default_factory=dict
    )
    precomputed_sea_ice_mask: Optional[PrecomputedSeaIceMaskConfig] = None
    sea_ice_window_avg: Optional[WindowAvgDatasetConfig] = None
    timedelta: str = "120h"

    def __post_init__(self):
        self._mask: Optional[np.ndarray] = None
        if self.sst_threshold is None and (
            self.precomputed_sea_ice_mask is None
        ):
            raise ValueError(
                "either sst_threshold or precomputed_sea_ice_mask is "
                "required"
            )

    def compute_sea_ice_mask(self, sst: np.ndarray) -> np.ndarray:
        if self.precomputed_sea_ice_mask is not None:
            self._mask = self.precomputed_sea_ice_mask.get_sea_ice_mask()
        else:
            with np.errstate(invalid="ignore"):
                sst_tm = np.nanmean(sst, axis=0)
            self._mask = np.nan_to_num(
                (sst_tm < self.sst_threshold).astype(np.float64)
            )
        return self._mask

    def apply_mask(self, arr, name: Optional[str] = None):
        if self._mask is None:
            raise RuntimeError("call compute_sea_ice_mask first")
        if name is not None and name in self.ocean_extra_fill_values:
            arr = np.nan_to_num(
                arr, nan=self.ocean_extra_fill_values[name]
            )
        return np.where(self._mask > 0, arr, np.nan)


@dataclasses.dataclass
class CoupledSeaIceConfig:
    """Window averaging + ts handling for the coupled sea-ice dataset
    (reference coupled_dataset_utils.py:399-442)."""

    window_avg: Optional[WindowAvgDatasetConfig] = None
    include_ts: bool = False
    timedelta: str = "6h"


@dataclasses.dataclass
class AtmosphereInputFieldsConfig:
    surface_temperature_name: str = "surface_temperature"
    sea_ice_fraction_name: str = "sea_ice_fraction"
    land_fraction_name: str = "land_fraction"
    ocean_fraction_name: str = "ocean_fraction"
    sea_surface_fraction_name: str = "sea_surface_fraction"


@dataclasses.dataclass
class OceanInputFieldsConfig:
    sea_surface_fraction_name: str = "sea_surface_fraction"
    sea_surface_temperature_name: str = "sst"
    hfds_name: str = "hfds"


@dataclasses.dataclass
class DerivedFieldsConfig:
    ocean_sea_ice_fraction_name: str = "ocean_sea_ice_fraction"
    hfds_total_area_name: str = "hfds_total_area"


@dataclasses.dataclass
class CoupledFieldNamesConfig:
    time_dim: str = "time"
    latitude_dim: str = "lat"
    longitude_dim: str = "lon"
    atmosphere: AtmosphereInputFieldsConfig = dataclasses.field(
        default_factory=AtmosphereInputFieldsConfig
    )
    ocean: OceanInputFieldsConfig = dataclasses.field(
        default_factory=OceanInputFieldsConfig
    )
    derived: DerivedFieldsConfig = dataclasses.field(
        default_factory=DerivedFieldsConfig
    )


@dataclasses.dataclass
class ExtraFieldsConfig:
    """Copy extra variables by exact name or trailing-underscore prefix
    (reference coupled_dataset_utils.py:9-45)."""

    names_and_prefixes: Optional[List[str]] = None

    def copy_extra_data_vars(self, src: dict, dst: dict) -> dict:
        if self.names_and_prefixes is None:
            return dst
        for pat in self.names_and_prefixes:
            for name, arr in src.items():
                if (name.startswith(pat) if pat.endswith("_")
                        else name == pat):
                    dst[name] = arr
        return dst

    def drop_extra_data_vars(self, data: dict) -> dict:
        """Remove previously-copied extras (reference
        coupled_dataset_utils.py:45-62)."""
        if self.names_and_prefixes is None:
            return data
        return {
            k: v for k, v in data.items()
            if not any(k.startswith(p) for p in self.names_and_prefixes)
        }


# ----- the three stages -----


def compute_coupled_sea_ice(
    atmos: ArrayDataset,
    config: CoupledSeaIceConfig,
    sea_ice: Optional[ArrayDataset] = None,
    ocean: Optional[ArrayDataset] = None,
    names: Optional[CoupledFieldNamesConfig] = None,
    atmos_extras: Optional[ExtraFieldsConfig] = None,
    sea_ice_extras: Optional[ExtraFieldsConfig] = None,
) -> ArrayDataset:
    """Reconcile land/sea-surface/ice/ocean fractions and derive sea-ice
    concentration at the atmosphere timestep (reference
    coupled_dataset_utils.py:445-578)."""
    if sea_ice is None and sea_ice_extras is not None:
        raise ValueError("sea_ice_extras given but sea_ice is None")
    names = names or CoupledFieldNamesConfig()
    a = names.atmosphere

    # the sea-surface fraction travels under the ocean-side name through
    # the whole chain (reference compute_coupled_sea_ice uses
    # input_field_names.ocean.sea_surface_fraction_name)
    sfrac_name = names.ocean.sea_surface_fraction_name
    lfrac = np.clip(atmos.data[a.land_fraction_name], 0.0, 1.0)
    if sea_ice is not None and sfrac_name in sea_ice.data:
        sfrac = sea_ice.data[sfrac_name]
    elif ocean is not None and sfrac_name in ocean.data:
        sfrac = ocean.data[sfrac_name]
    else:
        logger.warning(
            "%s not found; assuming sea surface fraction = 1 - land "
            "fraction", sfrac_name,
        )
        sfrac = 1.0 - lfrac
    sfrac = np.clip(np.nan_to_num(sfrac), 0.0, 1.0)

    ifrac = np.clip(atmos.data[a.sea_ice_fraction_name], 0.0, 1.0)
    if sea_ice is not None:
        ifrac = np.clip(
            np.nan_to_num(sea_ice.data[a.sea_ice_fraction_name]), 0.0, 1.0
        )

    sfrac_mod = np.where(sfrac > 0, 1.0 - lfrac, 0.0)
    lfrac_mod = 1.0 - sfrac_mod
    with np.errstate(divide="ignore", invalid="ignore"):
        sic_mod = np.nan_to_num(np.clip(ifrac / sfrac, 0.0, 1.0))
    ifrac_mod = sic_mod * sfrac_mod
    ofrac_mod = (1.0 - sic_mod) * sfrac_mod

    ts = atmos.data[a.surface_temperature_name]
    data = {
        a.land_fraction_name: lfrac_mod,
        sfrac_name: sfrac,
        a.ocean_fraction_name: ofrac_mod,
        names.derived.ocean_sea_ice_fraction_name: sic_mod,
        a.sea_ice_fraction_name: ifrac_mod,
        a.surface_temperature_name: ts,
    }
    time = atmos.time
    if not config.include_ts:
        data.pop(a.surface_temperature_name)
    if config.window_avg is not None:
        avg, avg_time = window_average_arrays(
            config.window_avg, data, time
        )
        # forward-fill back onto the original timestep (reference
        # apply_window_avg_and_reindex)
        data = ArrayDataset(
            avg, avg_time, atmos.lat, atmos.lon
        ).reindex_ffill(time).data
        if config.include_ts:
            data[a.surface_temperature_name] = _interpolate_sst(
                ts=ts,
                sst=data[a.surface_temperature_name],
                ofrac=data[a.ocean_fraction_name],
            )
    out = ArrayDataset(data, time, atmos.lat, atmos.lon)
    if atmos_extras is not None:
        atmos_extras.copy_extra_data_vars(atmos.data, out.data)
    if sea_ice_extras is not None:
        sea_ice_extras.copy_extra_data_vars(sea_ice.data, out.data)
    return out


def compute_coupled_ocean(
    ocean: ArrayDataset,
    atmos: ArrayDataset,
    coupled_sea_ice: ArrayDataset,
    config: CoupledSeaSurfaceConfig,
    names: Optional[CoupledFieldNamesConfig] = None,
    extras: Optional[ExtraFieldsConfig] = None,
) -> ArrayDataset:
    """Coupled ocean dataset at ocean timesteps (reference
    coupled_dataset_utils.py:581-668)."""
    names = names or CoupledFieldNamesConfig()
    a, o, d = names.atmosphere, names.ocean, names.derived

    ds = ArrayDataset(
        dict(coupled_sea_ice.data), coupled_sea_ice.time,
        coupled_sea_ice.lat, coupled_sea_ice.lon,
    )
    ds.data.pop(a.surface_temperature_name, None)
    if config.sea_ice_window_avg is not None:
        avg, avg_time = window_average_arrays(
            config.sea_ice_window_avg, ds.data, ds.time
        )
        ds = ArrayDataset(avg, avg_time, ds.lat, ds.lon)
    ds = ds.sel_times(ocean.time)

    flux_avg, flux_time = window_average_arrays(
        config.surface_flux_window_avg, atmos.data, atmos.time
    )
    flux_ds = ArrayDataset(
        flux_avg, flux_time, atmos.lat, atmos.lon
    ).sel_times(ocean.time)
    for k, v in flux_ds.data.items():
        if k not in ds.data:
            ds.data[k] = v

    sfrac = ds.data[o.sea_surface_fraction_name]
    ds.data[d.hfds_total_area_name] = ocean.data[o.hfds_name] * sfrac

    mask = config.compute_sea_ice_mask(
        ocean.data[o.sea_surface_temperature_name]
    )
    for name in [a.sea_ice_fraction_name, d.ocean_sea_ice_fraction_name]:
        ds.data[name] = config.apply_mask(ds.data[name])
        ds.data[f"mask_{name}"] = mask
    for name in config.ocean_extra_masked_names:
        ds.data[name] = config.apply_mask(ocean.data[name], name)
        ds.data[f"mask_{name}"] = mask
    if extras is not None:
        extras.copy_extra_data_vars(ocean.data, ds.data)
    return ds


def compute_coupled_atmosphere(
    atmos: ArrayDataset,
    ocean: ArrayDataset,
    coupled_ocean: ArrayDataset,
    config: CoupledSurfaceTemperatureConfig,
    names: Optional[CoupledFieldNamesConfig] = None,
    extras: Optional[ExtraFieldsConfig] = None,
) -> ArrayDataset:
    """Coupled atmosphere at atmosphere timesteps with SST blended into
    surface temperature (reference coupled_dataset_utils.py:671-752)."""
    names = names or CoupledFieldNamesConfig()
    a, o = names.atmosphere, names.ocean

    ts = atmos.data[a.surface_temperature_name]
    sub = coupled_ocean.sel_times(ocean.time)
    ifrac = sub.data[a.sea_ice_fraction_name]
    ofrac = sub.data[a.ocean_fraction_name]

    ff = ArrayDataset(
        {"ifrac": ifrac, "ofrac": ofrac,
         "sst": ocean.data[o.sea_surface_temperature_name]},
        ocean.time, atmos.lat, atmos.lon,
    ).reindex_ffill(atmos.time).data
    ifrac_re, ofrac_re, sst_re = ff["ifrac"], ff["ofrac"], ff["sst"]

    ts_mod = config.apply_sst_to_ts(ts, sst_re, ofrac_re)
    lfrac = coupled_ocean.data[a.land_fraction_name]
    sfrac = coupled_ocean.data[o.sea_surface_fraction_name]
    data = {
        a.land_fraction_name: (
            lfrac[0] if lfrac.shape[:1] == (len(coupled_ocean.time),)
            else lfrac
        ),
        a.ocean_fraction_name: ofrac_re,
        a.sea_ice_fraction_name: ifrac_re,
        o.sea_surface_fraction_name: (
            sfrac[0] if sfrac.shape[:1] == (len(coupled_ocean.time),)
            else sfrac
        ),
        a.surface_temperature_name: ts_mod,
    }
    out = ArrayDataset(data, atmos.time, atmos.lat, atmos.lon)
    if extras is not None:
        extras.copy_extra_data_vars(atmos.data, out.data)
    return out


# ----- driver -----


@dataclasses.dataclass
class CoupledInputDatasetConfig:
    zarr_path: str
    time_chunk_size: int = 160
    extra_fields: ExtraFieldsConfig = dataclasses.field(
        default_factory=ExtraFieldsConfig
    )
    first_timestamp: Optional[str] = None
    last_timestamp: Optional[str] = None

    def get_dataset(self, lat_dim="lat", lon_dim="lon") -> ArrayDataset:
        return ArrayDataset.from_store(
            self.zarr_path, self.first_timestamp, self.last_timestamp,
            lat_dim=lat_dim, lon_dim=lon_dim,
        )


@dataclasses.dataclass
class InputDatasetsConfig:
    atmosphere: CoupledInputDatasetConfig
    ocean: Optional[CoupledInputDatasetConfig] = None
    sea_ice: Optional[CoupledInputDatasetConfig] = None


@dataclasses.dataclass
class EnsembleRunConfig:
    """(reference create_coupled_datasets.py:337-348)"""

    atmosphere: CoupledInputDatasetConfig
    ocean: Optional[CoupledInputDatasetConfig] = None
    sea_ice: Optional[CoupledInputDatasetConfig] = None


@dataclasses.dataclass
class InputEnsembleConfig:
    """(reference create_coupled_datasets.py:350-367)"""

    runs: Dict[str, EnsembleRunConfig]


@dataclasses.dataclass
class CoupledDatasetsConfig:
    coupled_sea_ice: CoupledSeaIceConfig = dataclasses.field(
        default_factory=CoupledSeaIceConfig
    )
    coupled_ts: Optional[CoupledSurfaceTemperatureConfig] = None
    coupled_sea_surface: Optional[CoupledSeaSurfaceConfig] = None
    input_field_names: CoupledFieldNamesConfig = dataclasses.field(
        default_factory=CoupledFieldNamesConfig
    )


@dataclasses.dataclass
class CreateCoupledDatasetsConfig:
    """(reference create_coupled_datasets.py:652-720; stats generation is
    run separately via ace_tpu.compute_stats on the output stores)."""

    version: str
    family_name: str
    output_directory: str
    coupled_datasets: CoupledDatasetsConfig
    input_datasets: Union[InputDatasetsConfig, InputEnsembleConfig]

    @property
    def sea_ice_output_store(self):
        return os.path.join(
            self.output_directory,
            f"{self.version}-{self.family_name}-sea_ice.zarr",
        )

    @property
    def ocean_output_store(self):
        return os.path.join(
            self.output_directory,
            f"{self.version}-{self.family_name}-ocean.zarr",
        )

    @property
    def atmosphere_output_store(self):
        return os.path.join(
            self.output_directory,
            f"{self.version}-{self.family_name}-atmosphere.zarr",
        )

    @classmethod
    def from_file(cls, path: str) -> "CreateCoupledDatasetsConfig":
        """Accepts the reference's committed YAMLs verbatim: stats dates,
        dask/beaker writer knobs, and climate_data_type are stripped
        (stats run separately via ace_tpu.compute_stats; there is no
        dask here)."""
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data.pop("stats", None)
        if isinstance(data.get("coupled_datasets"), dict):
            data["coupled_datasets"].pop("output_writer", None)
        inputs = data.get("input_datasets")
        if isinstance(inputs, dict):
            inputs.pop("climate_data_type", None)
            inputs.pop("stats", None)
        return from_dict(cls, data)


def run(config: CreateCoupledDatasetsConfig) -> dict:
    if isinstance(config.input_datasets, InputEnsembleConfig):
        # one coupled-dataset chain per ensemble member, with the run
        # name folded into the family name (reference
        # create_coupled_datasets.py ensemble path)
        written = {}
        for run_name, member in config.input_datasets.runs.items():
            member_config = dataclasses.replace(
                config,
                family_name=f"{config.family_name}-{run_name}",
                input_datasets=InputDatasetsConfig(
                    atmosphere=member.atmosphere,
                    ocean=member.ocean,
                    sea_ice=member.sea_ice,
                ),
            )
            written[run_name] = run(member_config)
        return written
    return _run_single(config)


def _run_single(config: CreateCoupledDatasetsConfig) -> dict:
    names = config.coupled_datasets.input_field_names
    lat_dim, lon_dim = names.latitude_dim, names.longitude_dim
    inputs = config.input_datasets
    atmos = inputs.atmosphere.get_dataset(lat_dim, lon_dim)
    ocean = (
        inputs.ocean.get_dataset(lat_dim, lon_dim)
        if inputs.ocean else None
    )
    sea_ice = (
        inputs.sea_ice.get_dataset(lat_dim, lon_dim)
        if inputs.sea_ice else None
    )
    os.makedirs(config.output_directory, exist_ok=True)
    written = {}

    coupled_si = compute_coupled_sea_ice(
        atmos, config.coupled_datasets.coupled_sea_ice,
        sea_ice=sea_ice, ocean=ocean, names=names,
        atmos_extras=inputs.atmosphere.extra_fields,
        sea_ice_extras=(
            inputs.sea_ice.extra_fields if inputs.sea_ice else None
        ),
    )
    coupled_si.write(config.sea_ice_output_store)
    written["sea_ice"] = config.sea_ice_output_store

    css = config.coupled_datasets.coupled_sea_surface
    if css is not None:
        if ocean is None:
            raise ValueError(
                "coupled_sea_surface configured but no ocean input"
            )
        # the atmosphere extras belong only in the sea-ice output
        # (reference create_coupled_datasets.py:577)
        coupled_si_for_ocean = ArrayDataset(
            inputs.atmosphere.extra_fields.drop_extra_data_vars(
                coupled_si.data
            ),
            coupled_si.time, coupled_si.lat, coupled_si.lon,
        )
        coupled_ocean = compute_coupled_ocean(
            ocean, atmos, coupled_si_for_ocean, css, names=names,
            extras=inputs.ocean.extra_fields,
        )
        coupled_ocean.write(config.ocean_output_store)
        written["ocean"] = config.ocean_output_store

        cts = config.coupled_datasets.coupled_ts
        if cts is not None:
            coupled_atmos = compute_coupled_atmosphere(
                atmos, ocean, coupled_ocean, cts, names=names,
                extras=inputs.atmosphere.extra_fields,
            )
            coupled_atmos.write(config.atmosphere_output_store)
            written["atmosphere"] = config.atmosphere_output_store
    elif config.coupled_datasets.coupled_ts is not None:
        raise ValueError(
            "coupled_ts configured but coupled_sea_surface is None"
        )
    for label, path in written.items():
        logger.info("wrote coupled %s dataset: %s", label, path)
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Create coupled atmosphere-ocean training datasets."
    )
    parser.add_argument("--yaml", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run(CreateCoupledDatasetsConfig.from_file(args.yaml))


if __name__ == "__main__":
    main()
