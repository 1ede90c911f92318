"""Compute a training dataset from raw model output (FV3GFS-style zarr).

Reference: scripts/data_process/compute_dataset.py (1018 LoC). Same
user-facing config schema and derived-variable definitions; different
execution model: instead of a dask/xarray-beam lazy graph we stream the
time axis in slabs through pure numpy functions and insert each slab
into a chunked output zarr store. The optional spherical-harmonics
roundtrip filter runs on the ace_tpu matmul SHT (JAX; TPU if available)
where the reference requires the CUDA xtorch_harmonics extension.

CLI:
    python -m ace_tpu.data_process.compute_dataset --config cfg.yaml \
        --run-directory /path/to/run --output-store out.zarr \
        [--debug] [--subsample] [--check-conservation]
"""

import argparse
import dataclasses
import json
import logging
import os
from typing import Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset

# constants as defined in the FV3GFS model (reference
# scripts/data_process/compute_dataset.py:36-38)
LATENT_HEAT_OF_VAPORIZATION = 2.5e6  # J/kg
GRAVITY = 9.80665  # m/s^2

SPECIFIC_TOTAL_WATER = "specific_total_water"
TOTAL_WATER_PATH = "total_water_path"
SURFACE_FROZEN_PRECIPITATION_NAME = "total_frozen_precipitation_rate"

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class StandardNameMapping:
    """Names of raw variables/dims in the source run (reference
    compute_dataset.py:56-167). A name set to the string "none" means the
    field is absent from the source and is skipped.
    """

    longitude_dim: str = "grid_xt"
    latitude_dim: str = "grid_yt"
    time_dim: str = "time"
    vertical_dim: str = "pfull"
    vertical_interface_dim: str = "phalf"
    surface_pressure: str = "PRESsfc"
    latent_heat_flux: str = "LHTFLsfc"
    precip_rate: str = "PRATEsfc"
    surface_snow_rate: str = "SNOWsfc"
    surface_ice_rate: str = "ICEsfc"
    convective_snow_rate: str = "PRECSC"
    convective_liquid_ice_rate: str = "PRECC"
    surface_graupel_rate: str = "GRAUPELsfc"
    total_frozen_precip_rate: str = "total_frozen_precipitation_rate"
    precipitable_water_path: str = "precipitable_water_path"
    pressure_thickness: str = "pressure_thickness_of_atmospheric_layer"
    air_temperature: str = "air_temperature"
    specific_humidity: str = "specific_humidity"
    cloud_water_mixing_ratio: str = "cloud_water_mixing_ratio"
    cloud_ice_mixing_ratio: str = "cloud_ice_mixing_ratio"
    graupel_mixing_ratio: str = "graupel_mixing_ratio"
    rain_mixing_ratio: str = "rain_mixing_ratio"
    snow_mixing_ratio: str = "snow_mixing_ratio"
    northward_wind: str = "northward_wind"
    eastward_wind: str = "eastward_wind"
    surface_evaporation_rate: str = "surface_evaporation_rate"
    land_fraction: str = "land_fraction"
    ocean_fraction: str = "ocean_fraction"
    sea_ice_fraction: str = "sea_ice_fraction"
    vertical_dim_land: str = "zfull_soil"
    height_thickness: str = "height_thickness_of_land_layer"
    # DLWP (HEALPix) dimension names (reference DLWPNameMapping,
    # compute_dataset.py:170-182); consumed by compute_hpx_dataset
    face_dim: str = "face"
    height_dim: str = "height"
    width_dim: str = "width"
    hybrid_level_coeffs: Sequence[str] = dataclasses.field(
        default_factory=list
    )
    additional_vertically_resolved_names: Sequence[str] = dataclasses.field(
        default_factory=list
    )
    land_names_to_vertically_coarsen_by_height_weighting: Sequence[str] = (
        dataclasses.field(default_factory=list)
    )
    land_names_to_vertically_coarsen_by_sum: Sequence[str] = (
        dataclasses.field(default_factory=list)
    )

    def __post_init__(self):
        self.horizontal_dims = [self.latitude_dim, self.longitude_dim]
        self.specific_total_water = SPECIFIC_TOTAL_WATER
        self.total_water_path = TOTAL_WATER_PATH
        self.total_frozen_precip_rate_output_name = (
            SURFACE_FROZEN_PRECIPITATION_NAME
        )
        self.pwat_tendency = f"tendency_of_{self.total_water_path}"
        self.time_derivative_names = [self.total_water_path]
        self.vertically_resolved = [
            self.specific_total_water,
            self.air_temperature,
            self.northward_wind,
            self.eastward_wind,
        ] + list(self.additional_vertically_resolved_names)
        self.vertically_resolved_names_land = list(
            self.land_names_to_vertically_coarsen_by_height_weighting
        ) + list(self.land_names_to_vertically_coarsen_by_sum)
        self.dropped_variables = (
            self.water_species
            + self.vertically_resolved
            + [self.pressure_thickness]
            + self.vertically_resolved_names_land
        )
        for name in [
            self.precipitable_water_path,
            self.surface_graupel_rate,
            self.surface_ice_rate,
            self.surface_snow_rate,
        ]:
            if name.lower() != "none":
                self.dropped_variables.append(name)

    @property
    def water_species(self) -> list:
        return [
            item
            for item in [
                self.specific_humidity,
                self.cloud_water_mixing_ratio,
                self.cloud_ice_mixing_ratio,
                self.graupel_mixing_ratio,
                self.rain_mixing_ratio,
                self.snow_mixing_ratio,
            ]
            if item.lower() != "none"
        ]

    @property
    def frozen_precipitation_species(self) -> list:
        if self.total_frozen_precip_rate.lower() != "none":
            return [self.total_frozen_precip_rate]
        return [
            item
            for item in [
                self.surface_graupel_rate,
                self.surface_ice_rate,
                self.surface_snow_rate,
            ]
            if item.lower() != "none"
        ]


@dataclasses.dataclass
class ChunkingConfig:
    """Output chunk sizes per standard dimension (reference
    compute_dataset.py:197-229; face_dim is the DLWP variant's knob)."""

    time_dim: int = 160
    latitude_dim: int = 180
    longitude_dim: int = 360
    face_dim: Optional[int] = None

    def get_chunks(self, names: StandardNameMapping) -> dict:
        chunks = {
            names.time_dim: self.time_dim,
            names.latitude_dim: self.latitude_dim,
            names.longitude_dim: self.longitude_dim,
        }
        if self.face_dim is not None:
            chunks[names.face_dim] = self.face_dim
        return chunks


@dataclasses.dataclass
class DatasetComputationConfig:
    """Computation details for a training dataset (reference
    compute_dataset.py:231-302). ``variable_sources`` maps store names
    (e.g. "full_state.zarr") under the run directory to variable lists.
    """

    reference_vertical_coordinate_file: str
    vertical_coarsening_indices: Sequence[Tuple[int, int]]
    variable_sources: Mapping[str, Sequence[str]]
    validate_vertical_coarsening_indices: bool = True
    n_split: int = 65
    renaming: Mapping[str, str] = dataclasses.field(default_factory=dict)
    roundtrip_fraction_kept: Optional[float] = None
    roundtrip_variables: Optional[Sequence[str]] = None
    standard_names: StandardNameMapping = dataclasses.field(
        default_factory=StandardNameMapping
    )
    chunking: ChunkingConfig = dataclasses.field(
        default_factory=lambda: ChunkingConfig(time_dim=1)
    )
    # the reference writes sharded zarr v3 stores (outer shards + inner
    # chunks); this writer has one chunk level, so sharding, when given,
    # takes precedence as the on-disk chunk size (reference
    # compute_dataset.py:893-897 uses sharding for the outer chunks)
    sharding: Optional[ChunkingConfig] = None
    # directory of netCDF files whose variables are merged in as
    # time-invariant inputs (reference compute_dataset.py:295, used for
    # the E3SM datasets)
    time_invariant_dir: Optional[str] = None
    vertical_coarsening_indices_land: Optional[
        Sequence[Tuple[int, int]]
    ] = None
    validate_vertical_coarsening_indices_land: bool = True
    reference_vertical_coordinate_file_land: Optional[str] = None
    mask_soil_moisture: bool = False
    CO2_concentration: Optional[float] = None


@dataclasses.dataclass
class DatasetConfig:
    """Top-level config file schema (reference compute_dataset.py:304-327).
    ``runs`` and ``data_output_directory`` document provenance for workflow
    drivers; only ``dataset_computation`` is consumed here.
    """

    dataset_computation: DatasetComputationConfig
    runs: Mapping[str, str] = dataclasses.field(default_factory=dict)
    data_output_directory: str = ""

    @classmethod
    def from_file(cls, path: str) -> "DatasetConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data = {k: v for k, v in data.items()
                if k in {f.name for f in dataclasses.fields(cls)}}
        return from_dict(cls, data)


# ----- slab numerics (numpy; 2-D vars [T, Y, X], 3-D vars [T, Z, Y, X]) ---


def validate_vertical_coarsening_indices(
    vertical_dim_size: int,
    interface_indices: Sequence[Tuple[int, int]],
    component: str,
) -> None:
    """Indices must exactly tile [0, nz) without overlap (reference
    compute_dataset.py:517-550)."""
    covered: list = []
    for start, end in interface_indices:
        covered.extend(range(start, end))
    if covered != list(range(vertical_dim_size)):
        raise ValueError(
            f"{component} vertical coarsening indices {interface_indices!r} "
            f"do not exactly span all {vertical_dim_size} levels or overlap"
        )


def compute_ocean_fraction(
    data: dict, output_name: str, land_fraction_name: str,
    sea_ice_fraction_name: str,
) -> dict:
    """ocean = 1 - sea_ice - land, clipping negative ocean into sea ice
    (reference compute_dataset.py:401-423)."""
    if output_name in data:
        return data
    sea_ice = np.nan_to_num(data[sea_ice_fraction_name], nan=0.0)
    ocean = 1.0 - sea_ice - data[land_fraction_name]
    negative = np.where(ocean < 0, ocean, 0.0)
    data[sea_ice_fraction_name] = sea_ice + negative
    data[output_name] = ocean - negative
    return data


def compute_latent_heat_flux(
    data: dict, output_name: str, evaporation_name: Optional[str] = None,
) -> dict:
    if output_name in data:
        return data
    if evaporation_name is None:
        raise ValueError(
            f"{output_name} not in dataset; evaporation_name required"
        )
    data[output_name] = (
        data.pop(evaporation_name) * LATENT_HEAT_OF_VAPORIZATION
    )
    return data


def compute_specific_total_water(
    data: dict, water_condensate_names: Sequence[str], output_name: str,
) -> dict:
    data[output_name] = sum(data[n] for n in water_condensate_names)
    return data


def compute_frozen_precipitation_rate(
    data: dict, frozen_precip_names: Sequence[str], output_name: str,
) -> dict:
    data[output_name] = sum(data[n] for n in frozen_precip_names)
    return data


def compute_pressure_thickness(
    data: dict, ak: np.ndarray, bk: np.ndarray,
    surface_pressure_name: str, output_name: str,
) -> dict:
    """dp_k = (ak_{k+1}-ak_k) + (bk_{k+1}-bk_k) * ps, [T, Z, Y, X]
    (reference compute_dataset.py:465-514)."""
    if output_name in data:
        return data
    ps = data[surface_pressure_name]
    dak = np.diff(ak).astype(ps.dtype)[None, :, None, None]
    dbk = np.diff(bk).astype(ps.dtype)[None, :, None, None]
    data[output_name] = dak + dbk * ps[:, None]
    return data


def _weighted_mean(arr, weights, axis):
    return (arr * weights).sum(axis) / weights.sum(axis)


def compute_vertical_coarsening(
    data: dict,
    vertically_resolved_names: Sequence[str],
    interface_indices: Sequence[Tuple[int, int]],
    pressure_thickness_name: str,
    validate_indices: bool = True,
) -> dict:
    """Mass(dp)-weighted vertical means -> '{name}_{i}' (reference
    compute_dataset.py:553-584)."""
    thickness = data[pressure_thickness_name]
    if validate_indices:
        validate_vertical_coarsening_indices(
            thickness.shape[1], interface_indices, "atmosphere"
        )
    for i, (start, end) in enumerate(interface_indices):
        dp = thickness[:, start:end]
        for name in vertically_resolved_names:
            data[f"{name}_{i}"] = _weighted_mean(
                data[name][:, start:end], dp, axis=1
            )
    return data


def compute_vertical_coarsening_land(
    data: dict,
    vertically_resolved_names: Sequence[str],
    interface_indices: Sequence[Tuple[int, int]],
    height_thickness: np.ndarray,
    summed_variables: Sequence[str],
    validate_indices: bool = True,
    mask_soil_moisture: bool = False,
) -> dict:
    """Height-weighted mean (or plain sum) over soil layers (reference
    compute_dataset.py:585-661). ``height_thickness`` is the [Zsoil]
    layer-thickness vector from the land vertical-coordinate file."""
    if not vertically_resolved_names:
        return data
    if validate_indices:
        validate_vertical_coarsening_indices(
            data[vertically_resolved_names[0]].shape[1],
            interface_indices,
            "land",
        )
    if mask_soil_moisture and (
        "total_moisture_content_of_soil_layer" in vertically_resolved_names
        and "temperature_of_soil_layer" in vertically_resolved_names
    ):
        moisture = data["total_moisture_content_of_soil_layer"]
        data["total_moisture_content_of_soil_layer"] = np.where(
            np.isnan(data["temperature_of_soil_layer"]), np.nan, moisture
        )
    for i, (start, end) in enumerate(interface_indices):
        dz = height_thickness[start:end].astype(np.float64)
        for name in vertically_resolved_names:
            chunk = data[name][:, start:end]
            if name in summed_variables:
                data[f"{name}_{i}"] = chunk.sum(axis=1)
            else:
                data[f"{name}_{i}"] = _weighted_mean(
                    chunk, dz[None, :, None, None].astype(chunk.dtype),
                    axis=1,
                )
    return data


def compute_column_moisture_integral(
    data: dict, input_name: str, output_name: str,
    pressure_thickness_name: str,
) -> dict:
    """Column integral of a mixing ratio: sum(q dp)/g, kg/m^2 (reference
    compute_dataset.py:702-714)."""
    data[output_name] = (
        data[input_name] * data[pressure_thickness_name]
    ).sum(axis=1) / GRAVITY
    return data


def compute_tendencies(
    data: dict, time_derivative_names: Sequence[str],
    timestep_seconds: np.ndarray,
) -> dict:
    """Backward time difference; first output step is NaN (reference
    compute_dataset.py:662-681). ``timestep_seconds`` has length T with
    NaN in slot 0 (or the slab-overlap dt for continuation slabs)."""
    dt = timestep_seconds[:, None, None]
    for name in time_derivative_names:
        arr = data[name]
        tendency = np.empty_like(arr)
        tendency[0] = np.nan
        tendency[1:] = np.diff(arr, axis=0) / dt[1:]
        data[f"tendency_of_{name}"] = tendency
    return data


def compute_column_advective_moisture_tendency(
    data: dict, pwat_tendency: str, latent_heat_flux: str, precip: str,
    latent_heat_of_vaporization: float = LATENT_HEAT_OF_VAPORIZATION,
) -> dict:
    evaporation = data[latent_heat_flux] / latent_heat_of_vaporization
    data[f"{pwat_tendency}_due_to_advection"] = (
        data[pwat_tendency] - evaporation + data[precip]
    )
    return data


def roundtrip_filter(
    fields: dict, fraction_modes_kept: float, grid: str = "legendre-gauss",
    variables: Optional[Sequence[str]] = None,
) -> dict:
    """SHT roundtrip with truncated modes, on the ace_tpu matmul SHT
    (reference uses the CUDA xtorch_harmonics.roundtrip_filter;
    compute_dataset.py:24-29,807-813). Filters 2-D [T, Y, X] and 3-D
    [T, Z, Y, X] float fields in place."""
    import jax.numpy as jnp

    from ace_tpu.ops.sht import InverseRealSHT, RealSHT

    first = next(iter(fields.values()))
    nlat, nlon = first.shape[-2], first.shape[-1]
    lmax = max(1, round(fraction_modes_kept * nlat))
    mmax = max(1, round(fraction_modes_kept * (nlon // 2 + 1)))
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    for name in variables if variables is not None else list(fields):
        arr = fields[name]
        if arr.shape[-2:] != (nlat, nlon):
            continue
        flat = arr.reshape((-1, nlat, nlon))
        out = np.asarray(isht(sht(jnp.asarray(flat))), dtype=arr.dtype)
        fields[name] = out.reshape(arr.shape)
    return fields


# ----- conservation checks (reference compute_dataset.py:716-794) -----


def assert_column_integral_of_moisture_is_conserved(
    data: dict, precipitable_water_path_name: str,
    total_water_path_name: str, rtol: float = 1e-1, atol: float = 1e-3,
) -> None:
    expected = data[precipitable_water_path_name]
    integrated = data[total_water_path_name]
    logger.info(
        "Mean |expected - integrated| pwat [kg/m^2]: %s",
        np.abs(expected - integrated).mean(),
    )
    np.testing.assert_allclose(integrated, expected, rtol=rtol, atol=atol)


def _area_weighted_global_mean(arr, lat_deg):
    w = np.cos(np.deg2rad(lat_deg))[:, None]
    return (arr * w).sum(axis=(-2, -1)) / (w.sum() * arr.shape[-1])


def assert_global_dry_air_mass_conservation(
    data: dict, lat_deg: np.ndarray, surface_pressure_name: str,
    total_water_path_name: str, atol: float = 1e-3,
) -> None:
    dry_air = (
        data[surface_pressure_name]
        - data[total_water_path_name] * GRAVITY
    )
    global_mass = _area_weighted_global_mean(dry_air, lat_deg)
    tendency = np.diff(global_mass)
    logger.info(
        "Mean |global dry air pressure tendency| [Pa]: %s",
        np.abs(tendency).mean(),
    )
    np.testing.assert_allclose(tendency, np.zeros_like(tendency), atol=atol)


def assert_global_moisture_conservation(
    data: dict, lat_deg: np.ndarray, total_water_path_name: str,
    latent_heat_flux_name: str, precip_rate_name: str,
    timestep_seconds: np.ndarray, rtol: float = 1e-7,
) -> None:
    global_moisture = _area_weighted_global_mean(
        data[total_water_path_name], lat_deg
    )
    actual = np.diff(global_moisture) / timestep_seconds[1:]
    evap_minus_precip = (
        data[latent_heat_flux_name] / LATENT_HEAT_OF_VAPORIZATION
        - data[precip_rate_name]
    )
    expected = _area_weighted_global_mean(evap_minus_precip, lat_deg)[1:]
    logger.info(
        "Mean |global moisture nonconservation| [kg/m^2/s]: %s",
        np.abs(actual - expected).mean(),
    )
    np.testing.assert_allclose(expected, actual, rtol=rtol, atol=1e-10)


# ----- streaming driver -----


class ZarrRegionWriter:
    """Chunked zarr-v2 output store written one time-slab at a time
    (xarray conventions, matching ace_tpu.data.store.write_zarr; the
    reference writes via xpartition, compute_dataset.py:994-1011)."""

    def __init__(self, path: str, attrs: Optional[dict] = None,
                 create_group: bool = True):
        os.makedirs(path, exist_ok=True)
        if create_group:  # False = add arrays to an existing group
            with open(os.path.join(path, ".zgroup"), "w") as f:
                json.dump({"zarr_format": 2}, f)
            if attrs:
                with open(os.path.join(path, ".zattrs"), "w") as f:
                    json.dump(attrs, f)
        self._path = path
        self._stores: dict = {}

    def create(self, name: str, shape, dtype, dims, chunks=None,
               attrs: Optional[dict] = None):
        import tensorstore as ts

        arr_dir = os.path.join(self._path, name)
        chunks = list(chunks) if chunks else list(shape)
        chunks = [min(c, s) if s else c for c, s in zip(chunks, shape)]
        store = ts.open({
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": arr_dir},
            "metadata": {
                "shape": list(shape),
                "chunks": chunks,
                "dtype": np.dtype(dtype).str,
                "fill_value": None,
            },
            "create": True, "delete_existing": True,
        }).result()
        with open(os.path.join(arr_dir, ".zattrs"), "w") as f:
            json.dump(
                {"_ARRAY_DIMENSIONS": list(dims), **(attrs or {})}, f
            )
        self._stores[name] = store

    def write(self, name: str, arr: np.ndarray, t0: int = 0):
        store = self._stores[name]
        if arr.ndim == 0 or arr.shape == tuple(store.shape):
            store.write(arr).result()
        else:
            store[t0:t0 + arr.shape[0]].write(arr).result()


def _read_ak_bk(path: str) -> Tuple[np.ndarray, np.ndarray]:
    ds = open_file_dataset(path)
    ak = np.squeeze(ds["ak"].read(()))
    bk = np.squeeze(ds["bk"].read(()))
    ds.close()
    return ak, bk


def _coarse_ak_bk(
    ak: np.ndarray, bk: np.ndarray,
    interface_indices: Sequence[Tuple[int, int]], dtype,
) -> dict:
    """Scalar ak_i/bk_i at the coarse interfaces (reference
    compute_dataset.py:356-399)."""
    out = {}
    for i, (start, end) in enumerate(interface_indices):
        out[f"ak_{i}"] = np.asarray(ak[start], dtype)
        out[f"bk_{i}"] = np.asarray(bk[start], dtype)
        if i == len(interface_indices) - 1:
            out[f"ak_{i + 1}"] = np.asarray(ak[end], dtype)
            out[f"bk_{i + 1}"] = np.asarray(bk[end], dtype)
    return out


def _compute_slab(
    slab: dict,
    config: DatasetComputationConfig,
    ak: np.ndarray,
    bk: np.ndarray,
    land_thickness: Optional[np.ndarray],
    timestep_seconds: np.ndarray,
) -> dict:
    """Run the full derived-variable pipeline on one time slab
    (mirrors reference construct_lazy_dataset, compute_dataset.py:796-912).
    """
    names = config.standard_names
    if config.roundtrip_fraction_kept is not None:
        slab = roundtrip_filter(
            slab, config.roundtrip_fraction_kept,
            variables=config.roundtrip_variables,
        )
    slab = compute_ocean_fraction(
        slab, names.ocean_fraction, names.land_fraction,
        names.sea_ice_fraction,
    )
    slab = compute_latent_heat_flux(
        slab, names.latent_heat_flux,
        names.surface_evaporation_rate
        if names.surface_evaporation_rate in slab else None,
    )
    slab = compute_specific_total_water(
        slab, names.water_species, names.specific_total_water
    )
    slab = compute_frozen_precipitation_rate(
        slab, names.frozen_precipitation_species,
        names.total_frozen_precip_rate_output_name,
    )
    slab = compute_pressure_thickness(
        slab, ak, bk, names.surface_pressure, names.pressure_thickness
    )
    slab = compute_vertical_coarsening(
        slab, names.vertically_resolved,
        config.vertical_coarsening_indices,
        names.pressure_thickness,
        config.validate_vertical_coarsening_indices,
    )
    if names.vertically_resolved_names_land:
        slab = compute_vertical_coarsening_land(
            slab, names.vertically_resolved_names_land,
            config.vertical_coarsening_indices_land,
            land_thickness,
            names.land_names_to_vertically_coarsen_by_sum,
            config.validate_vertical_coarsening_indices_land,
            config.mask_soil_moisture,
        )
    slab = compute_column_moisture_integral(
        slab, names.specific_total_water, names.total_water_path,
        names.pressure_thickness,
    )
    slab = compute_tendencies(
        slab, names.time_derivative_names, timestep_seconds
    )
    slab = compute_column_advective_moisture_tendency(
        slab, names.pwat_tendency, names.latent_heat_flux,
        names.precip_rate,
    )
    if config.CO2_concentration is not None:
        first = slab[names.surface_pressure]
        slab["co2"] = np.full_like(first, config.CO2_concentration)
    return slab


def _finalize_slab(slab: dict, config: DatasetComputationConfig) -> dict:
    """Drop intermediates and apply output renaming (reference drops after
    the conservation checks, compute_dataset.py:984-986)."""
    out = dict(slab)
    for name in config.standard_names.dropped_variables:
        out.pop(name, None)
    return {config.renaming.get(k, k): v for k, v in out.items()}


def run(
    config: DatasetComputationConfig,
    run_directory: str,
    output_store: str,
    subsample: bool = False,
    check_conservation: bool = False,
    debug: bool = False,
) -> None:
    names = config.standard_names
    stores = {
        store: open_file_dataset(os.path.join(run_directory, store))
        for store in config.variable_sources
    }
    coord_names = {
        names.latitude_dim, names.longitude_dim, names.time_dim,
        names.vertical_dim, names.vertical_interface_dim,
    }
    var_to_store = {}
    for store, var_names in config.variable_sources.items():
        for v in var_names:
            if v not in coord_names:  # dims are coordinates, not data
                var_to_store[v] = stores[store]

    first_store = next(iter(stores.values()))
    time = first_store.read_time(names.time_dim)
    t_offset = 0
    n_times = len(time)
    if subsample:
        # reference uses ds.isel(time=slice(10, 13)); clamp for short
        # inputs instead of producing an empty selection
        t_offset = min(10, max(0, n_times - 2))
        n_times = min(3, n_times - t_offset)
    time = time[t_offset:t_offset + n_times]
    dt_seconds = np.full(n_times, np.nan)
    dt_seconds[1:] = np.diff(time.values) / 1e6

    ak, bk = _read_ak_bk(config.reference_vertical_coordinate_file)
    land_thickness = None
    if config.reference_vertical_coordinate_file_land:
        lds = open_file_dataset(
            config.reference_vertical_coordinate_file_land
        )
        land_thickness = np.squeeze(
            lds[names.height_thickness].read(())
        )
        lds.close()

    lat = var_to_store[names.surface_pressure][
        names.latitude_dim
    ].read(())
    lon = var_to_store[names.surface_pressure][
        names.longitude_dim
    ].read(())

    if config.time_invariant_dir:
        import glob as _glob

        for path in sorted(
            _glob.glob(os.path.join(config.time_invariant_dir, "*.nc"))
        ):
            tistore = open_file_dataset(path)
            stores[path] = tistore
            for v in tistore.keys():
                if (v not in coord_names and v not in var_to_store
                        and tistore[v].dims
                        and tistore[v].dims[0] != names.time_dim):
                    var_to_store[v] = tistore

    def read_slab(lo: int, hi: int) -> dict:
        """Read global time steps [lo, hi); variables without a leading
        time dimension are broadcast along it."""
        slab = {}
        sel = slice(t_offset + lo, t_offset + hi)
        for v, store in var_to_store.items():
            var = store[v]
            if var.dims and var.dims[0] == names.time_dim:
                slab[v] = var.read((sel,))
            else:
                static = var.read(())
                slab[v] = np.broadcast_to(
                    static, (hi - lo,) + static.shape
                )
        return slab

    # probe with the first <=2 steps to learn the output schema
    probe_n = min(2, n_times)
    probe = _finalize_slab(_compute_slab(
        read_slab(0, probe_n), config, ak, bk, land_thickness,
        dt_seconds[:probe_n],
    ), config)
    scalars = _coarse_ak_bk(
        ak, bk, config.vertical_coarsening_indices,
        probe[config.renaming.get(
            names.surface_pressure, names.surface_pressure
        )].dtype,
    )

    lat_dim = config.renaming.get(names.latitude_dim, names.latitude_dim)
    lon_dim = config.renaming.get(names.longitude_dim, names.longitude_dim)
    time_dim = config.renaming.get(names.time_dim, names.time_dim)
    if debug:
        for k, v in {**probe, **scalars}.items():
            logger.info("%s: shape[1:]=%s dtype=%s", k, v.shape[1:], v.dtype)
        return

    chunk_cfg = config.sharding or config.chunking
    chunks = chunk_cfg.get_chunks(names)
    t_chunk = chunks.get(names.time_dim, 1)
    writer = ZarrRegionWriter(output_store, attrs={
        "history": (
            "Dataset computed by ace_tpu.data_process.compute_dataset "
            f"from run directory {run_directory}."
        ),
        "vertical_coordinate": (
            "The pressure at level interfaces can be computed as "
            "p_i = ak_i + bk_i * PRESsfc."
        ),
    })
    from ace_tpu.data.store import encode_cf_time

    tvals, tunits, tcal = encode_cf_time(time)
    writer.create(time_dim, (n_times,), tvals.dtype, (time_dim,),
                  chunks=[t_chunk],
                  attrs={"units": tunits, "calendar": tcal})
    writer.write(time_dim, tvals)
    writer.create(lat_dim, lat.shape, lat.dtype, (lat_dim,))
    writer.write(lat_dim, lat)
    writer.create(lon_dim, lon.shape, lon.dtype, (lon_dim,))
    writer.write(lon_dim, lon)
    for name, arr in probe.items():
        dims = (time_dim,) + {
            2: (lat_dim,), 3: (lat_dim, lon_dim),
        }.get(arr.ndim, tuple(
            f"dim_{i}" for i in range(arr.ndim - 1)
        ))
        chunk_list = [t_chunk] + [
            chunks.get(d, s) for d, s in zip(dims[1:], arr.shape[1:])
        ]
        writer.create(name, (n_times,) + arr.shape[1:], arr.dtype, dims,
                      chunks=chunk_list)
    for name, val in scalars.items():
        writer.create(name, (), val.dtype, (), attrs={
            "units": "Pa" if name.startswith("ak") else ""
        })
        writer.write(name, val)

    # slab loop with 1-step overlap so backward tendencies are exact
    slab_size = max(
        2, int(np.ceil(n_times / max(1, config.n_split)))
    )
    start = 0
    while start < n_times:
        stop = min(n_times, start + slab_size)
        lo = max(0, start - 1)  # one-step lookback for tendencies
        slab = _compute_slab(
            read_slab(lo, stop), config, ak, bk, land_thickness,
            dt_seconds[lo:stop],
        )
        if check_conservation:
            pwp = names.precipitable_water_path
            if pwp.lower() != "none" and pwp in slab:
                assert_column_integral_of_moisture_is_conserved(
                    slab, pwp, names.total_water_path
                )
            assert_global_dry_air_mass_conservation(
                slab, lat, names.surface_pressure,
                names.total_water_path,
            )
            assert_global_moisture_conservation(
                slab, lat, names.total_water_path,
                names.latent_heat_flux, names.precip_rate,
                dt_seconds[lo:stop],
            )
        slab = _finalize_slab(slab, config)
        offset = start - lo
        for name, arr in slab.items():
            writer.write(name, arr[offset:], t0=start)
        logger.info("wrote time steps [%d, %d) of %d", start, stop, n_times)
        start = stop
    for store in stores.values():
        store.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute a training dataset from raw model output."
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--run-directory", required=True)
    parser.add_argument("--output-store", required=True)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--subsample", action="store_true")
    parser.add_argument("--check-conservation", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    config = DatasetConfig.from_file(args.config).dataset_computation
    run(
        config, args.run_directory, args.output_store,
        subsample=args.subsample,
        check_conservation=args.check_conservation,
        debug=args.debug,
    )


if __name__ == "__main__":
    main()
