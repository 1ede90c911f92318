"""ERA5 -> ACE training dataset ingestion.

Native equivalent of the reference's Dataflow pipeline
(/root/reference/scripts/era5/pipeline/xr-beam-pipeline.py): reads
ARCO-ERA5-format zarr stores (hourly mean fluxes, 6-hourly surface
analysis / pressure-level fields, model-level 3D fields), derives the
ACE variable set, conservatively regrids 0.25-degree lat-lon to a
Gaussian F-grid, vertically coarsens the 137 model levels to the ACE
layers with pressure weighting, and writes one training zarr. Where the
reference distributes chunks over apache-beam/Dataflow workers and
regrids with xesmf, this runs the same per-chunk math in-process on the
native conservative regridder (ops/conservative_regrid.py) — the
transforms are pure functions of numpy blocks and are unit-tested
against the reference's formulas.

CLI:
    python -m ace_tpu.data_process.era5_ingest --yaml cfg.yaml [--debug]

Config::

    full_37_path: /data/arco-full37.zarr     # hourly + 6-hourly fields
    model_level_path: /data/arco-ml.zarr     # 137-level 3D fields
    co2_path: /data/co2.zarr                 # optional
    output_path: /data/ace-era5.zarr
    start_time: "2001-01-01T06:00:00"        # hour multiple of 6
    end_time: "2001-01-02T00:00:00"
    output_grid: F90                         # F22.5 / F45 / F90 / F360
    output_layer_indices: [0, 48, 67, 79, 90, 100, 109, 119, 137]
    streams: [invariant, mean_flux, surface_analysis, pressure_level,
              model_level, co2]
    check_data_validity: false
"""

import argparse
import dataclasses
import logging
from typing import Mapping, Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord, parse_datetime_string

logger = logging.getLogger(__name__)

GRAVITY = 9.80665
DENSITY_OF_LIQUID_WATER = 1000.0  # kg/m**3
TIME_STEP = 6  # hours between output timesteps
N_INPUT_LAYERS = 137

# reference xr-beam-pipeline.py:32 — name -> Gaussian grid number N
# (nlat = 2N, nlon = 4N)
GAUSSIAN_GRID_N = {"F22.5": 22.5, "F45": 45, "F90": 90, "F360": 360}

OUTPUT_PRESSURE_LEVELS = [1000, 850, 700, 500, 250, 200, 100, 50, 10]
OUTPUT_PRESSURE_LEVELS_GEOPOTENTIAL = [
    1000, 850, 700, 500, 300, 250, 200, 100, 50, 10,
]
DEFAULT_OUTPUT_LAYER_INDICES = [0, 48, 67, 79, 90, 100, 109, 119, 137]

SOIL_TYPES = {
    "undefined": 0, "coarse": 1, "medium": 2, "medium_fine": 3,
    "fine": 4, "very_fine": 5, "organic": 6, "tropical_organic": 7,
}

# variables that are legitimately masked (reference :230)
VARIABLES_WITH_SOME_MISSING_VALUES = (
    "sea_ice_cover",
    "sea_surface_temperature",
    "significant_height_of_combined_wind_waves_and_swell",
)

MEAN_FLUX_VARS = [
    "mean_top_downward_short_wave_radiation_flux",
    "mean_top_net_short_wave_radiation_flux",
    "mean_top_net_long_wave_radiation_flux",
    "mean_surface_downward_short_wave_radiation_flux",
    "mean_surface_net_short_wave_radiation_flux",
    "mean_surface_downward_long_wave_radiation_flux",
    "mean_surface_net_long_wave_radiation_flux",
    "mean_surface_sensible_heat_flux",
    "mean_surface_latent_heat_flux",
    "mean_total_precipitation_rate",
    "mean_vertically_integrated_moisture_divergence",
    "mean_snowfall_rate",
    "mean_top_net_short_wave_radiation_flux_clear_sky",
    "mean_top_net_long_wave_radiation_flux_clear_sky",
    "mean_surface_downward_short_wave_radiation_flux_clear_sky",
    "mean_surface_net_short_wave_radiation_flux_clear_sky",
    "mean_surface_downward_long_wave_radiation_flux_clear_sky",
    "mean_surface_net_long_wave_radiation_flux_clear_sky",
    "mean_runoff_rate",
    "mean_eastward_gravity_wave_surface_stress",
    "mean_eastward_turbulent_surface_stress",
    "mean_northward_gravity_wave_surface_stress",
    "mean_northward_turbulent_surface_stress",
]

SURFACE_ANALYSIS_VARS = [
    "sea_ice_cover",
    "volumetric_soil_water_layer_1", "volumetric_soil_water_layer_2",
    "volumetric_soil_water_layer_3", "volumetric_soil_water_layer_4",
    "soil_temperature_level_1", "soil_temperature_level_2",
    "soil_temperature_level_3", "soil_temperature_level_4",
    "snow_depth", "snow_density", "sea_surface_temperature",
    "skin_temperature",
    "significant_height_of_combined_wind_waves_and_swell",
]

INVARIANT_VARS = ["land_sea_mask", "geopotential_at_surface", "soil_type"]

PRESSURE_LEVEL_VARS = [
    "specific_humidity", "temperature", "u_component_of_wind",
    "v_component_of_wind", "geopotential",
]

MODEL_LEVEL_3D_VARS = [
    "temperature", "specific_humidity",
    "specific_cloud_liquid_water_content",
    "specific_cloud_ice_water_content", "specific_rain_water_content",
    "specific_snow_water_content", "u_component_of_wind",
    "v_component_of_wind",
]
MODEL_LEVEL_SURFACE_VARS = [
    "surface_pressure", "mean_sea_level_pressure", "skin_temperature",
    "2m_temperature", "2m_dewpoint_temperature",
    "10m_u_component_of_wind", "10m_v_component_of_wind",
]

RENAME_PRESSURE_LEVEL = {
    **{f"specific_humidity_{p}": f"Q{p}" for p in OUTPUT_PRESSURE_LEVELS},
    **{f"temperature_{p}": f"TMP{p}" for p in OUTPUT_PRESSURE_LEVELS},
    **{f"u_component_of_wind_{p}": f"UGRD{p}"
       for p in OUTPUT_PRESSURE_LEVELS},
    **{f"v_component_of_wind_{p}": f"VGRD{p}"
       for p in OUTPUT_PRESSURE_LEVELS},
    **{f"geopotential_{p}": f"h{p}"
       for p in OUTPUT_PRESSURE_LEVELS_GEOPOTENTIAL},
}


# ---------------------------------------------------------------------
# physics (reference xr-beam-pipeline.py:334-457)
# ---------------------------------------------------------------------

def saturation_vapor_pressure(t: np.ndarray) -> np.ndarray:
    a1, a2, a3, a4 = 611.21, 273.16, 17.502, 32.19
    return a1 * np.exp(a3 * (t - a2) / (t - a4))


def specific_humidity_from_dewpoint(dewpoint, pressure):
    ewsat = saturation_vapor_pressure(dewpoint)
    eps = 0.621981
    return eps * ewsat / (pressure - (1 - eps) * ewsat)


def merged_sea_surface_and_skin_temperature(sst, skin_t, ocean_fraction):
    """skin T over land/ice (ocean_fraction < 0.5) or wherever SST is
    undefined; SST otherwise (reference :365)."""
    mask = (ocean_fraction < 0.5) | np.isnan(sst)
    return np.where(mask, skin_t, sst)


def surface_snow_amount(snow_depth):
    return DENSITY_OF_LIQUID_WATER * snow_depth


def surface_snow_area_fraction(snow_depth, snow_density):
    out = (DENSITY_OF_LIQUID_WATER * snow_depth / snow_density) / 0.1
    return np.minimum(out, 1.0)


def surface_snow_thickness(amount, snow_density, area_fraction):
    with np.errstate(divide="ignore", invalid="ignore"):
        out = amount / (snow_density * area_fraction)
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def soil_type_fractions(soil_type: np.ndarray) -> dict:
    out = {}
    for name, sid in SOIL_TYPES.items():
        out[f"{name}_soil_type_fraction"] = np.isclose(
            soil_type, sid, atol=1.0e-3, rtol=0.0
        ).astype(np.float32)
    return out


def fix_top_interface(ak: np.ndarray) -> np.ndarray:
    """Reference :799 — midpoint the top interface so the implicit model
    top pressure is ~1 Pa rather than 0."""
    ak = np.array(ak, dtype=np.float64)
    ak[0] = (ak[0] + ak[1]) / 2.0
    return ak


def layer_thicknesses(ak, bk, surface_pressure):
    """dp[k] for each model level (reference :820)."""
    dak = np.asarray(ak)[1:] - np.asarray(ak)[:-1]
    dbk = np.asarray(bk)[1:] - np.asarray(bk)[:-1]
    return (
        dak[:, None, None]
        + dbk[:, None, None] * np.asarray(surface_pressure)[None]
    )


def vertical_coarsen(var, dp, output_layer_indices):
    """Pressure-weighted coarsening 137 -> len(indices)-1 layers
    (reference :848). var/dp: [137, H, W]."""
    out = []
    for i in range(len(output_layer_indices) - 1):
        sl = slice(output_layer_indices[i], output_layer_indices[i + 1])
        w = dp[sl]
        out.append(
            ((var[sl] * w).sum(axis=0) / w.sum(axis=0)).astype(np.float32)
        )
    return out


def coarse_ak_bk(ak, bk, output_layer_indices):
    return (
        {f"ak_{i}": float(ak[j])
         for i, j in enumerate(output_layer_indices)},
        {f"bk_{i}": float(bk[j])
         for i, j in enumerate(output_layer_indices)},
    )


# ---------------------------------------------------------------------
# target grid + regridding
# ---------------------------------------------------------------------

def gaussian_f_grid(output_grid: str):
    """Gaussian F-grid centers, south-to-north / half-spacing-offset lon
    (reference :262 _make_target_grid)."""
    from numpy.polynomial.legendre import leggauss

    n = GAUSSIAN_GRID_N[output_grid]
    nlat = round(2 * n)
    x, _ = leggauss(nlat)
    lat = np.sort(np.degrees(np.arcsin(x)))
    nlon = round(4 * n)
    dlon = 360.0 / nlon
    lon = np.linspace(dlon / 2, 360 - dlon / 2, nlon)
    return lat, lon


class _Regridder:
    """Cached conservative regridder source-grid -> F-grid with the
    xesmf-compatible skipna/na_thres semantics."""

    def __init__(self, lat_in, lon_in, output_grid: str):
        from ace_tpu.ops.conservative_regrid import ConservativeRegridder

        self.flip = lat_in[0] > lat_in[-1]
        if self.flip:
            lat_in = lat_in[::-1]
        lat_out, lon_out = gaussian_f_grid(output_grid)
        self.lat_out, self.lon_out = lat_out, lon_out
        self._r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)

    def __call__(self, x, skipna=False, na_thres=1.0):
        x = np.asarray(x, np.float64)
        if self.flip:
            x = x[..., ::-1, :]
        return self._r(x, skipna=skipna, na_thres=na_thres).astype(
            np.float32
        )


# ---------------------------------------------------------------------
# streams (pure functions of numpy blocks)
# ---------------------------------------------------------------------

def process_mean_flux_window(arrays: Mapping[str, np.ndarray], regrid):
    """One 6-hour window of hourly mean-flux fields [6, H, W] -> one
    output step of derived fluxes (reference :538 + :608)."""
    a = {k: np.asarray(v, np.float64).mean(axis=0)
         for k, v in arrays.items()}
    out = {
        "DSWRFtoa": a["mean_top_downward_short_wave_radiation_flux"],
        "USWRFtoa": (a["mean_top_downward_short_wave_radiation_flux"]
                     - a["mean_top_net_short_wave_radiation_flux"]),
        "ULWRFtoa": -a["mean_top_net_long_wave_radiation_flux"],
        "DSWRFsfc": a["mean_surface_downward_short_wave_radiation_flux"],
        "USWRFsfc": (
            a["mean_surface_downward_short_wave_radiation_flux"]
            - a["mean_surface_net_short_wave_radiation_flux"]
        ),
        "DLWRFsfc": a["mean_surface_downward_long_wave_radiation_flux"],
        "ULWRFsfc": (
            a["mean_surface_downward_long_wave_radiation_flux"]
            - a["mean_surface_net_long_wave_radiation_flux"]
        ),
        "UCSWRFtoa": (
            a["mean_top_downward_short_wave_radiation_flux"]
            - a["mean_top_net_short_wave_radiation_flux_clear_sky"]
        ),
        "UCLWRFtoa": -a[
            "mean_top_net_long_wave_radiation_flux_clear_sky"
        ],
        "DCSWRFsfc": a[
            "mean_surface_downward_short_wave_radiation_flux_clear_sky"
        ],
        "UCSWRFsfc": (
            a["mean_surface_downward_short_wave_radiation_flux_clear_sky"]
            - a["mean_surface_net_short_wave_radiation_flux_clear_sky"]
        ),
        "DCLWRFsfc": a[
            "mean_surface_downward_long_wave_radiation_flux_clear_sky"
        ],
        "UCLWRFsfc": (
            a["mean_surface_downward_long_wave_radiation_flux_clear_sky"]
            - a["mean_surface_net_long_wave_radiation_flux_clear_sky"]
        ),
        "SHTFLsfc": -a["mean_surface_sensible_heat_flux"],
        "LHTFLsfc": -a["mean_surface_latent_heat_flux"],
        "PRATEsfc": a["mean_total_precipitation_rate"],
        "total_frozen_precipitation_rate": a["mean_snowfall_rate"],
        "runoff_flux": a["mean_runoff_rate"],
        "tendency_of_total_water_path_due_to_advection": -a[
            "mean_vertically_integrated_moisture_divergence"
        ],
        "eastward_surface_stress": (
            a["mean_eastward_gravity_wave_surface_stress"]
            + a["mean_eastward_turbulent_surface_stress"]
        ),
        "northward_surface_stress": (
            a["mean_northward_gravity_wave_surface_stress"]
            + a["mean_northward_turbulent_surface_stress"]
        ),
    }
    return {k: regrid(v) for k, v in out.items()}


def process_invariant(arrays: Mapping[str, np.ndarray], regrid):
    """(reference :642)."""
    out = {
        "HGTsfc": np.asarray(arrays["geopotential_at_surface"]) / GRAVITY,
        "land_fraction": np.asarray(arrays["land_sea_mask"]),
    }
    out.update(soil_type_fractions(np.asarray(arrays["soil_type"])))
    return {k: regrid(v) for k, v in out.items()}


def process_surface_analysis(arrays, invariant_regridded, regrid):
    """Fields [T, H, W] -> regridded dict (reference :658-727)."""
    a = {k: np.asarray(v, np.float64) for k, v in arrays.items()}
    out = {
        "sea_ice_fraction": np.nan_to_num(a["sea_ice_cover"], nan=0.0),
        "soil_moisture_0": a["volumetric_soil_water_layer_1"],
        "soil_moisture_1": a["volumetric_soil_water_layer_2"],
        "soil_moisture_2": a["volumetric_soil_water_layer_3"],
        "soil_moisture_3": a["volumetric_soil_water_layer_4"],
        "soil_temperature_0": a["soil_temperature_level_1"],
        "soil_temperature_1": a["soil_temperature_level_2"],
        "soil_temperature_2": a["soil_temperature_level_3"],
        "soil_temperature_3": a["soil_temperature_level_4"],
    }
    out["surface_snow_amount"] = surface_snow_amount(a["snow_depth"])
    out["surface_snow_area_fraction"] = surface_snow_area_fraction(
        a["snow_depth"], a["snow_density"]
    )
    out["surface_snow_thickness"] = surface_snow_thickness(
        out["surface_snow_amount"], a["snow_density"],
        out["surface_snow_area_fraction"],
    )
    res = {k: regrid(v) for k, v in out.items()}
    # adaptive masking for the masked ocean fields so coastal points
    # keep a defined value (reference :687-698)
    res["sea_surface_temperature"] = regrid(
        a["sea_surface_temperature"], skipna=True, na_thres=1.0
    )
    waves = regrid(
        a["significant_height_of_combined_wind_waves_and_swell"],
        skipna=True, na_thres=1.0,
    )
    res["significant_height_of_combined_wind_waves_and_swell"] = (
        np.nan_to_num(waves, nan=0.0)
    )
    ocean = (
        1.0 - invariant_regridded["land_fraction"]
        - res["sea_ice_fraction"]
    )
    # clip negative ocean into the sea-ice fraction (reference :712-716)
    negative = np.where(ocean < 0, ocean, 0.0)
    res["ocean_fraction"] = (ocean - negative).astype(np.float32)
    res["sea_ice_fraction"] = (
        res["sea_ice_fraction"] + negative
    ).astype(np.float32)
    skin = regrid(a["skin_temperature"])
    res["merged_sea_surface_and_skin_temperature"] = (
        merged_sea_surface_and_skin_temperature(
            res["sea_surface_temperature"], skin, res["ocean_fraction"]
        ).astype(np.float32)
    )
    return res


def process_pressure_level(arrays, levels: np.ndarray, regrid):
    """level-indexed fields [T, L, H, W] -> per-level regridded dict
    with the reference names (reference :749)."""
    levels = np.asarray(levels)
    out = {}
    for name, data in arrays.items():
        plist = (
            OUTPUT_PRESSURE_LEVELS_GEOPOTENTIAL
            if name == "geopotential" else OUTPUT_PRESSURE_LEVELS
        )
        for p in plist:
            (idx,) = np.nonzero(levels == p)
            if idx.size != 1:
                raise ValueError(f"level {p} not in the input dataset")
            field = np.asarray(data)[:, idx[0]]
            if name == "geopotential":
                field = field / GRAVITY
            out[RENAME_PRESSURE_LEVEL[f"{name}_{p}"]] = regrid(field)
    return out


def process_model_level_step(model, surface, ak, bk, regrid,
                             output_layer_indices):
    """One timestep: model[name] [137, H, W], surface[name] [H, W] ->
    regridded ACE fields (reference :881)."""
    q_total = (
        np.asarray(model["specific_humidity"], np.float64)
        + model["specific_cloud_liquid_water_content"]
        + model["specific_cloud_ice_water_content"]
        + model["specific_rain_water_content"]
        + model["specific_snow_water_content"]
    )
    dp = layer_thicknesses(ak, bk, surface["surface_pressure"])
    n_layers = len(output_layer_indices) - 1
    fields = {}
    for short, data in (
        ("t", np.asarray(model["temperature"], np.float64)),
        ("q", q_total),
        ("u", np.asarray(model["u_component_of_wind"], np.float64)),
        ("v", np.asarray(model["v_component_of_wind"], np.float64)),
    ):
        for i, layer in enumerate(
            vertical_coarsen(data, dp, output_layer_indices)
        ):
            fields[f"{short}_{i}"] = layer
    fields["PRESsfc"] = np.asarray(surface["surface_pressure"])
    fields["PRMSL"] = np.asarray(surface["mean_sea_level_pressure"])
    fields["skt"] = np.asarray(surface["skin_temperature"])
    fields["t2m"] = np.asarray(surface["2m_temperature"])
    fields["d2m"] = np.asarray(surface["2m_dewpoint_temperature"])
    fields["u10"] = np.asarray(surface["10m_u_component_of_wind"])
    fields["v10"] = np.asarray(surface["10m_v_component_of_wind"])
    reg = {k: regrid(v) for k, v in fields.items()}
    reg["Q2m"] = specific_humidity_from_dewpoint(
        reg["d2m"], reg["PRESsfc"]
    ).astype(np.float32)
    rename = {
        **{f"q_{i}": f"specific_total_water_{i}"
           for i in range(n_layers)},
        **{f"t_{i}": f"air_temperature_{i}" for i in range(n_layers)},
        **{f"u_{i}": f"eastward_wind_{i}" for i in range(n_layers)},
        **{f"v_{i}": f"northward_wind_{i}" for i in range(n_layers)},
        "skt": "surface_temperature", "t2m": "TMP2m", "u10": "UGRD10m",
        "v10": "VGRD10m", "d2m": "DPT2m",
    }
    return {rename.get(k, k): v for k, v in reg.items()}


def check_data_validity(name, block):
    """Reference :505 — refuse time slices with unexpected NaNs."""
    block = np.asarray(block)
    axes = tuple(range(1, block.ndim))
    if name in VARIABLES_WITH_SOME_MISSING_VALUES:
        bad = np.isnan(block).all(axis=axes)
    else:
        bad = np.isnan(block).any(axis=axes)
    if bad.any():
        raise ValueError(
            f"Missing values in {name!r} at time indices "
            f"{np.nonzero(bad)[0].tolist()}"
        )


# ---------------------------------------------------------------------
# CLI driver
# ---------------------------------------------------------------------

ALL_STREAMS = ("invariant", "mean_flux", "surface_analysis",
               "pressure_level", "model_level", "co2")


@dataclasses.dataclass
class Era5IngestConfig:
    full_37_path: str
    model_level_path: Optional[str]
    output_path: str
    start_time: str
    end_time: str
    co2_path: Optional[str] = None
    co2_name: str = "carbon_dioxide"
    output_grid: str = "F90"
    output_layer_indices: Sequence[int] = dataclasses.field(
        default_factory=lambda: list(DEFAULT_OUTPUT_LAYER_INDICES)
    )
    streams: Sequence[str] = dataclasses.field(
        default_factory=lambda: list(ALL_STREAMS)
    )
    check_data_validity: bool = False
    time_dim: str = "time"
    # time-chunk size of the written zarr (training loaders read
    # per-window; whole-variable chunks would force full decodes)
    output_time_chunk: int = 20
    # ak/bk override when the model-level store carries no GRIB_pv attr
    ak: Optional[Sequence[float]] = None
    bk: Optional[Sequence[float]] = None
    n_input_layers: int = N_INPUT_LAYERS

    @classmethod
    def from_file(cls, path: str) -> "Era5IngestConfig":
        import yaml

        with open(path) as f:
            return from_dict(cls, yaml.safe_load(f))


def _get_ak_bk(ds, config: Era5IngestConfig):
    if config.ak is not None and config.bk is not None:
        return (fix_top_interface(np.asarray(config.ak, np.float64)),
                np.asarray(config.bk, np.float64))
    for name in ds.keys():
        pv = ds[name].attrs.get("GRIB_pv")
        if pv is not None:
            pv = np.asarray(pv, np.float64)
            n = config.n_input_layers
            return fix_top_interface(pv[: n + 1]), pv[n + 1:]
    raise ValueError(
        "no GRIB_pv attribute found; provide ak/bk in the config"
    )


def _time_indices(time: TimeCoord, start_us: int, end_us: int, step_us):
    sel = np.nonzero(
        (time.values >= start_us) & (time.values <= end_us)
        & ((time.values - start_us) % step_us == 0)
    )[0]
    return sel


def run(config: Era5IngestConfig, debug: bool = False) -> None:
    ds = open_file_dataset(config.full_37_path)
    time = ds.read_time(config.time_dim)
    cal = time.calendar
    start = parse_datetime_string(config.start_time, cal)
    end = parse_datetime_string(config.end_time, cal)
    hour_us = 3600 * 10**6
    out_idx = _time_indices(time, start, end, TIME_STEP * hour_us)
    if out_idx.size == 0:
        raise ValueError("no output times in range")
    n_time = out_idx.size
    out_time = TimeCoord(time.values[out_idx], cal)
    lat_in = ds["latitude"].read(())
    lon_in = ds["longitude"].read(())
    regrid = _Regridder(lat_in, lon_in, config.output_grid)
    ny, nx = len(regrid.lat_out), len(regrid.lon_out)
    logger.info("%d output steps on %s (%dx%d)", n_time,
                config.output_grid, ny, nx)
    if debug:
        ds.close()
        return

    arrays: dict[str, np.ndarray] = {}
    dims: dict[str, tuple] = {}
    tdims = (config.time_dim, "lat", "lon")

    def add(name, value, time_varying=True):
        arrays[name] = value.astype(np.float32)
        dims[name] = tdims if time_varying else ("lat", "lon")

    inv_reg = None
    if "invariant" in config.streams or "surface_analysis" in config.streams:
        inv = {n: ds[n].read(()) for n in INVARIANT_VARS}
        # invariant fields may carry a leading time axis; use the first
        inv = {n: (v[0] if v.ndim == 3 else v) for n, v in inv.items()}
        inv_reg = process_invariant(inv, regrid)
        if "invariant" in config.streams:
            for k, v in inv_reg.items():
                add(k, v, time_varying=False)

    if "mean_flux" in config.streams:
        for k in range(n_time):
            # window [T-5h, T]
            t_target = time.values[out_idx[k]]
            sel = np.nonzero(
                (time.values > t_target - 6 * hour_us)
                & (time.values <= t_target)
            )[0]
            if sel.size != 6:
                raise ValueError(
                    f"mean-flux window ending at output step {k} has "
                    f"{sel.size} hourly samples, need 6 — the source "
                    "must start at least 5 hours before start_time"
                )
            block = {n: ds[n].read((sel,)) for n in MEAN_FLUX_VARS}
            if config.check_data_validity:
                for n, b in block.items():
                    check_data_validity(n, b)
            step = process_mean_flux_window(block, regrid)
            for n, v in step.items():
                if n not in arrays:
                    add(n, np.zeros((n_time, ny, nx), np.float32))
                arrays[n][k] = v
            logger.info("mean_flux %d/%d", k + 1, n_time)

    if "surface_analysis" in config.streams:
        block = {n: ds[n].read((out_idx,))
                 for n in SURFACE_ANALYSIS_VARS}
        if config.check_data_validity:
            for n, b in block.items():
                check_data_validity(n, b)
        for n, v in process_surface_analysis(
            block, inv_reg, regrid
        ).items():
            add(n, v)
        logger.info("surface_analysis done")

    if "pressure_level" in config.streams:
        levels = ds["level"].read(())
        block = {n: ds[n].read((out_idx,))
                 for n in PRESSURE_LEVEL_VARS}
        for n, v in process_pressure_level(block, levels, regrid).items():
            add(n, v)
        logger.info("pressure_level done")

    if "model_level" in config.streams:
        if config.model_level_path is None:
            raise ValueError("model_level stream needs model_level_path")
        ml = open_file_dataset(config.model_level_path)
        ml_time = ml.read_time(config.time_dim)
        ak, bk = _get_ak_bk(ml, config)
        akc, bkc = coarse_ak_bk(ak, bk, config.output_layer_indices)
        for name, val in {**akc, **bkc}.items():
            arrays[name] = np.float64(val)
            dims[name] = ()
        for k in range(n_time):
            t_target = time.values[out_idx[k]]
            (mi,) = np.nonzero(ml_time.values == t_target)
            if mi.size != 1:
                raise ValueError(
                    f"model-level store missing output time index {k}"
                )
            model = {n: ml[n].read((mi,))[0] for n in MODEL_LEVEL_3D_VARS}
            surface = {
                n: ds[n].read((out_idx[k: k + 1],))[0]
                for n in MODEL_LEVEL_SURFACE_VARS
            }
            step = process_model_level_step(
                model, surface, ak, bk, regrid,
                config.output_layer_indices,
            )
            for n, v in step.items():
                if n not in arrays:
                    add(n, np.zeros((n_time, ny, nx), np.float32))
                arrays[n][k] = v
            logger.info("model_level %d/%d", k + 1, n_time)
        ml.close()

    if "co2" in config.streams and config.co2_path is not None:
        co2 = open_file_dataset(config.co2_path)
        co2_time = co2.read_time(config.time_dim)
        vals = co2[config.co2_name].read(())
        interp = np.interp(
            out_time.values.astype(np.float64),
            co2_time.values.astype(np.float64), np.asarray(vals),
        )
        arrays[config.co2_name] = interp.astype(np.float32)
        dims[config.co2_name] = (config.time_dim,)
        co2.close()
        logger.info("co2 done")

    ds.close()
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
        description="ERA5 -> ACE training dataset ingestion."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run(Era5IngestConfig.from_file(args.yaml), debug=args.debug)


if __name__ == "__main__":
    main()
