"""Named-field accessor over a TensorDict with atmospheric physics
properties (reference: fme/core/atmosphere_data.py).

Vertical-level variables (``specific_total_water_{k}``) are stacked on
demand along a trailing axis; physics properties (water/energy paths,
fluxes) are computed lazily from the dict.
"""

from collections.abc import Mapping

import jax.numpy as jnp

from ace_tpu.core.constants import (
    GRAVITY,
    LATENT_HEAT_OF_VAPORIZATION,
    RDGAS,
    RVGAS,
    SPECIFIC_HEAT_OF_DRY_AIR_CONST_PRESSURE,
    SPECIFIC_HEAT_OF_DRY_AIR_CONST_VOLUME,
)
from ace_tpu.core import metrics
from ace_tpu.core.stacker import Stacker
from ace_tpu.core.typing_ import TensorDict, TensorMapping

ATMOSPHERE_FIELD_NAME_PREFIXES = {
    "specific_total_water": ["specific_total_water_"],
    "surface_pressure": ["PRESsfc", "PS"],
    "surface_height": ["HGTsfc"],
    "surface_geopotential": ["PHIS"],
    "tendency_of_total_water_path_due_to_advection": [
        "tendency_of_total_water_path_due_to_advection"
    ],
    "latent_heat_flux": ["LHTFLsfc", "LHFLX"],
    "sensible_heat_flux": ["SHTFLsfc", "SHFLX"],
    "precipitation_rate": ["PRATEsfc", "surface_precipitation_rate"],
    "sfc_down_sw_radiative_flux": ["DSWRFsfc", "FSDS"],
    "sfc_up_sw_radiative_flux": ["USWRFsfc", "surface_upward_shortwave_flux"],
    "sfc_down_lw_radiative_flux": ["DLWRFsfc", "FLDS"],
    "sfc_up_lw_radiative_flux": ["ULWRFsfc", "surface_upward_longwave_flux"],
    "toa_up_lw_radiative_flux": ["ULWRFtoa", "FLUT"],
    "toa_up_sw_radiative_flux": ["USWRFtoa", "top_of_atmos_upward_shortwave_flux"],
    "toa_down_sw_radiative_flux": ["DSWRFtoa", "SOLIN"],
    "air_temperature": ["air_temperature_", "T_"],
    "frozen_precipitation_rate": ["total_frozen_precipitation_rate"],
    "eastward_wind_at_10m": ["UGRD10m"],
    "northward_wind_at_10m": ["VGRD10m"],
}


class AtmosphereData:
    def __init__(
        self,
        atmosphere_data: TensorMapping,
        vertical_coordinate=None,
        atmosphere_field_name_prefixes: Mapping[str, list[str]] | None = None,
    ):
        if atmosphere_field_name_prefixes is None:
            atmosphere_field_name_prefixes = ATMOSPHERE_FIELD_NAME_PREFIXES.copy()
        self._data = dict(atmosphere_data)
        self._prefix_map = atmosphere_field_name_prefixes
        self._vertical_coordinate = vertical_coordinate
        self._stacker = Stacker(atmosphere_field_name_prefixes)
        self._modified_keys: set[str] = set()

    @property
    def data(self) -> TensorDict:
        return self._data

    @property
    def modified_data(self) -> TensorDict:
        return {k: self._data[k] for k in self._modified_keys}

    def _get(self, name):
        for prefix in self._prefix_map[name]:
            if prefix in self._data:
                return self._data[prefix]
        raise KeyError(name)

    def _set(self, name, value):
        for prefix in self._prefix_map[name]:
            if prefix in self._data:
                self._data[prefix] = value
                self._modified_keys.add(prefix)
                return
        raise KeyError(name)

    def _set_levels(self, name, value):
        """Write a stacked [..., n_levels] tensor back to per-level keys."""
        names = self.get_all_vertical_level_names(name)
        for i, key in enumerate(names):
            self._data[key] = value[..., i]
            self._modified_keys.add(key)

    def get_all_vertical_level_names(self, standard_name: str) -> list[str]:
        return self._stacker.get_all_level_names(standard_name, self._data)

    @property
    def air_temperature(self) -> jnp.ndarray:
        return self._stacker("air_temperature", self._data)

    def set_air_temperature(self, value):
        self._set_levels("air_temperature", value)

    @property
    def specific_total_water(self) -> jnp.ndarray:
        return self._stacker("specific_total_water", self._data)

    @property
    def surface_height(self) -> jnp.ndarray:
        try:
            return self._get("surface_height")
        except KeyError:
            # E3SM stores geopotential; convert with its gravity constant
            GRAVITY_E3SM = 9.80616
            return self._get("surface_geopotential") / GRAVITY_E3SM

    @property
    def surface_pressure(self) -> jnp.ndarray:
        return self._get("surface_pressure")

    def set_surface_pressure(self, value):
        self._set("surface_pressure", value)

    @property
    def toa_down_sw_radiative_flux(self):
        return self._get("toa_down_sw_radiative_flux")

    @property
    def toa_up_sw_radiative_flux(self):
        return self._get("toa_up_sw_radiative_flux")

    @property
    def toa_up_lw_radiative_flux(self):
        return self._get("toa_up_lw_radiative_flux")

    @property
    def surface_pressure_due_to_dry_air(self) -> jnp.ndarray:
        if self._vertical_coordinate is None:
            raise ValueError("Vertical coordinate required to compute dry air.")
        return metrics.surface_pressure_due_to_dry_air(
            self.surface_pressure, self.total_water_path
        )

    @property
    def total_water_path(self) -> jnp.ndarray:
        if self._vertical_coordinate is None:
            raise ValueError(
                "Vertical coordinate required to compute total water path."
            )
        return self._vertical_coordinate.vertical_integral(
            self.specific_total_water, self.surface_pressure
        )

    @property
    def frozen_precipitation_rate(self) -> jnp.ndarray:
        try:
            return self._get("frozen_precipitation_rate")
        except KeyError:
            try:
                return (
                    self._data["ICEsfc"]
                    + self._data["GRAUPELsfc"]
                    + self._data["SNOWsfc"]
                )
            except KeyError:
                try:
                    return jnp.zeros_like(self.surface_pressure)
                except KeyError:
                    return jnp.zeros_like(self.precipitation_rate)

    def set_frozen_precipitation_rate(self, value):
        self._set("frozen_precipitation_rate", value)

    @property
    def net_surface_energy_flux_without_frozen_precip(self):
        return metrics.net_surface_energy_flux(
            self._get("sfc_down_lw_radiative_flux"),
            self._get("sfc_up_lw_radiative_flux"),
            self._get("sfc_down_sw_radiative_flux"),
            self._get("sfc_up_sw_radiative_flux"),
            self._get("latent_heat_flux"),
            self._get("sensible_heat_flux"),
        )

    @property
    def net_surface_energy_flux(self):
        return metrics.net_surface_energy_flux(
            self._get("sfc_down_lw_radiative_flux"),
            self._get("sfc_up_lw_radiative_flux"),
            self._get("sfc_down_sw_radiative_flux"),
            self._get("sfc_up_sw_radiative_flux"),
            self._get("latent_heat_flux"),
            self._get("sensible_heat_flux"),
            frozen_precipitation_rate=self.frozen_precipitation_rate,
        )

    @property
    def net_top_of_atmosphere_energy_flux(self):
        return metrics.net_top_of_atmosphere_energy_flux(
            self._get("toa_down_sw_radiative_flux"),
            self._get("toa_up_sw_radiative_flux"),
            self._get("toa_up_lw_radiative_flux"),
        )

    @property
    def net_energy_flux_into_atmosphere(self):
        return self.net_top_of_atmosphere_energy_flux - self.net_surface_energy_flux

    @property
    def precipitation_rate(self):
        return self._get("precipitation_rate")

    def set_precipitation_rate(self, value):
        self._set("precipitation_rate", value)

    @property
    def latent_heat_flux(self):
        return self._get("latent_heat_flux")

    @property
    def evaporation_rate(self):
        return self._get("latent_heat_flux") / LATENT_HEAT_OF_VAPORIZATION

    def set_evaporation_rate(self, value):
        self._set("latent_heat_flux", value * LATENT_HEAT_OF_VAPORIZATION)

    @property
    def tendency_of_total_water_path_due_to_advection(self):
        return self._get("tendency_of_total_water_path_due_to_advection")

    def set_tendency_of_total_water_path_due_to_advection(self, value):
        self._set("tendency_of_total_water_path_due_to_advection", value)

    def height_at_log_midpoint(self) -> jnp.ndarray:
        interface_pressure = self._vertical_coordinate.interface_pressure(
            self.surface_pressure
        )
        layer_thickness = compute_layer_thickness(
            interface_pressure, self.air_temperature, self.specific_total_water
        )
        height_at_interface = _height_at_interface(
            layer_thickness, self.surface_height
        )
        return (
            height_at_interface[..., :-1] * height_at_interface[..., 1:]
        ) ** 0.5

    @property
    def height_at_midpoint(self) -> jnp.ndarray:
        if self._vertical_coordinate is None:
            raise ValueError(
                "height_at_midpoint requires a vertical coordinate"
            )
        interface_pressure = self._vertical_coordinate.interface_pressure(
            self.surface_pressure
        )
        layer_thickness = compute_layer_thickness(
            interface_pressure, self.air_temperature, self.specific_total_water
        )
        height_at_interface = _height_at_interface(
            layer_thickness, self.surface_height
        )
        return 0.5 * (
            height_at_interface[..., :-1] + height_at_interface[..., 1:]
        )

    @property
    def moist_static_energy(self) -> jnp.ndarray:
        return (
            self.air_temperature * SPECIFIC_HEAT_OF_DRY_AIR_CONST_PRESSURE
            + self.specific_total_water * LATENT_HEAT_OF_VAPORIZATION
            + self.height_at_midpoint * GRAVITY
        )

    @property
    def total_energy_ace2(self) -> jnp.ndarray:
        """Total energy under ACE2's assumptions: no kinetic energy,
        hydrostatic geopotential, total water ≈ specific humidity.
        """
        return (
            self.air_temperature * SPECIFIC_HEAT_OF_DRY_AIR_CONST_VOLUME
            + self.specific_total_water * LATENT_HEAT_OF_VAPORIZATION
            + self.height_at_midpoint * GRAVITY
        )

    @property
    def total_energy_ace2_path(self) -> jnp.ndarray:
        if self._vertical_coordinate is None:
            # ValueError so the derived-variable loop skips (its except
            # clause catches KeyError/ValueError only)
            raise ValueError(
                "total_energy_ace2_path requires a vertical coordinate"
            )
        return self._vertical_coordinate.vertical_integral(
            self.total_energy_ace2, self.surface_pressure
        )

    @property
    def windspeed_at_10m(self) -> jnp.ndarray:
        return jnp.sqrt(
            self._get("eastward_wind_at_10m") ** 2
            + self._get("northward_wind_at_10m") ** 2
        )


def compute_layer_thickness(
    pressure_at_interface, air_temperature, specific_total_water
) -> jnp.ndarray:
    """Hydrostatic layer thickness (reference:
    fme/core/atmosphere_data.py:376). Clamps interface pressure to >= 1 Pa
    before the log so ERA5's 0 Pa TOA stays differentiable.
    """
    tv = air_temperature * (1 + (RVGAS / RDGAS - 1.0) * specific_total_water)
    dlogp = jnp.diff(
        jnp.log(jnp.clip(pressure_at_interface, min=1.0)), axis=-1
    )
    return dlogp * RDGAS * tv / GRAVITY


def _height_at_interface(layer_thickness, surface_height) -> jnp.ndarray:
    cumulative_thickness = jnp.flip(
        jnp.cumsum(jnp.flip(layer_thickness, axis=-1), axis=-1), axis=-1
    )
    hsfc = jnp.where(surface_height < 0.0, 0.0, surface_height)[..., None]
    return jnp.concatenate(
        [
            cumulative_thickness
            + jnp.broadcast_to(hsfc, cumulative_thickness.shape),
            jnp.broadcast_to(hsfc, (*cumulative_thickness.shape[:-1], 1)),
        ],
        axis=-1,
    )
