"""Registry of derived variables computed post-rollout from AtmosphereData
(reference: fme/core/derived_variables.py).

Functions take (AtmosphereData over [batch, time, lat, lon] fields,
timestep) and return a derived field; they are computed only when not
already present in the data.
"""

import datetime
import logging
from collections.abc import Callable, MutableMapping

import jax.numpy as jnp

from ace_tpu.core.atmosphere_data import AtmosphereData
from ace_tpu.core.dataset_info import VariableMetadata
from ace_tpu.core.typing_ import TensorDict

DerivedVariableFunc = Callable[
    [AtmosphereData, datetime.timedelta], jnp.ndarray
]

_DERIVED_VARIABLE_REGISTRY: MutableMapping[
    str, tuple[DerivedVariableFunc, VariableMetadata]
] = {}


def get_derived_variable_metadata() -> dict[str, VariableMetadata]:
    return {
        label: metadata
        for label, (_, metadata) in _DERIVED_VARIABLE_REGISTRY.items()
    }


def register(metadata: VariableMetadata):
    def decorator(func: DerivedVariableFunc):
        label = func.__name__
        if label in _DERIVED_VARIABLE_REGISTRY:
            raise ValueError(f"{label} already registered")
        _DERIVED_VARIABLE_REGISTRY[label] = (func, metadata)
        return func

    return decorator


@register(VariableMetadata("Pa", "Surface pressure due to dry air only"))
def surface_pressure_due_to_dry_air(data, timestep):
    return data.surface_pressure_due_to_dry_air


@register(
    VariableMetadata("Pa/s", "Absolute value of tendency of dry air surface pressure")
)
def surface_pressure_due_to_dry_air_absolute_tendency(data, timestep):
    ps_dry = data.surface_pressure_due_to_dry_air
    tendency = jnp.abs(jnp.diff(ps_dry, axis=1))
    return jnp.concatenate(
        [jnp.zeros_like(ps_dry[:, :1]), tendency], axis=1
    )


@register(VariableMetadata("kg/m**2", "Total water path"))
def total_water_path(data, timestep):
    return data.total_water_path


@register(VariableMetadata("kg/m**2/s", "Total water path budget residual"))
def total_water_path_budget_residual(data, timestep):
    twp = data.total_water_path
    tendency = (twp[:, 1:] - twp[:, :-1]) / timestep.total_seconds()
    residual = tendency - (
        data.evaporation_rate[:, 1:]
        - data.precipitation_rate[:, 1:]
        + data.tendency_of_total_water_path_due_to_advection[:, 1:]
    )
    return jnp.concatenate(
        [jnp.zeros_like(twp[:, :1]), residual], axis=1
    )


@register(VariableMetadata("W/m**2", "Net TOA radiative flux into atmosphere"))
def net_energy_flux_toa_into_atmosphere(data, timestep):
    return data.net_top_of_atmosphere_energy_flux


@register(VariableMetadata("W/m**2", "Net surface energy flux into atmosphere"))
def net_energy_flux_sfc_into_atmosphere(data, timestep):
    return -data.net_surface_energy_flux


@register(
    VariableMetadata("W/m**2", "Net energy flux into atmospheric column")
)
def net_energy_flux_into_atmospheric_column(data, timestep):
    return data.net_energy_flux_into_atmosphere


@register(
    VariableMetadata("J/m**2", "Total energy path following ACE2 assumptions")
)
def total_energy_ace2_path(data, timestep):
    return data.total_energy_ace2_path


@register(
    VariableMetadata("W/m**2", "Tendency of ACE2 total energy path")
)
def total_energy_ace2_path_tendency(data, timestep):
    path = data.total_energy_ace2_path
    tendency = (path[:, 1:] - path[:, :-1]) / timestep.total_seconds()
    return jnp.concatenate(
        [jnp.zeros_like(path[:, :1]), tendency], axis=1
    )


@register(
    VariableMetadata(
        "W/m**2",
        "Implied advective tendency of total energy path assuming "
        "closed budget",
    )
)
def implied_tendency_of_total_energy_ace2_path_due_to_advection(
    data, timestep
):
    """Residual of the column total energy budget (reference
    derived_variables.py:150)."""
    path = data.total_energy_ace2_path
    tendency = (path[:, 1:] - path[:, :-1]) / timestep.total_seconds()
    tendency = jnp.concatenate(
        [jnp.zeros_like(path[:, :1]), tendency], axis=1
    )
    return tendency - data.net_energy_flux_into_atmosphere


@register(VariableMetadata("m/s", "Windspeed at 10m above surface"))
def windspeed_at_10m(data, timestep):
    return data.windspeed_at_10m


def compute_derived_quantities(
    data: TensorDict,
    vertical_coordinate,
    timestep: datetime.timedelta,
    forcing_data: TensorDict | None = None,
) -> TensorDict:
    """Compute all registered derived variables that are absent and
    computable from the given fields (reference: derived_variables.py:219).
    """
    out = dict(data)
    merged = dict(data)
    if forcing_data is not None:
        for k, v in forcing_data.items():
            merged.setdefault(k, v)
    atm = AtmosphereData(merged, vertical_coordinate)
    for label, (func, _) in _DERIVED_VARIABLE_REGISTRY.items():
        if label in out:
            continue
        try:
            out[label] = func(atm, timestep)
        except (KeyError, ValueError):
            logging.debug(f"cannot compute derived variable {label}")
    return out


# ----- ocean derived variables (reference: ocean_derived_variables.py) --


_OCEAN_DERIVED_VARIABLE_REGISTRY: dict = {}


def ocean_register(metadata: VariableMetadata, exists_ok: bool = False):
    def decorator(func):
        _OCEAN_DERIVED_VARIABLE_REGISTRY[func.__name__] = (
            func, metadata, exists_ok
        )
        return func

    return decorator


def get_ocean_derived_variable_metadata() -> dict[str, VariableMetadata]:
    return {
        label: meta
        for label, (_, meta, _) in
        _OCEAN_DERIVED_VARIABLE_REGISTRY.items()
    }


@ocean_register(
    VariableMetadata("J/m**2", "Column-integrated ocean heat content")
)
def ocean_heat_content(data, timestep):
    return data.ocean_heat_content


@ocean_register(VariableMetadata(
    "W/m**2", "Tendency of column-integrated ocean heat content"
))
def ocean_heat_content_tendency(data, timestep):
    ohc = data.ocean_heat_content
    tend = jnp.diff(ohc, axis=1) / timestep.total_seconds()
    return jnp.concatenate(
        [jnp.zeros_like(ohc[:, :1]), tend], axis=1
    )


@ocean_register(VariableMetadata(
    "W/m**2",
    "Implied advective tendency of ocean heat content assuming closed "
    "budget",
))
def implied_tendency_of_ocean_heat_content_due_to_advection(
    data, timestep
):
    return (
        ocean_heat_content_tendency(data, timestep)
        - data.net_energy_flux_into_ocean
    )


@ocean_register(VariableMetadata(
    "W/m**2", "Net energy flux through surface and sea floor into ocean"
))
def net_energy_flux_into_ocean_column(data, timestep):
    return data.net_energy_flux_into_ocean


@ocean_register(
    VariableMetadata("[0-1]", "sea ice concentration"), exists_ok=True
)
def sea_ice_fraction(data, timestep):
    return data.sea_ice_fraction


def compute_ocean_derived_quantities(
    data: TensorDict,
    depth_coordinate,
    timestep: datetime.timedelta,
    forcing_data: TensorDict | None = None,
) -> TensorDict:
    """(reference: ocean_derived_variables.py:104)."""
    from ace_tpu.core.ocean_data import OceanData

    out = dict(data)
    merged = dict(data)
    if forcing_data is not None:
        for k, v in forcing_data.items():
            merged.setdefault(k, v)
    ocean = OceanData(merged, depth_coordinate)
    for label, (func, _, exists_ok) in (
        _OCEAN_DERIVED_VARIABLE_REGISTRY.items()
    ):
        if label in out:
            if exists_ok:
                continue
            raise ValueError(
                f"variable {label} already exists; derived variables "
                "may not collide with dataset variables unless "
                "registered with exists_ok=True (reference "
                "ocean_derived_variables.py:77-84)"
            )
        try:
            out[label] = func(ocean, timestep)
        except (KeyError, ValueError):
            logging.debug(f"cannot compute ocean derived {label}")
    return out


def compute_derived_for(
    data: TensorDict,
    vertical_coordinate,
    timestep: datetime.timedelta,
    forcing_data: TensorDict | None = None,
) -> TensorDict:
    """Dispatch derived-variable computation on the vertical coordinate
    type: DepthCoordinate routes to the ocean registry, anything else to
    the atmosphere registry (reference:
    fme/core/coordinates.py:351 DepthCoordinate.build_derive_function ->
    OceanDeriveFn vs :256 HybridSigmaPressureCoordinate -> AtmosphereDeriveFn).
    """
    from ace_tpu.core.coordinates import DepthCoordinate

    if isinstance(vertical_coordinate, DepthCoordinate):
        return compute_ocean_derived_quantities(
            data, vertical_coordinate, timestep, forcing_data
        )
    return compute_derived_quantities(
        data, vertical_coordinate, timestep, forcing_data
    )
