"""Atmosphere physics-constraint corrector
(reference: fme/core/corrector/atmosphere.py).

Applied to denormalized generated data after each step: force-positive
clamps, global dry-air mass conservation, zero global-mean moisture
advection, moisture budget closure, and total-energy conservation via a
uniform temperature correction.

JAX design notes:
- corrections are pure functions; per-sample corrector state (the pinned
  IC dry-air mass) is an explicit pytree threaded through ``lax.scan``
  carries with a *static* structure decided at build time;
- the reference computes dry-air conservation in float64 on GPU
  (atmosphere.py:368); TPUs have no fast f64, so we instead compute the
  *anomaly* mean ``mean(dry_air - target)`` in float32, which keeps the
  reduction at the ~Pa scale of the correction and preserves precision
  without f64.
"""

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from ace_tpu.core.atmosphere_data import AtmosphereData, compute_layer_thickness
from ace_tpu.core.constants import (
    GRAVITY,
    SPECIFIC_HEAT_OF_DRY_AIR_CONST_VOLUME,
)
from ace_tpu.core.typing_ import TensorDict, TensorMapping

# CorrectorState is a plain dict pytree; keys present are decided statically
# at corrector build time so scan carries have a fixed structure.
CorrectorState = dict


def replace_value_keep_gradient(x, new_value):
    """Straight-through estimator: forward = new_value, gradient = identity
    (reference: fme/core/corrector/utils.py:9).
    """
    return x + jax.lax.stop_gradient(new_value - x)


def force_positive(data: TensorMapping, names: list[str],
                   keep_gradient: bool = False) -> TensorDict:
    out: TensorDict = {}
    for name in names:
        clamped = jnp.clip(data[name], min=0.0)
        if keep_gradient:
            clamped = replace_value_keep_gradient(data[name], clamped)
        out[name] = clamped
    return out


@dataclasses.dataclass
class EnergyBudgetConfig:
    """Total energy budget correction config
    (reference: fme/core/corrector/atmosphere.py:35).
    """

    method: Literal["constant_temperature"]
    constant_unaccounted_heating: float = 0.0


@dataclasses.dataclass
class AtmosphereCorrectorConfig:
    """Post-step state corrector configuration
    (reference: fme/core/corrector/atmosphere.py:223 AtmosphereCorrectorConfig).
    """

    conserve_dry_air: bool = False
    zero_global_mean_moisture_advection: bool = False
    moisture_budget_correction: (
        Literal[
            "precipitation",
            "evaporation",
            "advection_and_precipitation",
            "advection_and_evaporation",
        ]
        | None
    ) = None
    force_positive_names: list[str] = dataclasses.field(default_factory=list)
    total_energy_budget_correction: EnergyBudgetConfig | None = None
    keep_gradient_through_clamps: bool = False
    clip_frozen_precipitation: bool = False
    # train-mode steps skip the corrector for this many initial epochs;
    # eval-mode steps always apply it (reference:
    # fme/core/corrector/registry.py:29 CorrectorConfigABC)
    corrector_disabled_epochs: int = 0

    def __post_init__(self):
        if self.corrector_disabled_epochs < 0:
            raise ValueError(
                "corrector_disabled_epochs must be non-negative, got "
                f"{self.corrector_disabled_epochs}"
            )

    def build(self, gridded_operations, vertical_coordinate, timestep):
        return AtmosphereCorrector(
            config=self,
            area_weighted_mean=gridded_operations.area_weighted_mean,
            vertical_coordinate=vertical_coordinate,
            timestep_seconds=timestep.total_seconds(),
        )

    @property
    def is_noop(self) -> bool:
        return not (
            self.conserve_dry_air
            or self.zero_global_mean_moisture_advection
            or self.moisture_budget_correction is not None
            or self.force_positive_names
            or self.total_energy_budget_correction is not None
        )


@dataclasses.dataclass
class CorrectorOutput:
    corrected: TensorDict
    corrector_state: CorrectorState
    delta: TensorDict  # per-variable correction diagnostics (stop-gradient)


class AtmosphereCorrector:
    """Ordered application of the configured corrections (order mirrors
    reference _build: force_positive -> dry air -> zero-mean advection ->
    moisture budget (+frozen clip) -> energy budget).
    """

    def __init__(self, config, area_weighted_mean, vertical_coordinate,
                 timestep_seconds):
        self.config = config
        self._awm = area_weighted_mean
        self._vc = vertical_coordinate
        self._dt = timestep_seconds
        if config.conserve_dry_air and vertical_coordinate is None:
            raise ValueError(
                "conserve_dry_air requires a vertical coordinate"
            )
        if config.moisture_budget_correction and vertical_coordinate is None:
            raise ValueError(
                "moisture budget correction requires a vertical coordinate"
            )

    def init_state(self, input_data: TensorMapping) -> CorrectorState:
        """Seed per-sample corrector state from the initial condition.

        The reference seeds lazily on first call (atmosphere.py:404); in JAX
        the state structure must be static inside ``scan``, so the Stepper
        seeds it from the IC before the rollout.
        """
        state: CorrectorState = {}
        if self.config.conserve_dry_air:
            ic = AtmosphereData(input_data, self._vc)
            state["global_dry_air_mass"] = self._awm(
                ic.surface_pressure_due_to_dry_air, keepdim=True
            )
        return state

    def __call__(
        self,
        input_data: TensorMapping,
        gen_data: TensorMapping,
        forcing_data: TensorMapping,
        corrector_state: CorrectorState | None,
    ) -> CorrectorOutput:
        cfg = self.config
        state = dict(corrector_state or {})
        snapshot = dict(gen_data)
        gen = dict(gen_data)
        modified: set[str] = set()

        def apply(changed: TensorDict):
            gen.update(changed)
            modified.update(changed.keys())

        if cfg.force_positive_names:
            apply(force_positive(
                gen, cfg.force_positive_names,
                keep_gradient=cfg.keep_gradient_through_clamps,
            ))

        if cfg.conserve_dry_air:
            if "global_dry_air_mass" not in state:
                state.update(self.init_state(input_data))
            apply(_adjust_gen_dry_air_to_target(
                gen, state["global_dry_air_mass"], self._awm, self._vc
            ))

        if cfg.zero_global_mean_moisture_advection:
            apply(_force_zero_global_mean_moisture_advection(gen, self._awm))

        if cfg.moisture_budget_correction is not None:
            apply(_force_conserve_moisture(
                input_data, gen, self._awm, self._vc, self._dt,
                cfg.moisture_budget_correction,
            ))
            if cfg.clip_frozen_precipitation:
                apply(_clip_frozen_precipitation(gen))

        if cfg.total_energy_budget_correction is not None:
            ec = cfg.total_energy_budget_correction
            apply(_force_conserve_total_energy(
                input_data, gen, forcing_data, self._awm, self._vc, self._dt,
                method=ec.method,
                unaccounted_heating=ec.constant_unaccounted_heating,
            ))

        delta = {
            k: jax.lax.stop_gradient(gen[k] - snapshot[k]) for k in modified
        }
        return CorrectorOutput(corrected=gen, corrector_state=state, delta=delta)


def _adjust_gen_dry_air_to_target(
    gen_data, target_global_dry_air, area_weighted_mean, vertical_coordinate
) -> TensorDict:
    """Pin global-mean dry-air mass to the target by a globally-constant
    dry-air pressure offset, solving for the consistent surface pressure
    (reference: fme/core/corrector/atmosphere.py:430):

        dry_air = ps - sum_k((ak_diff + bk_diff * ps) * wat_k)
        ps = (dry_air + sum_k(ak_diff * wat_k)) / (1 - sum_k(bk_diff * wat_k))
    """
    gen = AtmosphereData(gen_data, vertical_coordinate)
    gen_dry_air = gen.surface_pressure_due_to_dry_air
    # anomaly-space mean keeps the f32 reduction at the scale of the error
    error = area_weighted_mean(
        gen_dry_air - target_global_dry_air, keepdim=True
    )
    new_gen_dry_air = gen_dry_air - error
    wat = gen.specific_total_water
    ak_diff = jnp.diff(vertical_coordinate.get_ak())
    bk_diff = jnp.diff(vertical_coordinate.get_bk())
    new_pressure = (new_gen_dry_air + jnp.sum(ak_diff * wat, axis=-1)) / (
        1 - jnp.sum(bk_diff * wat, axis=-1)
    )
    gen.set_surface_pressure(new_pressure)
    return gen.modified_data


def _force_zero_global_mean_moisture_advection(
    gen_data, area_weighted_mean
) -> TensorDict:
    gen = AtmosphereData(gen_data)
    adv = gen.tendency_of_total_water_path_due_to_advection
    mean_adv = area_weighted_mean(adv, keepdim=True)
    gen.set_tendency_of_total_water_path_due_to_advection(adv - mean_adv)
    return gen.modified_data


def _clip_frozen_precipitation(gen_data: TensorMapping) -> TensorDict:
    """Frozen precip is a component of total precip, so clip it to the
    (corrected) total rate (reference: atmosphere.py:493).
    """
    if "total_frozen_precipitation_rate" not in gen_data:
        return {}
    gen = AtmosphereData(gen_data)
    gen.set_frozen_precipitation_rate(
        jnp.minimum(gen.frozen_precipitation_rate, gen.precipitation_rate)
    )
    return gen.modified_data


def _force_conserve_moisture(
    input_data, gen_data, area_weighted_mean, vertical_coordinate,
    timestep_seconds, terms_to_modify,
) -> TensorDict:
    """Close the moisture budget (reference: atmosphere.py:518)."""
    inp = AtmosphereData(input_data, vertical_coordinate)
    gen = AtmosphereData(gen_data, vertical_coordinate)

    twp_total_tendency = (
        gen.total_water_path - inp.total_water_path
    ) / timestep_seconds
    twp_tendency_gm = area_weighted_mean(twp_total_tendency, keepdim=True)
    evap_gm = area_weighted_mean(gen.evaporation_rate, keepdim=True)
    precip_gm = area_weighted_mean(gen.precipitation_rate, keepdim=True)
    if terms_to_modify.endswith("precipitation"):
        new_precip_gm = evap_gm - twp_tendency_gm
        gen.set_precipitation_rate(
            gen.precipitation_rate * (new_precip_gm / precip_gm)
        )
    elif terms_to_modify.endswith("evaporation"):
        new_evap_gm = twp_tendency_gm + precip_gm
        gen.set_evaporation_rate(
            gen.evaporation_rate * (new_evap_gm / evap_gm)
        )
    if terms_to_modify.startswith("advection"):
        new_advection = twp_total_tendency - (
            gen.evaporation_rate - gen.precipitation_rate
        )
        gen.set_tendency_of_total_water_path_due_to_advection(new_advection)
    return gen.modified_data


def _force_conserve_total_energy(
    input_data, gen_data, forcing_data, area_weighted_mean,
    vertical_coordinate, timestep_seconds,
    method="constant_temperature", unaccounted_heating=0.0,
) -> TensorDict:
    """Conserve total energy via a uniform air-temperature correction
    (reference: atmosphere.py:611).
    """
    if method != "constant_temperature":
        raise NotImplementedError(
            f"method {method} not implemented for total energy conservation"
        )
    inp = AtmosphereData(input_data, vertical_coordinate)
    forcing = AtmosphereData(forcing_data)
    atmosphere_data = dict(gen_data)
    atmosphere_data["DSWRFtoa"] = forcing.toa_down_sw_radiative_flux
    atmosphere_data["HGTsfc"] = forcing.surface_height
    gen = AtmosphereData(atmosphere_data, vertical_coordinate)

    gen_energy_gm = area_weighted_mean(gen.total_energy_ace2_path, keepdim=True)
    input_energy_gm = area_weighted_mean(inp.total_energy_ace2_path, keepdim=True)
    flux_gm = area_weighted_mean(
        gen.net_energy_flux_into_atmosphere, keepdim=True
    )
    desired_energy_gm = (
        input_energy_gm + (flux_gm + unaccounted_heating) * timestep_seconds
    )
    energy_correction = desired_energy_gm - gen_energy_gm
    factor_gm = area_weighted_mean(
        _energy_correction_factor(gen, vertical_coordinate), keepdim=True
    )
    temperature_correction = energy_correction / factor_gm
    names = gen.get_all_vertical_level_names("air_temperature")
    return {
        name: gen.data[name] + temperature_correction for name in names
    }


def _energy_correction_factor(gen: AtmosphereData, vertical_coordinate):
    """Factor converting a uniform temperature change to a change in
    column-integrated total energy (reference: atmosphere.py:690).
    """
    interface_pressure = vertical_coordinate.interface_pressure(
        gen.surface_pressure
    )
    q_times_dlogp = (
        compute_layer_thickness(
            interface_pressure, gen.air_temperature, gen.specific_total_water
        )
        * GRAVITY
        / gen.air_temperature
    )
    cumulative = jnp.flip(
        jnp.cumsum(jnp.flip(q_times_dlogp, axis=-1), axis=-1), axis=-1
    )
    total_integrand = (
        SPECIFIC_HEAT_OF_DRY_AIR_CONST_VOLUME - 0.5 * q_times_dlogp + cumulative
    )
    return vertical_coordinate.vertical_integral(
        total_integrand, gen.surface_pressure
    )
