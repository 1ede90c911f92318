"""Coupled atmosphere-ocean stepper
(reference: fme/coupled/stepper.py:872 CoupledStepper, :239
CoupledStepperConfig).

The atmosphere takes ``n_inner_steps`` fast steps per slow ocean step
(n_inner = ocean_timestep / atmosphere_timestep). Exchange per outer step:
- the ocean's SST (renamed to the atmosphere's surface-temperature name) is
  held constant as atmosphere forcing during the inner steps, applied by
  the atmosphere step's own SST prescriber;
- atmosphere outputs required by the ocean (surface fluxes) are
  time-averaged over the inner window and fed as ocean forcing;
- exogenous forcings shared by both components are read from the
  atmosphere's forcing stream and time-averaged for the ocean.

The full coupled rollout is one jitted function (inner rollout is the
atmosphere stepper's scan; the outer loop unrolls at trace time).
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.stepper.stepper import PrognosticState, Stepper, StepperConfig


@dataclasses.dataclass
class CoupledComponentConfig:
    """One coupled component (reference: coupled/stepper.py component
    configs hold a StepperConfig each).
    """

    stepper: StepperConfig


@dataclasses.dataclass
class CoupledPrognosticState:
    atmosphere_data: PrognosticState
    ocean_data: PrognosticState


@dataclasses.dataclass
class CoupledStepperConfig:
    """(reference: fme/coupled/stepper.py:239)."""

    atmosphere: CoupledComponentConfig
    ocean: CoupledComponentConfig
    sst_name: str = "sst"

    def get_stepper(
        self,
        atmosphere_info: DatasetInfo,
        ocean_info: DatasetInfo,
    ) -> "CoupledStepper":
        atmos = self.atmosphere.stepper.get_stepper(atmosphere_info)
        ocean = self.ocean.stepper.get_stepper(ocean_info)
        return CoupledStepper(self, ocean=ocean, atmosphere=atmos)


class CoupledStepper:
    def __init__(self, config: CoupledStepperConfig, ocean: Stepper,
                 atmosphere: Stepper):
        self._config = config
        self.ocean = ocean
        self.atmosphere = atmosphere
        if self.sst_name not in ocean.out_names:
            raise ValueError(
                f"{self.sst_name} not in the ocean's output names"
            )
        a_dt = atmosphere.dataset_info.timestep
        o_dt = ocean.dataset_info.timestep
        if a_dt is None or o_dt is None:
            raise ValueError("both components need a dataset timestep")
        ratio = o_dt.total_seconds() / a_dt.total_seconds()
        if ratio != int(ratio) or ratio < 1:
            raise ValueError(
                f"ocean timestep {o_dt} must be an integer multiple of the "
                f"atmosphere timestep {a_dt}"
            )
        self._n_inner = int(ratio)

    @property
    def config(self) -> CoupledStepperConfig:
        return self._config

    @property
    def sst_name(self) -> str:
        return self._config.sst_name

    @property
    def n_inner_steps(self) -> int:
        return self._n_inner

    @property
    def surface_temperature_name(self) -> str:
        """Atmosphere-side SST name (from its ocean/prescriber config)."""
        ocean_cfg = self.atmosphere.step.config.ocean
        if ocean_cfg is None:
            raise ValueError(
                "coupled atmosphere stepper requires an ocean (SST "
                "prescription) config"
            )
        return ocean_cfg.surface_temperature_name

    @property
    def _ocean_to_atmosphere_forcing_names(self) -> list[str]:
        return [self.sst_name]

    @property
    def _atmosphere_to_ocean_forcing_names(self) -> list[str]:
        """Ocean forcings produced by the atmosphere (e.g. surface fluxes)."""
        ocean_inputs = set(self.ocean.forcing_window_names)
        return sorted(ocean_inputs & set(self.atmosphere.out_names))

    @property
    def _shared_forcing_exogenous_names(self) -> list[str]:
        """Exogenous forcings shared by both (read from atmosphere data)."""
        ocean_inputs = set(self.ocean.forcing_window_names)
        atmos_forcings = set(self.atmosphere.forcing_window_names)
        return sorted(ocean_inputs & atmos_forcings)

    @property
    def atmosphere_forcing_window_names(self) -> list[str]:
        """Names required from the atmosphere forcing dataset."""
        supplied_by_ocean = {self.surface_temperature_name}
        return sorted(
            set(self.atmosphere.forcing_window_names) - supplied_by_ocean
        )

    @property
    def ocean_forcing_window_names(self) -> list[str]:
        """Names required from the ocean forcing dataset."""
        supplied = set(self._atmosphere_to_ocean_forcing_names) | set(
            self._shared_forcing_exogenous_names
        )
        return sorted(set(self.ocean.forcing_window_names) - supplied)

    def init_params(self, rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        return {
            "atmosphere": self.atmosphere.init_params(k1),
            "ocean": self.ocean.init_params(k2),
        }

    @property
    def params(self):
        return {
            "atmosphere": self.atmosphere.params,
            "ocean": self.ocean.params,
        }

    def predict(
        self,
        initial_condition: CoupledPrognosticState,
        atmosphere_forcing: TensorMapping,
        ocean_forcing: TensorMapping,
        rng: jax.Array | None = None,
    ) -> tuple[TensorDict, TensorDict, CoupledPrognosticState]:
        """Coupled rollout.

        atmosphere_forcing: [B, n_outer*n_inner + 1, ...] fields from the
            atmosphere dataset (exogenous + ocean-fraction etc.).
        ocean_forcing: [B, n_outer + 1, ...] ocean-exogenous fields.

        Returns (atmosphere outputs [B, n_outer*n_inner, ...], ocean outputs
        [B, n_outer, ...], final state).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        n_inner = self._n_inner
        n_total = (
            next(iter(atmosphere_forcing.values())).shape[1] - 1
        )
        if n_total % n_inner != 0:
            raise ValueError(
                f"atmosphere forcing covers {n_total} steps, not a multiple "
                f"of n_inner_steps={n_inner}"
            )
        n_outer = n_total // n_inner
        if ocean_forcing:
            n_ocean = next(iter(ocean_forcing.values())).shape[1] - 1
            if n_ocean != n_outer:
                raise ValueError(
                    f"ocean forcing covers {n_ocean} steps but atmosphere "
                    f"forcing implies {n_outer}"
                )
        atmos_state = self.atmosphere.get_initial_state(
            initial_condition.atmosphere_data
        )
        ocean_state = self.ocean.get_initial_state(
            initial_condition.ocean_data
        )
        sst_atmos_name = self.surface_temperature_name
        # prescribe the ocean's IC SST onto the atmosphere IC over the
        # ocean mask so the very first inner step is driven by the
        # coupled state, not the atmosphere dataset's surface temperature
        # (reference fme/coupled/stepper.py:986 _prescribe_ic_sst)
        ocean_cfg = self.atmosphere.step.config.ocean
        ofrac_name = ocean_cfg.ocean_fraction_name
        if (
            sst_atmos_name in atmos_state.data
            and ofrac_name in atmosphere_forcing
        ):
            from ace_tpu.core.ocean import Prescriber

            prescriber = Prescriber(
                prescribed_name=sst_atmos_name,
                mask_name=ofrac_name,
                mask_value=1,
                interpolate=ocean_cfg.interpolate,
            )
            ic_ts = atmos_state.data[sst_atmos_name]
            n_ic = ic_ts.shape[1]
            sst_ic = jnp.broadcast_to(
                ocean_state.data[self.sst_name][:, :1],
                ic_ts.shape,
            )
            blended = prescriber(
                {ofrac_name: atmosphere_forcing[ofrac_name][:, :n_ic]},
                {sst_atmos_name: ic_ts},
                {sst_atmos_name: sst_ic},
            )[sst_atmos_name]
            atmos_state = dataclasses.replace(
                atmos_state,
                data={**atmos_state.data, sst_atmos_name: blended},
            )
        atmos_outputs: list[TensorDict] = []
        ocean_outputs: list[TensorDict] = []
        for i_outer in range(n_outer):
            rng, k_a, k_o = jax.random.split(rng, 3)
            sl = slice(i_outer * n_inner, (i_outer + 1) * n_inner + 1)
            atmos_window = {
                k: v[:, sl]
                for k, v in atmosphere_forcing.items()
                if k in self.atmosphere_forcing_window_names
            }
            # ocean SST (IC of this outer step), constant over inner steps
            sst = ocean_state.data[self.sst_name]  # [B, 1, ...]
            atmos_window[sst_atmos_name] = jnp.broadcast_to(
                sst, (sst.shape[0], n_inner + 1, *sst.shape[2:])
            )
            a_out, atmos_state = self.atmosphere.predict(
                atmos_state, atmos_window, rng=k_a
            )
            atmos_outputs.append(a_out)

            ocean_window = {
                k: v[:, i_outer : i_outer + 2]
                for k, v in ocean_forcing.items()
                if k in self.ocean_forcing_window_names
            }
            # atmosphere-generated fluxes, time-averaged over inner steps,
            # aligned as next-step forcing for the single ocean step
            for k in self._atmosphere_to_ocean_forcing_names:
                avg = jnp.mean(a_out[k], axis=1, keepdims=True)
                ocean_window[k] = jnp.concatenate([avg, avg], axis=1)
            for k in self._shared_forcing_exogenous_names:
                avg = jnp.mean(
                    atmosphere_forcing[k][:, sl][:, 1:], axis=1,
                    keepdims=True,
                )
                ocean_window[k] = jnp.concatenate([avg, avg], axis=1)
            o_out, ocean_state = self.ocean.predict(
                ocean_state, ocean_window, rng=k_o
            )
            ocean_outputs.append(o_out)

        atmos_stacked = {
            k: jnp.concatenate([o[k] for o in atmos_outputs], axis=1)
            for k in atmos_outputs[0]
        }
        ocean_stacked = {
            k: jnp.concatenate([o[k] for o in ocean_outputs], axis=1)
            for k in ocean_outputs[0]
        }
        return (
            atmos_stacked,
            ocean_stacked,
            CoupledPrognosticState(
                atmosphere_data=atmos_state, ocean_data=ocean_state
            ),
        )

    def get_state(self) -> dict[str, Any]:
        return {
            "atmosphere": self.atmosphere.step.get_state(),
            "ocean": self.ocean.step.get_state(),
            "sst_name": self.sst_name,
        }
