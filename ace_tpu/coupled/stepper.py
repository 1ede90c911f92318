"""Coupled atmosphere-ocean stepper
(reference: fme/coupled/stepper.py:872 CoupledStepper, :239
CoupledStepperConfig).

The atmosphere takes ``n_inner_steps`` fast steps per slow ocean step
(n_inner = ocean_timestep / atmosphere_timestep). Exchange per outer step
(reference :1150 get_prediction_generator):
- every ocean output the atmosphere needs (the SST — renamed to the
  atmosphere's surface-temperature name — plus any other ocean
  prognostics appearing among the atmosphere's inputs) is held constant
  as atmosphere forcing during the inner steps; the ocean's current SST
  is also prescribed onto the atmosphere's initial condition at the top
  of EVERY outer step (reference :986 _prescribe_ic_sst);
- atmosphere outputs required by the ocean (surface fluxes) are
  time-averaged over the inner window and fed as next-step ocean forcing;
- exogenous forcings shared by both components are read from the
  atmosphere's forcing stream and time-averaged for the ocean;
- optionally (ocean_fraction_prediction) the atmosphere's ocean fraction
  is computed at runtime from the ocean-predicted sea-ice fraction and
  the land fraction instead of being read from data (reference :86
  CoupledOceanFractionConfig).

The full coupled rollout is one jitted function (inner rollout is the
atmosphere stepper's scan; the outer loop unrolls at trace time).
"""

import dataclasses
import datetime
from typing import Any

import jax
import jax.numpy as jnp

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.ocean_data import OCEAN_FIELD_NAME_PREFIXES
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.stepper.stepper import PrognosticState, Stepper, StepperConfig


def _parse_timedelta(value: str) -> datetime.timedelta:
    """ISO 8601 / pandas duration string -> timedelta
    (reference: coupled/stepper.py:291 pd.Timedelta)."""
    import pandas as pd

    return pd.Timedelta(value).to_pytimedelta()


@dataclasses.dataclass
class CoupledComponentConfig:
    """One coupled component (reference: coupled/stepper.py:70
    ComponentConfig).

    timedelta: ISO 8601 duration of this component's step (e.g. "PT6H",
        "1D"). Optional here: when omitted it is taken from the
        component's dataset; when given it is validated against the
        dataset at get_stepper time.
    """

    stepper: StepperConfig
    timedelta: str | None = None


@dataclasses.dataclass
class CoupledOceanFractionConfig:
    """Compute the atmosphere's ocean fraction at runtime from the
    ocean-predicted sea-ice fraction and the (atmosphere-data) land
    fraction (reference: coupled/stepper.py:86)."""

    sea_ice_fraction_name: str
    land_fraction_name: str
    sea_ice_fraction_name_in_atmosphere: str | None = None

    def __post_init__(self):
        self._canonical_sea_ice_fraction_name()

    def _canonical_sea_ice_fraction_name(self) -> str:
        name = self.sea_ice_fraction_name
        if name in OCEAN_FIELD_NAME_PREFIXES["sea_ice_fraction"]:
            return "sea_ice_fraction"
        if name in OCEAN_FIELD_NAME_PREFIXES["ocean_sea_ice_fraction"]:
            return "ocean_sea_ice_fraction"
        raise ValueError(
            f"CoupledOceanFractionConfig expected {name} to be registered "
            "in OCEAN_FIELD_NAME_PREFIXES as a sea ice fraction."
        )

    def validate_ocean_prognostic_names(self, prognostic_names):
        if self.sea_ice_fraction_name not in prognostic_names:
            raise ValueError(
                f"CoupledOceanFractionConfig expected "
                f"{self.sea_ice_fraction_name} to be a prognostic variable "
                "of the ocean model, but it is not."
            )

    def validate_atmosphere_forcing_names(self, forcing_names):
        if self.land_fraction_name not in forcing_names:
            raise ValueError(
                f"CoupledOceanFractionConfig expected "
                f"{self.land_fraction_name} to be an ML forcing of the "
                "atmosphere model, but it is not."
            )

    def filter_atmosphere_forcing_names(
        self, unfiltered_names, ocean_fraction_name: str
    ) -> list[str]:
        """Remove ocean fraction and (atmosphere-side) sea-ice fraction
        from atmosphere forcing names: both are computed at runtime
        (reference :143)."""
        sea_ice_name = (
            self.sea_ice_fraction_name_in_atmosphere
            or self.sea_ice_fraction_name
        )
        return [
            n for n in unfiltered_names
            if n not in (ocean_fraction_name, sea_ice_name)
        ]

    def compute(self, sea_ice_fraction, land_fraction):
        """(sea_ice_fraction, land_fraction) -> (sea_ice, ocean_fraction)
        (reference :171 build_ocean_data + OceanData.ocean_fraction:
        ocean = 1 - land - sea_ice, clipped at 0)."""
        sea_ice = jnp.nan_to_num(sea_ice_fraction)
        ocean = jnp.clip(1.0 - land_fraction - sea_ice, min=0)
        return sea_ice, ocean


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
    ocean_fraction_prediction: CoupledOceanFractionConfig | None = None

    def get_stepper(
        self,
        atmosphere_info: DatasetInfo,
        ocean_info: DatasetInfo,
    ) -> "CoupledStepper":
        for cfg, info, label in (
            (self.atmosphere, atmosphere_info, "atmosphere"),
            (self.ocean, ocean_info, "ocean"),
        ):
            if cfg.timedelta is not None and info.timestep is not None:
                configured = _parse_timedelta(cfg.timedelta)
                if configured != info.timestep:
                    raise ValueError(
                        f"{label} config timedelta {cfg.timedelta} does "
                        f"not match the dataset timestep {info.timestep}"
                    )
        atmos = self.atmosphere.stepper.get_stepper(atmosphere_info)
        ocean = self.ocean.stepper.get_stepper(ocean_info)
        return CoupledStepper(self, ocean=ocean, atmosphere=atmos)


class CoupledStepper:
    def __init__(self, config: CoupledStepperConfig, ocean: Stepper,
                 atmosphere: Stepper):
        self._config = config
        self.ocean = ocean
        self.atmosphere = atmosphere
        # jitted exchange caches (built lazily; see _predict_impl)
        self._exchange_pre = None
        self._exchange_post = None
        self._validate()
        a_dt = self._component_timestep(config.atmosphere, atmosphere)
        o_dt = self._component_timestep(config.ocean, ocean)
        if a_dt > o_dt:
            raise ValueError(
                "Atmosphere timedelta must not be larger than ocean's."
            )
        ratio = o_dt.total_seconds() / a_dt.total_seconds()
        if ratio != int(ratio) or ratio < 1:
            raise ValueError(
                f"ocean timestep {o_dt} must be an integer multiple of the "
                f"atmosphere timestep {a_dt}"
            )
        self._n_inner = int(ratio)

    @staticmethod
    def _component_timestep(cfg: CoupledComponentConfig,
                            stepper: Stepper) -> datetime.timedelta:
        if cfg.timedelta is not None:
            return _parse_timedelta(cfg.timedelta)
        dt = stepper.dataset_info.timestep
        if dt is None:
            raise ValueError(
                "coupled components need a timestep (from the component "
                "config timedelta or the dataset)"
            )
        return dt

    def _validate(self):
        """Component compatibility rules
        (reference: coupled/stepper.py:524 _validate_component_configs)."""
        config = self._config
        ocean_cfg = self.atmosphere.step.config.ocean
        if ocean_cfg is None:
            raise ValueError(
                "The atmosphere stepper 'ocean' config is missing but must "
                "be set for coupled emulation."
            )
        if ocean_cfg.is_slab:
            raise ValueError(
                "The atmosphere stepper 'ocean' config cannot use 'slab' "
                "for coupled emulation."
            )
        duplicates = set(self.ocean.out_names) & set(
            self.atmosphere.out_names
        )
        if duplicates:
            raise ValueError(
                "Output variable names of CoupledStepper components cannot "
                f"overlap. Found the following duplicated names: "
                f"{sorted(duplicates)}"
            )
        # ocean diagnostics cannot force the atmosphere: only ocean
        # prognostics persist across the coupled window
        ocean_diags_as_forcings = sorted(
            (self._atmosphere_input_only & set(self.ocean.out_names))
            - set(self.ocean.step.input_names)
        )
        if ocean_diags_as_forcings:
            raise ValueError(
                "CoupledStepper only supports ocean prognostic variables "
                "as atmosphere forcings, but the following ocean diagnostic "
                "variables are inputs to the atmosphere: "
                f"{ocean_diags_as_forcings}."
            )
        # atmosphere-supplied ocean forcings are window averages aligned
        # to the END of the ocean step, so they must be declared
        # next-step forcings on the ocean side
        missing_next_step = sorted(
            set(self._atmosphere_to_ocean_forcing_names)
            - set(self.ocean.step.next_step_forcing_names)
        )
        if missing_next_step:
            raise ValueError(
                "The following variables which are atmosphere component "
                "outputs and ocean component inputs were not found among "
                f"the ocean's next_step_forcing_names: {missing_next_step}."
            )
        if config.sst_name not in self.ocean.out_names:
            raise ValueError(
                f"The variable {config.sst_name} is not in the ocean's "
                "output names but is required for coupling with the "
                "atmosphere."
            )
        if config.ocean_fraction_prediction is not None:
            config.ocean_fraction_prediction.validate_ocean_prognostic_names(
                self.ocean.prognostic_names
            )
            config.ocean_fraction_prediction.validate_atmosphere_forcing_names(
                self._atmosphere_input_only
            )

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
        return self.atmosphere.step.config.ocean.surface_temperature_name

    @property
    def ocean_fraction_name(self) -> str:
        return self.atmosphere.step.config.ocean.ocean_fraction_name

    @property
    def _atmosphere_input_only(self) -> set[str]:
        return (
            set(self.atmosphere.step.input_names)
            - set(self.atmosphere.out_names)
        )

    @property
    def _ocean_input_only(self) -> set[str]:
        return set(self.ocean.step.input_names) - set(self.ocean.out_names)

    @property
    def _ocean_to_atmosphere_forcing_names(self) -> list[str]:
        """All ocean outputs the atmosphere needs, plus the SST (and the
        ocean-side sea-ice fraction when ocean fraction is predicted)
        (reference :337)."""
        names = self._atmosphere_input_only & set(self.ocean.out_names)
        names.add(self.sst_name)
        ofrac = self._config.ocean_fraction_prediction
        if ofrac is not None:
            names.add(ofrac.sea_ice_fraction_name)
        return sorted(names)

    @property
    def _atmosphere_to_ocean_forcing_names(self) -> list[str]:
        """Ocean forcings produced by the atmosphere (e.g. surface fluxes)
        (reference :324)."""
        return sorted(self._ocean_input_only & set(self.atmosphere.out_names))

    @property
    def _ocean_forcing_exogenous_names(self) -> list[str]:
        return sorted(
            self._ocean_input_only - set(self.atmosphere.out_names)
        )

    @property
    def _atmosphere_forcing_exogenous_names(self) -> list[str]:
        names = sorted(self._atmosphere_input_only - set(self.ocean.out_names))
        ofrac = self._config.ocean_fraction_prediction
        if ofrac is not None:
            names = ofrac.filter_atmosphere_forcing_names(
                names, self.ocean_fraction_name
            )
        return names

    @property
    def _shared_forcing_exogenous_names(self) -> list[str]:
        """Exogenous forcings shared by both (read from atmosphere data)
        (reference :319)."""
        return sorted(
            set(self._ocean_forcing_exogenous_names)
            & set(self._atmosphere_forcing_exogenous_names)
        )

    @property
    def atmosphere_forcing_window_names(self) -> list[str]:
        """Names required from the atmosphere forcing dataset
        (reference :455: exogenous + prescribed prognostics; ocean-supplied
        fields come from the ocean state, not the dataset)."""
        prescribed = getattr(
            self.atmosphere.step.config, "prescribed_prognostic_names", []
        )
        return sorted(
            set(self._atmosphere_forcing_exogenous_names) | set(prescribed)
        )

    @property
    def ocean_forcing_window_names(self) -> list[str]:
        """Names required from the ocean forcing dataset (reference :475)."""
        prescribed = getattr(
            self.ocean.step.config, "prescribed_prognostic_names", []
        )
        return sorted(
            (set(self._ocean_forcing_exogenous_names)
             - set(self._shared_forcing_exogenous_names))
            | set(prescribed)
        )

    @property
    def all_atmosphere_names(self) -> list[str]:
        """Atmosphere dataset requirements (reference :344)."""
        names = (
            set(self.atmosphere.step.input_names)
            | set(self.atmosphere.out_names)
        ) - set(self.ocean.out_names)
        ofrac = self._config.ocean_fraction_prediction
        if ofrac is not None:
            names = set(ofrac.filter_atmosphere_forcing_names(
                names, self.ocean_fraction_name
            ))
        return sorted(names)

    @property
    def all_ocean_names(self) -> list[str]:
        """Ocean dataset requirements; shared forcings read from the
        atmosphere data are excluded (reference :358)."""
        names = (
            set(self.ocean.step.input_names) | set(self.ocean.out_names)
        ) - set(self.all_atmosphere_names)
        ofrac = self._config.ocean_fraction_prediction
        if ofrac is not None:
            # kept on the atmosphere side; land fraction needed to derive
            # ocean fraction comes from atmosphere data
            names -= {ofrac.land_fraction_name}
        return sorted(names)

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

    def _mask_ocean_fields(self, fields: TensorDict) -> TensorDict:
        """Zero ocean-invalid points of ocean-supplied forcings using the
        ocean dataset masks (reference :1050-1056)."""
        provider = self.ocean.dataset_info.mask_provider
        if provider is None:
            return fields
        out = dict(fields)
        for name, tensor in fields.items():
            mask = provider.get_mask_for(name)
            if mask is not None:
                out[name] = jnp.where(jnp.asarray(mask) != 0, tensor, 0.0)
        return out

    def _forcings_from_ocean(
        self,
        ocean_state_data: TensorMapping,
        atmosphere_forcing_window: TensorMapping,
        n_inner: int,
    ) -> TensorDict:
        """Constant-over-window atmosphere forcings taken from the ocean
        state (reference :1090 _get_atmosphere_forcings)."""
        sst_atmos_name = self.surface_temperature_name
        fields: TensorDict = {}
        for k in self._ocean_to_atmosphere_forcing_names:
            name = sst_atmos_name if k == self.sst_name else k
            v = ocean_state_data[k]  # [B, 1, ...]
            fields[name] = jnp.broadcast_to(
                v, (v.shape[0], n_inner + 1, *v.shape[2:])
            )
        ofrac_cfg = self._config.ocean_fraction_prediction
        if ofrac_cfg is not None:
            sea_ice_atmos_name = (
                ofrac_cfg.sea_ice_fraction_name_in_atmosphere
                or ofrac_cfg.sea_ice_fraction_name
            )
            sea_ice = fields.pop(ofrac_cfg.sea_ice_fraction_name)
            land = atmosphere_forcing_window[ofrac_cfg.land_fraction_name]
            sea_ice, ocean_frac = ofrac_cfg.compute(sea_ice, land)
            fields[sea_ice_atmos_name] = sea_ice
            fields[self.ocean_fraction_name] = ocean_frac
        return self._mask_ocean_fields(fields)

    def predict(
        self,
        initial_condition: CoupledPrognosticState,
        atmosphere_forcing: TensorMapping,
        ocean_forcing: TensorMapping,
        rng: jax.Array | None = None,
    ) -> tuple[TensorDict, TensorDict, CoupledPrognosticState]:
        """Coupled rollout. The per-outer-step EXCHANGE (prescriber
        blend, ocean-state -> atmosphere forcings, flux averaging)
        compiles into two small cached programs and each component's
        rollout is its own jitted program — four dispatches per outer
        step instead of ~100 eager ops (measured 3.25 -> 11.35 -> 15.7
        atmosphere steps/s at SamudrACE scale on one v5e). A fully
        fused per-window program was measured to exceed the remote-
        compile transport limits at flagship scale, so the exchange
        stays a separate (tiny) program.

        atmosphere_forcing: [B, n_outer*n_inner + 1, ...] fields from the
            atmosphere dataset (exogenous + ocean-fraction etc.).
        ocean_forcing: [B, n_outer + 1, ...] ocean-exogenous fields.

        Returns (atmosphere outputs [B, n_outer*n_inner, ...], ocean outputs
        [B, n_outer, ...], final state).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._predict_impl(
            initial_condition, atmosphere_forcing, ocean_forcing, rng
        )

    def _predict_impl(
        self,
        initial_condition: CoupledPrognosticState,
        atmosphere_forcing: TensorMapping,
        ocean_forcing: TensorMapping,
        rng: jax.Array,
    ) -> tuple[TensorDict, TensorDict, CoupledPrognosticState]:
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
        ofrac_name = self.ocean_fraction_name
        ocean_cfg = self.atmosphere.step.config.ocean

        from ace_tpu.core.ocean import Prescriber

        prescriber = Prescriber(
            prescribed_name=sst_atmos_name,
            mask_name=ofrac_name,
            mask_value=1,
            interpolate=ocean_cfg.interpolate,
        )

        # exchange as two small cached jitted programs (closures carry
        # only static config — no parameters — so they inline safely
        # when _predict_impl itself runs under an outer transform)
        if self._exchange_pre is None:
            def exchange_pre(ocean_data, atmos_window, atmos_ic):
                win = dict(atmos_window)
                win.update(self._forcings_from_ocean(
                    ocean_data, win, n_inner
                ))
                new_ic = dict(atmos_ic)
                if sst_atmos_name in new_ic:
                    ic_ts = new_ic[sst_atmos_name]
                    n_ic = ic_ts.shape[1]
                    new_ic[sst_atmos_name] = prescriber(
                        {ofrac_name: win[ofrac_name][:, :n_ic]},
                        {sst_atmos_name: ic_ts},
                        {sst_atmos_name: win[sst_atmos_name][:, :n_ic]},
                    )[sst_atmos_name]
                return win, new_ic

            def exchange_post(a_out, shared_window, ocean_window):
                win = dict(ocean_window)
                for k in self._atmosphere_to_ocean_forcing_names:
                    avg = jnp.mean(a_out[k], axis=1, keepdims=True)
                    win[k] = jnp.concatenate([avg, avg], axis=1)
                for k in self._shared_forcing_exogenous_names:
                    avg = jnp.mean(
                        shared_window[k][:, 1:], axis=1, keepdims=True
                    )
                    win[k] = jnp.concatenate([avg, avg], axis=1)
                return win

            self._exchange_pre = jax.jit(exchange_pre)
            self._exchange_post = jax.jit(exchange_post)

        atmos_outputs: list[TensorDict] = []
        ocean_outputs: list[TensorDict] = []
        for i_outer in range(n_outer):
            rng, k_a, k_o = jax.random.split(rng, 3)
            sl = slice(i_outer * n_inner, (i_outer + 1) * n_inner + 1)
            atmos_window_raw = {
                k: v[:, sl]
                for k, v in atmosphere_forcing.items()
                if k in self.atmosphere_forcing_window_names
            }
            # the ocean state (IC of this outer step) supplies the SST —
            # renamed — and every other ocean output the atmosphere
            # needs, constant over the inner steps; the current ocean
            # SST is also prescribed onto the atmosphere IC over the
            # ocean mask (reference :986 _prescribe_ic_sst)
            atmos_window, new_ic = self._exchange_pre(
                ocean_state.data, atmos_window_raw, atmos_state.data
            )
            if sst_atmos_name in atmos_state.data:
                atmos_state = dataclasses.replace(
                    atmos_state, data=new_ic
                )
            a_out, atmos_state = self.atmosphere.predict(
                atmos_state, atmos_window, rng=k_a
            )
            atmos_outputs.append(a_out)

            ocean_window_raw = {
                k: v[:, i_outer : i_outer + 2]
                for k, v in ocean_forcing.items()
                if k in self.ocean_forcing_window_names
            }
            # atmosphere-generated fluxes + shared exogenous forcings,
            # time-averaged over inner steps, aligned as next-step
            # forcing for the single ocean step
            shared_window = {
                k: atmosphere_forcing[k][:, sl]
                for k in self._shared_forcing_exogenous_names
            }
            ocean_window = self._exchange_post(
                a_out, shared_window, ocean_window_raw
            )
            o_out, ocean_state = self.ocean.predict(
                ocean_state, ocean_window, rng=k_o, n_forward=1
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
