"""Two-module steps: separate radiation model and secondary module
(reference: fme/core/step/radiation.py:28 SeparateRadiationStepConfig,
fme/core/step/secondary_module.py:33 SecondaryModuleStepConfig).

Both compose two flax modules inside one ``step_with_adjustments`` pipeline;
parameters are a dict of the two modules' pytrees.
"""

import dataclasses
from typing import Any

import jax

from ace_tpu.core.corrector.atmosphere import AtmosphereCorrectorConfig
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.normalizer import NetworkAndLossNormalizationConfig
from ace_tpu.core.ocean import OceanConfig
from ace_tpu.core.packer import Packer
from ace_tpu.core.step.base import (
    StepABC,
    StepArgs,
    StepConfigABC,
    StepOutput,
    StepperState,
    StepSelector,
)
from ace_tpu.core.step.secondary_decoder import SecondaryDecoderConfig
from ace_tpu.core.step.single_module import (
    split_rngs,
    step_with_adjustments,
)
from ace_tpu.models.registry import ModuleSelector


@StepSelector.register("separate_radiation")
@dataclasses.dataclass
class SeparateRadiationStepConfig(StepConfigABC):
    """(reference: fme/core/step/radiation.py:28)."""

    builder: ModuleSelector
    radiation_builder: ModuleSelector
    main_prognostic_names: list[str]
    shared_forcing_names: list[str]
    radiation_only_forcing_names: list[str]
    radiation_diagnostic_names: list[str]
    main_diagnostic_names: list[str]
    normalization: NetworkAndLossNormalizationConfig
    next_step_forcing_names: list[str] = dataclasses.field(default_factory=list)
    ocean: OceanConfig | None = None
    corrector: AtmosphereCorrectorConfig = dataclasses.field(
        default_factory=AtmosphereCorrectorConfig
    )
    detach_radiation: bool = False
    residual_prediction: bool = False

    def __post_init__(self):
        seen: dict[str, str] = {}
        for names, label in (
            (self.main_prognostic_names, "main_prognostic_names"),
            (self.shared_forcing_names, "shared_forcing_names"),
            (self.radiation_only_forcing_names, "radiation_only_forcing_names"),
            (self.main_diagnostic_names, "main_diagnostic_names"),
            (self.radiation_diagnostic_names, "radiation_diagnostic_names"),
        ):
            for name in names:
                if name in seen:
                    raise ValueError(
                        f"Name {name!r} appears in both {seen[name]} and {label}"
                    )
                seen[name] = label
        for name in self.next_step_forcing_names:
            if name not in self._forcing_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} not in forcing names"
                )

    @property
    def _forcing_names(self) -> list[str]:
        return list(self.shared_forcing_names) + list(
            self.radiation_only_forcing_names
        )

    @property
    def radiation_in_names(self) -> list[str]:
        return (
            list(self.main_prognostic_names)
            + list(self.shared_forcing_names)
            + list(self.radiation_only_forcing_names)
        )

    @property
    def main_in_names(self) -> list[str]:
        return (
            list(self.main_prognostic_names)
            + list(self.shared_forcing_names)
            + list(self.radiation_diagnostic_names)
        )

    @property
    def main_out_names(self) -> list[str]:
        return list(self.main_prognostic_names) + list(
            self.main_diagnostic_names
        )

    @property
    def input_names(self) -> list[str]:
        names = set(self.main_prognostic_names) | set(self._forcing_names)
        if self.ocean is not None:
            names |= set(self.ocean.forcing_names)
        return sorted(names)

    @property
    def output_names(self) -> list[str]:
        return sorted(
            set(self.main_out_names) | set(self.radiation_diagnostic_names)
        )

    @property
    def prognostic_names(self) -> list[str]:
        return list(self.main_prognostic_names)

    @property
    def next_step_input_names(self) -> list[str]:
        result = set(self.input_names) - set(self.output_names)
        if self.ocean is not None:
            result |= set(self.ocean.forcing_names)
        return sorted(result)

    def get_next_step_forcing_names(self) -> list[str]:
        return list(self.next_step_forcing_names)

    @property
    def _normalize_names(self) -> list[str]:
        # only the model name lists — ocean forcing names (in input_names)
        # are prescribed, not normalized (reference: radiation.py:142)
        return sorted(
            set(self.main_prognostic_names)
            | set(self.shared_forcing_names)
            | set(self.radiation_only_forcing_names)
            | set(self.main_diagnostic_names)
            | set(self.radiation_diagnostic_names)
        )

    def get_step(self, dataset_info: DatasetInfo) -> "SeparateRadiationStep":
        return SeparateRadiationStep(self, dataset_info)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        state = to_dict(self)
        state["builder"] = self.builder.get_state()
        state["radiation_builder"] = self.radiation_builder.get_state()
        return state


class SeparateRadiationStep(StepABC):
    def __init__(self, config: SeparateRadiationStepConfig,
                 dataset_info: DatasetInfo):
        self._config = config
        self._dataset_info = dataset_info
        self.radiation_module = config.radiation_builder.build(
            len(config.radiation_in_names),
            len(config.radiation_diagnostic_names),
            dataset_info,
        )
        self.module = config.builder.build(
            len(config.main_in_names), len(config.main_out_names),
            dataset_info,
        )
        self.radiation_in_packer = Packer(config.radiation_in_names)
        self.radiation_out_packer = Packer(config.radiation_diagnostic_names)
        self.in_packer = Packer(config.main_in_names)
        self.out_packer = Packer(config.main_out_names)
        self.normalizer = config.normalization.build_network_normalizer(
            config._normalize_names
        )
        self.ocean = (
            config.ocean.build(
                config.input_names, config.output_names, dataset_info.timestep
            )
            if config.ocean is not None
            else None
        )
        self.corrector = (
            config.corrector.build(
                dataset_info.gridded_operations,
                dataset_info.atmosphere_vertical_coordinate,
                dataset_info.timestep,
            )
            if not config.corrector.is_noop
            else None
        )

    @property
    def config(self):
        return self._config

    @property
    def dataset_info(self):
        return self._dataset_info

    def init_params(self, rng: jax.Array):
        import jax.numpy as jnp

        nlat, nlon = self._dataset_info.img_shape
        k1, k2 = jax.random.split(rng)
        rad_dummy = jnp.zeros(
            (1, nlat, nlon, len(self._config.radiation_in_names))
        )
        main_dummy = jnp.zeros(
            (1, nlat, nlon, len(self._config.main_in_names))
        )
        return {
            "radiation": self.radiation_module.init(k1, rad_dummy),
            "main": self.module.init(k2, main_dummy),
        }

    def init_stepper_state(self, input_data) -> StepperState:
        state: StepperState = {}
        if self.corrector is not None:
            state["corrector"] = self.corrector.init_state(input_data)
        return state

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        config = self._config

        def network_calls(input_norm, rngs):
            # independent rng streams for the two modules
            rad_rngs, main_rngs = split_rngs(rngs, 2)
            rad_in = self.radiation_in_packer.pack(
                {k: input_norm[k] for k in config.radiation_in_names}
            )
            rad_out = self.radiation_module.apply(
                params["radiation"], rad_in,
                deterministic=args.deterministic, rngs=rad_rngs,
            )
            rad_norm = self.radiation_out_packer.unpack(rad_out)
            if config.detach_radiation:
                main_extra = {
                    k: jax.lax.stop_gradient(v) for k, v in rad_norm.items()
                }
            else:
                main_extra = rad_norm
            main_in = self.in_packer.pack(
                {**{k: input_norm[k] for k in config.main_in_names
                    if k in input_norm},
                 **main_extra}
            )
            main_out = self.module.apply(
                params["main"], main_in,
                deterministic=args.deterministic, rngs=main_rngs,
            )
            main_norm = self.out_packer.unpack(main_out)
            return {**rad_norm, **main_norm}

        return step_with_adjustments(
            args=args,
            network_calls=network_calls,
            normalizer=self.normalizer,
            corrector=self.corrector,
            ocean=self.ocean,
            residual_prediction=config.residual_prediction,
            prognostic_names=self.prognostic_names,
            prescribed_prognostic_names=[],
        )

    def get_state(self) -> dict[str, Any]:
        return {"config": self._config.get_state()}


@StepSelector.register("secondary_module")
@dataclasses.dataclass
class SecondaryModuleStepConfig(StepConfigABC):
    """(reference: fme/core/step/secondary_module.py:33)."""

    builder: ModuleSelector
    in_names: list[str]
    out_names: list[str]
    normalization: NetworkAndLossNormalizationConfig
    secondary_builder: ModuleSelector = None  # type: ignore[assignment]
    secondary_out_names: list[str] = dataclasses.field(default_factory=list)
    secondary_residual_out_names: list[str] = dataclasses.field(
        default_factory=list
    )
    secondary_decoder: "SecondaryDecoderConfig | None" = None
    ocean: OceanConfig | None = None
    corrector: AtmosphereCorrectorConfig = dataclasses.field(
        default_factory=AtmosphereCorrectorConfig
    )
    next_step_forcing_names: list[str] = dataclasses.field(default_factory=list)
    prescribed_prognostic_names: list[str] = dataclasses.field(
        default_factory=list
    )
    residual_prediction: bool = False

    def __post_init__(self):
        if self.secondary_builder is None:
            raise ValueError("secondary_builder is required")
        # validations mirror reference secondary_module.py:84 __post_init__
        for name in self.prescribed_prognostic_names:
            if name not in self.out_names:
                raise ValueError(
                    f"prescribed_prognostic_name {name!r} must be in "
                    f"out_names: {self.out_names}"
                )
        for name in self.next_step_forcing_names:
            if name not in self.in_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} not in in_names: "
                    f"{self.in_names}"
                )
            if name in self.out_names:
                raise ValueError(
                    f"next_step_forcing_name is an output variable: {name!r}"
                )
        all_secondary_names = set(self.secondary_out_names) | set(
            self.secondary_residual_out_names
        )
        if self.secondary_decoder is not None:
            for name in self.secondary_decoder.secondary_diagnostic_names:
                if name in self.in_names:
                    raise ValueError(
                        f"secondary_diagnostic_name is an input: {name!r}"
                    )
                if name in set(self.out_names) | all_secondary_names:
                    raise ValueError(
                        f"secondary_diagnostic_name is an output: {name!r}"
                    )
        if not self.secondary_out_names and not self.secondary_residual_out_names:
            raise ValueError(
                "at least one of secondary_out_names or "
                "secondary_residual_out_names must be non-empty"
            )
        overlap = set(self.secondary_out_names) & set(self.out_names)
        if overlap:
            raise ValueError(
                f"secondary_out_names overlap out_names: {sorted(overlap)}"
            )
        overlap = set(self.secondary_out_names) & set(
            self.secondary_residual_out_names
        )
        if overlap:
            raise ValueError(
                "secondary_out_names must not overlap with "
                f"secondary_residual_out_names: {sorted(overlap)}"
            )
        for name in self.secondary_residual_out_names:
            if name not in self.out_names and name not in self.in_names:
                raise ValueError(
                    f"secondary_residual_out_name {name!r} must be in "
                    "out_names or in_names"
                )

    @property
    def secondary_module_out_names(self) -> list[str]:
        return list(self.secondary_out_names) + list(
            self.secondary_residual_out_names
        )

    @property
    def input_names(self) -> list[str]:
        names = set(self.in_names)
        if self.ocean is not None:
            names |= set(self.ocean.forcing_names)
        return sorted(names)

    @property
    def output_names(self) -> list[str]:
        decoder_names = (
            self.secondary_decoder.secondary_diagnostic_names
            if self.secondary_decoder is not None
            else []
        )
        return sorted(
            set(self.out_names)
            | set(self.secondary_out_names)
            | set(self.secondary_residual_out_names)
            | set(decoder_names)
        )

    @property
    def next_step_input_names(self) -> list[str]:
        result = set(self.input_names) - set(self.output_names)
        if self.ocean is not None:
            result |= set(self.ocean.forcing_names)
        result |= set(self.prescribed_prognostic_names)
        return sorted(result)

    def get_next_step_forcing_names(self) -> list[str]:
        return list(self.next_step_forcing_names)

    @property
    def _normalize_names(self) -> list[str]:
        # in_names (not input_names: ocean forcing names are prescribed,
        # never normalized) plus all outputs
        # (reference: secondary_module.py:164)
        return sorted(set(self.in_names) | set(self.output_names))

    def get_step(self, dataset_info: DatasetInfo) -> "SecondaryModuleStep":
        return SecondaryModuleStep(self, dataset_info)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        state = to_dict(self)
        state["builder"] = self.builder.get_state()
        state["secondary_builder"] = self.secondary_builder.get_state()
        return state


class SecondaryModuleStep(StepABC):
    def __init__(self, config: SecondaryModuleStepConfig,
                 dataset_info: DatasetInfo):
        self._config = config
        self._dataset_info = dataset_info
        self.module = config.builder.build(
            len(config.in_names), len(config.out_names), dataset_info
        )
        self.secondary_module = config.secondary_builder.build(
            len(config.in_names),
            len(config.secondary_module_out_names),
            dataset_info,
        )
        self.in_packer = Packer(config.in_names)
        self.out_packer = Packer(config.out_names)
        self.secondary_out_packer = Packer(config.secondary_module_out_names)
        self.secondary_decoder = (
            config.secondary_decoder.build(
                n_in_channels=len(config.out_names),
                dataset_info=dataset_info,
            )
            if config.secondary_decoder is not None
            else None
        )
        self.normalizer = config.normalization.build_network_normalizer(
            config._normalize_names
        )
        # ocean sees the primary module's out_names
        # (reference: secondary_module.py:296)
        self.ocean = (
            config.ocean.build(
                config.in_names, config.out_names, dataset_info.timestep
            )
            if config.ocean is not None
            else None
        )
        self.corrector = (
            config.corrector.build(
                dataset_info.gridded_operations,
                dataset_info.atmosphere_vertical_coordinate,
                dataset_info.timestep,
            )
            if not config.corrector.is_noop
            else None
        )

    @property
    def config(self):
        return self._config

    @property
    def dataset_info(self):
        return self._dataset_info

    def init_params(self, rng: jax.Array):
        import jax.numpy as jnp

        nlat, nlon = self._dataset_info.img_shape
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, nlat, nlon, len(self._config.in_names)))
        params = {
            "main": self.module.init(k1, dummy),
            "secondary": self.secondary_module.init(k2, dummy),
        }
        if self.secondary_decoder is not None:
            params["secondary_decoder"] = self.secondary_decoder.init_params(
                k3, (nlat, nlon)
            )
        return params

    def init_stepper_state(self, input_data) -> StepperState:
        state: StepperState = {}
        if self.corrector is not None:
            state["corrector"] = self.corrector.init_state(input_data)
        return state

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        config = self._config

        def network_calls(input_norm, rngs):
            # independent rng streams for the sibling modules
            main_rngs, sec_rngs, dec_rngs = split_rngs(rngs, 3)
            packed = self.in_packer.pack(
                {k: input_norm[k] for k in config.in_names}
            )
            main_out = self.module.apply(
                params["main"], packed,
                deterministic=args.deterministic, rngs=main_rngs,
            )
            output = self.out_packer.unpack(main_out)
            sec_out = self.secondary_module.apply(
                params["secondary"], packed,
                deterministic=args.deterministic, rngs=sec_rngs,
            )
            sec = self.secondary_out_packer.unpack(sec_out)
            for name in config.secondary_out_names:
                output[name] = sec[name]
            for name in config.secondary_residual_out_names:
                if name in output:
                    output[name] = output[name] + sec[name]
                else:
                    output[name] = input_norm[name] + sec[name]
            if self.secondary_decoder is not None:
                # decodes from a stop_gradient of the primary outputs
                # (reference: secondary_module.py:420 detach semantics)
                output.update(
                    self.secondary_decoder(
                        params["secondary_decoder"], main_out,
                        deterministic=args.deterministic, rngs=dec_rngs,
                    )
                )
            return output

        return step_with_adjustments(
            args=args,
            network_calls=network_calls,
            normalizer=self.normalizer,
            corrector=self.corrector,
            ocean=self.ocean,
            residual_prediction=config.residual_prediction,
            prognostic_names=self.prognostic_names,
            prescribed_prognostic_names=config.prescribed_prognostic_names,
        )

    def get_state(self) -> dict[str, Any]:
        return {"config": self._config.get_state()}
