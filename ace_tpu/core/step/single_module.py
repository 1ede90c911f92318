"""The default single-module step
(reference: fme/core/step/single_module.py:48,261,595).

Pipeline per step: normalize inputs -> pack channels -> module forward ->
unpack -> denormalize -> corrector -> ocean SST prescription -> prescribed
prognostic overwrite. All of it is a pure function of (params, StepArgs).
"""

import dataclasses
from typing import Any

import jax

from ace_tpu.core.corrector.atmosphere import (
    AtmosphereCorrector,
    AtmosphereCorrectorConfig,
)
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.normalizer import (
    NetworkAndLossNormalizationConfig,
    StandardNormalizer,
)
from ace_tpu.core.ocean import Ocean, OceanConfig
from ace_tpu.core.packer import Packer
from ace_tpu.core.step.base import (
    StepABC,
    StepArgs,
    StepConfigABC,
    StepOutput,
    StepperState,
    StepSelector,
)
from ace_tpu.core.step.global_mean_removal import GlobalMeanRemovalConfig
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.models.registry import ModuleSelector


def make_rngs(rng):
    """Split a step rng into the flax PRNG collections used by modules."""
    if rng is None:
        return None
    k_drop, k_noise = jax.random.split(rng)
    return {"dropout": k_drop, "noise": k_noise}


def step_with_adjustments(
    args: StepArgs,
    network_calls,
    normalizer: StandardNormalizer,
    corrector,
    ocean,
    residual_prediction: bool,
    prognostic_names: list[str],
    prescribed_prognostic_names: list[str],
    global_mean_removal=None,
) -> StepOutput:
    """Shared step pipeline around the network call(s): normalize ->
    network -> denormalize -> corrector -> ocean -> prescribed overwrite
    (reference: fme/core/step/single_module.py:595 step_with_adjustments).

    ``network_calls(input_norm, rngs) -> output_norm`` runs the module(s) on
    the normalized input dict.
    """
    input_data = args.input
    next_step_input_data = args.next_step_input_data

    gmr_state = None
    if global_mean_removal is not None:
        network_input, gmr_state = global_mean_removal.forward_transform(
            input_data
        )
        input_norm = normalizer.normalize(dict(network_input))
        # synthetic global-mean channels are already normalized
        input_norm = {**input_norm, **gmr_state.extras}
    else:
        input_norm = normalizer.normalize(dict(input_data))
    output_norm = network_calls(input_norm, make_rngs(args.rng))
    if residual_prediction:
        # network output is added to the normalized input for prognostics
        # (reference: single_module.py add_names semantics)
        for name in prognostic_names:
            output_norm[name] = output_norm[name] + input_norm[name]
    output: TensorDict = normalizer.denormalize(output_norm)
    if global_mean_removal is not None:
        output = global_mean_removal.inverse_transform(output, gmr_state)

    stepper_state = dict(args.stepper_state)
    diagnostics: TensorDict = {}
    if corrector is not None:
        result = corrector(
            input_data, output, next_step_input_data,
            stepper_state.get("corrector", {}),
        )
        output = result.corrected
        diagnostics = result.delta
        stepper_state["corrector"] = result.corrector_state

    if ocean is not None:
        overlap = {ocean.surface_temperature_name} & set(diagnostics)
        if overlap:
            raise ValueError(
                "ocean-prescribed names overlap corrector-modified names: "
                f"{sorted(overlap)}"
            )
        output = ocean(input_data, output, next_step_input_data)

    for name in prescribed_prognostic_names:
        if name not in next_step_input_data:
            raise ValueError(
                f"prescribed_prognostic_name {name!r} not in "
                "next_step_input_data"
            )
        output = {**output, name: next_step_input_data[name]}
    if prescribed_prognostic_names:
        diagnostics = {
            k: v for k, v in diagnostics.items()
            if k not in prescribed_prognostic_names
        }

    return StepOutput(
        output=output,
        stepper_state=stepper_state,
        corrector_diagnostics=diagnostics,
    )


@StepSelector.register("single_module")
@StepSelector.register("default")
@dataclasses.dataclass
class SingleModuleStepConfig(StepConfigABC):
    """Configuration for the single-module step
    (reference: fme/core/step/single_module.py:48).
    """

    builder: ModuleSelector
    in_names: list[str]
    out_names: list[str]
    normalization: NetworkAndLossNormalizationConfig
    ocean: OceanConfig | None = None
    corrector: AtmosphereCorrectorConfig = dataclasses.field(
        default_factory=AtmosphereCorrectorConfig
    )
    next_step_forcing_names: list[str] = dataclasses.field(default_factory=list)
    prescribed_prognostic_names: list[str] = dataclasses.field(
        default_factory=list
    )
    residual_prediction: bool = False
    global_mean_removal: GlobalMeanRemovalConfig | None = None

    def __post_init__(self):
        if self.global_mean_removal is not None:
            self.global_mean_removal.validate_names(
                self.in_names, self.out_names
            )
        for name in self.prescribed_prognostic_names:
            if name not in self.out_names:
                raise ValueError(
                    f"prescribed_prognostic_name {name!r} must be in out_names"
                )
        for name in self.next_step_forcing_names:
            if name not in self.in_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} not in in_names"
                )
            if name in self.out_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} is an output variable"
                )

    @property
    def input_names(self) -> list[str]:
        if self.ocean is None:
            return list(self.in_names)
        return sorted(set(self.in_names) | set(self.ocean.forcing_names))

    @property
    def output_names(self) -> list[str]:
        return list(self.out_names)

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
        return sorted(set(self.in_names) | set(self.out_names))

    def get_step(self, dataset_info: DatasetInfo) -> "SingleModuleStep":
        return SingleModuleStep(config=self, dataset_info=dataset_info)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        state = to_dict(self)
        state["builder"] = self.builder.get_state()
        return state


class SingleModuleStep(StepABC):
    def __init__(self, config: SingleModuleStepConfig,
                 dataset_info: DatasetInfo):
        self._config = config
        self._dataset_info = dataset_info
        self.normalizer: StandardNormalizer = (
            config.normalization.build_network_normalizer(
                config._normalize_names
            )
        )
        self.global_mean_removal = (
            config.global_mean_removal.build(self.normalizer)
            if config.global_mean_removal is not None
            else None
        )
        extra_names = (
            self.global_mean_removal.extra_channel_names
            if self.global_mean_removal is not None
            else []
        )
        self.module = config.builder.build(
            n_in_channels=len(config.in_names) + len(extra_names),
            n_out_channels=len(config.out_names),
            dataset_info=dataset_info,
        )
        self.in_packer = Packer(list(config.in_names) + extra_names)
        self.out_packer = Packer(config.out_names)
        if config.ocean is not None:
            if dataset_info.timestep is None:
                raise ValueError("ocean requires dataset_info.timestep")
            self.ocean: Ocean | None = config.ocean.build(
                config.in_names, config.out_names, dataset_info.timestep
            )
        else:
            self.ocean = None
        if not config.corrector.is_noop:
            if dataset_info.timestep is None:
                raise ValueError("corrector requires dataset_info.timestep")
            self.corrector: AtmosphereCorrector | None = config.corrector.build(
                dataset_info.gridded_operations,
                dataset_info.atmosphere_vertical_coordinate,
                dataset_info.timestep,
            )
        else:
            self.corrector = None

    @property
    def config(self) -> SingleModuleStepConfig:
        return self._config

    @property
    def dataset_info(self) -> DatasetInfo:
        return self._dataset_info

    def init_params(self, rng: jax.Array):
        import jax.numpy as jnp

        nlat, nlon = self._dataset_info.img_shape
        dummy = jnp.zeros((1, nlat, nlon, len(self.in_packer.names)))
        return self.module.init(rng, dummy)

    def init_stepper_state(self, input_data: TensorMapping) -> StepperState:
        state: StepperState = {}
        if self.corrector is not None:
            state["corrector"] = self.corrector.init_state(input_data)
        return state

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        config = self._config

        def network_calls(input_norm, rngs):
            packed = self.in_packer.pack(
                {k: input_norm[k] for k in self.in_packer.names}
            )
            out_packed = self.module.apply(
                params, packed, deterministic=args.deterministic, rngs=rngs
            )
            return self.out_packer.unpack(out_packed)

        return step_with_adjustments(
            args=args,
            network_calls=network_calls,
            normalizer=self.normalizer,
            corrector=self.corrector,
            ocean=self.ocean,
            residual_prediction=config.residual_prediction,
            prognostic_names=self.prognostic_names,
            prescribed_prognostic_names=config.prescribed_prognostic_names,
            global_mean_removal=self.global_mean_removal,
        )

    def get_state(self) -> dict[str, Any]:
        return {
            "config": self._config.get_state(),
            "dataset_info": self._dataset_info.get_state(),
            "normalizer": self.normalizer.get_state(),
        }
