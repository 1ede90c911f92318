"""Multi-call step: re-invoke a wrapped step with perturbed forcing values
(e.g. halved/quadrupled CO2) emitting suffixed diagnostics — the ACE2
radiative-forcing "multi-call" feature
(reference: fme/core/step/multi_call.py:69, fme/core/step/_multi_call.py).
"""

import dataclasses
import re
from typing import Any

import jax

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.step.base import (
    StepABC,
    StepArgs,
    StepConfigABC,
    StepOutput,
    StepperState,
    StepSelector,
)

LEVEL_PATTERN = re.compile(r"_(\d+)$")


def get_multi_call_name(name: str, suffix: str) -> str:
    """Append the suffix, keeping vertical level labels trailing
    (reference: _multi_call.py:22): 'T_0' + '_2xCO2' -> 'T_2xCO2_0'.
    """
    match = LEVEL_PATTERN.search(name)
    if match:
        return name[: match.start()] + suffix + match.group(0)
    return name + suffix


@dataclasses.dataclass
class MultiCallConfig:
    """(reference: fme/core/step/_multi_call.py:50)."""

    forcing_name: str
    forcing_multipliers: dict[str, float]
    output_names: list[str]

    def get_multi_called_names(self, name: str) -> list[str]:
        return [
            get_multi_call_name(name, suffix)
            for suffix in self.forcing_multipliers
        ]

    @property
    def names(self) -> list[str]:
        out = []
        for name in self.output_names:
            out.extend(self.get_multi_called_names(name))
        return out

    def validate(self, in_names: list[str], out_names: list[str]):
        if self.forcing_name not in in_names:
            raise ValueError(
                f"forcing name {self.forcing_name} not in input names"
            )
        if self.forcing_name in out_names:
            raise ValueError(
                f"forcing name {self.forcing_name} must not be an output"
            )
        for name in self.output_names:
            if name not in out_names:
                raise ValueError(f"{name} not in output names")
        for mc_name in self.names:
            if mc_name in in_names or mc_name in out_names:
                raise ValueError(
                    f"multi-call output {mc_name} conflicts with existing names"
                )


@StepSelector.register("multi_call")
@dataclasses.dataclass
class MultiCallStepConfig(StepConfigABC):
    """(reference: fme/core/step/multi_call.py:71)."""

    wrapped_step: StepSelector
    config: MultiCallConfig | None = None
    include_multi_call_in_loss: bool = True

    def __post_init__(self):
        if self.config is not None:
            self.config.validate(
                self.wrapped_step.input_names, self.wrapped_step.output_names
            )
        if self.config is None and self.include_multi_call_in_loss:
            raise ValueError(
                "include_multi_call_in_loss is True, but config is None"
            )

    @property
    def normalization(self):
        """Delegated to the wrapped step (the trainer builds the loss
        normalizer from step.config.normalization; reference
        MultiCallStepConfig.get_loss_normalizer extends the wrapped
        normalizer over the suffixed names)."""
        return self.wrapped_step.instance.normalization

    @property
    def _normalize_names(self) -> list[str]:
        return self.wrapped_step.instance._normalize_names

    def get_loss_normalizer(self, residual_scaled_names=None):
        """Wrapped loss normalizer extended so each suffixed multi-call
        output shares its base variable's statistics (reference
        multi_call.py MultiCallStepConfig.get_loss_normalizer)."""
        inner = self.wrapped_step.instance
        base = inner.normalization.build_loss_normalizer(
            inner._normalize_names,
            residual_scaled_names=residual_scaled_names,
        )
        if self.config is None:
            return base
        from ace_tpu.core.normalizer import StandardNormalizer

        means = dict(base.means)
        stds = dict(base.stds)
        for suffix in self.config.forcing_multipliers:
            for name in self.config.output_names:
                mc = get_multi_call_name(name, suffix)
                means[mc] = means[name]
                stds[mc] = stds[name]
        return StandardNormalizer(means, stds)

    @property
    def input_names(self) -> list[str]:
        return self.wrapped_step.input_names

    @property
    def output_names(self) -> list[str]:
        names = list(self.wrapped_step.output_names)
        if self.config is not None:
            names.extend(self.config.names)
        return names

    @property
    def loss_names(self) -> list[str]:
        if self.config is not None and self.include_multi_call_in_loss:
            return self.output_names
        return self.wrapped_step.output_names

    @property
    def prognostic_names(self) -> list[str]:
        return self.wrapped_step.prognostic_names

    @property
    def next_step_input_names(self) -> list[str]:
        return self.wrapped_step.next_step_input_names

    def get_next_step_forcing_names(self) -> list[str]:
        return self.wrapped_step.get_next_step_forcing_names()

    def get_step(self, dataset_info: DatasetInfo) -> "MultiCallStep":
        wrapped = self.wrapped_step.get_step(dataset_info)
        return MultiCallStep(wrapped_step=wrapped, config=self)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        return {
            "wrapped_step": self.wrapped_step.get_state(),
            "config": to_dict(self.config) if self.config else None,
            "include_multi_call_in_loss": self.include_multi_call_in_loss,
        }


class MultiCallStep(StepABC):
    def __init__(self, wrapped_step: StepABC, config: MultiCallStepConfig):
        self._wrapped = wrapped_step
        self._config = config

    @property
    def config(self) -> MultiCallStepConfig:
        return self._config

    @property
    def dataset_info(self) -> DatasetInfo:
        return self._wrapped.dataset_info

    def init_params(self, rng: jax.Array):
        return self._wrapped.init_params(rng)

    def init_stepper_state(self, input_data) -> StepperState:
        return self._wrapped.init_stepper_state(input_data)

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        wrapped_out = self._wrapped.step(params, args)
        output = dict(wrapped_out.output)
        mc = self._config.config
        if mc is not None:
            for suffix, multiplier in mc.forcing_multipliers.items():
                if (
                    mc.forcing_name not in args.input
                    and mc.forcing_name not in args.next_step_input_data
                ):
                    # fail loudly rather than silently emitting base
                    # predictions under the multi-call names (reference
                    # multi_call.py raises at call time)
                    raise ValueError(
                        f"multi-call forcing {mc.forcing_name!r} not in "
                        "input or next_step_input_data"
                    )
                scaled_input = dict(args.input)
                if mc.forcing_name in scaled_input:
                    scaled_input[mc.forcing_name] = (
                        multiplier * scaled_input[mc.forcing_name]
                    )
                scaled_next = dict(args.next_step_input_data)
                if mc.forcing_name in scaled_next:
                    scaled_next[mc.forcing_name] = (
                        multiplier * scaled_next[mc.forcing_name]
                    )
                # labels/data_mask carry through to the perturbed calls
                # (reference apply_input_process_func preserves them)
                mc_out = self._wrapped.step(
                    params,
                    dataclasses.replace(
                        args,
                        input=scaled_input,
                        next_step_input_data=scaled_next,
                    ),
                )
                for name in mc.output_names:
                    output[get_multi_call_name(name, suffix)] = (
                        mc_out.output[name]
                    )
        # the multi-call's own state/diagnostics are discarded; only the
        # wrapped step's are carried (reference: multi_call.py:320)
        return StepOutput(
            output=output,
            stepper_state=wrapped_out.stepper_state,
            corrector_diagnostics=wrapped_out.corrector_diagnostics,
        )

    def get_state(self) -> dict[str, Any]:
        return {"wrapped_step": self._wrapped.get_state()}
