"""Single-timestep transition contract (reference: fme/core/step/step.py).

A Step maps denormalized input fields at time t (plus next-step forcing
data) to denormalized output fields at time t+dt. In this framework a step
is a *pure function* of (params, StepArgs); module parameters live in an
explicit pytree so steps compose with jit/grad/scan/shard_map.
"""

import abc
import dataclasses
from typing import Any

import jax

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.registry import Registry, Selector
from ace_tpu.core.typing_ import TensorDict, TensorMapping

# Per-sample state threaded through step calls inside a rollout (corrector
# reference values, PRNG state). A plain dict pytree with *static* key
# structure so it can be a lax.scan carry.
StepperState = dict


@dataclasses.dataclass
class StepArgs:
    """Arguments to ``StepABC.step`` (reference: fme/core/step/args.py)."""

    input: TensorMapping
    next_step_input_data: TensorMapping
    stepper_state: StepperState
    rng: jax.Array | None = None
    deterministic: bool = True
    # Per-variable [batch] bool presence masks for genuinely-absent inputs
    # (reference: fme/core/step/args.py data_mask); None = all present.
    data_mask: TensorMapping | None = None
    # One-hot dataset labels [batch, n_labels] for conditional models
    # (reference: fme/core/step/args.py labels)
    labels: jax.Array | None = None
    # skip the post-step corrector for this call: set by the train loop
    # during the first ``corrector_disabled_epochs`` epochs (reference:
    # fme/core/corrector/registry.py EpochScheduledCorrector; eval-mode
    # steps always apply the corrector)
    corrector_disabled: bool = False


@dataclasses.dataclass
class StepOutput:
    """Result of one step (reference: fme/core/step/output.py)."""

    output: TensorDict
    stepper_state: StepperState
    corrector_diagnostics: TensorDict = dataclasses.field(default_factory=dict)


class StepABC(abc.ABC):
    @property
    @abc.abstractmethod
    def config(self) -> "StepConfigABC": ...

    @property
    @abc.abstractmethod
    def dataset_info(self) -> DatasetInfo: ...

    @property
    def input_names(self) -> list[str]:
        return self.config.input_names

    @property
    def output_names(self) -> list[str]:
        return self.config.output_names

    @property
    def prognostic_names(self) -> list[str]:
        return self.config.prognostic_names

    @property
    def diagnostic_names(self) -> list[str]:
        return self.config.diagnostic_names

    @property
    def forcing_names(self) -> list[str]:
        return self.config.forcing_names

    @property
    def loss_names(self) -> list[str]:
        return self.config.loss_names

    @property
    def next_step_input_names(self) -> list[str]:
        return self.config.next_step_input_names

    @property
    def next_step_forcing_names(self) -> list[str]:
        return self.config.get_next_step_forcing_names()

    @property
    def n_ic_timesteps(self) -> int:
        return 1

    @abc.abstractmethod
    def init_params(self, rng: jax.Array) -> Any:
        """Initialize the module parameter pytree."""

    @abc.abstractmethod
    def init_stepper_state(self, input_data: TensorMapping) -> StepperState:
        """Build the (static-structure) per-sample state from the IC."""

    @abc.abstractmethod
    def step(self, params: Any, args: StepArgs) -> StepOutput: ...

    @abc.abstractmethod
    def get_state(self) -> dict[str, Any]: ...


@dataclasses.dataclass
class StepConfigABC(abc.ABC):
    @abc.abstractmethod
    def get_step(self, dataset_info: DatasetInfo) -> StepABC: ...

    @property
    @abc.abstractmethod
    def input_names(self) -> list[str]: ...

    @property
    @abc.abstractmethod
    def output_names(self) -> list[str]: ...

    @property
    @abc.abstractmethod
    def next_step_input_names(self) -> list[str]: ...

    @property
    def prognostic_names(self) -> list[str]:
        return sorted(set(self.output_names) & set(self.input_names))

    @property
    def diagnostic_names(self) -> list[str]:
        return sorted(set(self.output_names) - set(self.input_names))

    @property
    def forcing_names(self) -> list[str]:
        return sorted(set(self.input_names) - set(self.output_names))

    @property
    def loss_names(self) -> list[str]:
        return self.output_names

    def get_next_step_forcing_names(self) -> list[str]:
        return []


class StepSelector(Selector):
    """``{type, config}`` step selection (reference: fme/core/step/step.py:241)."""

    _registry: Registry = Registry()

    @classmethod
    def get_registry(cls) -> Registry:
        return cls._registry

    @classmethod
    def register(cls, name: str):
        return cls._registry.register(name)

    def get_step(self, dataset_info: DatasetInfo) -> StepABC:
        return self.instance.get_step(dataset_info)

    @property
    def allow_missing_variables(self) -> bool:
        """Whether the data pipeline may emit presence masks for missing
        variables (reference: fme/core/step/step.py:234, delegating to
        the step config's builder; True if ANY builder allows it)."""
        cfg = self.instance
        for field in ("builder", "radiation_builder", "secondary_builder"):
            builder = getattr(cfg, field, None)
            if builder is not None and getattr(
                builder, "allow_missing_variables", False
            ):
                return True
        return False

    def __getattr__(self, name):
        # delegate name-set properties to the wrapped config
        return getattr(self.instance, name)
