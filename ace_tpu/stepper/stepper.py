"""Autoregressive rollout engine over any StepABC
(reference: fme/ace/stepper/single_module.py:803 Stepper).

TPU-native design: the rollout is a ``jax.lax.scan`` over time with
time-major forcing slices as scan inputs, so the whole multi-step rollout
compiles to a single XLA while-loop — no per-step dispatch, and
``jax.checkpoint`` policies can be applied to the scanned body for
rollout-length memory scaling (the reference uses per-step activation
checkpointing, fme/core/optimization.py:40).
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.masking import StaticSpatialMaskingConfig
from ace_tpu.core.step import (  # noqa: F401 — imports register step types
    StepABC,
    StepArgs,
    StepperState,
    StepSelector,
)
from ace_tpu.core.typing_ import TensorDict, TensorMapping

TIME_DIM = 1


@dataclasses.dataclass
class PrognosticState:
    """Prognostic fields with a size-``n_ic_timesteps`` time dim, usable as
    an initial condition (reference: fme/ace/data_loading/batch_data.py:125).
    """

    data: TensorDict  # [batch, n_ic_timesteps, ...]
    stepper_state: StepperState = dataclasses.field(default_factory=dict)


def _time_major(x: jax.Array) -> jax.Array:
    return jnp.moveaxis(x, TIME_DIM, 0)


def _batch_major(x: jax.Array) -> jax.Array:
    return jnp.moveaxis(x, 0, TIME_DIM)


class Stepper:
    """Rollout engine: threads prognostic state, per-sample stepper state
    and PRNG keys through an XLA-compiled scan over forward steps.
    """

    def __init__(self, step: StepABC, params: Any = None,
                 input_masker=None):
        from ace_tpu.core.training_history import TrainingHistory

        self.step = step
        self.params = params
        # provenance chain of training jobs, serialized into checkpoints
        # (reference: fme/ace/stepper/single_module.py:856 training_history)
        self.training_history = TrainingHistory()
        # output spatial masking from dataset "mask_*" fields (reference:
        # fme/ace/stepper/single_module.py:841 _output_masking)
        provider = getattr(step.dataset_info, "mask_provider", None)
        self.output_masker = (
            provider.build_output_masker() if provider is not None
            else (lambda data: data)
        )
        # input spatial masking (reference: single_module.py:1063
        # args.apply_input_process_func)
        self.input_masker = input_masker or (lambda data: dict(data))
        # jitted-rollout cache for predict() (built lazily; see predict)
        self._predict_jitted = None
        if (
            input_masker is None
            and provider is not None
            and getattr(provider, "masks", None)
        ):
            import logging

            logging.warning(
                "dataset has mask_* fields: outputs are NaN-filled in "
                "masked regions (reference behavior) but no "
                "input_masking is configured — NaN will feed the "
                "network after the first step; set "
                "stepper.input_masking to refill masked inputs"
            )

    @property
    def prognostic_names(self) -> list[str]:
        return self.step.prognostic_names

    @property
    def out_names(self) -> list[str]:
        return self.step.output_names

    @property
    def forcing_window_names(self) -> list[str]:
        """All variables the forcing window must provide."""
        input_only = set(self.step.input_names) - set(self.step.output_names)
        return sorted(input_only | set(self.step.next_step_input_names))

    @property
    def n_ic_timesteps(self) -> int:
        return self.step.n_ic_timesteps

    @property
    def dataset_info(self) -> DatasetInfo:
        return self.step.dataset_info

    def init_params(self, rng: jax.Array):
        # jit so initialization is one compiled program rather than
        # thousands of individually dispatched ops
        self.params = jax.jit(self.step.init_params)(rng)
        return self.params

    def get_initial_state(self, ic: PrognosticState) -> PrognosticState:
        """Seed stepper state (corrector references) from the IC if absent."""
        if ic.stepper_state:
            return ic
        ic_squeezed = {
            k: v[:, -1] if v.ndim > 3 else v for k, v in ic.data.items()
        }
        return PrognosticState(
            data=ic.data,
            stepper_state=self.step.init_stepper_state(ic_squeezed),
        )

    def predict_fn(
        self,
        params: Any,
        ic_data: TensorMapping,
        forcing: TensorMapping,
        stepper_state: StepperState,
        rng: jax.Array,
        deterministic: bool = True,
        labels=None,
        n_forward: int | None = None,
    ) -> tuple[TensorDict, TensorDict, StepperState]:
        """Pure rollout function (jit/grad/shard_map-compatible).

        Args:
            params: module parameter pytree.
            ic_data: prognostic fields, each [batch, n_ic, ...spatial].
            forcing: forcing fields, each [batch, n_forward+1, ...spatial]
                (index 0 aligns with the IC).
            stepper_state: per-sample state (from ``init_stepper_state``).
            rng: PRNG key consumed one split per step.
            n_forward: rollout length; required when the model has no
                forcing variables (otherwise inferred from them).

        Returns:
            (outputs, diagnostics, final_stepper_state); outputs are
            [batch, n_forward, ...spatial] for every output variable.
        """
        step = self.step
        prognostic_names = step.prognostic_names
        input_only = sorted(set(step.input_names) - set(step.output_names))
        nsf = set(step.next_step_forcing_names)
        nsi = step.next_step_input_names

        state0 = {k: ic_data[k][:, -1] for k in prognostic_names}

        xs_in = {
            k: _time_major(forcing[k][:, 1:] if k in nsf else forcing[k][:, :-1])
            for k in input_only
        }
        xs_next = {k: _time_major(forcing[k][:, 1:]) for k in nsi}

        def body(carry, xs):
            state, st_state, key = carry
            key, sub = jax.random.split(key)
            forcing_t, next_t = xs
            out = step.step(
                params,
                StepArgs(
                    input=self.input_masker({**state, **forcing_t}),
                    next_step_input_data=self.input_masker(next_t),
                    stepper_state=st_state,
                    rng=sub,
                    deterministic=deterministic,
                    labels=labels,
                ),
            )
            masked = self.output_masker(out.output)
            new_state = {k: masked[k] for k in prognostic_names}
            return (new_state, out.stepper_state, key), (
                masked,
                out.corrector_diagnostics,
            )

        if n_forward is None:
            if forcing:
                n_forward = next(iter(forcing.values())).shape[1] - 1
            else:
                raise ValueError(
                    "n_forward is required when the model has no forcing "
                    "variables"
                )
        (_, final_state, _), (outputs, diags) = jax.lax.scan(
            body, (state0, stepper_state, rng), (xs_in, xs_next),
            length=n_forward,
        )
        outputs = {k: _batch_major(v) for k, v in outputs.items()}
        diags = {k: _batch_major(v) for k, v in diags.items()}
        return outputs, diags, final_state

    def predict(
        self,
        initial_condition: PrognosticState,
        forcing: TensorMapping,
        rng: jax.Array | None = None,
        params: Any = None,
        n_forward: int | None = None,
    ) -> tuple[TensorDict, PrognosticState]:
        """Convenience inference rollout using stored params.

        ``forcing`` arrays are [batch, n_forward + n_ic, ...spatial].
        Returns output dict [batch, n_forward, ...] and the final
        PrognosticState.
        """
        params = params if params is not None else self.params
        if params is None:
            raise ValueError("Stepper has no params; call init_params first")
        ic = self.get_initial_state(initial_condition)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        forcing_subset = {
            k: forcing[k] for k in self.forcing_window_names if k in forcing
        }
        missing = set(self.forcing_window_names) - set(forcing_subset)
        if missing:
            raise ValueError(f"forcing data missing variables {sorted(missing)}")
        # jit the rollout once per (shape, n_forward) signature: an eager
        # predict_fn re-TRACES the whole scan body (the full network) on
        # every call — measured seconds per window at flagship scale in
        # the inference loop and the coupled outer loop
        if self._predict_jitted is None:
            self._predict_jitted = jax.jit(
                self.predict_fn,
                static_argnames=("deterministic", "n_forward"),
            )
        outputs, diags, final_state = self._predict_jitted(
            params, ic.data, forcing_subset, ic.stepper_state, rng,
            n_forward=n_forward,
        )
        next_ic = PrognosticState(
            data={
                k: outputs[k][:, -self.n_ic_timesteps :]
                for k in self.prognostic_names
            },
            stepper_state=final_state,
        )
        return outputs, next_ic


@dataclasses.dataclass
class StepperConfig:
    """Top-level stepper configuration
    (reference: fme/ace/stepper/single_module.py:525 StepperConfig).
    """

    step: StepSelector
    # fill statically masked regions of step inputs (reference:
    # fme/ace/stepper/single_module.py:536 input_masking)
    input_masking: StaticSpatialMaskingConfig | None = None

    def get_stepper(self, dataset_info: DatasetInfo) -> Stepper:
        step = self.step.get_step(dataset_info)
        input_masker = None
        if self.input_masking is not None:
            input_masker = self.input_masking.build(
                getattr(dataset_info, "mask_provider", None),
                means=getattr(
                    getattr(step, "normalizer", None), "means", None
                ),
            )
        return Stepper(step=step, input_masker=input_masker)

    @property
    def in_names(self) -> list[str]:
        return self.step.input_names

    @property
    def out_names(self) -> list[str]:
        return self.step.output_names

    def get_state(self) -> dict:
        from ace_tpu.core.config import to_dict

        state = {"step": self.step.get_state()}
        if self.input_masking is not None:
            state["input_masking"] = to_dict(self.input_masking)
        return state

    @classmethod
    def from_state(cls, state: dict) -> "StepperConfig":
        from ace_tpu.core.config import from_dict as _from_dict

        input_masking = None
        if state.get("input_masking") is not None:
            input_masking = _from_dict(
                StaticSpatialMaskingConfig, state["input_masking"]
            )
        return cls(
            step=StepSelector.from_state(state["step"]),
            input_masking=input_masking,
        )


@dataclasses.dataclass
class CheckpointStepperConfig:
    """Define the stepper by loading its configuration from a saved
    checkpoint (reference: fme/ace/stepper/single_module.py:786
    CheckpointStepperConfig). Weight initialization is separate
    (parameter_init under stepper_training).
    """

    checkpoint_path: str

    def to_stepper_config(self) -> "StepperConfig":
        import json

        from ace_tpu.stepper.checkpoint import load_msgpack

        payload = load_msgpack(self.checkpoint_path)
        return StepperConfig.from_state(
            json.loads(payload["stepper"]["config"])
        )

    def get_stepper(self, dataset_info: DatasetInfo) -> "Stepper":
        return self.to_stepper_config().get_stepper(dataset_info)

    @property
    def in_names(self) -> list[str]:
        return self.to_stepper_config().in_names

    @property
    def out_names(self) -> list[str]:
        return self.to_stepper_config().out_names


@dataclasses.dataclass
class StepperOverrideConfig:
    """Inference-time overrides of a serialized stepper's configuration
    (reference: fme/ace/stepper/single_module.py:1848
    StepperOverrideConfig). "keep" leaves the stored value untouched.
    """

    ocean: Any = "keep"
    prescribed_prognostic_names: Any = "keep"
    # override the serialized MultiCall configuration: None disables
    # multi-call diagnostics at inference; a dict replaces/wraps with a
    # new MultiCallConfig (reference: single_module.py:1868)
    multi_call: Any = "keep"

    def apply(self, stepper_config_state: dict) -> dict:
        state = dict(stepper_config_state)
        step = dict(state.get("step", {}))
        step_cfg = dict(step.get("config", {}))
        # ocean/prescribed overrides act on the inner (module) step
        # config, which for a multi_call wrapper is the wrapped step
        inner_cfg = step_cfg
        if step.get("type") == "multi_call":
            wrapped = dict(step_cfg.get("wrapped_step", {}))
            inner_cfg = dict(wrapped.get("config", {}))
            wrapped["config"] = inner_cfg
            step_cfg["wrapped_step"] = wrapped
        if self.ocean != "keep":
            inner_cfg["ocean"] = self.ocean
        if self.prescribed_prognostic_names != "keep":
            inner_cfg["prescribed_prognostic_names"] = (
                list(self.prescribed_prognostic_names)
            )
        if self.multi_call != "keep":
            if step.get("type") == "multi_call":
                if self.multi_call is None:
                    step_cfg["config"] = None
                    step_cfg["include_multi_call_in_loss"] = False
                else:
                    step_cfg["config"] = self.multi_call
            elif self.multi_call is not None:
                step = {
                    "type": "multi_call",
                    "config": {
                        "wrapped_step": {
                            "type": step.get("type"),
                            "config": step_cfg,
                        },
                        "config": self.multi_call,
                        "include_multi_call_in_loss": False,
                    },
                }
                state["step"] = step
                return state
        step["config"] = step_cfg
        state["step"] = step
        return state
