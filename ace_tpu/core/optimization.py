"""Optimizer / LR-schedule / EMA configuration on optax
(reference: fme/core/optimization.py, fme/core/scheduler.py,
fme/core/ema.py).

TPU-native notes: there is no GradScaler — bfloat16 on TPU keeps the fp32
exponent range so loss scaling is unnecessary; "AMP" maps to running the
network in bfloat16 with fp32 params/optimizer state (handled by the model
dtype, not here). Gradient accumulation across rollout steps becomes a
scan-carried gradient sum (see TrainStepper); activation checkpointing maps
to ``jax.checkpoint`` over the scanned step body.
"""

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class SchedulerConfig:
    """LR scheduler config (reference: fme/core/scheduler.py:10).

    Supported types mirror the torch.optim.lr_scheduler names used by the
    reference configs: CosineAnnealingLR, CosineAnnealingWarmRestarts,
    StepLR, ExponentialLR, LinearLR, ConstantLR, OneCycleLR (subset of
    kwargs each).
    """

    type: str | None = None
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    step_each_iteration: bool = False

    def build(self, base_lr: float, max_epochs: int,
              steps_per_epoch: int = 1) -> optax.Schedule:
        """Return an optax schedule mapping update-count -> lr.

        When ``step_each_iteration`` is False, the schedule advances once
        per epoch; we emulate this by flooring the step count to epochs.
        """
        kw = dict(self.kwargs)
        per_epoch = not self.step_each_iteration

        def epochs(count):
            return count // steps_per_epoch if per_epoch else count

        if self.type is None:
            return lambda count: base_lr
        if self.type == "CosineAnnealingLR":
            t_max = kw.get("T_max", max_epochs)
            eta_min = kw.get("eta_min", 0.0)
            def schedule(count):
                t = jnp.minimum(epochs(count), t_max)
                return eta_min + (base_lr - eta_min) * 0.5 * (
                    1 + jnp.cos(jnp.pi * t / t_max)
                )
            return schedule
        if self.type == "CosineAnnealingWarmRestarts":
            t0 = kw.get("T_0", max_epochs)
            eta_min = kw.get("eta_min", 0.0)
            def schedule(count):
                t = jnp.mod(epochs(count), t0)
                return eta_min + (base_lr - eta_min) * 0.5 * (
                    1 + jnp.cos(jnp.pi * t / t0)
                )
            return schedule
        if self.type == "StepLR":
            step_size = kw.get("step_size", 1)
            gamma = kw.get("gamma", 0.1)
            return lambda count: base_lr * gamma ** (epochs(count) // step_size)
        if self.type == "ExponentialLR":
            gamma = kw["gamma"]
            return lambda count: base_lr * gamma ** epochs(count)
        if self.type == "LinearLR":
            start = kw.get("start_factor", 1.0 / 3)
            end = kw.get("end_factor", 1.0)
            total = kw.get("total_iters", 5)
            def schedule(count):
                frac = jnp.minimum(epochs(count) / total, 1.0)
                return base_lr * (start + (end - start) * frac)
            return schedule
        if self.type == "ConstantLR":
            factor = kw.get("factor", 1.0 / 3)
            total = kw.get("total_iters", 5)
            return lambda count: base_lr * jnp.where(
                epochs(count) < total, factor, 1.0
            )
        if self.type == "OneCycleLR":
            max_lr = kw.get("max_lr", base_lr)
            total = kw["total_steps"]
            pct_start = kw.get("pct_start", 0.3)
            div_factor = kw.get("div_factor", 25.0)
            final_div_factor = kw.get("final_div_factor", 1e4)
            initial = max_lr / div_factor
            final = initial / final_div_factor
            up = pct_start * total

            def schedule(count):
                t = epochs(count)
                rise = initial + (max_lr - initial) * 0.5 * (
                    1 - jnp.cos(jnp.pi * jnp.minimum(t / up, 1.0))
                )
                t2 = jnp.clip((t - up) / (total - up), 0.0, 1.0)
                fall = final + (max_lr - final) * 0.5 * (
                    1 + jnp.cos(jnp.pi * t2)
                )
                return jnp.where(t < up, rise, fall)

            return schedule
        raise NotImplementedError(f"scheduler type {self.type!r}")


@dataclasses.dataclass
class SequentialSchedulerConfig:
    """Run a sequence of LR schedulers one after the other
    (reference: fme/core/scheduler.py:48 SequentialSchedulerConfig,
    torch.optim.lr_scheduler.SequentialLR). ``milestones[i]`` is the epoch
    (or iteration, when step_each_iteration) at which ``schedulers[i+1]``
    takes over; each scheduler restarts its own clock at its milestone
    (optax.join_schedules semantics match SequentialLR's fresh start).
    """

    schedulers: list[SchedulerConfig]
    milestones: list[int]
    last_epoch: int = -1

    def __post_init__(self):
        if not self.schedulers:
            raise ValueError("schedulers must be non-empty")
        if len(self.milestones) != len(self.schedulers) - 1:
            raise ValueError(
                "milestones must have one fewer entry than schedulers"
            )
        if any(
            s.step_each_iteration != self.schedulers[0].step_each_iteration
            for s in self.schedulers
        ):
            raise ValueError(
                "All SchedulerConfigs in the SequentialSchedulerConfig "
                "must have identical values for step_each_iteration."
            )

    @property
    def type(self) -> str:
        return "Sequential"

    @property
    def step_each_iteration(self) -> bool:
        return self.schedulers[0].step_each_iteration

    def build(self, base_lr: float, max_epochs: int,
              steps_per_epoch: int = 1) -> optax.Schedule:
        children = [
            s.build(base_lr, max_epochs, steps_per_epoch)
            for s in self.schedulers
        ]
        # milestones are epochs unless stepping per iteration; optax
        # counts optimizer updates, so scale epoch milestones accordingly
        scale = 1 if self.step_each_iteration else steps_per_epoch
        boundaries = [m * scale for m in self.milestones]
        return optax.join_schedules(children, boundaries)


@dataclasses.dataclass
class CheckpointConfig:
    """Activation checkpointing (rematerialization) config
    (reference: fme/core/optimization.py:40 CheckpointConfig). Rollout
    steps with index >= after_n_forward_steps run under ``jax.checkpoint``
    so their activations are recomputed in the backward pass instead of
    stored; earlier steps keep their activations. ``kwargs`` is accepted
    for reference-config compatibility and warned-on-then-ignored (the
    torch ``use_reentrant`` etc. knobs have no JAX analog).
    """

    after_n_forward_steps: float = float("inf")
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if self.kwargs:
            import logging

            logging.warning(
                "CheckpointConfig.kwargs %s have no JAX analog and are "
                "IGNORED (torch checkpoint knobs like use_reentrant do "
                "not apply to jax.checkpoint)", dict(self.kwargs),
            )


@dataclasses.dataclass
class OptimizationConfig:
    """Optimizer config (reference: fme/core/optimization.py:289).

    ``enable_automatic_mixed_precision`` is accepted for config parity; on
    TPU it is a no-op here (bf16 compute is a model dtype concern).
    """

    optimizer_type: str = "Adam"  # "Adam" | "AdamW" | "FusedAdam"
    lr: float = 0.001
    kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    enable_automatic_mixed_precision: bool = False
    scheduler: SchedulerConfig | SequentialSchedulerConfig = (
        dataclasses.field(default_factory=SchedulerConfig)
    )
    max_grad_norm: float | None = None
    # accumulate gradients over this many batches before applying an
    # update (reference: optimization.py:289 use_gradient_accumulation;
    # here via optax.MultiSteps, which also scales the LR schedule count)
    use_gradient_accumulation: bool = False
    gradient_accumulation_steps: int = 1
    # activation rematerialization for rollout steps
    # (reference: optimization.py:331 checkpoint field)
    checkpoint: CheckpointConfig = dataclasses.field(
        default_factory=CheckpointConfig
    )
    # fine-tuning: transfer Adam moment estimates from another training
    # checkpoint while keeping this config's hyperparameters and a fresh
    # LR schedule (reference: optimization.py:314)
    resume_optimizer_ckpt_path: str | None = None
    # storage dtype for the Adam first moment (e.g. "bfloat16"): halves
    # that buffer's HBM so large models fit a 16 GB chip; the update
    # math still runs in f32 (optax mu_dtype semantics). None keeps the
    # reference behavior (f32 moments).
    first_moment_dtype: str | None = None

    def __post_init__(self):
        if self.optimizer_type == "FusedAdam":
            import warnings

            warnings.warn(
                "FusedAdam is deprecated. Use AdamW instead.",
                DeprecationWarning,
            )
        if self.enable_automatic_mixed_precision:
            import logging

            logging.warning(
                "enable_automatic_mixed_precision is IGNORED on TPU: "
                "mixed precision is a model dtype here — set the "
                "builder's compute_dtype to 'bfloat16' instead (the "
                "spectral transforms stay f32 either way, matching the "
                "reference's autocast-disabled SHT blocks)"
            )

    @property
    def has_lr_schedule(self) -> bool:
        """(reference: optimization.py:345)."""
        if isinstance(self.scheduler, SequentialSchedulerConfig):
            return True
        return self.scheduler.type is not None

    def build(self, max_epochs: int, steps_per_epoch: int = 1) -> "Optimization":
        base_schedule = self.scheduler.build(
            self.lr, max_epochs, steps_per_epoch
        )
        # mutable multiplier so LR-tuning adoptions (train/lr_tuning.py)
        # can rescale the schedule mid-training; the caller must re-jit
        # its train step afterwards since jit bakes the current value in
        scale_box = [1.0]

        def schedule(count):
            return base_schedule(count) * scale_box[0]
        kw = dict(self.kwargs)
        b1, b2 = kw.pop("betas", (0.9, 0.999))
        eps = kw.pop("eps", 1e-8)
        weight_decay = kw.pop("weight_decay", None)
        mu_dtype = self.first_moment_dtype
        if self.optimizer_type in ("Adam", "FusedAdam"):
            opt = optax.adam(
                schedule, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype
            )
            if weight_decay:
                opt = optax.chain(
                    optax.add_decayed_weights(weight_decay), opt
                )
        elif self.optimizer_type == "AdamW":
            opt = optax.adamw(
                schedule, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype,
                weight_decay=weight_decay if weight_decay is not None else 0.01,
            )
        else:
            raise NotImplementedError(
                f"optimizer type {self.optimizer_type!r}"
            )
        if self.max_grad_norm is not None:
            opt = optax.chain(
                optax.clip_by_global_norm(self.max_grad_norm), opt
            )
        if self.gradient_accumulation_steps > 1:
            opt = optax.MultiSteps(
                opt, every_k_schedule=self.gradient_accumulation_steps
            ).gradient_transformation()
        return Optimization(
            tx=opt, schedule=schedule, config=self, lr_scale_box=scale_box,
        )

    def get_state(self) -> dict:
        from ace_tpu.core.config import to_dict

        return to_dict(self)


class Optimization:
    """Holds the optax transformation + mutable optimizer state."""

    def __init__(self, tx: optax.GradientTransformation, schedule, config,
                 lr_scale_box: list | None = None):
        self.tx = tx
        self.schedule = schedule
        self.config = config
        self.state = None
        self._count = 0
        self._lr_scale_box = lr_scale_box if lr_scale_box is not None else [1.0]

    def scale_lr(self, factor: float):
        """Multiply the LR schedule by ``factor`` from now on (LR-tuning
        adoption). Callers holding a jitted train step must rebuild it —
        jit bakes the scale in at trace time."""
        self._lr_scale_box[0] *= factor

    def init(self, params):
        self.state = self.tx.init(params)
        return self.state

    @property
    def learning_rate(self) -> float:
        return float(self.schedule(self._count))

    def step(self, params, grads, opt_state=None):
        """Pure-functional update; also advances internal bookkeeping."""
        opt_state = opt_state if opt_state is not None else self.state
        updates, new_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        self.state = new_state
        self._count += 1
        return new_params, new_state

    def get_state(self) -> dict:
        return {
            "count": self._count,
            # LR-tuning adoption scale; without it a restart would
            # silently revert to the untuned learning rate
            "lr_scale": self._lr_scale_box[0],
        }

    def load_state(self, state: dict):
        self._count = state.get("count", 0)
        self._lr_scale_box[0] = state.get("lr_scale", 1.0)


class NullOptimization:
    """No-op optimization used for validation
    (reference: fme/core/optimization.py NullOptimization).
    """

    def init(self, params):
        return None

    def step(self, params, grads, opt_state=None):
        return params, None

    @property
    def learning_rate(self) -> float:
        return float("nan")


@dataclasses.dataclass
class EMAConfig:
    """Exponential moving average of params
    (reference: fme/core/ema.py:51 EMATracker).
    """

    decay: float = 0.9999
    use_num_updates: bool = True

    def build(self) -> "EMATracker":
        return EMATracker(
            decay=self.decay, use_num_updates=self.use_num_updates
        )


class EMATracker:
    """EMA with decay ramp-up (reference: fme/core/ema.py:85):
    effective decay = min(decay, (1 + n) / (10 + n)).
    """

    def __init__(self, decay: float, use_num_updates: bool = True):
        if decay < 0.0 or decay > 1.0:
            raise ValueError("decay must be in [0, 1]")
        self.decay = decay
        self.use_num_updates = use_num_updates
        self.ema_params = None
        self.num_updates = 0

    def init(self, params):
        self.ema_params = params
        self.num_updates = 0

    def __call__(self, params):
        """Update EMA from current params (host-side loop driver calls this
        once per optimizer step).
        """
        self.num_updates += 1
        if self.use_num_updates:
            decay = min(
                self.decay, (1 + self.num_updates) / (10 + self.num_updates)
            )
        else:
            decay = self.decay
        one_minus = 1.0 - decay
        self.ema_params = jax.tree_util.tree_map(
            lambda e, p: e - one_minus * (e - p), self.ema_params, params
        )
        return self.ema_params

    def get_state(self) -> dict:
        return {"num_updates": self.num_updates, "decay": self.decay}

    def load_state(self, state: dict):
        self.num_updates = state["num_updates"]
        self.decay = state.get("decay", self.decay)
