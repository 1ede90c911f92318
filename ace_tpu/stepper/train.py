"""Training stepper: multi-step rollout loss + optimizer update as one
jitted function (reference: fme/ace/stepper/single_module.py:1559
TrainStepper, train_on_batch :1598).

TPU-native design: the rollout-with-loss is a single ``lax.scan`` whose
body can be wrapped in ``jax.checkpoint`` (the reference's per-step
activation checkpointing, fme/core/optimization.py:40); the whole
(loss -> grad -> optimizer update) pipeline is one XLA program, so a
training step is one device launch. Under a data-parallel mesh the same
function runs SPMD with gradients reduced by XLA (psum from sharding
constraints) — no DDP wrapper exists or is needed.
"""

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ace_tpu.core.loss import StepLossConfig
from ace_tpu.core.schedule import (
    TimeLengthProbabilities,
    TimeLengthSchedule,
    probabilities_from_time_length,
)
from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
from ace_tpu.core.step.base import StepArgs
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.ops.sht import RealSHT
from ace_tpu.stepper.parameter_init import ParameterInitializationConfig
from ace_tpu.stepper.stepper import Stepper, _batch_major, _time_major


@dataclasses.dataclass
class StepperTrainConfig:
    """Training-specific stepper options
    (reference: fme/ace/train/train_config.py stepper_training block).

    n_forward_steps: rollout length for the training loss — a constant,
        a stochastic TimeLengthProbabilities, or an epoch-milestone
        TimeLengthSchedule of either (reference:
        time_length_probabilities.py TimeLengthSchedule; lengths are
        sampled per batch host-side, and XLA caches one executable per
        distinct length).
    n_ensemble: ensemble members per sample for CRPS/EnergyScore training.
    remat: apply jax.checkpoint to every scanned step body (activation
        rematerialization). For the reference's threshold behavior use
        OptimizationConfig.checkpoint.after_n_forward_steps instead,
        which remats only the steps at or past the threshold.
    """

    loss: StepLossConfig = dataclasses.field(default_factory=StepLossConfig)
    n_forward_steps: int | TimeLengthProbabilities | TimeLengthSchedule = 1
    # -1 = auto: 2 for ensemble losses, else 1 (reference
    # single_module.py:1475-1480 __post_init__)
    n_ensemble: int = -1
    remat: bool = False
    # optimize only the final rollout step's loss; intermediate steps
    # still run (and carry gradients through the rollout) but do not
    # contribute loss terms (reference: single_module.py:1468
    # optimize_last_step_only)
    optimize_last_step_only: bool = False
    # fine-tuning: base-checkpoint weight transfer, parameter freezing and
    # L2-SP regularization (reference: single_module.py:1471 parameter_init)
    parameter_init: "ParameterInitializationConfig" = dataclasses.field(
        default_factory=lambda: ParameterInitializationConfig()
    )

    def __post_init__(self):
        ensemble = self.loss.type in ("EnsembleLoss",)
        if self.n_ensemble == -1:
            self.n_ensemble = 2 if ensemble else 1
        if ensemble and self.n_ensemble < 2:
            # CRPS/energy score over a single member would silently
            # reduce over the latitude axis
            raise ValueError(
                "EnsembleLoss requires n_ensemble >= 2 "
                f"(got {self.n_ensemble})"
            )

    @property
    def n_forward_steps_schedule(self) -> TimeLengthSchedule:
        if isinstance(self.n_forward_steps, TimeLengthSchedule):
            return self.n_forward_steps
        return TimeLengthSchedule.from_constant(self.n_forward_steps)

    @property
    def max_n_forward_steps(self) -> int:
        return self.n_forward_steps_schedule.max_n_forward_steps


class TrainStepper:
    """Composes a Stepper with a loss and an optimizer into pure train/valid
    step functions.
    """

    def __init__(
        self,
        stepper: Stepper,
        train_config: StepperTrainConfig,
        optimization_config: OptimizationConfig,
        ema_config: EMAConfig | None = None,
        max_epochs: int = 1,
        steps_per_epoch: int = 1,
    ):
        self.stepper = stepper
        self.train_config = train_config
        step = stepper.step
        info = step.dataset_info
        sht = None
        if train_config.loss.is_ensemble_loss:
            if len(info.img_shape) == 2:
                nlat, nlon = info.img_shape
                grid = info.horizontal_coordinates.grid
                sht = RealSHT(nlat, nlon, grid=grid, channels_last=True)
            else:
                # HEALPix: channels-last SHT via gridded operations
                sht = info.gridded_operations.get_real_sht()
        # loss normalizer: network stats with residual stds for prognostics
        if hasattr(step.config, "get_loss_normalizer"):
            # steps with synthetic output names (multi-call) extend the
            # normalizer themselves (reference
            # MultiCallStepConfig.get_loss_normalizer)
            loss_normalizer = step.config.get_loss_normalizer(
                residual_scaled_names=step.prognostic_names
            )
        else:
            loss_normalizer = (
                step.config.normalization.build_loss_normalizer(
                    step.config._normalize_names,
                    residual_scaled_names=step.prognostic_names,
                )
            )
        self.step_loss = train_config.loss.build(
            info.gridded_operations,
            out_names=step.output_names,
            normalizer=loss_normalizer,
            sht=sht,
        )
        self.optimization = self._build_optimization(
            optimization_config, max_epochs, steps_per_epoch
        )
        self.ema = ema_config.build() if ema_config is not None else None
        self._train_step_fn: Callable | None = None
        self._loss_fn: Callable | None = None
        self._length_sampler: TimeLengthProbabilities | None = None
        self._sampler_epoch: int | None = None
        self._base_params = None  # set by init() when fine-tuning

    def _build_optimization(self, optimization_config, max_epochs,
                            steps_per_epoch):
        import optax

        optimization = optimization_config.build(
            max_epochs=max_epochs, steps_per_epoch=steps_per_epoch
        )
        frozen = self.train_config.parameter_init.frozen_parameters
        if frozen is not None:
            # zero updates for frozen params (reference: parameter_init.py
            # frozen_parameters). Chained with a callable mask here (not in
            # init()) so the optimizer-state structure is identical whether
            # a run starts fresh or resumes from a checkpoint.
            optimization.tx = optax.chain(
                optimization.tx,
                optax.masked(optax.set_to_zero(), frozen.frozen_mask),
            )
        return optimization

    def _get_base_params(self):
        """Base-checkpoint weights for the L2-SP regularizer; lazily
        loaded so a checkpoint-resumed run (which skips init()) still
        regularizes toward the same base."""
        pinit = self.train_config.parameter_init
        if self._base_params is None and pinit.weights_path is not None:
            from ace_tpu.stepper.checkpoint import load_stepper

            self._base_params = load_stepper(pinit.weights_path).params
        return self._base_params

    def sample_n_forward_steps(self, epoch: int = 0) -> int:
        """Per-batch rollout-length draw for the current epoch
        (reference: loss_schedule.py LossSchedule.sample). Constant
        configs return the fixed length without consuming randomness.
        """
        schedule = self.train_config.n_forward_steps_schedule
        if self._sampler_epoch != epoch:
            self._length_sampler = probabilities_from_time_length(
                schedule.get_value(epoch)
            )
            self._sampler_epoch = epoch
        assert self._length_sampler is not None
        if self._length_sampler.is_constant:
            return self._length_sampler.max_n_forward_steps
        return self._length_sampler.sample()

    # ----- pure functions -----

    @property
    def corrector_disabled_epochs(self) -> int:
        """Initial epochs during which train-mode steps skip the corrector
        (reference: fme/core/corrector/registry.py:29)."""
        cfg = getattr(self.stepper.step.config, "corrector", None)
        if cfg is None:
            return 0
        inst = getattr(cfg, "instance", cfg)  # unwrap CorrectorSelector
        return int(getattr(inst, "corrector_disabled_epochs", 0))

    def loss_fn(self, params, batch: TensorMapping, rng: jax.Array,
                n_steps: int | None = None, labels=None,
                deterministic: bool = False,
                corrector_disabled: bool = False,
                data_mask: TensorMapping | None = None):
        """Rollout loss over n_steps (defaults to the schedule maximum).

        batch: dict of [B, n_forward+1, ...spatial] containing all input,
        forcing and target variables (index 0 = IC).
        ``deterministic=True`` disables dropout/input-dropout/noise (the
        reference calls stepper.set_eval() before validation,
        generics/trainer.py:600).
        Returns (total_loss, metrics_dict).
        """
        step = self.stepper.step
        cfg = self.train_config
        if n_steps is None:
            n_steps = cfg.max_n_forward_steps
        prognostic_names = step.prognostic_names
        input_only = sorted(set(step.input_names) - set(step.output_names))
        nsf = set(step.next_step_forcing_names)
        nsi = step.next_step_input_names
        out_names = step.output_names
        n_ens = cfg.n_ensemble

        def expand_ens(x):
            # fold ensemble into batch: [B, ...] -> [B*E, ...]
            if n_ens == 1:
                return x
            return jnp.repeat(x, n_ens, axis=0)

        if labels is not None:
            labels = expand_ens(labels)
        # presence masks: [B] per variable; the step sees the
        # ensemble-folded batch, the loss the original batch axis
        # (reference: single_module.py train_on_batch data_mask)
        step_mask = None
        if data_mask is not None:
            step_mask = {k: expand_ens(v) for k, v in data_mask.items()}
        state0 = {
            k: expand_ens(batch[k][:, 0]) for k in prognostic_names
        }
        stepper_state = step.init_stepper_state(state0)
        xs_in = {
            k: _time_major(expand_ens(
                batch[k][:, 1 : n_steps + 1] if k in nsf
                else batch[k][:, 0:n_steps]
            ))
            for k in input_only
        }
        xs_next = {
            k: _time_major(expand_ens(batch[k][:, 1 : n_steps + 1]))
            for k in nsi
        }
        xs_target = {
            k: _time_major(batch[k][:, 1 : n_steps + 1]) for k in out_names
        }
        xs_idx = jnp.arange(n_steps)

        def body(carry, xs):
            state, st_state, key, loss_sum = carry
            key, sub = jax.random.split(key)
            forcing_t, next_t, target_t, idx = xs
            out = step.step(
                params,
                StepArgs(
                    # input masking fills statically masked regions (NaN
                    # on ocean data) before the network, during training
                    # exactly as at inference (reference:
                    # single_module.py:1063 apply_input_process_func)
                    input=self.stepper.input_masker(
                        {**state, **forcing_t}
                    ),
                    next_step_input_data=self.stepper.input_masker(
                        next_t
                    ),
                    stepper_state=st_state,
                    rng=sub,
                    deterministic=deterministic,
                    labels=labels,
                    corrector_disabled=corrector_disabled,
                    data_mask=step_mask,
                ),
            )
            # static output masking applies during training exactly as in
            # the inference rollout (reference Stepper.step masks every
            # call, ace/stepper/single_module.py:1069)
            masked = self.stepper.output_masker(out.output)
            gen = {k: masked[k] for k in out_names}
            if n_ens > 1:
                # unfold ensemble for the probabilistic loss:
                # [B*E, ...] -> [B, E, ...]; target gets a size-1 ens axis
                gen_l = {
                    k: v.reshape(-1, n_ens, *v.shape[1:])
                    for k, v in gen.items()
                }
                tgt_l = {k: v[:, None] for k, v in target_t.items()}
            else:
                gen_l, tgt_l = gen, target_t
            step_loss = self.step_loss(gen_l, tgt_l, idx,
                                       data_mask=data_mask)
            new_state = {k: masked[k] for k in prognostic_names}
            if cfg.optimize_last_step_only:
                # all-but-the-last step run without gradient: detaching
                # the carried state means only the final step()'s
                # parameters see gradient (reference single_module.py:
                # 1706-1711 wraps earlier steps in torch.no_grad())
                new_state = jax.lax.stop_gradient(new_state)
                st_out = jax.lax.stop_gradient(out.stepper_state)
            else:
                st_out = out.stepper_state
            return (
                (new_state, st_out, key, loss_sum + step_loss.total),
                step_loss.total,
            )

        # activation rematerialization: steps >= after_n_forward_steps
        # recompute activations in the backward pass (reference:
        # fme/core/optimization.py:40 CheckpointConfig.build(step)).
        # cfg.remat=True remats everything; otherwise the threshold
        # splits the rollout into an eager-prefix scan and a remat scan.
        if cfg.remat:
            split = 0
        else:
            after = self.optimization.config.checkpoint.after_n_forward_steps
            split = n_steps if after >= n_steps else max(int(after), 0)
        carry = (state0, stepper_state, rng, jnp.zeros(()))
        xs_all = (xs_in, xs_next, xs_target, xs_idx)
        segments = []
        if split > 0:
            segments.append((body, 0, split))
        if split < n_steps:
            segments.append((jax.checkpoint(body), split, n_steps))
        per_step_parts = []
        for fn, lo, hi in segments:
            xs_seg = jax.tree_util.tree_map(lambda x: x[lo:hi], xs_all)
            if hi - lo == 1:
                # unroll single-step segments: a length-1 lax.scan
                # lowers to a while loop whose backward body forces a
                # fresh copy of every captured weight (measured: 8 x
                # 360 MB spectral-filter copies on the flagship), which
                # is pure HBM waste for the common 1-step pretraining
                x0 = jax.tree_util.tree_map(lambda x: x[0], xs_seg)
                carry, y = fn(carry, x0)
                ps = y[None]
            else:
                carry, ps = jax.lax.scan(fn, carry, xs_seg)
            per_step_parts.append(ps)
        (_, _, _, total) = carry
        per_step = (
            jnp.concatenate(per_step_parts)
            if len(per_step_parts) > 1
            else per_step_parts[0]
        )
        if cfg.optimize_last_step_only:
            total = per_step[-1]
        pinit = cfg.parameter_init
        if pinit.alpha != 0.0 or pinit.beta != 0.0:
            total = total + pinit.regularizer_loss(
                params, self._get_base_params()
            )
        metrics = {"loss": total}
        for i in range(n_steps):
            metrics[f"loss_step_{i}"] = per_step[i]
        return total, metrics

    @property
    def samples_varied_lengths(self) -> bool:
        return not self.train_config.n_forward_steps_schedule.is_constant

    def build_train_step(self, donate: bool = True):
        """Returns jitted fn(params, opt_state, batch, rng) ->
        (new_params, new_opt_state, metrics).
        """

        def train_step(params, opt_state, batch, rng, n_steps=None,
                       labels=None, corrector_disabled=False,
                       data_mask=None):
            (loss, metrics), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(params, batch, rng, n_steps, labels,
              False, corrector_disabled, data_mask)
            updates, new_opt_state = self.optimization.tx.update(
                grads, opt_state, params
            )
            import optax

            new_params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_params, new_opt_state, metrics

        # n_steps and corrector_disabled are static: one cached
        # executable per distinct (length, disabled) pair — at most one
        # extra compile when the disabled-epochs threshold crosses
        return jax.jit(
            train_step,
            donate_argnums=(0, 1) if donate else (),
            static_argnums=(4, 6),
        )

    def build_valid_step(self):
        def valid_step(params, batch, rng, n_steps=None, labels=None,
                       data_mask=None):
            _, metrics = self.loss_fn(
                params, batch, rng, n_steps, labels, deterministic=True,
                data_mask=data_mask,
            )
            return metrics

        return jax.jit(valid_step, static_argnums=(3,))

    # ----- convenience (stateful driver API) -----

    def init(self, rng: jax.Array):
        params = self.stepper.init_params(rng)
        pinit = self.train_config.parameter_init
        params, self._base_params = pinit.apply_weights(params)
        if pinit.weights_path is not None:
            # carry the base checkpoint's training-job provenance
            # (reference: single_module.py:859 _append_training_history_from)
            from ace_tpu.stepper.checkpoint import load_msgpack

            state = load_msgpack(pinit.weights_path)["stepper"]
            if "training_history" in state:
                import json

                from ace_tpu.core.training_history import TrainingHistory

                self.stepper.training_history.extend(
                    TrainingHistory.from_state(
                        json.loads(state["training_history"])
                    )
                )
        opt_state = self.optimization.init(params)
        if self.ema is not None:
            self.ema.init(params)
        return params, opt_state

    @property
    def effective_loss_scaling(self) -> TensorDict:
        """Final per-variable loss scaling: loss-normalizer stds divided by
        variable weights (reference: single_module.py effective_loss_scaling).
        """
        weights = self.train_config.loss.weights
        normalizer = self.step_loss.loss.normalizer
        return {
            k: normalizer.stds[k] / weights.get(k, 1.0)
            for k in self.stepper.step.output_names
        }
