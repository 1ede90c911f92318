"""Training orchestration: epoch loop, validation, EMA, checkpoint zoo,
resume (reference: fme/core/generics/trainer.py:219 Trainer,
fme/ace/train/train_config.py:328 TrainConfig).

The per-batch work is one jitted XLA program (see TrainStepper); this
module is the host-side driver: data iteration, EMA tracking, metric
logging, atomic checkpointing and preemption-safe resume.
"""

import dataclasses
import logging
import os
from typing import Any

import jax
import numpy as np

from ace_tpu.aggregator.inference import InferenceAggregatorConfig
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
from ace_tpu.core.timing import GlobalTimer
from ace_tpu.core.typing_ import Slice
from ace_tpu.core.wandb import DiskMetricLogger, WandB
from ace_tpu.data.inference import InferenceDataLoaderConfig
from ace_tpu.data.loading import DataLoaderConfig, GriddedData
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.parallel import distributed as dist
from ace_tpu.parallel.mesh import MeshConfig
from ace_tpu.stepper.checkpoint import (
    load_train_checkpoint,
    save_train_checkpoint,
)
from ace_tpu.stepper.parameter_init import CopyWeightsConfig
from ace_tpu.train.lr_tuning import LRTuningConfig, run_lr_tuning_trial
from ace_tpu.stepper.stepper import CheckpointStepperConfig, StepperConfig
from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper


@dataclasses.dataclass
class InlineInferenceConfig:
    """Inline autoregressive inference run each epoch for checkpoint
    selection (reference: fme/ace/train/train_config.py inline inference +
    trainer.py:842 inference_one_epoch; selects best_inference_ckpt).
    """

    loader: InferenceDataLoaderConfig
    n_forward_steps: int = 2
    forward_steps_in_memory: int = 2
    epochs: Slice = dataclasses.field(default_factory=Slice)
    # multiple named entries combine their errors by weight for the
    # best-inference checkpoint (reference: train_config.py:133-137)
    name: str | None = None
    weight: float = 1.0
    # aggregator options for the inline run (reference:
    # train_config.py InlineInferenceConfig.aggregator — e.g.
    # monthly_reference_data, log_step_means)
    aggregator: InferenceAggregatorConfig = dataclasses.field(
        default_factory=InferenceAggregatorConfig
    )


@dataclasses.dataclass
class LoggingConfig:
    """(reference: fme/core/logging_utils.py:31)."""

    log_to_screen: bool = True
    log_to_file: bool = True
    log_to_wandb: bool = False
    project: str = "ace_tpu"
    entity: str | None = None
    # log param/grad histograms every N batches; None disables (the
    # reference's wandb.watch(modules), fme/core/wandb.py:171)
    watch_log_freq: int | None = None

    def configure(self, experiment_dir: str, resumable: bool = True):
        handlers: list[logging.Handler] = []
        if self.log_to_screen:
            handlers.append(logging.StreamHandler())
        if self.log_to_file and dist.is_root():
            os.makedirs(experiment_dir, exist_ok=True)
            handlers.append(
                logging.FileHandler(os.path.join(experiment_dir, "out.log"))
            )
        logging.basicConfig(
            # root process logs INFO; others WARNING only (reference:
            # fme/core/logging_utils.py root-rank logging)
            level=logging.INFO if dist.is_root() else logging.WARNING,
            format="%(asctime)s %(levelname)s %(message)s",
            handlers=handlers,
            force=True,
        )
        wandb = WandB.get_instance()
        wandb.configure(self.log_to_wandb and dist.is_root())
        if wandb.enabled:
            # resumable: a preempted-and-restarted job in the same
            # experiment dir continues the SAME wandb run (run id is
            # persisted in <experiment_dir>/wandb_run_id; reference:
            # fme/core/wandb.py:237)
            wandb.init(
                resumable=resumable,
                experiment_dir=experiment_dir,
                project=self.project,
                entity=self.entity,
                dir=experiment_dir,
            )
            if self.watch_log_freq is not None:
                wandb.watch(log_freq=self.watch_log_freq)


class CheckpointPaths:
    """(reference: fme/core/generics/trainer.py:193)."""

    def __init__(self, experiment_dir: str):
        self.checkpoint_dir = os.path.join(experiment_dir, "training_checkpoints")

    @property
    def latest_checkpoint_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "ckpt.msgpack")

    @property
    def best_checkpoint_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "best_ckpt.msgpack")

    @property
    def ema_checkpoint_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "ema_ckpt.msgpack")

    @property
    def best_inference_checkpoint_path(self) -> str:
        return os.path.join(
            self.checkpoint_dir, "best_inference_ckpt.msgpack"
        )

    def epoch_checkpoint_path(self, epoch: int) -> str:
        return os.path.join(self.checkpoint_dir, f"ckpt_{epoch:04d}.msgpack")


@dataclasses.dataclass
class TrainConfig:
    """Top-level training config (reference:
    fme/ace/train/train_config.py:328; subset of fields this round).
    """

    train_loader: DataLoaderConfig
    validation_loader: DataLoaderConfig
    stepper: StepperConfig | CheckpointStepperConfig
    optimization: OptimizationConfig
    max_epochs: int
    experiment_dir: str
    stepper_training: StepperTrainConfig = dataclasses.field(
        default_factory=StepperTrainConfig
    )
    ema: EMAConfig = dataclasses.field(default_factory=EMAConfig)
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    save_checkpoint: bool = True
    # write per-epoch validation / inline-inference diagnostics netCDFs
    # under output/{val,inference}/epoch_NNNN (reference:
    # train_config.py save_per_epoch_diagnostics)
    save_per_epoch_diagnostics: bool = False
    validate_using_ema: bool = True
    log_train_every_n_batches: int = 10
    checkpoint_save_epochs: Slice | None = None
    inference: list[InlineInferenceConfig] | InlineInferenceConfig | None = None

    @property
    def inference_entries(self) -> list[InlineInferenceConfig]:
        if self.inference is None:
            return []
        if isinstance(self.inference, InlineInferenceConfig):
            return [self.inference]
        return list(self.inference)
    # save a restart checkpoint every N batches within an epoch (0 = off)
    # (reference: trainer.py mid-epoch restart checkpoints :544-556)
    checkpoint_every_n_batches: int = 0
    # exit after at most this many epochs in this invocation; re-running
    # resumes the next segment (reference: core/generics/trainer.py:151
    # segment_epochs) — for preemptible/time-limited schedulers
    segment_epochs: int | None = None
    # run validation (and inline inference) once before any training
    # (reference: generics/trainer.py:156 evaluate_before_training)
    evaluate_before_training: bool = False
    # after each epoch, evaluate the training loss (no updates, EMA
    # params) on this many batches of an independent shuffle
    # (reference: generics/trainer.py:597 train_evaluation_batches)
    train_evaluation_batches: int = 0
    # overwrite a wildcard-selected subset of weights from their initial
    # values after each batch — frozen-parameter training on a weight
    # subset (reference: train_config.py copy_weights_after_batch,
    # core/weight_ops.py CopyWeightsConfig)
    copy_weights_after_batch: "CopyWeightsConfig | None" = None
    # per-epoch LR trial: short-train at current vs reduced LR, adopt the
    # reduced LR if it validates better (reference:
    # core/generics/lr_tuning.py, hooked at generics/trainer.py:376-400)
    lr_tuning: "LRTuningConfig" = dataclasses.field(
        default_factory=lambda: LRTuningConfig()
    )
    # (data, h, w) device mesh for data-parallel + spatial decomposition
    # (reference: FME_DISTRIBUTED_BACKEND/H/W env config,
    # fme/core/distributed/model_torch_distributed.py:112). None keeps
    # the single-device placement; required for multi-process runs.
    mesh: MeshConfig | None = None
    seed: int = 0

    def __post_init__(self):
        if self.lr_tuning.enabled and self.optimization.has_lr_schedule:
            raise ValueError(
                "lr_tuning and optimization.scheduler cannot both be "
                "specified; lr_tuning is an alternative form of learning "
                "rate scheduling"
            )  # reference: train_config.py:468

    @property
    def n_forward_steps(self) -> int:
        # data windows must cover the longest schedulable rollout
        return self.stepper_training.max_n_forward_steps

    def build_trainer(self) -> "Trainer":
        if isinstance(self.stepper, CheckpointStepperConfig):
            # resolve once so data requirements and checkpoints see the
            # full config
            self.stepper = self.stepper.to_stepper_config()
        requirements = DataRequirements(
            names=sorted(
                set(self.stepper.step.input_names)
                | set(self.stepper.step.output_names)
            ),
            n_timesteps=self.n_forward_steps + 1,
            allow_missing_variables=self.stepper.step.allow_missing_variables,
        )
        if self.mesh is not None:
            mesh = self.mesh.build()
            placement = dist.BatchPlacement(mesh)
        elif dist.process_count() > 1:
            raise ValueError(
                "multi-process training requires an explicit `mesh` "
                "config (data_parallel/h/w)"
            )
        else:
            mesh = None
            placement = None
        train_data = self.train_loader.build(
            requirements, train=True, seed=self.seed, sharding=placement
        )
        valid_data = self.validation_loader.build(
            requirements, train=False, seed=self.seed, sharding=placement
        )
        dataset_info = train_data.dataset_info
        stepper = self.stepper.get_stepper(dataset_info)
        train_stepper = TrainStepper(
            stepper,
            self.stepper_training,
            self.optimization,
            self.ema,
            max_epochs=self.max_epochs,
            steps_per_epoch=max(1, train_data.n_batches),
        )
        return Trainer(
            self, train_stepper, train_data, valid_data,
            mesh=mesh, placement=placement,
        )


class Trainer:
    def __init__(
        self,
        config: TrainConfig,
        train_stepper: TrainStepper,
        train_data: GriddedData,
        valid_data: GriddedData,
        mesh=None,
        placement=None,
    ):
        self.config = config
        self.train_stepper = train_stepper
        self.train_data = train_data
        self.valid_data = valid_data
        self.mesh = mesh
        self.placement = placement
        self.paths = CheckpointPaths(config.experiment_dir)
        self.num_batches_seen = 0
        self._epoch_batches_seen = 0
        self._resume_skip_batches = 0
        self.start_epoch = 0
        self.best_validation_loss = float("inf")
        self.best_inference_error = float("inf")
        self._disk_logger = (
            DiskMetricLogger(
                os.path.join(config.experiment_dir, "metrics.jsonl")
            )
            if dist.is_root() else None
        )
        self.params = None
        self.opt_state = None
        self._train_step = train_stepper.build_train_step(donate=False)
        self._valid_step = train_stepper.build_valid_step()
        self._rng = jax.random.PRNGKey(config.seed)
        self._old_handlers: dict = {}
        self._current_epoch = 0

    @property
    def stepper(self):
        return self.train_stepper.stepper

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT -> save a restart checkpoint then re-raise
        (reference: fme/core/distributed/shutdown.py preemption handling +
        post-shutdown restart save, generics/trainer.py:322-345).
        """
        import signal

        def handler(signum, frame):
            logging.warning(
                f"received signal {signum}; saving restart checkpoint"
            )
            self._save_latest()
            # exit cleanly with the conventional 128+signum code; the saved
            # checkpoint makes the next launch resume mid-run
            raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            self._old_handlers[sig] = signal.signal(sig, handler)

    def _restore_signal_handlers(self):
        import signal

        for sig, old in self._old_handlers.items():
            signal.signal(sig, old)
        self._old_handlers = {}

    def _checkpoint_extra(self, epoch: int) -> dict:
        return {
            "epoch": epoch,
            "num_batches_seen": self.num_batches_seen,
            "epoch_batches_seen": self._epoch_batches_seen,
            "best_validation_loss": self.best_validation_loss,
            "best_inference_error": self.best_inference_error,
            "ema": self.train_stepper.ema.get_state()
            if self.train_stepper.ema
            else None,
            "optimization": self.train_stepper.optimization.get_state(),
        }

    def _save_latest(self):
        if self.params is None or not dist.is_root():
            return
        stepper = self.stepper
        stepper.params = self.params
        save_train_checkpoint(
            self.paths.latest_checkpoint_path, stepper, self.config.stepper,
            opt_state=self.opt_state,
            ema_params=self.train_stepper.ema.ema_params
            if self.train_stepper.ema
            else None,
            extra=self._checkpoint_extra(self._current_epoch),
        )

    def train(self):
        import contextlib

        from ace_tpu.parallel.mesh import spatial_parallel

        with contextlib.ExitStack() as stack:
            if self.mesh is not None:
                stack.enter_context(jax.set_mesh(self.mesh))
                # h*w > 1 switches SFNO to the all-to-all distributed
                # SHT (ops/distributed_sht.py); spatial_parallel is a
                # no-op for purely data-parallel meshes
                stack.enter_context(spatial_parallel(self.mesh))
            return self._train_impl()

    def _train_impl(self):
        if self.params is None:
            if os.path.exists(self.paths.latest_checkpoint_path):
                self.restore(self.paths.latest_checkpoint_path)
            else:
                self.params, self.opt_state = self.train_stepper.init(
                    self._next_rng()
                )
                resume_path = self.config.optimization.resume_optimizer_ckpt_path
                if resume_path is not None:
                    self._load_optimizer_running_state(resume_path)
        if self.placement is not None:
            # replicate params + optimizer state over the mesh (every
            # process holds identical values from the shared seed or the
            # shared checkpoint, so assembling global replicated arrays
            # is exact; gradients then psum over "data" via SPMD)
            self.params = jax.tree.map(
                self.placement.put_replicated, self.params
            )
            self.opt_state = jax.tree.map(
                self.placement.put_replicated, self.opt_state
            )
            self.train_stepper.optimization.state = self.opt_state
            if (
                self.train_stepper.ema is not None
                and self.train_stepper.ema.ema_params is not None
            ):
                self.train_stepper.ema.ema_params = jax.tree.map(
                    self.placement.put_replicated,
                    self.train_stepper.ema.ema_params,
                )
        # record this job in the stepper's provenance chain (reference:
        # generics/trainer.py:293 update_training_history)
        from ace_tpu.core.training_history import TrainingJob

        self.stepper.training_history.append(TrainingJob.from_env())
        self._copy_weights = (
            self.config.copy_weights_after_batch.build(self.params)
            if self.config.copy_weights_after_batch is not None
            else None
        )
        timer = GlobalTimer.get_instance()
        self._install_signal_handlers()
        if self.config.segment_epochs is None:
            end_epoch = self.config.max_epochs
        else:
            end_epoch = min(
                self.start_epoch + self.config.segment_epochs,
                self.config.max_epochs,
            )
        if self.config.evaluate_before_training and self.start_epoch == 0:
            valid_logs = self.validate()
            pre_logs = {f"valid_pre/{k}": v for k, v in valid_logs.items()}
            # pre-training inference baseline (reference
            # generics/trainer.py runs the inference callback before
            # training as well)
            pre_entries = [
                (i, e) for i, e in
                enumerate(self.config.inference_entries)
                if e.epochs.contains(0)
            ]
            multiple = len(self.config.inference_entries) > 1
            for i, entry in pre_entries:
                prefix = entry.name or (
                    f"inference_{i}" if multiple else "inference"
                )
                logs = self.inference_one_epoch(entry)
                logs.pop("inference_error", None)
                for k, v in logs.items():
                    pre_logs[f"valid_pre/{prefix}/{k}"] = v
            WandB.get_instance().log(
                pre_logs, step=self.num_batches_seen
            )
        for epoch in range(self.start_epoch, end_epoch):
            self._current_epoch = epoch
            if self._resume_skip_batches == 0:
                self._epoch_batches_seen = 0
            logging.info(f"Epoch {epoch} starting")
            if self.config.lr_tuning.enabled:
                self._maybe_tune_lr(epoch)
            with timer.context("train_one_epoch"):
                train_metrics = self.train_one_epoch(epoch)
            diag_root = (
                os.path.join(self.config.experiment_dir, "output")
                if self.config.save_per_epoch_diagnostics and
                dist.is_root() else None
            )
            with timer.context("validation"):
                valid_metrics = self.validate(
                    diagnostics_dir=os.path.join(
                        diag_root, "val", f"epoch_{epoch + 1:04d}"
                    ) if diag_root else None
                )
            inference_metrics: dict[str, float] = {}
            entries = [
                (i, e) for i, e in
                enumerate(self.config.inference_entries)
                if e.epochs.contains(epoch)
            ]
            if entries:
                with timer.context("inline_inference"):
                    weighted_error = 0.0
                    have_error = False
                    multiple = len(self.config.inference_entries) > 1
                    for i, entry in entries:
                        prefix = entry.name or (
                            f"inference_{i}" if multiple else ""
                        )
                        logs = self.inference_one_epoch(
                            entry,
                            diagnostics_dir=os.path.join(
                                diag_root, prefix or "inference",
                                f"epoch_{epoch + 1:04d}",
                            ) if diag_root else None,
                        )
                        err = logs.pop("inference_error", None)
                        if err is not None:
                            weighted_error += entry.weight * err
                            have_error = True
                        for k, v in logs.items():
                            key = f"{prefix}/{k}" if prefix else k
                            inference_metrics[key] = v
                    if have_error:
                        inference_metrics["inference_error"] = (
                            weighted_error
                        )
            all_metrics = {
                **{f"train/{k}": v for k, v in train_metrics.items()},
                **{f"val/{k}": v for k, v in valid_metrics.items()},
                **{f"inference/{k}": v for k, v in inference_metrics.items()},
                "epoch": epoch,
                "lr": self.train_stepper.optimization.learning_rate,
            }
            if self._disk_logger is not None:
                self._disk_logger.log(
                    all_metrics, step=self.num_batches_seen
                )
            WandB.get_instance().log(all_metrics, step=self.num_batches_seen)
            logging.info(
                f"Epoch {epoch}: train loss {train_metrics['loss']:.5f}, "
                f"valid loss {valid_metrics['loss']:.5f}"
            )
            if self.config.save_checkpoint:
                self.save_all_checkpoints(
                    epoch, float(valid_metrics["loss"])
                )
                err = inference_metrics.get("inference_error")
                if err is not None and err < self.best_inference_error:
                    self.best_inference_error = err
                    if dist.is_root():
                        stepper = self.stepper
                        stepper.params = self._validation_params()
                        save_train_checkpoint(
                            self.paths.best_inference_checkpoint_path,
                            stepper, self.config.stepper,
                        )
                        stepper.params = self.params
        self._restore_signal_handlers()
        return self.params

    def _maybe_tune_lr(self, epoch: int):
        """Run the per-epoch LR trial and adopt a winning reduced LR
        (reference: generics/trainer.py:376-400 + lr_tuning.py)."""
        cfg = self.config.lr_tuning
        n = cfg.num_batches
        self.train_data.set_epoch(epoch)
        train_batches = []
        for batch in self.train_data:
            train_batches.append(batch.data)
            if len(train_batches) >= n:
                break
        valid_batches = []
        for batch in self.valid_data:
            valid_batches.append(batch.data)
            if len(valid_batches) >= n:
                break
        optimization = self.train_stepper.optimization
        current_lr = optimization.learning_rate
        if current_lr <= 0.0 or not train_batches or not valid_batches:
            return
        new_lr = run_lr_tuning_trial(
            cfg,
            self.params,
            current_lr,
            lambda p, b, k: self.train_stepper.loss_fn(p, b, k),
            train_batches,
            valid_batches,
            self._next_rng(),
        )
        if new_lr is not None:
            logging.info(f"LR tuning adopted lr={new_lr:.3e}")
            optimization.scale_lr(new_lr / current_lr)
            # jit baked the old scale in; rebuild the step functions
            self._train_step = self.train_stepper.build_train_step(
                donate=False
            )
            WandB.get_instance().log(
                {"lr_tuning/adopted_lr": new_lr}, step=self.num_batches_seen
            )

    def train_one_epoch(self, epoch: int) -> dict[str, float]:
        self.train_data.set_epoch(epoch)
        totals: dict[str, float] = {}
        pending_metrics: list = []
        count = 0
        skip = self._resume_skip_batches
        self._resume_skip_batches = 0
        if skip:
            logging.info(
                f"mid-epoch resume: skipping {skip} already-trained batches"
            )
        wandb = WandB.get_instance()
        for batch in self.train_data:
            # per-batch rollout length (constant unless a stochastic or
            # epoch-milestone schedule is configured); sampled before the
            # skip so resumed runs draw the same length sequence
            n_steps = self.train_stepper.sample_n_forward_steps(epoch)
            if skip > 0:
                skip -= 1
                self._epoch_batches_seen += 1
                continue
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, batch.data, self._next_rng(),
                n_steps, batch.labels,
                epoch < self.train_stepper.corrector_disabled_epochs,
                batch.data_mask,
            )
            self.train_stepper.optimization._count += 1
            if self._copy_weights is not None:
                # re-pin the wildcard-selected subset to its stored values
                # (reference: core/weight_ops.py CopyWeightsConfig, applied
                # after each batch)
                self.params = self._copy_weights.apply(self.params)
            if self.train_stepper.ema is not None:
                if self.train_stepper.ema.ema_params is None:
                    self.train_stepper.ema.init(self.params)
                self.train_stepper.ema(self.params)
            self.num_batches_seen += 1
            self._epoch_batches_seen += 1
            count += 1
            # metrics stay device-resident: a float() here would block
            # the host on every step, serializing dispatch against the
            # device (one parallel transfer drains them at epoch end)
            pending_metrics.append(metrics)
            if count % self.config.log_train_every_n_batches == 0:
                wandb.log(
                    {"train_batch/loss": float(metrics["loss"])},
                    step=self.num_batches_seen,
                )
            # no-op unless LoggingConfig.watch_log_freq activated a watch
            wandb.log_watched(self.num_batches_seen, self.params)
            if (
                self.config.checkpoint_every_n_batches > 0
                and count % self.config.checkpoint_every_n_batches == 0
            ):
                self._save_latest()
        import jax as _jax

        for m in _jax.device_get(pending_metrics):
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        metrics_out = {k: v / max(count, 1) for k, v in totals.items()}
        if self.config.train_evaluation_batches > 0:
            # independent shuffle: offset the epoch seed so batches are
            # uncorrelated with the just-trained pass
            self.train_data.set_epoch(epoch + 104729)
            params = self._validation_params()
            losses = []
            for i, batch in enumerate(self.train_data):
                if i >= self.config.train_evaluation_batches:
                    break
                m = self._valid_step(
                    params, batch.data, self._next_rng(), None,
                    batch.labels, batch.data_mask,
                )
                losses.append(m["loss"])
            if losses:
                metrics_out["loss_independent_shuffle"] = float(
                    np.mean(_jax.device_get(losses))
                )
            self.train_data.set_epoch(epoch)
        return metrics_out

    def _validation_params(self):
        if (
            self.config.validate_using_ema
            and self.train_stepper.ema is not None
            and self.train_stepper.ema.ema_params is not None
        ):
            return self.train_stepper.ema.ema_params
        return self.params

    def validate(self, diagnostics_dir: str | None = None) -> dict[str, float]:
        from ace_tpu.aggregator.one_step import OneStepAggregator

        params = self._validation_params()
        totals: dict[str, float] = {}
        count = 0
        stepper = self.stepper
        one_step = OneStepAggregator(
            self.valid_data.dataset_info.gridded_operations,
            record_snapshots=diagnostics_dir is not None,
            record_mean_maps=diagnostics_dir is not None,
        )
        prognostic = stepper.prognostic_names
        forcing_names = stepper.forcing_window_names
        pending_metrics: list = []
        for batch in self.valid_data:
            metrics = self._valid_step(
                params, batch.data, self._next_rng(), None, batch.labels,
                batch.data_mask,
            )
            count += 1
            # device-resident until the loop ends (see train_one_epoch)
            pending_metrics.append(metrics)
            # one-step maps/metrics (reference: OneStepAggregator during
            # validation, fme/ace/aggregator/one_step/main.py:47)
            ic = {k: batch.data[k][:, :1] for k in prognostic}
            forcing = {
                k: batch.data[k][:, :2] for k in forcing_names
                if k in batch.data
            }
            outputs, _, _ = stepper.predict_fn(
                params, ic, forcing,
                stepper.step.init_stepper_state(
                    {k: v[:, 0] for k, v in ic.items()}
                ),
                self._next_rng(),
                n_forward=1,
            )
            target = {
                k: batch.data[k][:, 1:2] for k in stepper.out_names
                if k in batch.data
            }
            one_step.record_batch(outputs, target)
        import jax as _jax

        for m in _jax.device_get(pending_metrics):
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        result = {k: v / max(count, 1) for k, v in totals.items()}
        result.update(one_step.get_logs())
        if diagnostics_dir is not None:
            one_step.flush_diagnostics(diagnostics_dir)
        return result

    def inference_one_epoch(self, cfg: InlineInferenceConfig,
                            diagnostics_dir: str | None = None) -> dict[str, float]:
        """Run inline autoregressive inference with the validation params
        (reference: trainer.py:842); tracks best_inference_error for the
        best-inference checkpoint.
        """
        import jax as _jax

        from ace_tpu.aggregator.inference import InferenceEvaluatorAggregator
        from ace_tpu.inference.loop import run_inference
        from ace_tpu.stepper.stepper import PrognosticState

        stepper = self.stepper
        data = cfg.loader.build(
            forcing_names=stepper.forcing_window_names,
            prognostic_names=stepper.prognostic_names,
            n_forward_steps=cfg.n_forward_steps,
            forward_steps_in_memory=cfg.forward_steps_in_memory,
        )
        ic_batch = data.initial_condition(stepper.prognostic_names)
        ic = PrognosticState(
            data={k: _jax.device_put(v) for k, v in ic_batch.data.items()}
        )
        aggregator = cfg.aggregator.build(
            data.dataset_info, n_timesteps=cfg.n_forward_steps,
            normalizer=getattr(stepper.step, "normalizer", None),
        )
        old_params = stepper.params
        stepper.params = self._validation_params()
        try:
            target_names = [
                n for n in stepper.out_names if n in data.dataset.names
            ]
            run_inference(
                stepper, ic, data, aggregator=aggregator,
                target_names=target_names,
            )
        finally:
            stepper.params = old_params
        if diagnostics_dir is not None:
            aggregator.flush_diagnostics(diagnostics_dir)
        logs = aggregator.get_logs()
        rmses = [v for k, v in logs.items()
                 if k.startswith("time_mean/rmse/")]
        if rmses:
            logs["inference_error"] = float(np.mean(rmses))
        return {k: float(v) for k, v in logs.items()}

    def save_all_checkpoints(self, epoch: int, valid_loss: float):
        self._epoch_batches_seen = 0  # the epoch is complete
        if not dist.is_root():
            # non-root processes still track best-so-far for consistency
            self.best_validation_loss = min(
                self.best_validation_loss, valid_loss
            )
            return
        extra = self._checkpoint_extra(epoch + 1)
        extra["best_validation_loss"] = min(
            self.best_validation_loss, valid_loss
        )
        stepper = self.stepper
        stepper.params = self.params
        save_train_checkpoint(
            self.paths.latest_checkpoint_path, stepper, self.config.stepper,
            opt_state=self.opt_state,
            ema_params=self.train_stepper.ema.ema_params
            if self.train_stepper.ema
            else None,
            extra=extra,
        )
        if valid_loss < self.best_validation_loss:
            self.best_validation_loss = valid_loss
            save_train_checkpoint(
                self.paths.best_checkpoint_path, stepper,
                self.config.stepper, extra=extra,
            )
        if self.train_stepper.ema is not None:
            ema_stepper_params = self.params
            stepper.params = self.train_stepper.ema.ema_params
            save_train_checkpoint(
                self.paths.ema_checkpoint_path, stepper,
                self.config.stepper, extra=extra,
            )
            stepper.params = ema_stepper_params
        if self.config.checkpoint_save_epochs is not None and (
            self.config.checkpoint_save_epochs.contains(epoch)
        ):
            save_train_checkpoint(
                self.paths.epoch_checkpoint_path(epoch), stepper,
                self.config.stepper, extra=extra,
            )

    def _load_optimizer_running_state(self, path: str):
        """Fine-tuning: transfer Adam moment estimates (mu/nu/count) from
        another run's checkpoint into the freshly built optimizer state,
        keeping this config's hyperparameters and a fresh LR-schedule
        clock (reference: fme/core/optimization.py:314
        resume_optimizer_ckpt_path).
        """
        import optax
        from flax import serialization

        from ace_tpu.stepper.checkpoint import load_train_checkpoint

        logging.info(f"Loading optimizer running state from {path}")
        out = load_train_checkpoint(path)
        if "optimizer_state_dict" not in out:
            raise ValueError(
                f"checkpoint {path} has no optimizer state to resume from"
            )

        # locate the Adam moment subtree in the serialized state dict —
        # structure-independent of the two runs' clipping/accumulation
        # wrappers, matching the reference's transfer of only
        # optimizer.state (the per-parameter moments)
        def find_adam_dict(node):
            if isinstance(node, dict):
                if {"mu", "nu", "count"} <= set(node):
                    return node
                for v in node.values():
                    found = find_adam_dict(v)
                    if found is not None:
                        return found
            return None

        adam_dict = find_adam_dict(out["optimizer_state_dict"])
        if adam_dict is None:
            raise ValueError(
                "no Adam moment state found in resume_optimizer_ckpt_path "
                f"checkpoint {path}"
            )

        def graft(fresh):
            if isinstance(fresh, optax.ScaleByAdamState):
                try:
                    return serialization.from_state_dict(fresh, adam_dict)
                except (ValueError, KeyError) as e:
                    raise ValueError(
                        "optimizer state in resume_optimizer_ckpt_path "
                        "does not match this run's parameter structure: "
                        f"{e}"
                    ) from e
            if hasattr(fresh, "_fields"):  # other namedtuple states
                return type(fresh)(*(
                    graft(getattr(fresh, f)) for f in fresh._fields
                ))
            if isinstance(fresh, tuple):
                return tuple(graft(f) for f in fresh)
            return fresh

        self.opt_state = graft(self.opt_state)
        self.train_stepper.optimization.state = self.opt_state

    def restore(self, path: str):
        """Resume from a training checkpoint
        (reference: trainer.py:935 restore).
        """
        logging.info(f"Restoring from {path}")
        out = load_train_checkpoint(path)
        self.params = out["stepper"].params
        self.opt_state = self.train_stepper.optimization.init(self.params)
        if "optimizer_state_dict" in out:
            from flax import serialization

            self.opt_state = serialization.from_state_dict(
                self.opt_state, out["optimizer_state_dict"]
            )
            self.train_stepper.optimization.state = self.opt_state
        if "ema_params" in out and self.train_stepper.ema is not None:
            self.train_stepper.ema.ema_params = out["ema_params"]
        extra = out.get("extra", {})
        self.start_epoch = extra.get("epoch", 0)
        self.num_batches_seen = extra.get("num_batches_seen", 0)
        # mid-epoch restart: skip the batches this epoch already trained
        # (reference trainer.py persists current_epoch_num_batches_seen
        # and resumes with subset_loader)
        self._resume_skip_batches = extra.get("epoch_batches_seen", 0)
        self.best_validation_loss = extra.get(
            "best_validation_loss", float("inf")
        )
        self.best_inference_error = extra.get(
            "best_inference_error", float("inf")
        )
        if extra.get("ema") and self.train_stepper.ema is not None:
            self.train_stepper.ema.load_state(extra["ema"])
        if extra.get("optimization"):
            self.train_stepper.optimization.load_state(extra["optimization"])
