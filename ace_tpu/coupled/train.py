"""Coupled training: joint atmosphere+ocean loss over coupled rollouts
(reference: fme/coupled/stepper.py:1965 CoupledTrainStepper,
fme/coupled/train/train.py:15 entry).

Entry point: ``python -m ace_tpu.coupled.train <config.yaml>``.
"""

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.loss import StepLossConfig
from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
from ace_tpu.core.wandb import DiskMetricLogger
from ace_tpu.coupled.stepper import (
    CoupledPrognosticState,
    CoupledStepper,
    CoupledStepperConfig,
)
from ace_tpu.data.dataset import (
    ConcatDatasetConfig,
    MergeDatasetConfig,
    XarrayDataConfig,
)
from ace_tpu.stepper.parameter_init import ParameterInitializationConfig
from ace_tpu.data.loading import DataLoader, WindowDataset
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.stepper.stepper import PrognosticState
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class CoupledDatasetsConfig:
    """Per-component dataset configs, each a plain / merged / concatenated
    source (reference: fme/coupled/data_loading CoupledDataLoaderConfig's
    nested dataset block, as in
    configs/baselines/cm4-piControl/train-config.yaml)."""

    atmosphere: (
        XarrayDataConfig | MergeDatasetConfig | ConcatDatasetConfig
    )
    ocean: XarrayDataConfig | MergeDatasetConfig | ConcatDatasetConfig


@dataclasses.dataclass
class CoupledDataConfig:
    """Two time-aligned datasets (reference: fme/coupled/data_loading/).

    Either the flat ``atmosphere``/``ocean`` fields or a nested
    ``dataset: {atmosphere, ocean}`` block (the reference's spelling)."""

    atmosphere: XarrayDataConfig | None = None
    ocean: XarrayDataConfig | None = None
    dataset: CoupledDatasetsConfig | None = None
    batch_size: int = 1
    num_data_workers: int = 2
    prefetch_factor: int = 2

    def __post_init__(self):
        flat = self.atmosphere is not None and self.ocean is not None
        if flat == (self.dataset is not None):
            raise ValueError(
                "set either dataset: {atmosphere, ocean} or the flat "
                "atmosphere/ocean fields"
            )

    def build_atmosphere(self):
        cfg = (
            self.dataset.atmosphere if self.dataset is not None
            else self.atmosphere
        )
        return cfg.build()

    def build_ocean(self):
        cfg = (
            self.dataset.ocean if self.dataset is not None
            else self.ocean
        )
        return cfg.build()


@dataclasses.dataclass
class ComponentTrainingConfig:
    """One component's training behavior (reference:
    fme/coupled/stepper.py:1717 ComponentTrainingConfig)."""

    loss: StepLossConfig = dataclasses.field(
        default_factory=StepLossConfig
    )
    # consecutive component steps included in the loss, from the first
    # step after the IC; None = all available
    n_steps: int | None = None
    optimize_last_step_only: bool = False
    loss_weight: float = 1.0
    parameter_init: ParameterInitializationConfig | None = None


@dataclasses.dataclass
class CoupledParameterInitConfig:
    """Fine-tune from a previously-trained COUPLED stepper: a
    coupled-trainer output directory holding
    atmosphere_ckpt.msgpack/ocean_ckpt.msgpack (reference:
    fme/coupled/stepper.py CoupledParameterInitConfig.checkpoint_path).
    """

    checkpoint_path: str | None = None


@dataclasses.dataclass
class CoupledTrainStepperConfig:
    """(reference: fme/coupled/stepper.py:1768
    CoupledTrainStepperConfig)."""

    n_coupled_steps: int
    ocean: ComponentTrainingConfig = dataclasses.field(
        default_factory=ComponentTrainingConfig
    )
    atmosphere: ComponentTrainingConfig = dataclasses.field(
        default_factory=ComponentTrainingConfig
    )
    parameter_init: CoupledParameterInitConfig = dataclasses.field(
        default_factory=CoupledParameterInitConfig
    )

    def __post_init__(self):
        if self.parameter_init.checkpoint_path is not None:
            for comp in (self.atmosphere, self.ocean):
                if (
                    comp.parameter_init is not None
                    and comp.parameter_init.weights_path is not None
                ):
                    raise ValueError(
                        "specify parameter_init.checkpoint_path or "
                        "component weights_path, not both (reference: "
                        "coupled/stepper.py:1800-1813)"
                    )


@dataclasses.dataclass
class CoupledTrainConfig:
    """(reference: fme/coupled/train/train.py TrainConfig surface, subset)."""

    experiment_dir: str
    max_epochs: int
    stepper: CoupledStepperConfig
    train_loader: CoupledDataConfig
    optimization: OptimizationConfig = dataclasses.field(
        default_factory=OptimizationConfig
    )
    n_coupled_steps: int = 1
    atmosphere_loss: StepLossConfig = dataclasses.field(
        default_factory=StepLossConfig
    )
    ocean_loss: StepLossConfig = dataclasses.field(
        default_factory=StepLossConfig
    )
    # per-component loss schedules (reference: fme/coupled/loss.py:4
    # ComponentLossSchedule): a weight of 0 removes the component from
    # the objective; optimize_last_step_only restricts each component's
    # loss to its final rollout step
    atmosphere_loss_weight: float = 1.0
    ocean_loss_weight: float = 1.0
    atmosphere_optimize_last_step_only: bool = False
    ocean_optimize_last_step_only: bool = False
    # the reference's nested training block (stepper_training:
    # {n_coupled_steps, ocean, atmosphere}); populates the flat fields
    # above and adds per-component n_steps bounds and parameter_init
    # (reference: coupled/stepper.py:1768)
    stepper_training: CoupledTrainStepperConfig | None = None
    # validation: {loader: ...} maps here (coupled validation loss each
    # epoch; reference: train_config.py:99 InlineValidationConfig)
    validation_loader: CoupledDataConfig | None = None
    ema: EMAConfig = dataclasses.field(
        default_factory=lambda: EMAConfig()
    )
    save_checkpoint: bool = True
    validate_using_ema: bool = True
    segment_epochs: int | None = None
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    seed: int = 0

    def __post_init__(self):
        if self.stepper_training is not None:
            st = self.stepper_training
            self.n_coupled_steps = st.n_coupled_steps
            self.atmosphere_loss = st.atmosphere.loss
            self.ocean_loss = st.ocean.loss
            self.atmosphere_loss_weight = st.atmosphere.loss_weight
            self.ocean_loss_weight = st.ocean.loss_weight
            self.atmosphere_optimize_last_step_only = (
                st.atmosphere.optimize_last_step_only
            )
            self.ocean_optimize_last_step_only = (
                st.ocean.optimize_last_step_only
            )

    @property
    def atmosphere_n_steps(self) -> int | None:
        if self.stepper_training is None:
            return None
        return self.stepper_training.atmosphere.n_steps

    @property
    def ocean_n_steps(self) -> int | None:
        if self.stepper_training is None:
            return None
        return self.stepper_training.ocean.n_steps





class CoupledTrainer:
    """Joint training over coupled rollouts; per-component losses summed
    (reference: fme/coupled/loss.py per-component loss schedules).
    """

    def __init__(self, config: CoupledTrainConfig):
        self.config = config
        # per-component (ParameterInitializationConfig, base_params) for
        # the L2-SP penalty; populated by train() parameter init
        self._l2sp: dict = {}
        atmos_ds = config.train_loader.build_atmosphere()
        ocean_ds = config.train_loader.build_ocean()
        self.coupled: CoupledStepper = config.stepper.get_stepper(
            atmos_ds.dataset_info, ocean_ds.dataset_info
        )
        n_inner = self.coupled.n_inner_steps
        n_outer = config.n_coupled_steps
        # name partition mirrors the reference's data requirements
        # (coupled/stepper.py:344 _all_atmosphere_names /
        # :358 _all_ocean_names): ocean-supplied fields are dropped from
        # the atmosphere side, shared forcings are read from the
        # atmosphere data only
        atmos_names = self.coupled.all_atmosphere_names
        ocean_names = self.coupled.all_ocean_names
        self.atmos_window = WindowDataset(
            atmos_ds,
            DataRequirements(atmos_names, n_outer * n_inner + 1),
        )
        self.ocean_window = WindowDataset(
            ocean_ds, DataRequirements(ocean_names, n_outer + 1)
        )
        info_a = atmos_ds.dataset_info
        info_o = ocean_ds.dataset_info
        self.atmos_loss = config.atmosphere_loss.build(
            info_a.gridded_operations,
            out_names=self.coupled.atmosphere.out_names,
            normalizer=(
                self.coupled.atmosphere.step.config.normalization
                .build_loss_normalizer(
                    self.coupled.atmosphere.step.config._normalize_names
                )
            ),
        )
        self.ocean_loss = config.ocean_loss.build(
            info_o.gridded_operations,
            out_names=self.coupled.ocean.out_names,
            normalizer=(
                self.coupled.ocean.step.config.normalization
                .build_loss_normalizer(
                    self.coupled.ocean.step.config._normalize_names
                )
            ),
        )
        self.tx = config.optimization.build(config.max_epochs).tx
        self._disk_logger = DiskMetricLogger(
            os.path.join(config.experiment_dir, "metrics.jsonl")
        )

    def loss_fn(self, params, atmos_batch, ocean_batch, rng):
        coupled = self.coupled
        n_inner = coupled.n_inner_steps
        # split params into components for prediction
        coupled.atmosphere.params = params["atmosphere"]
        coupled.ocean.params = params["ocean"]
        ic = CoupledPrognosticState(
            atmosphere_data=PrognosticState(data={
                k: atmos_batch[k][:, :1]
                for k in coupled.atmosphere.prognostic_names
            }),
            ocean_data=PrognosticState(data={
                k: ocean_batch[k][:, :1]
                for k in coupled.ocean.prognostic_names
            }),
        )
        atmos_forcing = {
            k: atmos_batch[k]
            for k in coupled.atmosphere_forcing_window_names
            if k in atmos_batch
        }
        ocean_forcing = {
            k: ocean_batch[k]
            for k in coupled.ocean_forcing_window_names
            if k in ocean_batch
        }
        a_out, o_out, _ = coupled.predict(
            ic, atmos_forcing, ocean_forcing, rng=rng
        )
        a_target = {
            k: atmos_batch[k][:, 1:]
            for k in coupled.atmosphere.out_names
            if k in atmos_batch
        }
        o_target = {
            k: ocean_batch[k][:, 1:]
            for k in coupled.ocean.out_names
            if k in ocean_batch
        }
        cfg = self.config
        # per-component loss-step bounds (reference:
        # coupled/stepper.py:1723 ComponentTrainingConfig.n_steps)
        a_n = cfg.atmosphere_n_steps
        o_n = cfg.ocean_n_steps
        if a_n is not None:
            a_out = {k: v[:, :a_n] for k, v in a_out.items()}
            a_target = {k: v[:, :a_n] for k, v in a_target.items()}
        if o_n is not None:
            o_out = {k: v[:, :o_n] for k, v in o_out.items()}
            o_target = {k: v[:, :o_n] for k, v in o_target.items()}
        if cfg.atmosphere_optimize_last_step_only:
            a_out_l = {k: a_out[k][:, -1:] for k in a_target}
            a_target = {k: v[:, -1:] for k, v in a_target.items()}
        else:
            a_out_l = {k: a_out[k] for k in a_target}
        if cfg.ocean_optimize_last_step_only:
            o_out_l = {k: o_out[k][:, -1:] for k in o_target}
            o_target = {k: v[:, -1:] for k, v in o_target.items()}
        else:
            o_out_l = {k: o_out[k] for k in o_target}
        zero = jnp.zeros(())
        a_active = (a_n is None or a_n > 0) and cfg.atmosphere_loss_weight
        o_active = (o_n is None or o_n > 0) and cfg.ocean_loss_weight
        loss_a = (
            self.atmos_loss(a_out_l, a_target, 0).total
            if a_active else zero
        )
        loss_o = (
            self.ocean_loss(o_out_l, o_target, 0).total
            if o_active else zero
        )
        total = (
            cfg.atmosphere_loss_weight * loss_a
            + cfg.ocean_loss_weight * loss_o
        )
        for comp, (pi, base) in getattr(self, "_l2sp", {}).items():
            total = total + pi.regularizer_loss(params[comp], base)
        return total, {
            "loss": total,
            "atmosphere_loss": loss_a,
            "ocean_loss": loss_o,
        }

    def _validate(self, params, rng) -> float:
        """Mean coupled loss over the validation pairing (reference:
        train_config.py:99 InlineValidationConfig)."""
        config = self.config
        if getattr(self, "_val_windows", None) is None:
            atmos_ds = config.validation_loader.build_atmosphere()
            ocean_ds = config.validation_loader.build_ocean()
            n_inner = self.coupled.n_inner_steps
            n_outer = config.n_coupled_steps
            self._val_windows = (
                WindowDataset(
                    atmos_ds,
                    DataRequirements(
                        self.coupled.all_atmosphere_names,
                        n_outer * n_inner + 1,
                    ),
                ),
                WindowDataset(
                    ocean_ds,
                    DataRequirements(
                        self.coupled.all_ocean_names, n_outer + 1
                    ),
                ),
            )
        atmos_w, ocean_w = self._val_windows
        n_inner = self.coupled.n_inner_steps
        n_pairs = min(
            len(ocean_w), (len(atmos_w) + n_inner - 1) // n_inner
        )
        if n_pairs == 0:
            raise ValueError(
                "validation dataset is shorter than one coupled rollout"
                f" window (needs {config.n_coupled_steps} coupled steps"
                " + 1)"
            )
        losses = []
        key = jax.random.PRNGKey(config.seed + 99)
        for i in range(min(n_pairs, 4)):
            a_s = atmos_w[i * n_inner]
            o_s = ocean_w[i]
            atmos_batch = {
                k: jnp.asarray(v[None]) for k, v in a_s[0].items()
            }
            ocean_batch = {
                k: jnp.asarray(v[None]) for k, v in o_s[0].items()
            }
            key, sub = jax.random.split(key)
            loss, _ = self.loss_fn(params, atmos_batch, ocean_batch, sub)
            losses.append(float(loss))
        return float(np.mean(losses))

    def train(self):
        config = self.config
        params = self.coupled.init_params(jax.random.PRNGKey(config.seed))
        # resume from previously saved component checkpoints when present
        # (reference: coupled trainer restarts)
        ckpt_dir = os.path.join(
            config.experiment_dir, "training_checkpoints"
        )
        atmos_path = os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack")
        ocean_path = os.path.join(ckpt_dir, "ocean_ckpt.msgpack")
        if os.path.exists(atmos_path) and os.path.exists(ocean_path):
            from ace_tpu.stepper.checkpoint import load_stepper

            logging.info("resuming coupled training from checkpoints")
            params = {
                "atmosphere": load_stepper(atmos_path).params,
                "ocean": load_stepper(ocean_path).params,
            }
        elif (
            config.stepper_training is not None
            and config.stepper_training.parameter_init.checkpoint_path
            is not None
        ):
            # fine-tune from a prior coupled run's checkpoint directory
            from ace_tpu.stepper.checkpoint import load_stepper

            base = config.stepper_training.parameter_init.checkpoint_path
            params = {
                "atmosphere": load_stepper(os.path.join(
                    base, "atmosphere_ckpt.msgpack"
                )).params,
                "ocean": load_stepper(os.path.join(
                    base, "ocean_ckpt.msgpack"
                )).params,
            }
            logging.info(f"initialized coupled weights from {base}")
        elif config.stepper_training is not None:
            # per-component parameter initialization: pre-trained
            # component checkpoints, with optional frozen subsets
            # (reference: coupled/stepper.py:1732 parameter_init — the
            # SamudrACE recipe loads uncoupled atmosphere + ocean
            # steppers and freezes one side)
            for comp in ("atmosphere", "ocean"):
                pi = getattr(config.stepper_training, comp).parameter_init
                if pi is not None and pi.weights_path is not None:
                    params[comp], base = pi.apply_weights(params[comp])
                    if pi.alpha or pi.beta:
                        # L2-SP toward the base weights (reference:
                        # parameter_init regularizer; added to the
                        # coupled loss like the uncoupled TrainStepper)
                        self._l2sp[comp] = (pi, base)
                    logging.info(
                        f"initialized {comp} weights from "
                        f"{pi.weights_path}"
                    )
        tx = self.tx
        if config.stepper_training is not None:
            # frozen parameters get zeroed updates (reference:
            # parameter_init FrozenParameterConfig)
            masks = {}
            any_frozen = False
            for comp in ("atmosphere", "ocean"):
                pi = getattr(config.stepper_training, comp).parameter_init
                if pi is not None and pi.frozen_parameters is not None:
                    masks[comp] = pi.frozen_parameters.frozen_mask(
                        params[comp]
                    )
                    any_frozen = True
                else:
                    masks[comp] = jax.tree_util.tree_map(
                        lambda _: False, params[comp]
                    )
            if any_frozen:
                tx = optax.chain(
                    tx, optax.masked(optax.set_to_zero(), masks)
                )
        opt_state = tx.init(params)
        ema = config.ema.build()
        ema.init(params)
        rng = jax.random.PRNGKey(config.seed + 1)

        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)

        # coupled sample i pairs ocean window i with the atmosphere
        # window starting at i * n_inner fast steps (reference
        # CoupledDataset.__getitem__, data_typing.py:217: fast_idx =
        # idx * n_steps_fast); pairing window i with window i would
        # misalign the components for every i > 0
        n_inner = self.coupled.n_inner_steps
        n_pairs = min(
            len(self.ocean_window),
            (len(self.atmos_window) + n_inner - 1) // n_inner,
        )
        batch_size = config.train_loader.batch_size
        n_batches = max(1, n_pairs // batch_size)
        shuffle_rng = np.random.RandomState(config.seed + 7)
        last_metrics = {}
        end_epoch = (
            config.max_epochs if config.segment_epochs is None
            else min(config.segment_epochs, config.max_epochs)
        )
        for epoch in range(end_epoch):
            order = np.arange(n_pairs)
            shuffle_rng.shuffle(order)  # fresh order each epoch
            for b in range(n_batches):
                idx = order[b * batch_size : (b + 1) * batch_size]
                atmos_samples = [
                    self.atmos_window[int(i) * n_inner] for i in idx
                ]
                ocean_samples = [
                    self.ocean_window[int(i)] for i in idx
                ]
                atmos_batch = {
                    k: jnp.asarray(np.stack(
                        [s[0][k] for s in atmos_samples]
                    ))
                    for k in atmos_samples[0][0]
                }
                ocean_batch = {
                    k: jnp.asarray(np.stack(
                        [s[0][k] for s in ocean_samples]
                    ))
                    for k in ocean_samples[0][0]
                }
                rng, sub = jax.random.split(rng)
                (loss, metrics), grads = grad_fn(
                    params, atmos_batch, ocean_batch, sub
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                ema(params)
                last_metrics = {k: float(v) for k, v in metrics.items()}
            if config.validation_loader is not None:
                val_params = (
                    ema.ema_params
                    if config.validate_using_ema
                    and ema.ema_params is not None else params
                )
                last_metrics["val_loss"] = self._validate(
                    val_params, rng
                )
            logging.info(f"coupled epoch {epoch}: {last_metrics}")
            self._disk_logger.log({**last_metrics, "epoch": epoch})
        self.coupled.atmosphere.params = params["atmosphere"]
        self.coupled.ocean.params = params["ocean"]
        if not config.save_checkpoint:
            return self
        # checkpoint both component steppers
        from ace_tpu.stepper.checkpoint import save_stepper

        ckpt_dir = os.path.join(config.experiment_dir, "training_checkpoints")
        if ema.ema_params is not None:
            # EMA variants of both components (reference: the coupled
            # trainer's EMA checkpoint zoo)
            self.coupled.atmosphere.params = ema.ema_params["atmosphere"]
            save_stepper(
                os.path.join(ckpt_dir, "atmosphere_ema_ckpt.msgpack"),
                self.coupled.atmosphere, config.stepper.atmosphere.stepper,
            )
            self.coupled.ocean.params = ema.ema_params["ocean"]
            save_stepper(
                os.path.join(ckpt_dir, "ocean_ema_ckpt.msgpack"),
                self.coupled.ocean, config.stepper.ocean.stepper,
            )
            self.coupled.atmosphere.params = params["atmosphere"]
            self.coupled.ocean.params = params["ocean"]
        save_stepper(
            os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack"),
            self.coupled.atmosphere, config.stepper.atmosphere.stepper,
        )
        save_stepper(
            os.path.join(ckpt_dir, "ocean_ckpt.msgpack"),
            self.coupled.ocean, config.stepper.ocean.stepper,
        )
        return self


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(CoupledTrainConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    logging.info("Starting coupled training")
    trainer = CoupledTrainer(config)
    return trainer.train()


if __name__ == "__main__":
    main()
