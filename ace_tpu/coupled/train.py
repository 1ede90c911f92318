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
from ace_tpu.core.optimization import OptimizationConfig
from ace_tpu.core.wandb import DiskMetricLogger
from ace_tpu.coupled.stepper import (
    CoupledPrognosticState,
    CoupledStepper,
    CoupledStepperConfig,
)
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.data.loading import DataLoader, WindowDataset
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.stepper.stepper import PrognosticState
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class CoupledDataConfig:
    """Two time-aligned datasets (reference: fme/coupled/data_loading/)."""

    atmosphere: XarrayDataConfig
    ocean: XarrayDataConfig
    batch_size: int = 1
    num_data_workers: int = 2


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
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    seed: int = 0


class CoupledTrainer:
    """Joint training over coupled rollouts; per-component losses summed
    (reference: fme/coupled/loss.py per-component loss schedules).
    """

    def __init__(self, config: CoupledTrainConfig):
        self.config = config
        atmos_ds = config.train_loader.atmosphere.build()
        ocean_ds = config.train_loader.ocean.build()
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
        loss_a = self.atmos_loss(a_out_l, a_target, 0).total
        loss_o = self.ocean_loss(o_out_l, o_target, 0).total
        total = (
            cfg.atmosphere_loss_weight * loss_a
            + cfg.ocean_loss_weight * loss_o
        )
        return total, {
            "loss": total,
            "atmosphere_loss": loss_a,
            "ocean_loss": loss_o,
        }

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
        opt_state = self.tx.init(params)
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
        for epoch in range(config.max_epochs):
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
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                last_metrics = {k: float(v) for k, v in metrics.items()}
            logging.info(f"coupled epoch {epoch}: {last_metrics}")
            self._disk_logger.log({**last_metrics, "epoch": epoch})
        self.coupled.atmosphere.params = params["atmosphere"]
        self.coupled.ocean.params = params["ocean"]
        # checkpoint both component steppers
        from ace_tpu.stepper.checkpoint import save_stepper

        ckpt_dir = os.path.join(config.experiment_dir, "training_checkpoints")
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
