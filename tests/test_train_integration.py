"""End-to-end training integration test: YAML config -> entry main ->
checkpoints -> resume (reference model: fme/ace/test_train.py round-trips
through real configs on synthetic netCDF data).
"""

import os

import jax
import pytest

import numpy as np
import yaml

from ace_tpu.testing import SyntheticData

IN_NAMES = ["prog_a", "prog_b", "forcing_c"]
OUT_NAMES = ["prog_a", "prog_b", "diag_d"]
ALL_NAMES = sorted(set(IN_NAMES) | set(OUT_NAMES))


def _config(tmp_path, data: SyntheticData, max_epochs=2):
    return {
        "experiment_dir": str(tmp_path / "output"),
        "max_epochs": max_epochs,
        "save_checkpoint": True,
        "seed": 0,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "validation_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "optimization": {"lr": 1e-3, "optimizer_type": "AdamW"},
        "stepper_training": {
            "n_forward_steps": 2,
            "loss": {"type": "MSE"},
        },
        "stepper": {
            "step": {
                "type": "single_module",
                "config": {
                    "builder": {
                        "type": "SphericalFourierNeuralOperatorNet",
                        "config": {
                            "embed_dim": 8,
                            "num_layers": 2,
                            "operator_type": "dhconv",
                            "data_grid": "equiangular",
                        },
                    },
                    "in_names": IN_NAMES,
                    "out_names": OUT_NAMES,
                    "normalization": {
                        "network": {
                            "global_means_path": str(data.mean_path),
                            "global_stds_path": str(data.std_path),
                        }
                    },
                },
            }
        },
    }


@pytest.mark.medium_duration
def test_train_end_to_end_and_resume(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    config_path = tmp_path / "config.yaml"
    cfg = _config(tmp_path, data, max_epochs=1)
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.train.train import main

    trainer = main([str(config_path)])
    ckpt_dir = os.path.join(cfg["experiment_dir"], "training_checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "ckpt.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "best_ckpt.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "ema_ckpt.msgpack"))
    assert os.path.exists(os.path.join(cfg["experiment_dir"], "metrics.jsonl"))
    assert np.isfinite(trainer.best_validation_loss)

    # resume: bump max_epochs via --override, rerun; should start at epoch 1
    trainer2 = main([str(config_path), "--override", "max_epochs=2"])
    assert trainer2.start_epoch == 1
    assert trainer2.num_batches_seen > trainer.num_batches_seen


@pytest.mark.medium_duration
def test_loaded_checkpoint_predicts(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    config_path = tmp_path / "config.yaml"
    cfg = _config(tmp_path, data, max_epochs=1)
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    main([str(config_path)])

    from ace_tpu.stepper.checkpoint import load_stepper
    from ace_tpu.stepper.stepper import PrognosticState
    import jax.numpy as jnp

    stepper = load_stepper(
        os.path.join(
            cfg["experiment_dir"], "training_checkpoints", "ckpt.msgpack"
        )
    )
    rng = np.random.RandomState(0)
    ic = PrognosticState(data={
        "prog_a": jnp.asarray(rng.randn(1, 1, 8, 16), jnp.float32),
        "prog_b": jnp.asarray(rng.randn(1, 1, 8, 16), jnp.float32),
    })
    forcing = {
        "forcing_c": jnp.asarray(rng.randn(1, 4, 8, 16), jnp.float32)
    }
    outputs, _ = stepper.predict(ic, forcing)
    assert outputs["prog_a"].shape == (1, 3, 8, 16)
    assert bool(jnp.all(jnp.isfinite(outputs["diag_d"])))


@pytest.mark.medium_duration
def test_inline_inference_selects_best_checkpoint(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=12)
    cfg = _config(tmp_path, data, max_epochs=2)
    cfg["inference"] = {
        "loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "start_indices": {"list": [0]},
        },
        "n_forward_steps": 4,
        "forward_steps_in_memory": 2,
    }
    config_path = tmp_path / "config.yaml"
    import yaml as _yaml

    with open(config_path, "w") as f:
        _yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    trainer = main([str(config_path)])
    assert np.isfinite(trainer.best_inference_error)
    assert os.path.exists(
        os.path.join(
            cfg["experiment_dir"], "training_checkpoints",
            "best_inference_ckpt.msgpack",
        )
    )
    # inference metrics logged
    import json

    with open(os.path.join(cfg["experiment_dir"], "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(
        k.startswith("inference/") for r in records for k in r
    )


def test_preemption_signal_saves_checkpoint(tmp_path):
    """SIGTERM mid-training saves a resumable checkpoint
    (reference model: fme/core/distributed/test_shutdown.py).
    """
    import signal
    import threading

    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=1)
    from ace_tpu.core.config import from_dict
    from ace_tpu.train.trainer import TrainConfig

    config = from_dict(TrainConfig, cfg)
    trainer = config.build_trainer()
    trainer.params, trainer.opt_state = trainer.train_stepper.init(
        trainer._next_rng()
    )
    trainer._install_signal_handlers()
    try:
        # deliver SIGTERM to ourselves; handler saves then exits cleanly
        try:
            signal.raise_signal(signal.SIGTERM)
            raised = False
        except SystemExit as e:
            raised = True
            assert e.code == 128 + signal.SIGTERM
        assert raised
    finally:
        trainer._restore_signal_handlers()
    ckpt = trainer.paths.latest_checkpoint_path
    assert os.path.exists(ckpt)
    # and it resumes
    trainer2 = config.build_trainer()
    trainer2.restore(ckpt)
    assert trainer2.params is not None


@pytest.mark.medium_duration
def test_segment_epochs_limits_run(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=3)
    cfg["segment_epochs"] = 1
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    # first segment trains exactly 1 of 3 epochs
    main([str(config_path)])
    trainer2 = main([str(config_path)])
    # second invocation resumed at epoch 1 and stopped after epoch 2
    assert trainer2.start_epoch == 1


@pytest.mark.medium_duration
def test_checkpoint_stepper_config_finetune(tmp_path):
    """TrainConfig.stepper can point at a saved checkpoint
    (reference: single_module.py:786 CheckpointStepperConfig)."""
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=1)
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    main([str(config_path)])
    ckpt = os.path.join(
        cfg["experiment_dir"], "training_checkpoints", "ckpt.msgpack"
    )
    cfg2 = _config(tmp_path, data, max_epochs=1)
    cfg2["experiment_dir"] = str(tmp_path / "finetune")
    cfg2["stepper"] = {"checkpoint_path": ckpt}
    config_path2 = tmp_path / "config2.yaml"
    with open(config_path2, "w") as f:
        yaml.safe_dump(cfg2, f)
    trainer = main([str(config_path2)])
    assert trainer.num_batches_seen > 0


@pytest.mark.medium_duration
def test_multiple_named_inline_inference_entries(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=12)
    cfg = _config(tmp_path, data, max_epochs=1)
    cfg["inference"] = [
        {
            "name": "short",
            "weight": 0.25,
            "loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0]},
            },
            "n_forward_steps": 2,
            "forward_steps_in_memory": 2,
        },
        {
            "name": "long",
            "weight": 0.75,
            "loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0]},
            },
            "n_forward_steps": 4,
            "forward_steps_in_memory": 2,
        },
    ]
    config_path = tmp_path / "config.yaml"
    import yaml as _yaml

    with open(config_path, "w") as f:
        _yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    trainer = main([str(config_path)])
    assert np.isfinite(trainer.best_inference_error)
    # metrics file carries both named entries plus the combined error
    import json

    with open(os.path.join(cfg["experiment_dir"], "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    keys = set().union(*[r.keys() for r in rows])
    assert any(k.startswith("inference/short/") for k in keys)
    assert any(k.startswith("inference/long/") for k in keys)
    assert "inference/inference_error" in keys


@pytest.mark.medium_duration
def test_train_evaluation_batches(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=1)
    cfg["train_evaluation_batches"] = 2
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    main([str(config_path)])
    import json

    with open(os.path.join(cfg["experiment_dir"], "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("train/loss_independent_shuffle" in r for r in rows)


@pytest.mark.medium_duration
def test_resume_optimizer_ckpt_path_transfers_moments(tmp_path):
    """Fine-tuning with resume_optimizer_ckpt_path transfers the Adam
    moment estimates from the base run but keeps a fresh trainer
    (reference: fme/core/optimization.py:314)."""
    import jax.numpy as jnp
    import optax

    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=1)
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    main([str(config_path)])
    ckpt = os.path.join(
        cfg["experiment_dir"], "training_checkpoints", "ckpt.msgpack"
    )

    cfg2 = _config(tmp_path, data, max_epochs=1)
    cfg2["experiment_dir"] = str(tmp_path / "finetune")
    cfg2["stepper"] = {"checkpoint_path": ckpt}
    cfg2["optimization"]["resume_optimizer_ckpt_path"] = ckpt
    from ace_tpu.core.config import from_dict as cfg_from_dict
    from ace_tpu.train.trainer import TrainConfig

    config = cfg_from_dict(TrainConfig, cfg2)
    trainer = config.build_trainer()
    # trigger param/opt-state init without training
    trainer.params, trainer.opt_state = trainer.train_stepper.init(
        trainer._next_rng()
    )
    trainer._load_optimizer_running_state(ckpt)

    def find_adam(state):
        if isinstance(state, optax.ScaleByAdamState):
            return state
        if isinstance(state, tuple):
            for s in state:
                found = find_adam(s)
                if found is not None:
                    return found
        return None

    adam = find_adam(trainer.opt_state)
    assert adam is not None
    # moments transferred from the trained base run: non-zero
    mu_mag = max(
        float(jnp.abs(m).max()) for m in jax.tree_util.tree_leaves(adam.mu)
    )
    assert mu_mag > 0.0
    assert int(adam.count) > 0


def test_lr_tuning_and_scheduler_are_mutually_exclusive(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=10)
    cfg = _config(tmp_path, data, max_epochs=1)
    cfg["optimization"]["scheduler"] = {"type": "CosineAnnealingLR"}
    cfg["lr_tuning"] = {"enabled": True}
    from ace_tpu.core.config import from_dict as cfg_from_dict
    from ace_tpu.core.config import ConfigError
    from ace_tpu.train.trainer import TrainConfig

    with pytest.raises((ValueError, ConfigError), match="lr_tuning"):
        cfg_from_dict(TrainConfig, cfg)
