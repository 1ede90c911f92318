"""TrainingHistory provenance + stepper_training fine-tuning wiring tests
(reference: fme/core/test_training_history.py,
fme/ace/stepper/test_parameter_init.py integration points).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.training_history import TrainingHistory, TrainingJob
from ace_tpu.stepper.checkpoint import load_stepper, save_stepper
from ace_tpu.stepper.parameter_init import (
    CopyWeightsConfig,
    FrozenParameterConfig,
    ParameterInitializationConfig,
)
from ace_tpu.stepper.train import StepperTrainConfig

from tests.test_train_stepper import _train_stepper, _batch
import pytest


def test_training_history_roundtrip():
    h = TrainingHistory([TrainingJob(git_sha="abc", job_id="run1")])
    h.append(TrainingJob.from_env())
    restored = TrainingHistory.from_state(h.get_state())
    assert restored == h
    assert restored.get_history_by_key()["git_sha"][0] == "abc"
    assert len(restored) == 2


def test_history_rides_in_checkpoint(tmp_path):
    ts = _train_stepper()
    ts.stepper.params, _ = ts.init(jax.random.PRNGKey(0))
    ts.stepper.training_history.append(TrainingJob(git_sha="deadbeef"))
    path = str(tmp_path / "ckpt.msgpack")
    save_stepper(path, ts.stepper, _config_of(ts))
    loaded = load_stepper(path)
    assert loaded.training_history.get_history_by_key()["git_sha"] == [
        "deadbeef"
    ]


def _config_of(ts):
    from ace_tpu.core.config import to_dict
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.stepper.stepper import StepperConfig

    from tests.test_step_stepper import _step_config

    return StepperConfig(
        step=StepSelector(
            type="single_module", config=to_dict(_step_config())
        )
    )


def _finetune_stepper(base_path, **pinit_kwargs):
    ts = _train_stepper()
    ts.train_config = dataclasses.replace(
        ts.train_config,
        parameter_init=ParameterInitializationConfig(
            weights_path=base_path, **pinit_kwargs
        ),
    )
    return ts


def test_parameter_init_transfers_weights_and_history(tmp_path):
    base = _train_stepper()
    base.stepper.params, _ = base.init(jax.random.PRNGKey(7))
    base.stepper.training_history.append(TrainingJob(git_sha="base-job"))
    path = str(tmp_path / "base.msgpack")
    save_stepper(path, base.stepper, _config_of(base))

    ft = _finetune_stepper(path)
    params, _ = ft.init(jax.random.PRNGKey(0))
    base_leaves = jax.tree_util.tree_leaves(base.stepper.params)
    ft_leaves = jax.tree_util.tree_leaves(params)
    for b, f in zip(base_leaves, ft_leaves):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(f))
    # base job's history was carried over
    shas = ft.stepper.training_history.get_history_by_key()["git_sha"]
    assert "base-job" in shas


def test_frozen_parameters_do_not_update(tmp_path):
    base = _train_stepper()
    base.stepper.params, _ = base.init(jax.random.PRNGKey(7))
    path = str(tmp_path / "base.msgpack")
    save_stepper(path, base.stepper, _config_of(base))

    ft = _finetune_stepper(
        path,
        frozen_parameters=FrozenParameterConfig(include=["*kernel*"]),
    )
    # rebuild the optimizer chain with the new parameter_init config
    ft.optimization = ft._build_optimization(
        ft.optimization.config, 1, 1
    )
    params, opt_state = ft.init(jax.random.PRNGKey(0))
    train_step = ft.build_train_step(donate=False)
    rng = np.random.RandomState(0)
    new_params, _, _ = train_step(
        params, opt_state, _batch(rng, 2), jax.random.PRNGKey(1), 2, None
    )
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_leaves(new_params)
    n_frozen = n_trained = 0
    for (path_k, old), new in zip(flat_old, flat_new):
        name = "/".join(str(p) for p in path_k)
        if "kernel" in name:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
            n_frozen += 1
        elif not np.allclose(np.asarray(old), np.asarray(new)):
            n_trained += 1
    assert n_frozen > 0
    assert n_trained > 0


def test_l2sp_regularizer_increases_loss(tmp_path):
    base = _train_stepper()
    base.stepper.params, _ = base.init(jax.random.PRNGKey(7))
    path = str(tmp_path / "base.msgpack")
    save_stepper(path, base.stepper, _config_of(base))

    rng = np.random.RandomState(0)
    batch = _batch(rng, 2)

    ft_plain = _finetune_stepper(path)
    params, _ = ft_plain.init(jax.random.PRNGKey(0))
    # move away from base so the penalty is nonzero
    params2 = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    loss_plain, _ = ft_plain.loss_fn(params2, batch, jax.random.PRNGKey(1))

    ft_reg = _finetune_stepper(path, alpha=10.0)
    loss_reg, _ = ft_reg.loss_fn(params2, batch, jax.random.PRNGKey(1))
    assert float(loss_reg) > float(loss_plain)


def test_optimize_last_step_only():
    ts = _train_stepper(n_forward_steps=3)
    params, _ = ts.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = _batch(rng, 3)
    _, metrics_all = ts.loss_fn(params, batch, jax.random.PRNGKey(1))
    ts.train_config = dataclasses.replace(
        ts.train_config, optimize_last_step_only=True
    )
    total_last, metrics_last = ts.loss_fn(params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(total_last), float(metrics_all["loss_step_2"]), rtol=1e-6
    )


@pytest.mark.medium_duration
def test_copy_weights_after_batch(tmp_path):
    """Trainer re-pins included weights to their start-of-run values."""
    import yaml

    from ace_tpu.testing import SyntheticData
    from ace_tpu.train.train import main

    names = ["prog_a", "forcing_a"]
    data = SyntheticData(tmp_path / "data", names, n_time=6)
    cfg = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "save_checkpoint": True,
        "seed": 0,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2,
            "num_data_workers": 0,
        },
        "validation_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2,
            "num_data_workers": 0,
        },
        "optimization": {"lr": 1e-2, "optimizer_type": "Adam"},
        "copy_weights_after_batch": {"include": ["*encoder*"]},
        "stepper_training": {"n_forward_steps": 1, "loss": {"type": "MSE"}},
        "stepper": {
            "step": {
                "type": "single_module",
                "config": {
                    "builder": {
                        "type": "SphericalFourierNeuralOperatorNet",
                        "config": {
                            "embed_dim": 8, "num_layers": 2,
                            "operator_type": "dhconv",
                            "data_grid": "equiangular",
                        },
                    },
                    "in_names": names,
                    "out_names": ["prog_a"],
                    "normalization": {
                        "network": {
                            "global_means_path": str(data.mean_path),
                            "global_stds_path": str(data.std_path),
                        },
                    },
                },
            },
        },
    }
    config_path = tmp_path / "cfg.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    trainer = main([str(config_path)])
    flat = jax.tree_util.tree_flatten_with_path(trainer.params)[0]
    init_flat = dict(
        (("/".join(str(p) for p in k)), v)
        for k, v in jax.tree_util.tree_flatten_with_path(
            trainer._copy_weights._base
        )[0]
    )
    n_pinned = 0
    for path_k, new in flat:
        name = "/".join(str(p) for p in path_k)
        if "encoder" in name:
            np.testing.assert_array_equal(
                np.asarray(new), np.asarray(init_flat[name])
            )
            n_pinned += 1
    assert n_pinned > 0
    # trainer appended this job to the stepper provenance
    assert len(trainer.stepper.training_history) == 1
