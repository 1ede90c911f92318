"""Missing-variable data masks: with the builder's
allow_missing_variables flag set, datasets lacking a required variable
produce NaN-filled placeholders plus per-variable [batch] presence
masks, which exclude the missing channels from the loss and feed the
step's input-presence handling (reference:
fme/ace/data_loading/batch_data.py:81 _collate_with_masking,
fme/core/registry/module.py:139, fme/core/loss.py:284)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ace_tpu.core.config import from_dict
from ace_tpu.data.loading import DataLoaderConfig
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.testing import SyntheticData

IN_NAMES = ["prog_a", "prog_b", "forcing_c"]
OUT_NAMES = ["prog_a", "prog_b", "diag_d"]


def _loader(tmp_path, names, allow_missing, req_names=None):
    data = SyntheticData(tmp_path / "d", names, n_time=8)
    cfg = from_dict(DataLoaderConfig, {
        "dataset": {"data_path": str(data.data_dir)},
        "batch_size": 2,
        "num_data_workers": 1,
    })
    req = DataRequirements(
        names=req_names or sorted(set(IN_NAMES) | set(OUT_NAMES)),
        n_timesteps=2,
        allow_missing_variables=allow_missing,
    )
    return data, cfg.build(req, train=False)


def test_missing_variable_raises_by_default(tmp_path):
    _, gridded = _loader(
        tmp_path, ["prog_a", "prog_b", "forcing_c"], allow_missing=False
    )
    with pytest.raises(KeyError, match="diag_d"):
        next(iter(gridded.loader))


def test_missing_variable_masked_when_allowed(tmp_path):
    _, gridded = _loader(
        tmp_path, ["prog_a", "prog_b", "forcing_c"], allow_missing=True
    )
    batch = next(iter(gridded.loader))
    assert batch.data_mask is not None
    assert set(batch.data_mask) == {"diag_d"}
    np.testing.assert_array_equal(
        np.asarray(batch.data_mask["diag_d"]), 0.0
    )
    # NaN-filled placeholder with the full window shape
    assert batch.data["diag_d"].shape == batch.data["prog_a"].shape
    assert np.isnan(np.asarray(batch.data["diag_d"])).all()
    # present variables carry no mask entries and real values
    assert np.isfinite(np.asarray(batch.data["prog_a"])).all()


def test_no_mask_when_all_present(tmp_path):
    _, gridded = _loader(
        tmp_path, sorted(set(IN_NAMES) | set(OUT_NAMES)),
        allow_missing=True,
    )
    batch = next(iter(gridded.loader))
    assert batch.data_mask is None


@pytest.mark.medium_duration
def test_train_end_to_end_with_missing_diagnostic(tmp_path):
    """Full training run where the dataset lacks one diagnostic: the
    loss must exclude the masked channel (finite loss, finite grads)
    and per-channel metrics for present variables must be unaffected."""
    import yaml

    data = SyntheticData(
        tmp_path / "syn", ["prog_a", "prog_b", "forcing_c"], n_time=8
    )
    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "save_checkpoint": True,
        "seed": 0,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2, "num_data_workers": 1,
        },
        "validation_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2, "num_data_workers": 1,
        },
        "optimization": {"lr": 1e-3, "optimizer_type": "AdamW"},
        "stepper_training": {"n_forward_steps": 1,
                             "loss": {"type": "MSE"}},
        "stepper": {"step": {"type": "single_module", "config": {
            "builder": {
                "type": "SphericalFourierNeuralOperatorNet",
                "config": {
                    "embed_dim": 8, "num_layers": 2,
                    "operator_type": "dhconv",
                    "data_grid": "equiangular",
                },
                "allow_missing_variables": True,
            },
            "in_names": IN_NAMES,
            "out_names": OUT_NAMES,
            "normalization": {"network": {
                "global_means_path": str(data.mean_path),
                "global_stds_path": str(data.std_path),
            }},
        }}},
    }
    # diag_d has no stats on disk either; give the normalizer stats for
    # all names (stats files typically cover the full variable registry)
    from ace_tpu.testing import save_stats_files

    save_stats_files(
        data.mean_path, data.std_path,
        sorted(set(IN_NAMES) | set(OUT_NAMES)),
    )
    config_path = tmp_path / "train.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.train.train import main

    trainer = main([str(config_path)])
    # parameters received finite updates
    leaves = jax.tree_util.tree_leaves(trainer.params)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # validation on the masked data yields a finite loss, and the
    # masked channel's per-step metric is excluded rather than NaN
    batch = next(iter(trainer.valid_data))
    assert batch.data_mask is not None and "diag_d" in batch.data_mask
    metrics = trainer._valid_step(
        trainer.params, batch.data, jax.random.PRNGKey(0), None,
        batch.labels, batch.data_mask,
    )
    assert np.isfinite(float(metrics["loss"]))
