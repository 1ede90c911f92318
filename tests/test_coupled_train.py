"""Coupled training entry integration test (reference model:
fme/coupled/test_train.py — YAML -> main() round trip on synthetic data).
"""

import os

import numpy as np
import yaml

from ace_tpu.testing import SyntheticData
import pytest


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def test_coupled_train_entry(tmp_path):
    # atmosphere at 6h, ocean at 12h -> n_inner = 2
    atmos_names = ["ta", "surface_temperature", "flux", "DSWRFtoa",
                   "ocean_fraction"]
    ocean_names = ["sst"]
    atmos = SyntheticData(
        tmp_path / "atmos", atmos_names, n_time=9, timestep_seconds=21600
    )
    ocean = SyntheticData(
        tmp_path / "ocean", ocean_names, n_time=5, timestep_seconds=43200,
    )

    def step_cfg(in_names, out_names, with_ocean, data, next_step_forcing_names=None):
        cfg = {
            "type": "single_module",
            "config": {
                "builder": {"type": "Linear", "config": {}},
                "in_names": in_names,
                "out_names": out_names,
                "next_step_forcing_names": next_step_forcing_names or [],
                "normalization": {"network": {
                    "global_means_path": str(data.mean_path),
                    "global_stds_path": str(data.std_path),
                }},
            },
        }
        if with_ocean:
            cfg["config"]["ocean"] = {
                "surface_temperature_name": "surface_temperature",
                "ocean_fraction_name": "ocean_fraction",
            }
        return cfg

    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "n_coupled_steps": 2,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "optimization": {"lr": 1e-3},
        "train_loader": {
            "atmosphere": {"data_path": str(atmos.data_dir)},
            "ocean": {"data_path": str(ocean.data_dir)},
            "batch_size": 1,
        },
        "stepper": {
            "sst_name": "sst",
            "atmosphere": {"stepper": {"step": step_cfg(
                ["ta", "surface_temperature", "DSWRFtoa"],
                ["ta", "flux", "surface_temperature"], True, atmos,
            )}},
            "ocean": {"stepper": {"step": step_cfg(
                ["sst", "flux"], ["sst"], False, ocean,
                next_step_forcing_names=["flux"],
            )}},
        },
    }
    # the ocean stepper needs the sst/flux stats; merge stats into one file
    # by regenerating ocean stats including flux
    from ace_tpu.testing import save_stats_files

    save_stats_files(
        ocean.path / "stats-mean.nc", ocean.path / "stats-std.nc",
        ["sst", "flux"],
    )

    config_path = tmp_path / "coupled.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.coupled.train import main

    trainer = main([str(config_path)])
    ckpt_dir = os.path.join(str(tmp_path / "out"), "training_checkpoints")
    assert os.path.exists(
        os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack")
    )
    assert os.path.exists(os.path.join(ckpt_dir, "ocean_ckpt.msgpack"))
    # metrics were recorded
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "metrics.jsonl")
    )

    # converted checkpoints reload as standalone steppers
    from ace_tpu.stepper.checkpoint import load_stepper

    atmos_stepper = load_stepper(
        os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack")
    )
    assert "ta" in atmos_stepper.prognostic_names


def test_coupled_inference_entry(tmp_path):
    # reuse the training test to produce component checkpoints
    test_coupled_train_entry(tmp_path)
    ckpt_dir = os.path.join(str(tmp_path / "out"), "training_checkpoints")

    config = {
        "experiment_dir": str(tmp_path / "inference"),
        "n_coupled_steps": 2,
        "coupled_steps_in_memory": 1,
        "evaluate": True,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "checkpoint": {
            "atmosphere": os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack"),
            "ocean": os.path.join(ckpt_dir, "ocean_ckpt.msgpack"),
        },
        "initial_condition": {
            "atmosphere": {"data_path": str(tmp_path / "atmos" / "data")},
            "ocean": {"data_path": str(tmp_path / "ocean" / "data")},
            "start_indices": [0, 1],
        },
    }
    config_path = tmp_path / "coupled_inference.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.coupled.inference import main

    logs = main([str(config_path)])
    out_dir = str(tmp_path / "inference")
    assert os.path.exists(
        os.path.join(out_dir, "autoregressive_predictions.nc")
    )
    assert os.path.exists(
        os.path.join(out_dir, "autoregressive_predictions_ocean.nc")
    )
    assert any(k.endswith("rmse/sst") for k in logs)
    assert all(np.isfinite(v) for v in logs.values())
    # full per-component aggregation: time-mean RMSE logs, netCDF
    # diagnostics and rendered maps for both components
    assert any(k.startswith("ocean/time_mean/rmse/") for k in logs)
    assert any(k.startswith("atmosphere/time_mean/rmse/") for k in logs)
    for comp in ("atmosphere", "ocean"):
        assert os.path.exists(os.path.join(
            out_dir, "diagnostics", comp, "time_mean_diagnostics.nc"
        ))
        plots = os.listdir(os.path.join(out_dir, "plots", comp))
        assert any(p.endswith(".png") for p in plots)

    # written ocean file has [n_ic, n_coupled_steps, ...] predictions
    import h5py

    with h5py.File(
        os.path.join(out_dir, "autoregressive_predictions_ocean.nc"), "r"
    ) as f:
        assert f["sst"].shape[0] == 2
        assert f["sst"].shape[1] == 2


def test_coupled_evaluator_entry(tmp_path):
    """The dedicated evaluator CLI forces paired aggregation on
    (reference entry: python -m fme.coupled.inference.evaluator)."""
    test_coupled_train_entry(tmp_path)
    ckpt_dir = os.path.join(str(tmp_path / "out"), "training_checkpoints")
    config = {
        "experiment_dir": str(tmp_path / "evaluator"),
        "n_coupled_steps": 2,
        "coupled_steps_in_memory": 1,
        # note: no "evaluate" key — the entry point forces it on
        "logging": {"log_to_screen": False, "log_to_file": False},
        "checkpoint": {
            "atmosphere": os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack"),
            "ocean": os.path.join(ckpt_dir, "ocean_ckpt.msgpack"),
        },
        "initial_condition": {
            "atmosphere": {"data_path": str(tmp_path / "atmos" / "data")},
            "ocean": {"data_path": str(tmp_path / "ocean" / "data")},
            "start_indices": [0],
        },
    }
    config_path = tmp_path / "coupled_evaluator.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.coupled.evaluator import main

    logs = main([str(config_path)])
    assert any(k.endswith("rmse/sst") for k in logs)
    assert all(np.isfinite(v) for v in logs.values())


def test_coupled_finetune_with_frozen_component(tmp_path):
    """The SamudrACE recipe: nested stepper_training block with
    per-component parameter_init loading pre-trained component
    checkpoints and freezing the atmosphere; the frozen component's
    weights do not change while the ocean's do (reference:
    fme/coupled/stepper.py:1717 ComponentTrainingConfig.parameter_init +
    the cm4-piControl train config)."""
    import numpy as np

    # phase 1: produce component checkpoints with the base test
    test_coupled_train_entry(tmp_path)
    ckpt_dir = os.path.join(str(tmp_path / "out"), "training_checkpoints")
    atmos_ckpt = os.path.join(ckpt_dir, "atmosphere_ckpt.msgpack")
    ocean_ckpt = os.path.join(ckpt_dir, "ocean_ckpt.msgpack")

    with open(tmp_path / "coupled.yaml") as f:
        config = yaml.safe_load(f)
    config["experiment_dir"] = str(tmp_path / "finetune")
    config.pop("n_coupled_steps")
    config["stepper_training"] = {
        "n_coupled_steps": 2,
        "atmosphere": {
            "parameter_init": {
                "weights_path": atmos_ckpt,
                "parameters": [{"frozen": {"include": ["*"]}}],
            },
            "n_steps": 0,
            "loss": {"type": "MSE"},
        },
        "ocean": {
            "parameter_init": {"weights_path": ocean_ckpt},
            "loss": {"type": "MSE"},
            "loss_weight": 1.0,
        },
    }
    config["validation_loader"] = config["train_loader"]
    config_path = tmp_path / "finetune.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.coupled.train import main
    from ace_tpu.stepper.checkpoint import load_stepper

    base_atmos = load_stepper(atmos_ckpt).params
    base_ocean = load_stepper(ocean_ckpt).params
    main([str(config_path)])

    ft_dir = os.path.join(str(tmp_path / "finetune"),
                          "training_checkpoints")
    new_atmos = load_stepper(
        os.path.join(ft_dir, "atmosphere_ckpt.msgpack")
    ).params
    new_ocean = load_stepper(
        os.path.join(ft_dir, "ocean_ckpt.msgpack")
    ).params

    import jax

    def flat(t):
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(t)[0]
        }

    fa, fb = flat(new_atmos), flat(base_atmos)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"frozen {k}")
    oa, ob = flat(new_ocean), flat(base_ocean)
    assert any(not np.array_equal(oa[k], ob[k]) for k in oa), (
        "ocean weights should train"
    )
    # EMA variants of both components were written
    assert os.path.exists(
        os.path.join(ft_dir, "ocean_ema_ckpt.msgpack")
    )
    # validation loss was recorded
    import json

    with open(os.path.join(str(tmp_path / "finetune"),
                           "metrics.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert any("val_loss" in rec for rec in lines)
