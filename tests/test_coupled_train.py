"""Coupled training entry integration test (reference model:
fme/coupled/test_train.py — YAML -> main() round trip on synthetic data).
"""

import os

import numpy as np
import yaml

from ace_tpu.testing import SyntheticData


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
