"""End-to-end inference/evaluator integration tests: train a tiny model,
checkpoint it, run the inference and evaluator entry points over synthetic
forcing data, verify outputs/diagnostics/restart files
(reference model: fme/ace/inference/test_inference.py, test_evaluator.py).
"""

import os

import numpy as np
import pytest
import yaml

from ace_tpu.testing import SyntheticData
from tests.test_train_integration import ALL_NAMES, _config

N_FORWARD = 6


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trained")
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=12)
    cfg = _config(tmp_path, data, max_epochs=1)
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from ace_tpu.train.train import main

    main([str(config_path)])
    ckpt = os.path.join(
        cfg["experiment_dir"], "training_checkpoints", "ckpt.msgpack"
    )
    return tmp_path, data, ckpt


@pytest.mark.medium_duration
def test_inference_entry(trained, tmp_path):
    tmp_trained, data, ckpt = trained
    out_dir = str(tmp_path / "inference")
    config = {
        "experiment_dir": out_dir,
        "checkpoint_path": ckpt,
        "n_forward_steps": N_FORWARD,
        "forward_steps_in_memory": 2,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "forcing_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "start_indices": {"list": [0, 1]},
        },
    }
    config_path = tmp_path / "inf.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.inference.inference import main

    summary = main([str(config_path)])
    assert summary["total_steps"] == N_FORWARD * 2
    assert summary["total_steps_per_second"] > 0
    # outputs written with full time axis
    from ace_tpu.data.store import open_file_dataset

    ds = open_file_dataset(
        os.path.join(out_dir, "autoregressive_predictions.nc")
    )
    assert ds["prog_a"].shape == (2, N_FORWARD, 8, 16)
    assert np.isfinite(ds["prog_a"].read(())).all()
    # restart + diagnostics exist
    assert os.path.exists(os.path.join(out_dir, "restart.nc"))
    assert os.path.exists(
        os.path.join(out_dir, "diagnostics", "time_mean_diagnostics.nc")
    )
    # windows stream continuously: times strictly increasing
    t = ds["time"].read(())
    assert (np.diff(t, axis=1) > 0).all()


@pytest.mark.medium_duration
def test_inference_windowing_invariance(trained, tmp_path):
    """Rollout results must not depend on forward_steps_in_memory."""
    tmp_trained, data, ckpt = trained
    results = {}
    for fsm in (2, 3, 6):
        out_dir = str(tmp_path / f"inf_{fsm}")
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": N_FORWARD,
            "forward_steps_in_memory": fsm,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "forcing_loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0]},
            },
        }
        config_path = tmp_path / f"inf_{fsm}.yaml"
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f)
        from ace_tpu.inference.inference import main

        main([str(config_path)])
        from ace_tpu.data.store import open_file_dataset

        ds = open_file_dataset(
            os.path.join(out_dir, "autoregressive_predictions.nc")
        )
        results[fsm] = ds["prog_a"].read(())
    np.testing.assert_allclose(results[2], results[6], atol=1e-5)
    np.testing.assert_allclose(results[3], results[6], atol=1e-5)


def test_inference_pipeline_matches_synchronous(trained, tmp_path,
                                                monkeypatch):
    """The double-buffered loop (host work for window N-1 overlapped with
    window N's rollout) must be bit-identical to the fully synchronous
    ordering (ace_tpu/inference/loop.py pipeline flag)."""
    tmp_trained, data, ckpt = trained
    results = {}
    for tag, pipeline_env in (("sync", "0"), ("pipelined", "1")):
        monkeypatch.setenv("ACE_TPU_INFERENCE_PIPELINE", pipeline_env)
        out_dir = str(tmp_path / f"inf_{tag}")
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": N_FORWARD,
            "forward_steps_in_memory": 2,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "forcing_loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0, 1]},
            },
        }
        config_path = tmp_path / f"inf_{tag}.yaml"
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f)
        from ace_tpu.inference.inference import main

        main([str(config_path)])
        from ace_tpu.data.store import open_file_dataset

        ds = open_file_dataset(
            os.path.join(out_dir, "autoregressive_predictions.nc")
        )
        results[tag] = {
            k: ds[k].read(()) for k in ("prog_a", "diag_d", "time")
        }
        # diagnostics (aggregator output) must match too
        diag = open_file_dataset(os.path.join(
            out_dir, "diagnostics", "time_mean_diagnostics.nc"
        ))
        results[tag]["time_mean"] = {
            k: diag[k].read(()) for k in diag.keys()
        }
    for k in results["sync"]:
        if k == "time_mean":
            continue
        np.testing.assert_array_equal(
            results["sync"][k], results["pipelined"][k], err_msg=k
        )
    for k in results["sync"]["time_mean"]:
        np.testing.assert_allclose(
            results["sync"]["time_mean"][k],
            results["pipelined"]["time_mean"][k],
            atol=0, rtol=0, err_msg=f"time_mean/{k}",
        )


def test_evaluator_entry(trained, tmp_path):
    tmp_trained, data, ckpt = trained
    out_dir = str(tmp_path / "evaluator")
    config = {
        "experiment_dir": out_dir,
        "checkpoint_path": ckpt,
        "n_forward_steps": 4,
        "forward_steps_in_memory": 2,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "start_indices": {
                "n_initial_conditions": 2, "first": 0, "interval": 2,
            },
        },
        "data_writer": {"save_prediction_files": False},
    }
    config_path = tmp_path / "eval.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.inference.evaluator import main

    summary = main([str(config_path)])
    logs = summary["logs"]
    # paired metrics exist for variables present in the target dataset
    rmse_keys = [k for k in logs if k.startswith("time_mean/rmse/")]
    assert rmse_keys, logs.keys()
    assert all(np.isfinite(logs[k]) for k in rmse_keys)
    assert any(k.startswith("spectrum/") for k in logs)


def test_validate_config_entry(trained, tmp_path):
    tmp_trained, data, ckpt = trained
    config = {
        "experiment_dir": str(tmp_path / "x"),
        "checkpoint_path": ckpt,
        "n_forward_steps": 2,
        "forcing_loader": {"dataset": {"data_path": str(data.data_dir)}},
    }
    config_path = tmp_path / "inf.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    from ace_tpu.validate_config import main

    main([str(config_path), "--config_type", "inference"])
    # invalid config raises
    config["bogus_key"] = 1
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    import pytest as _pytest

    from ace_tpu.core.config import ConfigError

    with _pytest.raises(ConfigError):
        main([str(config_path), "--config_type", "inference"])


@pytest.mark.medium_duration
def test_segmented_inference_matches_single_run(trained, tmp_path):
    """N chained segments via restart.nc must reproduce one long rollout
    (reference model: fme/ace/inference/test_segmented.py).
    """
    tmp_trained, data, ckpt = trained

    def run(out_dir, n_steps, segments=None):
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": n_steps,
            "forward_steps_in_memory": 2,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "forcing_loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0]},
            },
        }
        config_path = tmp_path / "seg.yaml"
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f)
        from ace_tpu.inference.inference import main

        argv = [str(config_path)]
        if segments:
            argv += ["--segments", str(segments)]
        main(argv)

    run(str(tmp_path / "single"), 6)
    run(str(tmp_path / "segmented"), 3, segments=2)

    from ace_tpu.data.store import open_file_dataset

    single = open_file_dataset(
        os.path.join(
            str(tmp_path / "single"), "autoregressive_predictions.nc"
        )
    )["prog_a"].read(())
    seg_parts = [
        open_file_dataset(
            os.path.join(
                str(tmp_path / "segmented"), f"segment_{i:04d}",
                "autoregressive_predictions.nc",
            )
        )["prog_a"].read(())
        for i in range(2)
    ]
    segmented = np.concatenate(seg_parts, axis=1)
    np.testing.assert_allclose(segmented, single, atol=1e-5)


def test_dataset_comparison(tmp_path):
    """(reference: fme/ace/inference/loop.py:29 run_dataset_comparison)."""
    from ace_tpu.core.config import from_dict
    from ace_tpu.inference.evaluator import (
        DatasetComparisonConfig,
        run_dataset_comparison,
    )
    from ace_tpu.testing import SyntheticData

    pred = SyntheticData(tmp_path / "pred", ["t2m"], n_time=8)
    tgt = SyntheticData(tmp_path / "tgt", ["t2m"], n_time=8)
    cfg = from_dict(DatasetComparisonConfig, {
        "experiment_dir": str(tmp_path / "out"),
        "n_forward_steps": 4,
        "forward_steps_in_memory": 2,
        "variable_names": ["t2m"],
        "prediction_loader": {
            "dataset": {"data_path": str(pred.data_dir)},
            "start_indices": {"list": [0]},
        },
        "target_loader": {
            "dataset": {"data_path": str(tgt.data_dir)},
            "start_indices": {"list": [0]},
        },
        "logging": {"log_to_screen": False, "log_to_file": False},
    })
    result = run_dataset_comparison(cfg)
    assert result["n_windows"] == 2
    assert any(
        k.startswith("time_mean/rmse") for k in result["logs"]
    )


@pytest.mark.medium_duration
def test_inference_entry_mesh_matches_single_device(trained, tmp_path):
    """The inference CLI on a (2, 2, 2) virtual mesh (data-parallel ICs +
    spatial lat/lon decomposition with the all-to-all distributed SHT)
    reproduces the single-device rollout (reference: inference under
    Distributed with per-rank batch scatter,
    fme/ace/data_loading/gridded_data.py:76-80)."""
    tmp_trained, data, ckpt = trained
    from ace_tpu.data.store import open_file_dataset
    from ace_tpu.inference.inference import main

    results = {}
    for tag, mesh in (("single", None),
                      ("mesh", {"data_parallel": 2, "h": 2, "w": 2})):
        out_dir = str(tmp_path / f"inf_{tag}")
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": N_FORWARD,
            "forward_steps_in_memory": 2,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "forcing_loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0, 1]},
            },
        }
        if mesh is not None:
            config["mesh"] = mesh
        config_path = tmp_path / f"inf_{tag}.yaml"
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f)
        summary = main([str(config_path)])
        assert summary["total_steps"] == N_FORWARD * 2
        ds = open_file_dataset(
            os.path.join(out_dir, "autoregressive_predictions.nc")
        )
        results[tag] = ds["prog_a"].read(())
    np.testing.assert_allclose(
        results["mesh"], results["single"], atol=5e-4
    )


@pytest.mark.medium_duration
def test_evaluator_entry_mesh(trained, tmp_path):
    """Evaluator CLI under a (1, 2, 2) spatial mesh produces the same
    paired metrics as single-device."""
    tmp_trained, data, ckpt = trained
    from ace_tpu.inference.evaluator import main

    logs = {}
    for tag, mesh in (("single", None), ("mesh", {"h": 2, "w": 2})):
        out_dir = str(tmp_path / f"eval_{tag}")
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": 4,
            "forward_steps_in_memory": 2,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "loader": {
                "dataset": {"data_path": str(data.data_dir)},
                "start_indices": {"list": [0, 1]},
            },
        }
        if mesh is not None:
            config["mesh"] = mesh
        config_path = tmp_path / f"eval_{tag}.yaml"
        with open(config_path, "w") as f:
            yaml.safe_dump(config, f)
        summary = main([str(config_path)])
        logs[tag] = summary["logs"]
    for key, v in logs["single"].items():
        if not isinstance(v, (int, float, np.floating)):
            continue
        got = logs["mesh"].get(key)
        if got is None or not np.isfinite(v):
            continue
        np.testing.assert_allclose(got, v, rtol=1e-3, atol=1e-4,
                                   err_msg=key)


@pytest.mark.medium_duration
def test_inference_ensemble_per_ic(trained, tmp_path):
    """n_ensemble_per_ic > 1 tiles ICs member-major, differentiates
    members through the stochastic noise stream, and aggregates
    spread/skill/CRPS (reference: fme/ace/inference/inference.py:296,
    aggregator/inference/main.py:102,343)."""
    import jax
    import yaml as _yaml

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.checkpoint import save_train_checkpoint
    from ace_tpu.stepper.stepper import StepperConfig

    tmp_trained, data, _ = trained
    # a stochastic stepper checkpoint (no training needed: random init)
    step_cfg = from_dict(SingleModuleStepConfig, {
        "builder": {
            "type": "NoiseConditionedSFNO",
            "config": {
                "embed_dim": 8, "noise_embed_dim": 4, "num_layers": 1,
                "noise_type": "gaussian", "data_grid": "equiangular",
            },
        },
        "in_names": ["prog_a", "forcing_c"],
        "out_names": ["prog_a"],
        "normalization": {"network": {
            "global_means_path": str(data.mean_path),
            "global_stds_path": str(data.std_path),
        }},
    })
    stepper_config = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    )
    from ace_tpu.data.dataset import XarrayDataConfig

    info = XarrayDataConfig(data_path=str(data.data_dir)).build().dataset_info
    stepper = stepper_config.get_stepper(info)
    stepper.init_params(jax.random.PRNGKey(0))

    # the noise-conditioning weights are zero-initialized (identity
    # conditioning), so an untrained model is exactly deterministic;
    # perturb them so ensemble members actually diverge
    def perturb(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "w_scale_2d" in name or "w_bias_2d" in name:
            return leaf + 0.3 * jax.random.normal(
                jax.random.PRNGKey(hash(name) % 2**31), leaf.shape
            )
        return leaf

    stepper.params = jax.tree_util.tree_map_with_path(
        perturb, stepper.params
    )
    ckpt = str(tmp_path / "stochastic.msgpack")
    save_train_checkpoint(ckpt, stepper, stepper_config)

    out_dir = str(tmp_path / "ens")
    config = {
        "experiment_dir": out_dir,
        "checkpoint_path": ckpt,
        "n_forward_steps": 4,
        "forward_steps_in_memory": 2,
        "n_ensemble_per_ic": 3,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "start_indices": {"list": [0, 1]},
        },
    }
    config_path = tmp_path / "ens.yaml"
    with open(config_path, "w") as f:
        _yaml.safe_dump(config, f)
    from ace_tpu.inference.evaluator import main

    summary = main([str(config_path)])
    logs = summary["logs"]
    # members differ -> nonzero spread; CRPS and spread/skill logged
    assert logs["ensemble/spread/prog_a"] > 0
    assert "ensemble/crps/prog_a" in logs
    assert "ensemble/spread_skill_ratio/prog_a" in logs
    # outputs carry n_ic * n_ensemble samples
    from ace_tpu.data.store import open_file_dataset

    ds = open_file_dataset(
        os.path.join(out_dir, "autoregressive_predictions.nc")
    )
    assert ds["prog_a"].shape[0] == 6
    arr = ds["prog_a"].read(())
    # two members of the same IC differ at the end of the rollout
    assert not np.allclose(arr[0, -1], arr[1, -1])


@pytest.mark.medium_duration
def test_inference_external_initial_condition(trained, tmp_path):
    """initial_condition seeds ICs from an external dataset with time
    selection; forcing windows align to the IC times (reference:
    fme/ace/inference/inference.py:63 InitialConditionConfig +
    :195-216 forcing start-index derivation)."""
    import glob

    tmp_trained, data, ckpt = trained
    ic_file = sorted(glob.glob(str(data.data_dir / "*.nc")))[0]
    from ace_tpu.data.store import open_file_dataset
    from ace_tpu.inference.inference import main

    # the timestamps of indices 0 and 2 in the dataset
    t = open_file_dataset(ic_file).read_time("time")
    comp = t.components()
    stamps = []
    for i in (0, 2):
        stamps.append(
            "%04d-%02d-%02dT%02d:00:00" % (
                comp["year"].reshape(-1)[i],
                comp["month"].reshape(-1)[i],
                comp["day"].reshape(-1)[i],
                comp["hour"].reshape(-1)[i],
            )
        )

    def run(tag, extra):
        out_dir = str(tmp_path / tag)
        config = {
            "experiment_dir": out_dir,
            "checkpoint_path": ckpt,
            "n_forward_steps": 4,
            "forward_steps_in_memory": 2,
            "logging": {"log_to_screen": False, "log_to_file": False},
            "forcing_loader": {
                "dataset": {"data_path": str(data.data_dir)},
            },
            **extra,
        }
        path = tmp_path / f"{tag}.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(config, f)
        main([str(path)])
        return open_file_dataset(
            os.path.join(out_dir, "autoregressive_predictions.nc")
        )["prog_a"].read(())

    got = run("external_ic", {"initial_condition": {
        "path": ic_file,
        "start_indices": {"times": stamps},
    }})
    want = run("indices", {"forcing_loader": {
        "dataset": {"data_path": str(data.data_dir)},
        "start_indices": {"list": [0, 2]},
    }})
    assert got.shape[0] == 2
    np.testing.assert_allclose(got, want, rtol=1e-6)
