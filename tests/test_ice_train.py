"""Sea-ice end-to-end scenario: train FloeNet on NaN-masked ice data
with input masking + ice budget corrector through the train CLI, then
run the standalone evaluator on the checkpoint.

Reference: fme/ace/test_ice_train.py (save_ice_nd_netcdf :23,
_TRAIN_CONFIG_TEMPLATE :150, test_train_and_inference).
"""

import os

import numpy as np
import pytest
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord

NLAT, NLON = 12, 24
NAMES = ["siconc", "LSRCc", "LSNKc", "XPRTc"]


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def _save_ice_dataset(path, n_time=10, timestep_seconds=86400):
    rng = np.random.RandomState(0)
    lat = np.linspace(-80.0, 80.0, NLAT)
    lon = np.linspace(0.0, 360.0 - 360.0 / NLON, NLON)
    time = TimeCoord.from_range(
        "2000-01-01T00:00", n_time, timestep_seconds
    )
    mask = np.ones((NLAT, NLON), np.float32)
    mask[1, 1] = 0.0
    mask[:2, :] = 0.0

    def masked(field):
        return np.where(mask[None] > 0, field, np.nan).astype(np.float32)

    shape = (n_time, NLAT, NLON)
    data = {
        "siconc": masked(rng.uniform(0.0, 1.0, shape)),
        "LSRCc": masked(1e-6 * rng.rand(*shape)),
        "LSNKc": masked(-1e-6 * rng.rand(*shape)),
        "XPRTc": masked(1e-7 * rng.randn(*shape)),
        "mask_2d": mask,
    }
    dims = {k: ("time", "lat", "lon") for k in data}
    dims["mask_2d"] = ("lat", "lon")
    write_h5(
        str(path), data, dims,
        coords={"lat": lat, "lon": lon},
        attrs={k: {"units": "1", "long_name": k} for k in data},
        time=time,
    )


def _save_stats(mean_path, std_path):
    means = {"siconc": 0.5, "LSRCc": 0.0, "LSNKc": 0.0, "XPRTc": 0.0}
    stds = {"siconc": 0.3, "LSRCc": 1e-6, "LSNKc": 1e-6, "XPRTc": 1e-7}
    for path, stats in ((mean_path, means), (std_path, stds)):
        write_h5(
            str(path),
            {k: np.asarray(np.float32(v)) for k, v in stats.items()},
            dims={k: () for k in stats},
        )


@pytest.mark.slow
def test_ice_train_and_evaluate(tmp_path):
    """Train → evaluator round trip on NaN-masked sea-ice data
    (reference: fme/ace/test_ice_train.py test_train_and_inference)."""
    root = tmp_path
    (root / "data").mkdir()
    _save_ice_dataset(root / "data" / "data.nc")
    _save_stats(root / "stats-mean.nc", root / "stats-std.nc")

    cfg = {
        "experiment_dir": str(root / "results"),
        "max_epochs": 1,
        "save_checkpoint": True,
        "seed": 0,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(root / "data")},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "validation_loader": {
            "dataset": {"data_path": str(root / "data")},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "optimization": {"lr": 1e-3, "optimizer_type": "AdamW"},
        "stepper_training": {"n_forward_steps": 1,
                             "loss": {"type": "MSE"}},
        "stepper": {
            "input_masking": {"mask_value": 0, "fill_value": 0.0},
            "step": {
                "type": "single_module",
                "config": {
                    "builder": {
                        "type": "FloeNet",
                        "config": {
                            "latent_dimension": 4,
                            "activation": "SiLU",
                            "meshes": 3,
                            "M0": 4,
                            "bias": True,
                            "radius_fraction": 1,
                            "layernorm": True,
                            "processor_steps": 1,
                            "residual": True,
                        },
                    },
                    "in_names": NAMES,
                    "out_names": NAMES,
                    "normalization": {"network": {
                        "global_means_path": str(root / "stats-mean.nc"),
                        "global_stds_path": str(root / "stats-std.nc"),
                    }},
                    "corrector": {
                        "type": "ice_corrector",
                        "config": {
                            "budget_correction": {
                                "corrected_variables": {
                                    "siconc": [
                                        "LSRCc", "LSNKc", "XPRTc"
                                    ],
                                },
                            },
                        },
                    },
                },
            },
        },
    }
    config_path = root / "train.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.train.train import main as train_main

    trainer = train_main([str(config_path)])
    assert np.isfinite(trainer.best_validation_loss)

    eval_cfg = {
        "experiment_dir": str(root / "eval_out"),
        "checkpoint_path": str(
            root / "results" / "training_checkpoints" /
            "best_ckpt.msgpack"
        ),
        "n_forward_steps": 4,
        "forward_steps_in_memory": 2,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "loader": {
            "dataset": {"data_path": str(root / "data"),
                        "fill_nans": 0.0},
            "start_indices": {"list": [0, 1]},
        },
        "aggregator": {"log_step_means": [], "log_spectra": False},
    }
    eval_path = root / "eval.yaml"
    with open(eval_path, "w") as f:
        yaml.safe_dump(eval_cfg, f)

    from ace_tpu.inference.evaluator import main as evaluator_main

    summary = evaluator_main([str(eval_path)])
    logs = summary["logs"]
    assert np.isfinite(logs["time_mean/rmse/siconc"])

    preds = open_file_dataset(
        os.path.join(str(root / "eval_out"),
                     "autoregressive_predictions.nc")
    )
    for name in NAMES:
        arr = np.asarray(preds[name].read(()))
        # masked regions are NaN; wet regions carry data
        assert not np.isnan(arr).all(), name
        assert np.isnan(arr).any(), name
