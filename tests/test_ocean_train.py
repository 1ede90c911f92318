"""Ocean end-to-end scenario: train Samudra on NaN-masked ocean data
with input masking + ocean corrector through the train CLI, then run the
standalone evaluator on the resulting checkpoint.

Reference: fme/ace/test_ocean_train.py (save_ocean_nd_netcdf synthetic
data :23, _TRAIN_CONFIG_TEMPLATE :215, test_train_and_inference :512).
"""

import os

import numpy as np
import pytest
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord

NLAT, NLON, NZ = 16, 32, 2

IN_NAMES = [
    "thetao_0", "thetao_1", "sst", "hfgeou",
    "sea_surface_fraction", "sea_ice_fraction", "land_fraction",
]
OUT_NAMES = [
    "thetao_0", "thetao_1", "sst", "sea_ice_fraction", "hfds_total_area",
]


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def _save_ocean_dataset(path, n_time=10, timestep_seconds=86400):
    """NaN-masked synthetic ocean dataset with per-level masks, interface
    depths, and sea-floor depth (reference: test_ocean_train.py:23
    save_ocean_nd_netcdf)."""
    rng = np.random.RandomState(0)
    lat = np.linspace(-80.0, 80.0, NLAT)
    lon = np.linspace(0.0, 360.0 - 360.0 / NLON, NLON)
    time = TimeCoord.from_range(
        "2000-01-01T00:00", n_time, timestep_seconds
    )
    # nested wet masks: level 1 wet points are a subset of level 0's
    mask0 = np.ones((NLAT, NLON), np.float32)
    mask0[1, 1] = 0.0  # small island
    mask0[:3, :] = 0.0  # polar land band
    mask1 = mask0 * rng.randint(0, 2, (NLAT, NLON)).astype(np.float32)
    idepth = np.linspace(0.0, 1000.0, NZ + 1)
    deptho = np.where(
        mask0 > 0,
        rng.uniform(idepth[-2], idepth[-1], (NLAT, NLON)),
        np.nan,
    ).astype(np.float32)

    def masked(field, mask):
        return np.where(mask[None] > 0, field, np.nan).astype(np.float32)

    shape = (n_time, NLAT, NLON)
    data = {
        "thetao_0": masked(12.85 + 0.5 * rng.randn(*shape), mask0),
        "thetao_1": masked(9.85 + 0.5 * rng.randn(*shape), mask1),
        "sst": masked(286.5 + 0.3 * rng.randn(*shape), mask0),
        "sea_ice_fraction": masked(
            rng.uniform(0.0, 0.2, shape), mask0
        ) * mask0[None],
        "sea_surface_fraction": np.broadcast_to(
            mask0[None], shape
        ).astype(np.float32).copy(),
        "land_fraction": np.broadcast_to(
            1.0 - mask0[None], shape
        ).astype(np.float32).copy(),
        "hfgeou": (0.1 * np.ones(shape, np.float32)) * mask0[None],
        "hfds_total_area": masked(
            4.0 + 0.5 * rng.randn(*shape), mask0
        ) * mask0[None],
        "mask_0": mask0,
        "mask_1": mask1,
        "mask_2d": mask0.copy(),
        "deptho": deptho,
    }
    dims = {k: ("time", "lat", "lon") for k in data}
    for k in ("mask_0", "mask_1", "mask_2d", "deptho"):
        dims[k] = ("lat", "lon")
    for i in range(NZ + 1):
        data[f"idepth_{i}"] = np.float32(idepth[i])
        dims[f"idepth_{i}"] = ()
    write_h5(
        str(path), data, dims,
        coords={"lat": lat, "lon": lon},
        attrs={k: {"units": "m", "long_name": k} for k in data},
        time=time,
    )


def _save_stats(mean_path, std_path):
    names = sorted(set(IN_NAMES + OUT_NAMES))
    means = {
        n: np.float32({"sst": 286.0}.get(
            n, 285.0 if n.startswith("thetao") else
            0.5 if "fraction" in n else 1.0
        ))
        for n in names
    }
    stds = {
        n: np.float32(
            2.0 if (n.startswith("thetao") or n == "sst")
            else 0.2 if "fraction" in n else 1.0
        )
        for n in names
    }
    for path, stats in ((mean_path, means), (std_path, stds)):
        write_h5(str(path), {k: np.asarray(v) for k, v in stats.items()},
                 dims={k: () for k in stats})


@pytest.fixture(scope="module")
def ocean_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ocean")
    data_dir = root / "data"
    data_dir.mkdir()
    _save_ocean_dataset(data_dir / "data.nc")
    _save_stats(root / "stats-mean.nc", root / "stats-std.nc")
    return root


def _train_config(root):
    return {
        "experiment_dir": str(root / "results"),
        "max_epochs": 1,
        "save_checkpoint": True,
        "save_per_epoch_diagnostics": True,
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
        "stepper_training": {"n_forward_steps": 2,
                             "loss": {"type": "MSE"}},
        "stepper": {
            "input_masking": {"mask_value": 0, "fill_value": 0.0},
            "step": {
                "type": "single_module",
                "config": {
                    "builder": {
                        "type": "Samudra",
                        "config": {
                            "ch_width": [8, 12],
                            "dilation": [1, 2],
                            "n_layers": [1, 1],
                            "norm": "layer",
                        },
                    },
                    "in_names": IN_NAMES,
                    "out_names": OUT_NAMES,
                    "normalization": {"network": {
                        "global_means_path": str(root / "stats-mean.nc"),
                        "global_stds_path": str(root / "stats-std.nc"),
                    }},
                    "corrector": {
                        "type": "ocean_corrector",
                        "config": {
                            "sea_ice_fraction_correction": {
                                "sea_ice_fraction_name":
                                    "sea_ice_fraction",
                                "land_fraction_name": "land_fraction",
                            },
                            "ocean_heat_content_correction": {
                                "method": "scaled_temperature",
                                "constant_unaccounted_heating": 0.1,
                            },
                        },
                    },
                },
            },
        },
        "inference": {
            "loader": {
                "dataset": {"data_path": str(root / "data")},
                "start_indices": {"list": [0, 1]},
            },
            "n_forward_steps": 4,
            "forward_steps_in_memory": 2,
            "aggregator": {"log_step_means": [], "log_spectra": False},
        },
    }


@pytest.mark.slow
def test_ocean_train_and_evaluate(ocean_setup):
    """Train → per-epoch diagnostics → standalone evaluator round trip
    on NaN-masked ocean data (reference: test_ocean_train.py:512
    test_train_and_inference)."""
    root = ocean_setup
    cfg = _train_config(root)
    config_path = root / "train.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.train.train import main as train_main

    trainer = train_main([str(config_path)])
    assert np.isfinite(trainer.best_validation_loss)
    results = root / "results"

    # per-epoch validation diagnostics: scalar means are NaN-free;
    # snapshot/mean maps carry NaN in masked regions and data elsewhere
    val_dir = results / "output" / "val" / "epoch_0001"
    assert val_dir.exists()
    for name, kind in (("mean", "scalar"), ("snapshot", "map"),
                       ("mean_map", "map")):
        f_diag = val_dir / f"{name}_diagnostics.nc"
        assert f_diag.exists(), f_diag
        ds = open_file_dataset(str(f_diag))
        keys = [k for k in ds.keys() if k not in ("lat", "lon")]
        assert keys
        for var in keys:
            vals = np.asarray(ds[var].read(()))
            if kind == "scalar":
                assert not np.isnan(vals).any(), var
            else:
                assert not np.isnan(vals).all(), var
                assert np.isnan(vals).any(), var

    # inline-inference per-epoch diagnostics exist (time_mean maps are
    # NaN in masked regions only)
    inf_dir = results / "output" / "inference" / "epoch_0001"
    assert inf_dir.exists()
    tm = open_file_dataset(str(inf_dir / "time_mean_diagnostics.nc"))
    gen_keys = [k for k in tm.keys() if k.startswith("gen_map-")]
    assert gen_keys
    for k in gen_keys:
        vals = np.asarray(tm[k].read(()))
        assert not np.isnan(vals).all(), k
        assert np.isnan(vals).any(), k
    assert (inf_dir / "mean_norm_diagnostics.nc").exists()

    # standalone evaluator on the best checkpoint with NaN-filled loader
    eval_cfg = {
        "experiment_dir": str(root / "eval_out"),
        "checkpoint_path": str(
            results / "training_checkpoints" / "best_ckpt.msgpack"
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
    for var in ("sst", "thetao_0", "thetao_1"):
        key = f"time_mean/rmse/{var}"
        assert key in logs and np.isfinite(logs[key]), key

    # predictions: masked regions are NaN, wet regions have data, and
    # the ocean derived variable is present
    preds = open_file_dataset(
        os.path.join(str(root / "eval_out"),
                     "autoregressive_predictions.nc")
    )
    for name in ("sst", "thetao_0", "thetao_1", "ocean_heat_content"):
        assert name in preds.keys(), name
        arr = np.asarray(preds[name].read(()))
        assert not np.isnan(arr).all(), name
        assert np.isnan(arr).any(), name
