"""HEALPix reorder + SHT tests, validated against the reference's
earth2grid tables and cuhpx torch implementation as oracles
(reference: fme/core/hpx/test_reorder.py, fme/core/cuhpx/test_sht.py).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ace_tpu.ops.hpx import (
    HealpixISHT,
    HealpixSHT,
    ring_to_xy_indices,
    xy_to_ring_indices,
)

REF_DATA = "/root/reference/fme/core/hpx/data"
REF_CUHPX = "/root/reference/fme/core/cuhpx"


@pytest.mark.parametrize("nside", [1, 2, 4, 8, 16, 32])
def test_ring_to_xy_matches_earth2grid_tables(nside):
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference tables unavailable")
    ref = np.load(os.path.join(REF_DATA, f"reorder_xyf2pix_{nside:05d}.npy"))
    np.testing.assert_array_equal(ring_to_xy_indices(nside), ref.ravel())


def test_reorder_round_trip():
    for nside in (1, 2, 8):
        r2x = ring_to_xy_indices(nside)
        x2r = xy_to_ring_indices(nside)
        np.testing.assert_array_equal(
            x2r[r2x], np.arange(12 * nside * nside)
        )


def test_reorder_2x2_figure():
    # values from the earth2grid healpix tutorial figure
    # (reference: fme/core/hpx/test_reorder.py:28)
    reorder = ring_to_xy_indices(2).reshape(12, 2, 2)
    np.testing.assert_array_equal(reorder[0], [[0, 5], [4, 13]])
    np.testing.assert_array_equal(reorder[6], [[16, 24], [23, 32]])
    np.testing.assert_array_equal(reorder[11], [[35, 43], [42, 47]])


def _load_cuhpx():
    if not os.path.isdir(REF_CUHPX):
        pytest.skip("reference cuhpx unavailable")
    import torch

    for name, path in [("fme", None), ("fme.core", None)]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            sys.modules[name] = mod
    dev = types.ModuleType("fme.core.device")
    dev.get_device = lambda: torch.device("cpu")
    sys.modules["fme.core.device"] = dev
    cu = types.ModuleType("fme.core.cuhpx")
    cu.__path__ = [REF_CUHPX]
    sys.modules["fme.core.cuhpx"] = cu

    def load(modname, path):
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    load("fme.core.cuhpx.tools", os.path.join(REF_CUHPX, "tools.py"))
    return load("fme.core.cuhpx.sht", os.path.join(REF_CUHPX, "sht.py"))


def test_healpix_sht_matches_reference_oracle():
    import torch

    sht_mod = _load_cuhpx()
    nside, lmax, mmax = 8, 16, 16
    ref_sht = sht_mod.SHT(nside, lmax=lmax, mmax=mmax,
                          quad_weights="pixel")
    ref_isht = sht_mod.iSHT(nside, lmax=lmax, mmax=mmax)
    rng = np.random.RandomState(0)
    x = rng.randn(12 * nside * nside).astype(np.float32)
    with torch.no_grad():
        ref_coeffs = ref_sht(torch.from_numpy(x))
        ref_back = ref_isht(ref_coeffs.clone())

    mine = HealpixSHT(nside, lmax=lmax, mmax=mmax)
    mine_inv = HealpixISHT(nside, lmax=lmax, mmax=mmax)
    my_coeffs = mine(jnp.asarray(x)[:, None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(my_coeffs), ref_coeffs.numpy(), atol=1e-5
    )
    my_back = mine_inv(
        jnp.asarray(np.asarray(my_coeffs))[:, :, None]
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(my_back), ref_back.numpy(), atol=1e-5
    )


def test_healpix_sht_bandlimited_roundtrip():
    # synthesize from random coefficients, transform back and forth:
    # low-degree content must survive the roundtrip
    nside = 16
    lmax = mmax = 8
    isht = HealpixISHT(nside, lmax=lmax, mmax=mmax)
    sht = HealpixSHT(nside, lmax=lmax, mmax=mmax)
    rng = np.random.RandomState(0)
    real = np.tril(rng.randn(lmax, mmax))
    imag = np.tril(rng.randn(lmax, mmax), -1)
    imag[:, 0] = 0.0  # m=0 coefficients of a real field are real
    coeffs = jnp.asarray(real + 1j * imag)[..., None]
    f = isht(coeffs)
    coeffs2 = sht(f)
    # HEALPix quadrature is approximate; low-l modes are recovered well
    err = np.abs(np.asarray(coeffs2 - coeffs))[:4, :4]
    scale = np.abs(np.asarray(coeffs))[:4, :4].max()
    assert err.max() < 0.15 * scale


def test_healpix_dataset_loading(tmp_path):
    """A dataset on (face, height, width) dims loads with HEALPix
    coordinates and static x/y/z derived from pixel centers."""
    from ace_tpu.data.store import write_h5
    from ace_tpu.data.dataset import XarrayDataConfig
    from ace_tpu.data.time import TimeCoord

    nside = 4
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    time = TimeCoord.from_range("2000-01-01T00:00", 4, 21600)
    write_h5(
        str(data_dir / "d.nc"),
        {
            "ta": rng.randn(4, 12, nside, nside).astype(np.float32),
            "face": np.arange(12).astype(np.float64),
            "height": np.arange(nside).astype(np.float64),
            "width": np.arange(nside).astype(np.float64),
        },
        {
            "ta": ("time", "face", "height", "width"),
            "face": ("face",), "height": ("height",),
            "width": ("width",),
        },
        time=time,
    )
    ds = XarrayDataConfig(data_path=str(data_dir)).build()
    from ace_tpu.core.coordinates import HEALPixCoordinates

    assert isinstance(ds.horizontal_coordinates, HEALPixCoordinates)
    assert ds.horizontal_coordinates.shape == (12, nside, nside)
    window, t = ds.get_window(0, 2, ["ta", "z"])
    assert window["ta"].shape == (2, 12, nside, nside)
    assert window["z"].shape == (2, 12, nside, nside)
    # z = sin(lat): poles fall inside polar faces
    assert abs(window["z"]).max() <= 1.0
    # dataset_info round-trips through serialization
    from ace_tpu.core.dataset_info import DatasetInfo

    info2 = DatasetInfo.from_state(ds.dataset_info.get_state())
    assert info2.horizontal_coordinates == ds.horizontal_coordinates


@pytest.mark.medium_duration
def test_healpix_unet_trains_end_to_end(tmp_path):
    """HEALPix dataset -> loader -> HEALPixUNet -> train step, on
    (face, height, width) data."""
    import yaml

    from ace_tpu.data.store import write_h5
    from ace_tpu.data.time import TimeCoord
    from ace_tpu.testing import save_stats_files

    nside = 8
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    n_time = 8
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    fields = {"prog": None, "forc": None}
    arrays = {
        name: rng.randn(n_time, 12, nside, nside).astype(np.float32)
        for name in fields
    }
    arrays.update({
        "face": np.arange(12).astype(np.float64),
        "height": np.arange(nside).astype(np.float64),
        "width": np.arange(nside).astype(np.float64),
    })
    dims = {name: ("time", "face", "height", "width") for name in fields}
    dims.update({
        "face": ("face",), "height": ("height",), "width": ("width",),
    })
    write_h5(str(data_dir / "d.nc"), arrays, dims, time=time)
    save_stats_files(
        tmp_path / "stats-mean.nc", tmp_path / "stats-std.nc",
        ["prog", "forc"],
    )

    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "save_checkpoint": True,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(data_dir)},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "validation_loader": {
            "dataset": {"data_path": str(data_dir)},
            "batch_size": 2,
            "num_data_workers": 1,
        },
        "optimization": {"lr": 1e-3},
        "stepper_training": {"n_forward_steps": 1, "loss": {"type": "MSE"}},
        "stepper": {
            "step": {
                "type": "single_module",
                "config": {
                    "builder": {
                        "type": "HEALPixUNet",
                        "config": {
                            "encoder": {
                                "conv_block": {
                                    "block_type": "ConvNeXtBlock",
                                    "activation": {"cap_value": 10},
                                },
                                "down_sampling_block": {
                                    "block_type": "AvgPool",
                                },
                                "n_channels": [8, 16],
                                "n_layers": [1, 1],
                            },
                            "decoder": {
                                "conv_block": {
                                    "block_type": "ConvNeXtBlock",
                                    "activation": {"cap_value": 10},
                                },
                                "up_sampling_block": {
                                    "block_type": "TransposedConvUpsample",
                                },
                                "output_layer": {
                                    "block_type": "BasicConvBlock",
                                    "kernel_size": 1,
                                    "n_layers": 1,
                                },
                                "n_channels": [16, 8],
                                "n_layers": [1, 1],
                            },
                        },
                    },
                    "in_names": ["prog", "forc"],
                    "out_names": ["prog"],
                    "normalization": {"network": {
                        "global_means_path": str(tmp_path / "stats-mean.nc"),
                        "global_stds_path": str(tmp_path / "stats-std.nc"),
                    }},
                },
            }
        },
    }
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    from ace_tpu.train.train import main

    trainer = main([str(config_path)])
    assert np.isfinite(trainer.best_validation_loss)
