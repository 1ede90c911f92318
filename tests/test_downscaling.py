"""Diffusion downscaling tests (reference model: fme/downscaling tests —
EDM loss behavior, sampler consistency, preconditioner limits).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.downscaling.diffusion import (
    LogNormalNoiseDistribution,
    edm_loss,
    edm_precondition,
    stochastic_sampler,
)
from ace_tpu.downscaling.models import (
    DiffusionModelConfig,
    PairedNormalizationConfig,
    UNetConfig,
)
from ace_tpu.core.normalizer import NormalizationConfig

H, W = 16, 16


def _info():
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(H),
            lon=np.linspace(0, 360, W, endpoint=False),
        )
    )


def test_preconditioner_limits():
    """As sigma -> 0, D(x) -> x regardless of the raw net (c_skip -> 1)."""

    def crazy_net(x, cond, c_noise):
        return jnp.full_like(x, 100.0)

    denoiser = edm_precondition(crazy_net, sigma_data=0.5)
    x = jnp.ones((2, 4, 4, 1))
    cond = jnp.zeros((2, 4, 4, 1))
    out = denoiser(x, cond, jnp.full((2,), 1e-6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)
    # As sigma -> inf the skip vanishes
    out_hi = denoiser(x, cond, jnp.full((2,), 1e6))
    assert abs(float(out_hi.mean())) > 1.0


def test_ideal_denoiser_gives_low_loss():
    """A perfect denoiser (returns the target) has zero EDM loss."""
    target = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 2),
                         jnp.float32)

    def perfect(x, cond, sigma):
        return target

    loss = float(edm_loss(perfect, jax.random.PRNGKey(0), target,
                          jnp.zeros((4, 8, 8, 1))))
    assert loss < 1e-10


def _model():
    names_in = ["coarse_a", "coarse_b"]
    names_out = ["fine_x"]
    config = DiffusionModelConfig(
        in_names=names_in,
        out_names=names_out,
        normalization=PairedNormalizationConfig(
            fine=NormalizationConfig(
                means={"fine_x": 0.0}, stds={"fine_x": 1.0}
            ),
            coarse=NormalizationConfig(
                means={n: 0.0 for n in names_in},
                stds={n: 1.0 for n in names_in},
            ),
        ),
        module=UNetConfig(base_channels=8, channel_mults=[1, 2],
                          num_res_blocks=1),
        num_diffusion_generation_steps=4,
    )
    return config.build(_info())


@pytest.mark.medium_duration
def test_diffusion_training_reduces_loss():
    import optax

    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    coarse = {
        "coarse_a": jnp.asarray(rng.randn(4, H, W), jnp.float32),
        "coarse_b": jnp.asarray(rng.randn(4, H, W), jnp.float32),
    }
    # learnable: fine = coarse_a (deterministic given conditioning)
    fine = {"fine_x": coarse["coarse_a"]}
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(model.loss_fn)(
            params, coarse, fine, key
        )
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


@pytest.mark.medium_duration
def test_generation_shapes_and_conditioning():
    model = _model()
    model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    coarse = {
        "coarse_a": jnp.asarray(rng.randn(2, H, W), jnp.float32),
        "coarse_b": jnp.asarray(rng.randn(2, H, W), jnp.float32),
    }
    out = model.generate(coarse, jax.random.PRNGKey(2), n_samples=2)
    assert out["fine_x"].shape == (2, 2, H, W)
    assert bool(jnp.all(jnp.isfinite(out["fine_x"])))
    # different sample keys produce different members
    assert not np.allclose(
        np.asarray(out["fine_x"][:, 0]), np.asarray(out["fine_x"][:, 1])
    )


def test_patching_roundtrip():
    import jax.numpy as jnp

    from ace_tpu.downscaling.patching import (
        composite_patch_predictions,
        get_patches,
    )

    patches = get_patches(
        yx_extent=(10, 14), yx_patch_extent=(6, 6), overlap=2,
        drop_partial_patches=False,
    )
    # compositing a constant field reproduces it exactly
    preds = [
        {"a": jnp.ones((2, 1,
                        p.input_slice.y.stop - p.input_slice.y.start,
                        p.input_slice.x.stop - p.input_slice.x.start))[
            ..., p.output_slice.y, p.output_slice.x]}
        for p in patches
    ]
    out = composite_patch_predictions(preds, patches)
    assert out["a"].shape == (2, 1, 10, 14)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)


@pytest.mark.medium_duration
def test_downscaling_train_and_patched_generate(tmp_path):
    import yaml

    from ace_tpu.testing import SyntheticData

    names = ["temp"]
    coarse = SyntheticData(
        tmp_path / "coarse", names, n_time=6, nlat=8, nlon=16
    )
    fine = SyntheticData(
        tmp_path / "fine", names, n_time=6, nlat=16, nlon=32
    )
    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "optimization": {"lr": 1e-3},
        "model": {
            "in_names": names,
            "out_names": names,
            "downscale_factor": 2,
            "num_diffusion_generation_steps": 3,
            "module": {
                "base_channels": 8,
                "channel_mults": [1, 2],
                "num_res_blocks": 1,
            },
            "normalization": {
                "coarse": {
                    "global_means_path": str(coarse.mean_path),
                    "global_stds_path": str(coarse.std_path),
                },
                "fine": {
                    "global_means_path": str(fine.mean_path),
                    "global_stds_path": str(fine.std_path),
                },
            },
        },
        "train_data": {
            "coarse": {"data_path": str(coarse.data_dir)},
            "fine": {"data_path": str(fine.data_dir)},
            "batch_size": 2,
        },
        "coarse_patch_extent_lat": 4,
        "coarse_patch_extent_lon": 8,
    }
    config_path = tmp_path / "ds.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.train import load_downscaling_model, main

    trainer = main([str(config_path)])
    ckpt = os.path.join(
        str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
    )
    assert os.path.exists(ckpt)

    model = load_downscaling_model(ckpt)
    from ace_tpu.downscaling.models import PatchPredictor

    predictor = PatchPredictor(
        model, coarse_patch_shape=(4, 8), coarse_horizontal_overlap=1
    )
    coarse_data = {
        "temp": jnp.asarray(
            np.random.RandomState(0).randn(1, 8, 16), jnp.float32
        )
    }
    out = predictor.generate(
        coarse_data, jax.random.PRNGKey(0), params=model.params,
        n_samples=2,
    )
    assert out["temp"].shape == (1, 2, 16, 32)
    assert bool(jnp.all(jnp.isfinite(out["temp"])))


@pytest.mark.medium_duration
def test_downscaler_predict_entry(tmp_path):
    # train a tiny model first (reuses the training test fixture)
    test_downscaling_train_and_patched_generate(tmp_path)
    import yaml

    config = {
        "experiment_dir": str(tmp_path / "predict"),
        "checkpoint_path": os.path.join(
            str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
        ),
        "coarse_data": {"data_path": str(tmp_path / "coarse" / "data")},
        "n_samples": 2,
        "n_timesteps": 2,
        "coarse_patch_extent_lat": 4,
        "coarse_patch_extent_lon": 8,
        "logging": {"log_to_screen": False, "log_to_file": False},
    }
    config_path = tmp_path / "predict.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.predict import main

    path = main([str(config_path)])
    import h5py

    with h5py.File(path, "r") as f:
        assert f["temp"].shape == (2, 2, 16, 32)
        assert np.isfinite(f["temp"][:]).all()


@pytest.mark.medium_duration
def test_downscaling_evaluator_entry(tmp_path):
    # train a tiny model first (reuses the training test fixture)
    test_downscaling_train_and_patched_generate(tmp_path)
    import yaml

    config = {
        "experiment_dir": str(tmp_path / "eval"),
        "checkpoint_path": os.path.join(
            str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
        ),
        "coarse_data": {"data_path": str(tmp_path / "coarse" / "data")},
        "fine_data": {"data_path": str(tmp_path / "fine" / "data")},
        "n_samples": 2,
        "n_timesteps": 2,
        "coarse_patch_extent_lat": 4,
        "coarse_patch_extent_lon": 8,
        "logging": {"log_to_screen": False, "log_to_file": False},
    }
    config_path = tmp_path / "eval.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.evaluator import main

    logs = main([str(config_path)])
    assert "downscaling/crps/temp" in logs
    assert "downscaling/rmse_of_ensemble_mean/temp" in logs
    # generation-quality metrics (psnr/ssim/relative-to-bicubic/rank)
    assert "downscaling/metrics/psnr/temp" in logs
    assert "downscaling/metrics/relative_crps_bicubic/temp" in logs
    assert all(np.isfinite(v) for v in logs.values())
    assert os.path.exists(
        os.path.join(str(tmp_path / "eval"), "generation_diagnostics.nc")
    )


def test_region_sampling_weights():
    from ace_tpu.downscaling.train import RegionSamplingConfig

    lat = np.linspace(-88, 88, 45)
    lon = np.linspace(0, 352, 45)
    cfg = RegionSamplingConfig(
        lat_interval=[-20, 20], lon_interval=[90, 180], weight=10.0
    )
    w = cfg.origin_weights(lat, lon, (8, 8))
    assert abs(w.sum() - 1.0) < 1e-9
    # in-region origins are 10x more likely than out-of-region
    center_lat = lat[np.arange(len(lat) - 7) + 4]
    center_lon = lon[np.arange(len(lon) - 7) + 4]
    inside = (
        (center_lat[:, None] >= -20) & (center_lat[:, None] <= 20)
        & (center_lon[None, :] >= 90) & (center_lon[None, :] <= 180)
    )
    ratio = w[inside].mean() / w[~inside].mean()
    np.testing.assert_allclose(ratio, 10.0, rtol=1e-9)


@pytest.mark.medium_duration
def test_deterministic_swinir_downscaling(tmp_path):
    import yaml

    from ace_tpu.testing import SyntheticData

    names = ["temp"]
    coarse = SyntheticData(
        tmp_path / "coarse", names, n_time=6, nlat=8, nlon=16
    )
    fine = SyntheticData(
        tmp_path / "fine", names, n_time=6, nlat=16, nlon=32
    )
    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "optimization": {"lr": 1e-3},
        "model": {
            "in_names": names,
            "out_names": names,
            "downscale_factor": 2,
            "module": "SwinIR",
            "loss": "MSE",
            "embed_dim": 8,
            "depths": [2],
            "num_heads": 2,
            "window_size": [4, 8],
            "normalization": {
                "coarse": {
                    "global_means_path": str(coarse.mean_path),
                    "global_stds_path": str(coarse.std_path),
                },
                "fine": {
                    "global_means_path": str(fine.mean_path),
                    "global_stds_path": str(fine.std_path),
                },
            },
        },
        "train_data": {
            "coarse": {"data_path": str(coarse.data_dir)},
            "fine": {"data_path": str(fine.data_dir)},
            "batch_size": 2,
        },
    }
    config_path = tmp_path / "swinir.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.train import load_downscaling_model, main

    main([str(config_path)])
    model = load_downscaling_model(os.path.join(
        str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
    ))
    coarse_data = {
        "temp": jnp.asarray(
            np.random.RandomState(0).randn(1, 8, 16), jnp.float32
        )
    }
    out = model.generate(
        coarse_data, jax.random.PRNGKey(0), params=model.params,
        n_samples=2,
    )
    assert out["temp"].shape == (1, 2, 16, 32)
    # deterministic: both samples identical
    np.testing.assert_array_equal(
        np.asarray(out["temp"][:, 0]), np.asarray(out["temp"][:, 1])
    )


def test_interpolate_baseline_downscaling():
    from datetime import timedelta

    from ace_tpu.core.config import from_dict
    from ace_tpu.core.coordinates import LatLonCoordinates
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.downscaling.models import DeterministicModelConfig

    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=np.linspace(-80, 80, 8),
            lon=np.linspace(0, 360, 16, endpoint=False),
        ),
        timestep=timedelta(hours=6),
    )
    cfg = from_dict(DeterministicModelConfig, {
        "in_names": ["temp"],
        "out_names": ["temp"],
        "module": "interpolate",
        "downscale_factor": 2,
        "normalization": {
            "coarse": {"means": {"temp": 0.0}, "stds": {"temp": 1.0}},
            "fine": {"means": {"temp": 0.0}, "stds": {"temp": 1.0}},
        },
    })
    model = cfg.build(info)
    model.init_params(jax.random.PRNGKey(0))
    coarse = {"temp": jnp.ones((1, 8, 16), jnp.float32) * 3.0}
    out = model.generate(coarse, jax.random.PRNGKey(0), n_samples=1)
    assert out["temp"].shape == (1, 1, 16, 32)
    np.testing.assert_allclose(np.asarray(out["temp"]), 3.0, atol=1e-6)


@pytest.mark.medium_duration
def test_event_downscaling(tmp_path):
    test_downscaling_train_and_patched_generate(tmp_path)
    import yaml

    config = {
        "experiment_dir": str(tmp_path / "events"),
        "checkpoint_path": os.path.join(
            str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
        ),
        "coarse_data": {"data_path": str(tmp_path / "coarse" / "data")},
        "n_samples": 1,
        "n_timesteps": 1,
        "events": [{
            "name": "storm",
            "date": "2000-01-01T12:00",
            "n_samples": 4,
            "save_generated_samples": True,
        }],
        "logging": {"log_to_screen": False, "log_to_file": False},
    }
    config_path = tmp_path / "events.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    from ace_tpu.downscaling.predict import main

    main([str(config_path)])
    import h5py

    with h5py.File(
        os.path.join(str(tmp_path / "events"), "storm_event.nc"), "r"
    ) as f:
        assert f["temp_mean"].shape == (16, 32)
        assert f["temp_std"].shape == (16, 32)
        assert f["temp"].shape == (4, 16, 32)
        assert np.isfinite(f["temp_mean"][:]).all()


def test_moe_denoiser_routing():
    """Sigma routing picks the expert whose inclusive range contains
    sigma; boundaries go to the lower-noise expert; out-of-range sigmas
    clamp (reference: serial_denoising.py _SigmaDispatchModule)."""
    from ace_tpu.downscaling.diffusion import make_moe_denoiser

    def expert(value):
        return lambda x, c, s: jnp.full_like(x, value)

    moe = make_moe_denoiser(
        [(0.002, 1.0), (1.0, 10.0), (10.0, 80.0)],
        [expert(0.0), expert(1.0), expert(2.0)],
    )
    x = jnp.zeros((1, 2, 2, 1))
    c = jnp.zeros((1, 2, 2, 1))

    def route(sigma):
        return float(moe(x, c, jnp.full((1,), sigma))[0, 0, 0, 0])

    assert route(0.5) == 0.0
    assert route(1.0) == 0.0  # boundary -> lower-noise expert
    assert route(5.0) == 1.0
    assert route(10.0) == 1.0  # boundary -> lower-noise expert
    assert route(50.0) == 2.0
    assert route(1e-4) == 0.0  # below all ranges -> first expert
    assert route(100.0) == 2.0  # above all ranges -> last expert
    # invalid ranges rejected
    with pytest.raises(ValueError, match="contiguous"):
        make_moe_denoiser(
            [(0.002, 1.0), (2.0, 10.0)], [expert(0.0), expert(1.0)]
        )
    with pytest.raises(ValueError, match="sigma_min < sigma_max"):
        make_moe_denoiser([(1.0, 1.0)], [expert(0.0)])


@pytest.mark.medium_duration
def test_denoising_moe_predictor_and_bundle(tmp_path):
    """MoE of two experts generates like a DiffusionModel, saves to one
    bundle, and the reloaded bundle reproduces generation exactly."""
    from ace_tpu.downscaling.models import (
        DenoisingExpertCheckpointConfig,
        DenoisingMoEBundledConfig,
        DenoisingMoEConfig,
        DenoisingMoEPredictor,
    )
    from ace_tpu.downscaling.train import save_downscaling_checkpoint

    m1 = _model()
    m2 = _model()
    m1.init_params(jax.random.PRNGKey(0))
    m2.init_params(jax.random.PRNGKey(1))
    # the output conv is zero-initialized (EDM convention), so fresh
    # experts denoise identically; offset the params so each expert has
    # a distinct denoiser
    m1.params = jax.tree_util.tree_map(lambda p: p + 0.01, m1.params)
    m2.params = jax.tree_util.tree_map(lambda p: p - 0.01, m2.params)
    p1 = tmp_path / "expert_low.msgpack"
    p2 = tmp_path / "expert_high.msgpack"
    save_downscaling_checkpoint(str(p1), m1, m1.params)
    save_downscaling_checkpoint(str(p2), m2, m2.params)

    cfg = DenoisingMoEConfig(
        denoising_expert_configs=[
            # deliberately unsorted: config sorts by sigma_min
            DenoisingExpertCheckpointConfig(
                checkpoint_path=str(p2), sigma_min=1.0, sigma_max=80.0
            ),
            DenoisingExpertCheckpointConfig(
                checkpoint_path=str(p1), sigma_min=0.002, sigma_max=1.0
            ),
        ],
        num_diffusion_generation_steps=4,
    )
    moe = cfg.build()
    rng = np.random.RandomState(0)
    coarse = {
        n: jnp.asarray(rng.randn(2, H, W), jnp.float32)
        for n in ["coarse_a", "coarse_b"]
    }
    out = moe.generate(coarse, jax.random.PRNGKey(7), n_samples=2)
    assert set(out) == {"fine_x"}
    assert out["fine_x"].shape == (2, 2, H, W)
    assert np.isfinite(np.asarray(out["fine_x"])).all()
    # the mixture differs from either expert alone (both experts used)
    solo1 = m1.generate(coarse, jax.random.PRNGKey(7), n_samples=2)
    solo2 = m2.generate(coarse, jax.random.PRNGKey(7), n_samples=2)
    assert not np.allclose(
        np.asarray(out["fine_x"]), np.asarray(solo1["fine_x"])
    )
    assert not np.allclose(
        np.asarray(out["fine_x"]), np.asarray(solo2["fine_x"])
    )

    # bundle roundtrip: identical generation under the same rng
    bundle = tmp_path / "moe_bundle.msgpack"
    moe.save(str(bundle))
    moe2 = DenoisingMoEBundledConfig(
        mixture_of_experts_path=str(bundle)
    ).build()
    out2 = moe2.generate(coarse, jax.random.PRNGKey(7), n_samples=2)
    np.testing.assert_allclose(
        np.asarray(out["fine_x"]), np.asarray(out2["fine_x"]), atol=1e-6
    )
    # incompatible experts rejected
    bad = DiffusionModelConfig(
        in_names=["coarse_a", "coarse_b"],
        out_names=["other"],
        normalization=PairedNormalizationConfig(
            fine=NormalizationConfig(means={"other": 0.0},
                                     stds={"other": 1.0}),
            coarse=NormalizationConfig(
                means={n: 0.0 for n in ["coarse_a", "coarse_b"]},
                stds={n: 1.0 for n in ["coarse_a", "coarse_b"]},
            ),
        ),
        module=UNetConfig(base_channels=8, channel_mults=[1, 2],
                          num_res_blocks=1),
    ).build(_info())
    bad.init_params(jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="experts must share"):
        DenoisingMoEPredictor(
            experts=[m1, bad],
            sigma_ranges=[(0.002, 1.0), (1.0, 80.0)],
            num_diffusion_generation_steps=4,
        )


@pytest.mark.medium_duration
def test_fine_topography_static_inputs(tmp_path):
    """use_fine_topography: normalized fine-grid static fields append to
    the conditioning, follow training patches, survive the checkpoint,
    and feed patched generation (reference: fme/downscaling/models.py
    use_fine_topography + data/static.py)."""
    import yaml

    from ace_tpu.data.store import write_h5
    from ace_tpu.downscaling.train import load_static_inputs
    from ace_tpu.testing import SyntheticData

    names = ["temp"]
    coarse = SyntheticData(
        tmp_path / "coarse", names, n_time=6, nlat=8, nlon=16
    )
    fine = SyntheticData(
        tmp_path / "fine", names, n_time=6, nlat=16, nlon=32
    )
    # fine-grid topography file (16x32)
    topo = np.random.RandomState(5).rand(16, 32).astype(np.float32) * 1000
    topo_path = tmp_path / "topography.nc"
    write_h5(str(topo_path), {"HGTsfc": topo}, {"HGTsfc": ("lat", "lon")})

    static = load_static_inputs({"HGTsfc": str(topo_path)})
    assert static.shape == (16, 32, 1)
    np.testing.assert_allclose(static.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(static.std(), 1.0, atol=1e-4)

    config = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 1,
        "logging": {"log_to_screen": False, "log_to_file": False},
        "optimization": {"lr": 1e-3},
        "static_inputs": {"HGTsfc": str(topo_path)},
        "model": {
            "in_names": names,
            "out_names": names,
            "downscale_factor": 2,
            "num_diffusion_generation_steps": 3,
            "use_fine_topography": True,
            "module": {
                "base_channels": 8,
                "channel_mults": [1, 2],
                "num_res_blocks": 1,
            },
            "normalization": {
                "coarse": {
                    "global_means_path": str(coarse.mean_path),
                    "global_stds_path": str(coarse.std_path),
                },
                "fine": {
                    "global_means_path": str(fine.mean_path),
                    "global_stds_path": str(fine.std_path),
                },
            },
        },
        "train_data": {
            "coarse": {"data_path": str(coarse.data_dir)},
            "fine": {"data_path": str(fine.data_dir)},
            "batch_size": 2,
        },
        "coarse_patch_extent_lat": 4,
        "coarse_patch_extent_lon": 8,
    }
    config_path = tmp_path / "ds.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.train import load_downscaling_model, main

    main([str(config_path)])
    ckpt = os.path.join(str(tmp_path / "out"), "checkpoints", "ckpt.msgpack")
    model = load_downscaling_model(ckpt)
    # static fields restored from the checkpoint, no original file needed
    assert model.static_inputs is not None
    np.testing.assert_allclose(
        np.asarray(model.static_inputs), static, atol=1e-6
    )
    from ace_tpu.downscaling.models import PatchPredictor

    predictor = PatchPredictor(
        model, coarse_patch_shape=(4, 8), coarse_horizontal_overlap=1
    )
    coarse_data = {
        "temp": jnp.asarray(
            np.random.RandomState(0).randn(1, 8, 16), jnp.float32
        )
    }
    out = predictor.generate(
        coarse_data, jax.random.PRNGKey(0), params=model.params,
        n_samples=1,
    )
    assert out["temp"].shape == (1, 1, 16, 32)
    assert bool(jnp.all(jnp.isfinite(out["temp"])))
    # misconfigured: topography enabled but no fields
    with pytest.raises(ValueError, match="no static input"):
        model.config.build(model.dataset_info)


@pytest.mark.medium_duration
def test_time_range_zarr_output(tmp_path):
    """Named time-range outputs: region crop + ensemble written to zarr
    with [time, sample, lat, lon] dims (reference:
    fme/downscaling/inference/output.py TimeRangeConfig)."""
    import yaml

    # train a tiny model first (reuses the training test fixture)
    test_downscaling_train_and_patched_generate(tmp_path)
    config = {
        "experiment_dir": str(tmp_path / "tr_out"),
        "checkpoint_path": os.path.join(
            str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
        ),
        "coarse_data": {"data_path": str(tmp_path / "coarse" / "data")},
        "n_timesteps": 0,
        "time_ranges": [
            {
                "name": "region_a",
                "time_range": {"start": 1, "stop": 3},
                "n_samples": 3,
                "max_samples_per_call": 2,
                "lat_extent": [-60, 60],
            }
        ],
        "logging": {"log_to_screen": False, "log_to_file": False},
    }
    config_path = tmp_path / "tr.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    from ace_tpu.downscaling.predict import main

    main([str(config_path)])
    from ace_tpu.data.store import open_file_dataset

    ds = open_file_dataset(str(tmp_path / "tr_out" / "region_a.zarr"))
    arr = np.asarray(ds["temp"].read(()))
    # 2 timesteps, 3 samples, lat crop x downscale factor 2
    assert arr.shape[0] == 2 and arr.shape[1] == 3
    assert arr.shape[2] < 16 and arr.shape[3] == 32
    assert np.isfinite(arr).all()
    # ensemble members differ
    assert not np.allclose(arr[:, 0], arr[:, 1])


def test_zarr_output_chunks():
    from ace_tpu.downscaling.predict import zarr_output_chunks

    # small field: whole lat/lon in one chunk, leading dims chunk 1
    assert zarr_output_chunks((5, 4, 16, 32)) == [1, 1, 16, 32]
    # big field halves until <= 10MB per chunk
    ch = zarr_output_chunks((1, 1, 4000, 8000))
    assert ch[0] == 1 and ch[1] == 1
    assert ch[2] * ch[3] * 4 <= 10 * 2**20
    assert ch[2] >= 1 and ch[3] >= 1


@pytest.mark.medium_duration
def test_loss_weights_config():
    """Per-variable and noise-exponent loss weighting
    (reference: fme/downscaling/models.py:81, noise.py:63)."""
    import dataclasses as dc

    from ace_tpu.downscaling.models import LossWeightsConfig

    m = _model()
    m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    coarse = {
        n: jnp.asarray(rng.randn(2, H, W), jnp.float32)
        for n in ["coarse_a", "coarse_b"]
    }
    fine = {"fine_x": jnp.asarray(rng.randn(2, H, W), jnp.float32)}
    key = jax.random.PRNGKey(3)
    base = float(m.loss_fn(m.params, coarse, fine, key))
    # doubling the sole output channel weight doubles the loss
    m2 = _model()
    m2.config = dc.replace(
        m2.config,
        loss_weights=LossWeightsConfig(output_channels={"fine_x": 2.0}),
    )
    m2.params = m.params
    np.testing.assert_allclose(
        float(m2.loss_fn(m.params, coarse, fine, key)), 2 * base,
        rtol=1e-6,
    )
    # a different noise exponent changes the weighting
    m3 = _model()
    m3.config = dc.replace(
        m3.config,
        loss_weights=LossWeightsConfig(noise_weight_exponent=0.5),
    )
    assert float(m3.loss_fn(m.params, coarse, fine, key)) != base


@pytest.mark.medium_duration
def test_bundle_denoising_moe_cli(tmp_path):
    """The bundling CLI (reference:
    scripts/downscaling/bundle_denoising_moe_checkpoint.py) writes a
    single-file bundle that DenoisingMoEBundledConfig reloads."""
    import yaml

    from ace_tpu.data_process.bundle_denoising_moe import main as bundle_main
    from ace_tpu.downscaling.models import DenoisingMoEBundledConfig
    from ace_tpu.downscaling.train import save_downscaling_checkpoint

    m1 = _model()
    m2 = _model()
    m1.init_params(jax.random.PRNGKey(0))
    m2.init_params(jax.random.PRNGKey(1))
    p1 = tmp_path / "low.msgpack"
    p2 = tmp_path / "high.msgpack"
    save_downscaling_checkpoint(str(p1), m1, m1.params)
    save_downscaling_checkpoint(str(p2), m2, m2.params)
    cfg_path = tmp_path / "moe.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "denoising_expert_configs": [
                {"checkpoint_path": str(p1),
                 "sigma_min": 0.002, "sigma_max": 1.0},
                {"checkpoint_path": str(p2),
                 "sigma_min": 1.0, "sigma_max": 80.0},
            ],
            "num_diffusion_generation_steps": 4,
        }, f)
    out_path = tmp_path / "bundle.msgpack"
    bundle_main([str(cfg_path), str(out_path)])
    moe = DenoisingMoEBundledConfig(
        mixture_of_experts_path=str(out_path)
    ).build()
    rng = np.random.RandomState(0)
    coarse = {
        n: jnp.asarray(rng.randn(1, H, W), jnp.float32)
        for n in ["coarse_a", "coarse_b"]
    }
    out = moe.generate(coarse, jax.random.PRNGKey(7), n_samples=1)
    assert np.isfinite(np.asarray(out["fine_x"])).all()


@pytest.mark.medium_duration
def test_downscaling_evaluator_data_block_and_events(tmp_path):
    """The reference evaluator spellings: a paired ``data`` block with
    lat/lon extents, plus event case studies scored over their region
    (reference: fme/downscaling/evaluator.py:172 EvaluatorConfig.data +
    :143 PairedEventConfig)."""
    test_downscaling_train_and_patched_generate(tmp_path)
    import yaml

    config = {
        "experiment_dir": str(tmp_path / "eval_events"),
        "checkpoint_path": os.path.join(
            str(tmp_path / "out"), "checkpoints", "ckpt.msgpack"
        ),
        "data": {
            "coarse": [{"data_path": str(tmp_path / "coarse" / "data")}],
            "fine": [{"data_path": str(tmp_path / "fine" / "data")}],
            "lat_extent": {"start": -60.0, "stop": 60.0},
        },
        "events": [{
            "name": "storm",
            "date": "2000-01-01T06:00",
            "lat_extent": {"start": -45.0, "stop": 45.0},
            "n_samples": 2,
            "save_generated_samples": True,
        }],
        "n_samples": 2,
        "n_timesteps": 2,
        "logging": {"log_to_screen": False, "log_to_file": False},
    }
    config_path = tmp_path / "eval_events.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    from ace_tpu.downscaling.evaluator import main

    logs = main([str(config_path)])
    # default (region-cropped) evaluation ran
    assert "downscaling/crps/temp" in logs
    # the event's metrics are namespaced under its name
    assert "event/storm/crps/temp" in logs
    assert np.isfinite(logs["event/storm/crps/temp"])
    # event samples were written
    assert os.path.exists(os.path.join(
        str(tmp_path / "eval_events"), "event_storm_samples.nc"
    ))
