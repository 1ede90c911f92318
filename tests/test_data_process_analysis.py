"""Analysis ETL tools: zarr rechunking, noise-floor statistics,
checkpoint interpolation, monthly-mean dataset writer (reference:
scripts/time_rechunk/rechunk_zarr.py, scripts/noise_floor/
generate_stats.py, scripts/interpolate_models/run.py,
scripts/monthly_data/write_monthly_data.py)."""

import json
import os

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord
import pytest

NY, NX = 4, 8


def test_rechunk_zarr(tmp_path):
    from ace_tpu.data_process.rechunk_zarr import rechunk_zarr

    rng = np.random.RandomState(0)
    n_time = 11
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    arrays = {
        "a": rng.randn(n_time, NY, NX).astype(np.float32),
        "static": rng.randn(NY, NX).astype(np.float32),
        "lat": np.linspace(-60, 60, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }
    dims = {"a": ("time", "lat", "lon"), "static": ("lat", "lon"),
            "lat": ("lat",), "lon": ("lon",)}
    write_zarr(str(tmp_path / "src.zarr"), arrays, dims, time=time)

    rechunk_zarr(str(tmp_path / "src.zarr"), str(tmp_path / "dst.zarr"),
                 time_chunk_size=4)
    ds = open_file_dataset(str(tmp_path / "dst.zarr"))
    np.testing.assert_array_equal(ds["a"].read(()), arrays["a"])
    np.testing.assert_array_equal(ds["static"].read(()), arrays["static"])
    assert len(ds.read_time()) == n_time
    # the new chunking is actually applied on disk
    with open(tmp_path / "dst.zarr" / "a" / ".zarray") as f:
        meta = json.load(f)
    assert meta["chunks"][0] == 4


def test_noise_floor_statistics(tmp_path):
    """For iid annual N(0, sigma^2) fields, the window-mean pattern RMSE
    scales like sigma/sqrt(window); the estimator must track that."""
    from ace_tpu.data_process.noise_floor import (
        DataConfig, generate_noise_floor,
    )

    rng = np.random.RandomState(0)
    n_members, n_years = 4, 10
    steps_per_year = 8  # coarse "year" of 8 steps via 45.65-day spacing
    sigma = 1.0
    paths = []
    for m in range(n_members):
        n_time = n_years * steps_per_year
        time = TimeCoord.from_range(
            "2000-01-01T00:00", n_time, int(365.25 / steps_per_year * 86400)
        )
        # constant within each year so annual means are exactly the draws
        draws = rng.randn(n_years, NY, NX) * sigma
        a = np.repeat(draws, steps_per_year, axis=0).astype(np.float32)
        p = tmp_path / f"member_{m}.zarr"
        write_zarr(
            str(p),
            {"a": a, "grid_yt": np.linspace(-60, 60, NY),
             "grid_xt": np.linspace(0, 360, NX, endpoint=False)},
            {"a": ("time", "grid_yt", "grid_xt"),
             "grid_yt": ("grid_yt",), "grid_xt": ("grid_xt",)},
            time=time,
        )
        paths.append(str(p))

    config = DataConfig(
        paths=paths, stats_path=str(tmp_path / "stats"),
        years_per_ensemble=n_years, is_amip=False,
    )
    stats = generate_noise_floor(config)
    means = stats["means"]["a"]  # over window sizes (1, 2, 5, 10)
    # sqrt-window scaling: rmse(w) ~ sigma/sqrt(w)
    ratio = means[0] / means[3]
    assert 2.2 < ratio < 4.5  # ideal sqrt(10) ~ 3.16
    assert 0.8 < means[0] < 1.2  # ~sigma for window=1
    out = open_file_dataset(str(tmp_path / "stats" / "rmse_means.nc"))
    np.testing.assert_allclose(out["a"].read(()), means)
    ann = open_file_dataset(str(tmp_path / "stats" / "annual_means.nc"))
    assert ann["a"].shape == (n_members, n_years, NY, NX)


def _tiny_stepper_checkpoint(tmp_path, seed, name):
    from datetime import timedelta

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate, LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.checkpoint import save_stepper
    from ace_tpu.stepper.stepper import StepperConfig

    import jax

    names = ["a", "b"]
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(8),
            lon=np.linspace(0, 360, 16, endpoint=False),
        ),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.asarray([0.0, 500.0, 0.0]),
            bk=np.asarray([0.0, 0.3, 1.0]),
        ),
        timestep=timedelta(hours=6),
    )
    step_cfg = from_dict(SingleModuleStepConfig, dict(
        builder={"type": "SphericalFourierNeuralOperatorNet",
                 "config": {"embed_dim": 8, "num_layers": 1,
                            "operator_type": "dhconv"}},
        in_names=names, out_names=names,
        normalization={"network": {
            "means": {n: 0.0 for n in names},
            "stds": {n: 1.0 for n in names},
        }},
    ))
    cfg = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    )
    stepper = cfg.get_stepper(info)
    stepper.init_params(jax.random.PRNGKey(seed))
    path = str(tmp_path / name)
    save_stepper(path, stepper, cfg)
    return path


@pytest.mark.medium_duration
def test_interpolate_checkpoints(tmp_path):
    import jax

    from ace_tpu.data_process.interpolate_checkpoints import (
        interpolate, pattern_rmse_over_interpolant,
    )
    from ace_tpu.stepper.checkpoint import load_msgpack, load_stepper

    a = _tiny_stepper_checkpoint(tmp_path, 0, "a.msgpack")
    b = _tiny_stepper_checkpoint(tmp_path, 1, "b.msgpack")
    out = interpolate(a, b, [1.0, 0.5, 0.0], str(tmp_path / "interp"))
    assert [os.path.basename(p) for p in out] == [
        "interp_1.0000.msgpack", "interp_0.5000.msgpack",
        "interp_0.0000.msgpack",
    ]
    pa = load_msgpack(a)["stepper"]["params"]
    pb = load_msgpack(b)["stepper"]["params"]
    p1 = load_msgpack(out[0])["stepper"]["params"]
    ph = load_msgpack(out[1])["stepper"]["params"]
    leaves_a = jax.tree_util.tree_leaves(pa)
    leaves_b = jax.tree_util.tree_leaves(pb)
    leaves_1 = jax.tree_util.tree_leaves(p1)
    leaves_h = jax.tree_util.tree_leaves(ph)
    for la, lb, l1, lh in zip(leaves_a, leaves_b, leaves_1, leaves_h):
        np.testing.assert_allclose(l1, la, rtol=1e-6)
        if np.issubdtype(np.asarray(la).dtype, np.floating):
            np.testing.assert_allclose(
                lh, 0.5 * np.asarray(la) + 0.5 * np.asarray(lb),
                rtol=1e-5, atol=1e-7,
            )
    # interpolated checkpoints are loadable steppers
    stepper = load_stepper(out[1])
    assert stepper is not None

    # pattern RMSE over interpolant: zero at the target by construction
    maps = np.stack([np.full((NY, NX), w) for w in [1.0, 0.5, 0.0]])
    area = np.ones((NY, NX))
    rmses = pattern_rmse_over_interpolant(maps, area, target_index=2)
    np.testing.assert_allclose(rmses, [1.0, 0.5, 0.0], atol=1e-12)


def test_write_monthly_data(tmp_path):
    from ace_tpu.data_process.write_monthly_data import Config, run

    rng = np.random.RandomState(0)
    # 6-hourly data spanning Dec 1999 - Jan 2000
    n_time = 40
    time = TimeCoord.from_range("1999-12-25T00:00", n_time, 21600)
    arrays = {
        "a": rng.randn(n_time, NY, NX).astype(np.float32),
        "b": rng.randn(n_time, NY, NX).astype(np.float32),
        "lat": np.linspace(-60, 60, NY),
        "lon": np.linspace(0, 360, NX, endpoint=False),
    }
    dims = {"a": ("time", "lat", "lon"), "b": ("time", "lat", "lon"),
            "lat": ("lat",), "lon": ("lon",)}
    write_zarr(str(tmp_path / "in.zarr"), arrays, dims, time=time)

    cfg = {
        "experiment_dir": str(tmp_path / "out"),
        "data_loader": {"dataset": {"data_path": str(tmp_path / "in.zarr")}},
        "variable_names": ["a", "b"],
        "forward_steps_in_memory": 7,  # force several ragged windows
    }
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    out_path = run(Config.from_file(str(path)))

    ds = open_file_dataset(out_path)
    a = ds["a"].read(())
    assert a.shape == (1, 2, NY, NX)  # [sample, month, lat, lon]
    np.testing.assert_allclose(
        a[0, 0], arrays["a"][:28].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        a[0, 1], arrays["a"][28:].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    counts = ds["counts"].read(())
    np.testing.assert_array_equal(counts, [[28, 12]])


def test_noise_floor_report_extrapolation(tmp_path):
    """The c/sqrt(w)+b fit must recover exact coefficients from data on
    that curve (reference: scripts/noise_floor/generate_train_report.py)."""
    from ace_tpu.data.store import write_h5
    from ace_tpu.data_process.noise_floor import (
        WINDOW_SIZES, fit_inverse_sqrt, noise_floor_report,
    )

    w = np.asarray(WINDOW_SIZES, np.float64)
    means = 2.0 / np.sqrt(w) + 0.3
    stds = 0.5 / np.sqrt(w) + 0.01
    stats = tmp_path / "stats"
    stats.mkdir()
    write_h5(str(stats / "rmse_means.nc"),
             {"a": means, "window_size": w},
             {"a": ("window_size",), "window_size": ("window_size",)})
    write_h5(str(stats / "rmse_stdevs.nc"),
             {"a": stds, "window_size": w},
             {"a": ("window_size",), "window_size": ("window_size",)})
    report = noise_floor_report(str(stats), ["a"], window_years=40)
    floor, spread = report["a"]
    np.testing.assert_allclose(floor, 2.0 / np.sqrt(40) + 0.3, rtol=1e-10)
    np.testing.assert_allclose(spread, 0.5 / np.sqrt(40) + 0.01,
                               rtol=1e-8)
    f = fit_inverse_sqrt(w, means)
    np.testing.assert_allclose(f(100.0), 2.0 / 10 + 0.3, rtol=1e-10)


@pytest.mark.medium_duration
def test_process_checkpoint_strips_training_state(tmp_path):
    """Publication prep (reference:
    scripts/checkpoint_publication/process_ckpt.py): optimizer/EMA
    state stripped; EMA weights optionally promoted; output loads as a
    plain stepper checkpoint."""
    import jax

    from ace_tpu.data_process.process_checkpoint import process_checkpoint
    from ace_tpu.stepper.checkpoint import (
        load_msgpack, load_stepper, save_msgpack,
    )

    src = _tiny_stepper_checkpoint(tmp_path, 0, "train.msgpack")
    state = load_msgpack(src)
    # decorate it like a training checkpoint
    params = state["stepper"]["params"]
    ema = jax.tree_util.tree_map(lambda a: np.asarray(a) * 0.5, params)
    state["optimizer"] = {"count": np.asarray(7)}
    state["ema"] = ema
    save_msgpack(src, state)

    out = str(tmp_path / "published.msgpack")
    process_checkpoint(src, out)
    published = load_msgpack(out)
    assert set(published) == {"stepper"}
    assert load_stepper(out) is not None

    out_ema = str(tmp_path / "published_ema.msgpack")
    process_checkpoint(src, out_ema, use_ema_weights=True)
    pub = load_msgpack(out_ema)["stepper"]["params"]
    for a, b in zip(jax.tree_util.tree_leaves(pub),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(a, b)


def test_vort_div_cli(tmp_path):
    """vort_div CLI: u/v wind pairs -> vorticity/divergence zarr, levels
    inferred from the name template; values match the library kernel
    (reference: scripts/vort_div/winds.py)."""
    from ace_tpu.data_process.vort_div import VortDivConfig, main
    from ace_tpu.ops.vector_sht import u_v_to_vort_div

    rng = np.random.RandomState(0)
    n_time, nlat, nlon = 5, 8, 16
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    arrays = {
        "lat": np.linspace(-60, 60, nlat),
        "lon": np.linspace(0, 360, nlon, endpoint=False),
    }
    dims = {"lat": ("lat",), "lon": ("lon",)}
    for k in range(2):
        for name in (f"eastward_wind_{k}", f"northward_wind_{k}"):
            arrays[name] = rng.randn(n_time, nlat, nlon).astype(np.float32)
            dims[name] = ("time", "lat", "lon")
    write_zarr(str(tmp_path / "winds.zarr"), arrays, dims, time=time)

    cfg = {
        "input_path": str(tmp_path / "winds.zarr"),
        "output_path": str(tmp_path / "vortdiv.zarr"),
        "grid": "equiangular",
        "time_chunk_size": 2,  # exercise the chunked read path
    }
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    main(["--yaml", str(tmp_path / "cfg.yaml"), "--debug"])  # smoke
    main(["--yaml", str(tmp_path / "cfg.yaml")])

    ds = open_file_dataset(str(tmp_path / "vortdiv.zarr"))
    assert len(ds.read_time()) == n_time
    for k in range(2):
        vort_ref, div_ref = u_v_to_vort_div(
            arrays[f"eastward_wind_{k}"], arrays[f"northward_wind_{k}"],
            grid="equiangular",
        )
        np.testing.assert_allclose(
            ds[f"vorticity_{k}"].read(()), np.asarray(vort_ref),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            ds[f"divergence_{k}"].read(()), np.asarray(div_ref),
            rtol=1e-5, atol=1e-5,
        )
    # sanity: vorticity of a nonzero wind field is nonzero
    assert float(np.max(np.abs(ds["vorticity_0"].read(())))) > 0
    np.testing.assert_array_equal(ds["lat"].read(()), arrays["lat"])

    # explicit single-pair names (no template)
    cfg2 = dict(cfg, u_name="eastward_wind_0", v_name="northward_wind_0",
                vort_name="vort", div_name="div",
                output_path=str(tmp_path / "single.zarr"))
    with open(tmp_path / "cfg2.yaml", "w") as f:
        yaml.safe_dump(cfg2, f)
    main(["--yaml", str(tmp_path / "cfg2.yaml")])
    ds2 = open_file_dataset(str(tmp_path / "single.zarr"))
    assert "vort" in ds2.keys() and "div" in ds2.keys()
