"""compute_stats CLI: streaming stats must equal full-array numpy stats
(reference: scripts/data_process/get_stats.py semantics — centering,
scaling-full-field, scaling-residual, time-mean)."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord


def _make_data(tmp_path, n_time=13, nlat=8, nlon=16):
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    arrays = {
        "a": (rng.randn(n_time, nlat, nlon) * 3 + 5).astype(np.float32),
        "b": rng.rand(n_time, nlat, nlon).astype(np.float32),
        "lat": np.linspace(-80, 80, nlat),
        "lon": np.linspace(0, 360, nlon, endpoint=False),
    }
    dims = {
        "a": ("time", "lat", "lon"), "b": ("time", "lat", "lon"),
        "lat": ("lat",), "lon": ("lon",),
    }
    write_h5(str(data_dir / "d.nc"), arrays, dims, time=time)
    return data_dir, arrays


def test_compute_stats_matches_numpy(tmp_path):
    data_dir, arrays = _make_data(tmp_path)
    out_dir = tmp_path / "stats"
    cfg = {
        "dataset": {"data_path": str(data_dir)},
        "output_dir": str(out_dir),
        "names": ["a", "b"],
        "window": 4,  # force multiple windows incl. a partial one
    }
    cfg_path = tmp_path / "stats.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.compute_stats import main

    stats = main([str(cfg_path)])

    for name in ["a", "b"]:
        full = arrays[name].astype(np.float64)
        np.testing.assert_allclose(
            stats["mean"][name], full.mean(), rtol=1e-6
        )
        np.testing.assert_allclose(
            stats["std"][name], full.std(), rtol=1e-6
        )
        np.testing.assert_allclose(
            stats["residual_std"][name],
            np.diff(full, axis=0).std(), rtol=1e-6,
        )

    mean_ds = open_file_dataset(str(out_dir / "stats-mean.nc"))
    assert float(mean_ds["a"].read(())) == np.float32(stats["mean"]["a"])
    tm = open_file_dataset(str(out_dir / "time-mean.nc"))
    np.testing.assert_allclose(
        tm["a"].read(()), arrays["a"].mean(axis=0), rtol=1e-5
    )


def test_stats_feed_training_normalization(tmp_path):
    """The emitted files load through NormalizationConfig."""
    data_dir, _ = _make_data(tmp_path)
    out_dir = tmp_path / "stats"
    from ace_tpu.compute_stats import ComputeStatsConfig, compute_stats
    from ace_tpu.core.config import from_dict

    compute_stats(from_dict(ComputeStatsConfig, {
        "dataset": {"data_path": str(data_dir)},
        "output_dir": str(out_dir),
    }))
    from ace_tpu.core.normalizer import NormalizationConfig

    norm = NormalizationConfig(
        global_means_path=str(out_dir / "stats-mean.nc"),
        global_stds_path=str(out_dir / "stats-std.nc"),
    ).build(["a", "b"])
    import jax.numpy as jnp

    x = {"a": jnp.ones((2, 2)), "b": jnp.zeros((2, 2))}
    normed = norm.normalize(x)
    assert np.isfinite(np.asarray(normed["a"])).all()
