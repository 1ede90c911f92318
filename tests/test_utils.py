"""Tests for tensor utils, masking, fill (reference models:
fme/core/test_tensors.py, test_spatial_masking.py, test_fill.py,
test_winds.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.fill import SmoothFloodFill
from ace_tpu.core.masking import (
    NameAndPrefixMatcher,
    SpatialMaskProvider,
    StaticSpatialMasking,
    VariableMaskingConfig,
)
from ace_tpu.core.tensors import (
    TensorDictAccumulator,
    add_ensemble_dim,
    assert_dict_allclose,
    flatten_dict,
    fold_ensemble_dim,
    u_v_to_x_y_z_wind,
    unflatten_dict,
    unfold_ensemble_dim,
    x_y_z_to_u_v_wind,
)


def test_ensemble_fold_roundtrip():
    data = {"a": jnp.arange(24.0).reshape(2, 3, 4)}
    ens = add_ensemble_dim(data, repeats=2)
    assert ens["a"].shape == (2, 2, 3, 4)
    folded, n = fold_ensemble_dim(ens)
    assert folded["a"].shape == (4, 3, 4) and n == 2
    unfolded = unfold_ensemble_dim(folded, n)
    np.testing.assert_array_equal(
        np.asarray(unfolded["a"]), np.asarray(ens["a"])
    )


def test_flatten_unflatten_dict():
    nested = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_dict(nested)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten_dict(flat) == nested


def test_assert_dict_allclose():
    a = {"x": jnp.ones(3)}
    assert_dict_allclose(a, {"x": np.ones(3)})
    with pytest.raises(AssertionError):
        assert_dict_allclose(a, {"x": np.zeros(3)})
    with pytest.raises(AssertionError, match="keys differ"):
        assert_dict_allclose(a, {"y": np.ones(3)})


def test_accumulator_mean():
    acc = TensorDictAccumulator()
    acc.record({"f": jnp.asarray(1.0)})
    acc.record({"f": jnp.asarray(3.0)})
    assert float(acc.get_mean()["f"]) == 2.0


def test_wind_conversion_roundtrip():
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(5), jnp.float32)
    v = jnp.asarray(rng.randn(5), jnp.float32)
    lat = jnp.asarray(rng.uniform(-80, 80, 5), jnp.float32)
    lon = jnp.asarray(rng.uniform(0, 360, 5), jnp.float32)
    wx, wy, wz = u_v_to_x_y_z_wind(u, v, lat, lon)
    u2, v2 = x_y_z_to_u_v_wind(wx, wy, wz, lat, lon)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_name_and_prefix_matcher():
    m = NameAndPrefixMatcher(["so", "sst"])
    assert m.matches("so") and m.matches("so_3") and m.matches("sst")
    assert not m.matches("something") and not m.matches("so_x")


def test_static_spatial_masking():
    mask = np.ones((4, 4), np.float32)
    mask[0] = 0.0
    masking = StaticSpatialMasking(masks={"so": mask}, fill_value=-1.0)
    data = {"so_0": jnp.ones((2, 4, 4)), "other": jnp.ones((2, 4, 4))}
    out = masking(data)
    np.testing.assert_array_equal(np.asarray(out["so_0"][:, 0]), -1.0)
    np.testing.assert_array_equal(np.asarray(out["so_0"][:, 1:]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["other"]), 1.0)


def test_spatial_mask_provider_builds_from_data():
    provider = SpatialMaskProvider(mask_names={"so": "wet_mask"})
    masker = provider.build({"wet_mask": np.ones((3, 3), np.float32)})
    out = masker({"so_0": jnp.full((1, 3, 3), 5.0)})
    np.testing.assert_array_equal(np.asarray(out["so_0"]), 5.0)


def test_variable_masking_modes():
    from ace_tpu.core.masking import (
        BernoulliMaskingConfig,
        MaskingGroupConfig,
        UniformMaskingConfig,
    )

    names = ["a", "b", "c"]
    # rate=1 group drops a+b together; default masks nothing
    cfg = VariableMaskingConfig(
        override_groups=[
            MaskingGroupConfig(
                variables=["a", "b"], masking=BernoulliMaskingConfig(rate=1.0)
            )
        ]
    )
    presence = np.asarray(
        cfg.build(names).sample_presence(jax.random.PRNGKey(0))
    )
    np.testing.assert_array_equal(presence, [False, False, True])
    # rate=0 keeps everything
    cfg0 = VariableMaskingConfig(
        override_groups=[
            MaskingGroupConfig(
                variables=["a", "b"], masking=BernoulliMaskingConfig(rate=0.0)
            )
        ]
    )
    presence0 = np.asarray(
        cfg0.build(names).sample_presence(jax.random.PRNGKey(0))
    )
    np.testing.assert_array_equal(presence0, [True, True, True])
    # uniform default: 0..2 of the ungrouped channels dropped
    cfg_u = VariableMaskingConfig(default=UniformMaskingConfig(2))
    masking = cfg_u.build(names)
    counts = set()
    for seed in range(20):
        p = np.asarray(masking.sample_presence(jax.random.PRNGKey(seed)))
        counts.add(int((~p).sum()))
    assert counts <= {0, 1, 2}
    assert len(counts) > 1  # actually varies
    # typo'd group variable fails loudly at build
    import pytest

    bad = VariableMaskingConfig(
        override_groups=[
            MaskingGroupConfig(
                variables=["bogus"], masking=BernoulliMaskingConfig(rate=0.5)
            )
        ]
    )
    with pytest.raises(ValueError):
        bad.build(names)


def test_smooth_flood_fill():
    # element-wise reference parity is covered in tests/test_fill.py;
    # this checks the qualitative contract on a simple blob
    rng = np.random.RandomState(0)
    data = rng.randn(2, 16, 16).astype(np.float32) + 5.0
    data[:, 6:10, 6:10] = np.nan
    fill = SmoothFloodFill()
    out = np.asarray(fill(jnp.asarray(data), "var"))
    assert np.isfinite(out).all()
    # valid points far from the mask unchanged (the reference's Gaussian
    # blend only adjusts pixels near the valid/NaN boundary)
    np.testing.assert_array_equal(out[:, :2, :2], data[:, :2, :2])
    # filled values are near the local field magnitude
    assert abs(out[:, 6:10, 6:10].mean() - 5.0) < 2.0


def test_wandb_media_logging(tmp_path):
    """WandB.log converts media wrappers at log time; DiskMetricLogger
    skips them (reference: fme/core/wandb.py:96 media types)."""
    import json

    import numpy as np

    from ace_tpu.core.wandb import (
        DiskMetricLogger,
        Histogram,
        Image,
        Table,
        Video,
        WandB,
    )

    logged = []

    class _FakeRun:
        def log(self, data, step=None):
            logged.append((data, step))

    wb = WandB.get_instance()
    wb.configure(log_to_wandb=True)
    wb._run = _FakeRun()

    class _FakeWandbModule:
        @staticmethod
        def Image(data, caption=None):
            return ("image", caption)

        @staticmethod
        def Video(data, caption=None, format=None, fps=None):
            return ("video", format or fps)

        @staticmethod
        def Table(columns, data):
            return ("table", columns, data)

        @staticmethod
        def Histogram(sequence=None, np_histogram=None, num_bins=64):
            return ("hist", num_bins)

    import sys

    had = "wandb" in sys.modules
    orig = sys.modules.get("wandb")
    sys.modules["wandb"] = _FakeWandbModule()
    try:
        wb.log({
            "scalar": 1.0,
            "map": Image(np.zeros((4, 4)), caption="map"),
            "vid": Video("/tmp/x.gif"),
            "tbl": Table(["a"], [[1]]),
            "hist": Histogram(sequence=[1, 2, 3]),
        }, step=3)
    finally:
        if had:
            sys.modules["wandb"] = orig
        else:
            del sys.modules["wandb"]
    (data, step), = logged
    assert step == 3
    assert data["scalar"] == 1.0
    assert data["map"] == ("image", "map")
    assert data["vid"] == ("video", "gif")
    assert data["tbl"] == ("table", ["a"], [[1]])
    assert data["hist"] == ("hist", 64)

    # DiskMetricLogger writes scalars only
    disk = DiskMetricLogger(str(tmp_path / "metrics.jsonl"))
    disk.log({"scalar": 2.0, "map": Image(np.zeros((2, 2)))}, step=1)
    rec = json.loads((tmp_path / "metrics.jsonl").read_text())
    assert rec == {"scalar": 2.0, "step": 1}


def test_wandb_run_resumption(tmp_path):
    """A resumable init persists the run id; a second init in the same
    experiment dir resumes THAT run (reference: fme/core/wandb.py:237
    init_wandb_with_resumption)."""
    from ace_tpu.core.wandb import WANDB_RUN_ID_FILE, WandB

    calls = []

    class _FakeRun:
        def __init__(self, id_):
            self.id = id_

    def fake_init(**kwargs):
        calls.append(kwargs)
        return _FakeRun(kwargs.get("id", "run-abc123"))

    WandB.reset()
    wb = WandB.get_instance()
    wb.configure(log_to_wandb=True)
    # first init in a fresh experiment dir: new run, id persisted
    wb.init(resumable=True, experiment_dir=str(tmp_path),
            wandb_init=fake_init, project="p")
    assert calls[0]["resume"] == "never"
    id_file = tmp_path / WANDB_RUN_ID_FILE
    assert id_file.read_text() == "run-abc123"
    # second init (the preempted-and-restarted job): same run id resumed
    WandB.reset()
    wb2 = WandB.get_instance()
    wb2.configure(log_to_wandb=True)
    wb2.init(resumable=True, experiment_dir=str(tmp_path),
             wandb_init=fake_init, project="p")
    assert calls[1]["resume"] == "must"
    assert calls[1]["id"] == "run-abc123"
    assert wb2.get_id() == "run-abc123"
    # resumable without an experiment dir is a config error
    import pytest

    with pytest.raises(ValueError):
        wb2.init(resumable=True, wandb_init=fake_init)
    WandB.reset()


def test_wandb_watch_logs_param_histograms():
    """watch() + log_watched() emit parameter/gradient histograms on the
    configured frequency (reference wandb.watch, fme/core/wandb.py:171)."""
    import numpy as np

    from ace_tpu.core.wandb import Histogram, WandB

    logged = []

    class _FakeRun:
        id = "r"

        def log(self, data, step=None):
            logged.append((data, step))

    WandB.reset()
    wb = WandB.get_instance()
    wb.configure(log_to_wandb=True)
    wb._run = _FakeRun()
    params = {"dense": {"kernel": np.ones((3, 2), np.float32)}}
    grads = {"dense": {"kernel": np.zeros((3, 2), np.float32)}}
    # no watch active: nothing logged
    wb.log_watched(0, params, grads)
    assert logged == []
    wb.watch(log_freq=10)
    wb.log_watched(5, params, grads)  # off-frequency step
    assert logged == []

    class _FakeWandbModule:
        @staticmethod
        def Histogram(sequence=None, np_histogram=None, num_bins=64):
            return ("hist", len(sequence))

    import sys

    had = "wandb" in sys.modules
    orig = sys.modules.get("wandb")
    sys.modules["wandb"] = _FakeWandbModule()
    try:
        wb.log_watched(10, params, grads)
    finally:
        if had:
            sys.modules["wandb"] = orig
        else:
            del sys.modules["wandb"]
    (data, step), = logged
    assert step == 10
    assert data["parameters/dense/kernel"] == ("hist", 6)
    assert data["gradients/dense/kernel"] == ("hist", 6)
    WandB.reset()


def test_compilation_cache_persists_entries(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at a persistent on-disk cache
    and compiles land entries there (so segmented inference / resumed
    training recompile warm)."""
    import jax
    import jax.numpy as jnp

    from ace_tpu.core.cli import enable_compilation_cache

    cache_dir = tmp_path / "jax_cache"
    monkeypatch.setenv("ACE_TPU_COMPILATION_CACHE", str(cache_dir))
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)

        @jax.jit
        def f(x):
            return jnp.sin(x) * 2.0 + jnp.cos(x)

        f(jnp.arange(8.0)).block_until_ready()
        entries = list(cache_dir.rglob("*")) if cache_dir.exists() else []
        assert entries, "no compilation cache entries were written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

    # explicit opt-out
    monkeypatch.setenv("ACE_TPU_COMPILATION_CACHE", "0")
    enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == prev


def test_benchmark_run_writes_json_and_png(tmp_path, monkeypatch):
    """benchmark runner CLI --output-dir emits per-device+commit JSON +
    PNG (reference: fme/core/benchmark/run.py:114-125)."""
    from ace_tpu.benchmark import run as bench_run

    results = bench_run.main([
        "sht", "--repeats", "1", "--output-dir", str(tmp_path),
    ])
    assert results and results[0]["mean_ms"] > 0
    jsons = list(tmp_path.glob("bench_*.json"))
    pngs = list(tmp_path.glob("bench_*.png"))
    assert len(jsons) == 1 and len(pngs) == 1
    import json as _json

    saved = _json.loads(jsons[0].read_text())
    assert saved[0]["name"] == "sht"
    assert pngs[0].stat().st_size > 1000
