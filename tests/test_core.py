"""Tests for config loading, registry, normalizer, packer, stacker,
gridded ops (reference test model: colocated unit tests in fme/core/).
"""

import dataclasses
from typing import Literal, Optional

import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.config import ConfigError, from_dict, to_dict, update_dict_with_dotlist
from ace_tpu.core.gridded_ops import GriddedOperations, LatLonOperations
from ace_tpu.core.metrics import spherical_area_weights, weighted_mean
from ace_tpu.core.normalizer import NormalizationConfig, StandardNormalizer
from ace_tpu.core.packer import Packer
from ace_tpu.core.stacker import Stacker


@dataclasses.dataclass
class _Inner:
    a: int
    b: float = 2.0


@dataclasses.dataclass
class _Outer:
    inner: _Inner
    name: str = "x"
    mode: Literal["fast", "slow"] = "fast"
    items: list[int] = dataclasses.field(default_factory=list)
    opt: Optional[_Inner] = None


class TestFromDict:
    def test_nested(self):
        cfg = from_dict(_Outer, {"inner": {"a": 1}, "items": [1, 2]})
        assert cfg.inner.a == 1 and cfg.inner.b == 2.0
        assert cfg.items == [1, 2]

    def test_unknown_key_raises(self):
        with pytest.raises(ConfigError, match="unknown keys"):
            from_dict(_Outer, {"inner": {"a": 1}, "bogus": 3})

    def test_missing_required_raises(self):
        with pytest.raises(ConfigError, match="missing required"):
            from_dict(_Outer, {})

    def test_literal_validation(self):
        with pytest.raises(ConfigError):
            from_dict(_Outer, {"inner": {"a": 1}, "mode": "wrong"})

    def test_optional_union(self):
        cfg = from_dict(_Outer, {"inner": {"a": 1}, "opt": {"a": 5}})
        assert cfg.opt.a == 5
        cfg2 = from_dict(_Outer, {"inner": {"a": 1}, "opt": None})
        assert cfg2.opt is None

    def test_int_for_float_ok_bool_rejected(self):
        cfg = from_dict(_Inner, {"a": 1, "b": 3})
        assert cfg.b == 3.0
        with pytest.raises(ConfigError):
            from_dict(_Inner, {"a": True})

    def test_roundtrip_to_dict(self):
        cfg = from_dict(_Outer, {"inner": {"a": 1}, "items": [3]})
        d = to_dict(cfg)
        assert from_dict(_Outer, d) == cfg

    def test_dotlist(self):
        data = {"inner": {"a": 1}}
        update_dict_with_dotlist(data, ["inner.b=4.5", "name=hello"])
        cfg = from_dict(_Outer, data)
        assert cfg.inner.b == 4.5 and cfg.name == "hello"


class TestNormalizer:
    def test_roundtrip(self):
        norm = StandardNormalizer({"t": 2.0}, {"t": 3.0})
        x = {"t": jnp.asarray([1.0, 2.0, 5.0])}
        normed = norm.normalize(x)
        np.testing.assert_allclose(
            np.asarray(normed["t"]), [-1 / 3, 0.0, 1.0], atol=1e-6
        )
        back = norm.denormalize(normed)
        np.testing.assert_allclose(np.asarray(back["t"]), [1.0, 2.0, 5.0],
                                   atol=1e-6)

    def test_passthrough_unknown_names(self):
        norm = StandardNormalizer({"t": 0.0}, {"t": 1.0})
        x = {"u": jnp.asarray([1.0])}
        assert norm.normalize(x)["u"] is x["u"]

    def test_state_roundtrip(self):
        norm = StandardNormalizer({"t": 2.0}, {"t": 3.0})
        norm2 = StandardNormalizer.from_state(norm.get_state())
        assert float(norm2.means["t"]) == 2.0

    def test_config_explicit(self):
        cfg = NormalizationConfig(means={"a": 1.0}, stds={"a": 2.0})
        norm = cfg.build(["a"])
        assert float(norm.stds["a"]) == 2.0

    def test_config_requires_stats(self):
        with pytest.raises(ValueError):
            NormalizationConfig()


class TestPacker:
    def test_pack_unpack_channels_last(self):
        packer = Packer(["a", "b"])
        data = {
            "a": jnp.ones((2, 4, 8)),
            "b": jnp.zeros((2, 4, 8)),
        }
        packed = packer.pack(data)
        assert packed.shape == (2, 4, 8, 2)
        out = packer.unpack(packed)
        np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
        np.testing.assert_array_equal(np.asarray(out["b"]), 0.0)

    def test_shape_mismatch_raises(self):
        packer = Packer(["a", "b"])
        with pytest.raises(ValueError):
            packer.pack({"a": jnp.ones((2, 4)), "b": jnp.ones((2, 5))})


class TestStacker:
    def test_stack_levels(self):
        stacker = Stacker({"q": ["q_"]})
        data = {"q_0": jnp.zeros((3, 4)), "q_1": jnp.ones((3, 4))}
        stacked = stacker("q", data)
        assert stacked.shape == (3, 4, 2)
        assert float(stacked[0, 0, 1]) == 1.0

    def test_exact_name(self):
        stacker = Stacker({"ps": ["PRESsfc"]})
        data = {"PRESsfc": jnp.zeros((3, 4))}
        assert stacker("ps", data).shape == (3, 4, 1)

    def test_missing_level_raises(self):
        stacker = Stacker({"q": ["q_"]})
        with pytest.raises(ValueError):
            stacker.get_all_level_names(
                "q", {"q_0": jnp.zeros(1), "q_2": jnp.zeros(1)}
            )


class TestGriddedOps:
    def test_area_weighted_mean_uniform(self):
        lats = np.linspace(-80, 80, 9)
        ops = LatLonOperations(spherical_area_weights(lats, 18))
        data = jnp.full((2, 9, 18), 3.0)
        np.testing.assert_allclose(
            np.asarray(ops.area_weighted_mean(data)), 3.0, rtol=1e-5
        )

    def test_weighting_matters(self):
        lats = np.asarray([-45.0, 45.0])
        ops = LatLonOperations(spherical_area_weights(lats, 4))
        # both lat rows have equal weight here, so mean is 0.5
        val = float(ops.area_weighted_mean(jnp.asarray(
            np.concatenate([np.zeros((1, 1, 4)), np.ones((1, 1, 4))], axis=1)
        ))[0])
        assert abs(val - 0.5) < 1e-6

    def test_state_roundtrip(self):
        lats = np.linspace(-80, 80, 5)
        ops = LatLonOperations(spherical_area_weights(lats, 10))
        ops2 = GriddedOperations.from_state(ops.get_state())
        assert isinstance(ops2, LatLonOperations)
        np.testing.assert_allclose(
            np.asarray(ops2.area_weights), np.asarray(ops.area_weights)
        )

    def test_rmse_and_bias(self):
        lats = np.linspace(-80, 80, 5)
        ops = LatLonOperations(spherical_area_weights(lats, 10))
        truth = jnp.zeros((5, 10))
        pred = jnp.ones((5, 10))
        assert abs(float(ops.area_weighted_rmse(truth, pred)) - 1.0) < 1e-6
        assert abs(float(ops.area_weighted_mean_bias(truth, pred)) - 1.0) < 1e-6


def test_weighted_mean_ignores_zero_weight_nans():
    data = jnp.asarray([1.0, float("nan"), 3.0])
    weights = jnp.asarray([1.0, 0.0, 1.0])
    assert float(weighted_mean(data, weights, dim=0)) == 2.0


def test_ocean_derived_quantities():
    from datetime import timedelta

    import jax.numpy as jnp

    from ace_tpu.core.coordinates import DepthCoordinate
    from ace_tpu.core.derived_variables import (
        compute_ocean_derived_quantities,
    )

    rng = np.random.RandomState(0)
    dc = DepthCoordinate(
        idepth=np.asarray([0.0, 10.0, 30.0]),
        mask=np.ones((4, 8, 2), np.float32),
    )
    data = {
        "thetao_0": jnp.asarray(rng.rand(1, 3, 4, 8) * 10 + 280,
                                jnp.float32),
        "thetao_1": jnp.asarray(rng.rand(1, 3, 4, 8) * 5 + 275,
                                jnp.float32),
        "hfds": jnp.asarray(rng.randn(1, 3, 4, 8) * 10, jnp.float32),
        "land_fraction": jnp.zeros((1, 3, 4, 8), jnp.float32),
    }
    out = compute_ocean_derived_quantities(
        data, dc, timedelta(hours=6)
    )
    assert "ocean_heat_content" in out
    assert "ocean_heat_content_tendency" in out
    assert "net_energy_flux_into_ocean_column" in out
    ohc = np.asarray(out["ocean_heat_content"])
    assert ohc.shape == (1, 3, 4, 8)
    assert (ohc > 0).all()
    # tendency consistent with finite difference
    tend = np.asarray(out["ocean_heat_content_tendency"])
    expected = (ohc[:, 1:] - ohc[:, :-1]) / (6 * 3600.0)
    np.testing.assert_allclose(tend[:, 1:], expected, rtol=2e-3)
