"""Ocean corrector tests (reference model: fme/core/corrector/test_ocean.py)."""

from datetime import timedelta

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import DepthCoordinate
from ace_tpu.core.corrector.ocean import (
    OceanCorrectorConfig,
    OceanHeatContentBudgetConfig,
    SeaIceFractionConfig,
    SurfaceEnergyFluxCorrectionConfig,
)
from ace_tpu.core.gridded_ops import LatLonOperations
from ace_tpu.core.metrics import spherical_area_weights
from ace_tpu.core.ocean_data import OceanData
import pytest

NLAT, NLON, NZ = 6, 12, 2
TIMESTEP = timedelta(days=5)


def _ops():
    return LatLonOperations(
        spherical_area_weights(np.linspace(-60, 60, NLAT), NLON)
    )


def _depth():
    return DepthCoordinate(
        idepth=np.asarray([0.0, 10.0, 50.0]),
        mask=np.ones((NLAT, NLON, NZ), np.float32),
    )


def _data(rng, batch=2):
    shape = (batch, NLAT, NLON)
    data = {
        "sst": jnp.asarray(275.0 + 2 * rng.randn(*shape), jnp.float32),
        "sea_ice_fraction": jnp.asarray(
            rng.uniform(-0.3, 1.3, shape), jnp.float32
        ),
        "land_fraction": jnp.asarray(
            rng.uniform(0, 0.3, shape), jnp.float32
        ),
        "hfds": jnp.asarray(10.0 * rng.randn(*shape), jnp.float32),
        "sea_surface_fraction": jnp.asarray(
            rng.uniform(0.7, 1.0, shape), jnp.float32
        ),
        "HI": jnp.asarray(np.abs(rng.randn(*shape)), jnp.float32),
        # atmosphere flux terms for hfds correction
        "LHTFLsfc": jnp.asarray(50 + 5 * rng.randn(*shape), jnp.float32),
        "SHTFLsfc": jnp.asarray(20 + 2 * rng.randn(*shape), jnp.float32),
        "PRATEsfc": jnp.asarray(np.abs(1e-4 * rng.randn(*shape)), jnp.float32),
        "DSWRFsfc": jnp.asarray(300 + 10 * rng.randn(*shape), jnp.float32),
        "USWRFsfc": jnp.asarray(50 + 5 * rng.randn(*shape), jnp.float32),
        "DLWRFsfc": jnp.asarray(300 + 10 * rng.randn(*shape), jnp.float32),
        "ULWRFsfc": jnp.asarray(350 + 10 * rng.randn(*shape), jnp.float32),
    }
    for k in range(NZ):
        data[f"thetao_{k}"] = jnp.asarray(
            278.0 + 2 * rng.randn(*shape), jnp.float32
        )
    return data


def test_sea_ice_fraction_bounds():
    rng = np.random.RandomState(0)
    gen = _data(rng)
    cfg = OceanCorrectorConfig(
        sea_ice_fraction_correction=SeaIceFractionConfig(
            sea_ice_fraction_name="sea_ice_fraction",
            land_fraction_name="land_fraction",
            zero_where_ice_free_names=["HI"],
        )
    )
    corrector = cfg.build(_ops(), _depth(), TIMESTEP)
    out = corrector(gen, gen, gen, {})
    sif = np.asarray(out.corrected["sea_ice_fraction"])
    assert sif.min() >= 0.0 and sif.max() <= 1.0
    # ocean fraction never negative
    ocean_frac = 1 - sif - np.asarray(gen["land_fraction"])
    assert ocean_frac.min() >= -1e-6
    # thickness zero where ice-free
    hi = np.asarray(out.corrected["HI"])
    assert np.all(hi[sif == 0.0] == 0.0)


def test_ocean_heat_content_conservation():
    rng = np.random.RandomState(1)
    ops, depth = _ops(), _depth()
    input_data = _data(rng)
    gen = _data(rng)
    cfg = OceanCorrectorConfig(
        ocean_heat_content_correction=OceanHeatContentBudgetConfig(
            method="scaled_temperature"
        )
    )
    corrector = cfg.build(ops, depth, TIMESTEP)
    out = corrector(input_data, gen, {k: v for k, v in input_data.items()
                                      if k != "hfds"}, {})
    gen_ohc = np.asarray(ops.area_weighted_mean(
        OceanData(out.corrected, depth).ocean_heat_content
    ))
    input_ohc = np.asarray(ops.area_weighted_mean(
        OceanData(input_data, depth).ocean_heat_content
    ))
    flux = np.asarray(ops.area_weighted_mean(
        np.asarray(out.corrected["hfds"])
        * np.asarray(input_data["sea_surface_fraction"])
    ))
    expected = input_ohc + flux * TIMESTEP.total_seconds()
    np.testing.assert_allclose(gen_ohc, expected, rtol=1e-4)


def test_hfds_correction_methods():
    rng = np.random.RandomState(2)
    input_data = _data(rng)
    gen = _data(rng)
    for method in ("residual_prediction", "prescribed"):
        cfg = OceanCorrectorConfig(
            surface_energy_flux_correction=SurfaceEnergyFluxCorrectionConfig(
                method=method
            )
        )
        corrector = cfg.build(_ops(), _depth(), TIMESTEP)
        out = corrector(input_data, gen, input_data, {})
        assert "hfds" in out.delta
        assert np.isfinite(np.asarray(out.corrected["hfds"])).all()


def test_ice_budget_correction_conserves_and_bounds():
    """(reference model: fme/core/corrector/ice.py tests)."""
    import jax.numpy as jnp

    from ace_tpu.core.corrector.ice import IceBudgetCorrectionConfig

    cfg = IceBudgetCorrectionConfig(
        corrected_variables={"siconc": ["src", "snk", "xprt"]}
    )
    rng = np.random.RandomState(0)
    dt = 6 * 3600.0
    old = jnp.asarray(rng.uniform(0, 1, (2, 4, 8)), jnp.float32)
    gen = {
        "src": jnp.asarray(np.abs(rng.randn(2, 4, 8)) / dt, jnp.float32),
        "snk": jnp.asarray(-np.abs(rng.randn(2, 4, 8)) / dt, jnp.float32),
        "xprt": jnp.asarray(rng.randn(2, 4, 8) / dt, jnp.float32),
    }
    out = cfg(gen, {"siconc": old}, timestep=dt)
    sic = np.asarray(out["siconc"])
    # bounded to [0, 1] within fp tolerance
    assert sic.min() >= -1e-5
    assert sic.max() <= 1.0 + 1e-5
    # reconstruction identity: new = old + dt * (src + snk + xprt)
    np.testing.assert_allclose(
        sic,
        np.asarray(old)
        + dt * (np.asarray(out["src"]) + np.asarray(out["snk"])
                + np.asarray(out["xprt"])),
        atol=1e-4,
    )
    # sign constraints preserved
    assert np.asarray(out["src"]).min() >= -1e-6
    assert np.asarray(out["snk"]).max() <= 1e-6


@pytest.mark.medium_duration
def test_ice_corrector_selector_in_step():
    import jax
    import jax.numpy as jnp

    from tests.test_step_stepper import _dataset_info
    from ace_tpu.core.config import from_dict
    from ace_tpu.core.step.single_module import SingleModuleStepConfig

    cfg = from_dict(SingleModuleStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "in_names": ["siconc"],
        "out_names": ["siconc", "src", "snk", "xprt"],
        "normalization": {"network": {
            "means": {"siconc": 0.0, "src": 0.0, "snk": 0.0, "xprt": 0.0},
            "stds": {"siconc": 1.0, "src": 1.0, "snk": 1.0, "xprt": 1.0},
        }},
        "corrector": {
            "type": "ice_corrector",
            "config": {"budget_correction": {
                "corrected_variables": {
                    "siconc": ["src", "snk", "xprt"]
                }
            }},
        },
    })
    step = cfg.get_step(_dataset_info())
    from ace_tpu.core.corrector.ice import IceCorrector

    assert isinstance(step.corrector, IceCorrector)
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    from ace_tpu.core.step.base import StepArgs
    from tests.test_step_stepper import NLAT, NLON

    inputs = {
        "siconc": jnp.asarray(
            rng.uniform(0, 1, (1, NLAT, NLON)), jnp.float32
        )
    }
    out = step.step(params, StepArgs(
        input=inputs, next_step_input_data={},
        stepper_state=step.init_stepper_state(inputs),
    ))
    sic = np.asarray(out.output["siconc"])
    assert sic.min() >= -1e-5 and sic.max() <= 1.0 + 1e-5


def test_ice_budget_rebalance_leaves_violation_free_cells_untouched():
    """Violation-free cells pass through unchanged even when their sink is
    positive or source negative: the reference skips _rebalance entirely
    when nothing violates, so sign projection must be gated per-cell on
    the violation mask (reference: fme/core/corrector/ice.py:110)."""
    import jax.numpy as jnp

    from ace_tpu.core.corrector.ice import IceBudgetCorrectionConfig

    cfg = IceBudgetCorrectionConfig(
        corrected_variables={"siconc": ["src", "snk", "xprt"]}
    )
    dt = 6 * 3600.0
    # cell 0: no violation, but sink > 0 / source < 0 (sign-convention
    #   breach without a mass violation) -> must pass through unchanged
    # cell 1: mass violation (goes negative) -> corrected
    old = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
    src = jnp.asarray([[[-0.05, 0.0]]], jnp.float32) / dt
    snk = jnp.asarray([[[0.02, -0.9]]], jnp.float32) / dt
    xprt = jnp.asarray([[[0.1, 0.1]]], jnp.float32) / dt
    out = cfg(
        {"src": src, "snk": snk, "xprt": xprt}, {"siconc": old},
        timestep=dt,
    )
    # violation-free cell untouched
    np.testing.assert_allclose(np.asarray(out["src"])[0, 0, 0],
                               np.asarray(src)[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["snk"])[0, 0, 0],
                               np.asarray(snk)[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["xprt"])[0, 0, 0],
                               np.asarray(xprt)[0, 0, 0], rtol=1e-6)
    # violating cell corrected to zero mass with sign constraints held
    sic = np.asarray(out["siconc"])
    assert abs(sic[0, 0, 1]) <= 1e-6
    assert np.asarray(out["src"])[0, 0, 1] >= -1e-9
    assert np.asarray(out["snk"])[0, 0, 1] <= 1e-9
