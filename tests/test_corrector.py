"""Atmosphere corrector conservation tests (reference test model:
fme/core/corrector/test_atmosphere.py — verify each correction enforces
its constraint on synthetic data).
"""

from datetime import timedelta

import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.atmosphere_data import AtmosphereData
from ace_tpu.core.coordinates import HybridSigmaPressureCoordinate
from ace_tpu.core.corrector.atmosphere import (
    AtmosphereCorrectorConfig,
    EnergyBudgetConfig,
)
from ace_tpu.core.gridded_ops import LatLonOperations
from ace_tpu.core.metrics import spherical_area_weights
from ace_tpu.core.ocean import OceanConfig

NLAT, NLON, NZ = 8, 16, 3
TIMESTEP = timedelta(hours=6)


def _vertical_coordinate():
    ak = np.linspace(0.0, 1000.0, NZ + 1)[::-1].copy()
    bk = np.linspace(1.0, 0.0, NZ + 1)[::-1].copy()
    # monotonic interfaces from TOA (low p) to surface: use increasing bk
    ak = np.asarray([100.0, 2000.0, 1000.0, 0.0])
    bk = np.asarray([0.0, 0.2, 0.6, 1.0])
    return HybridSigmaPressureCoordinate(ak=ak, bk=bk)


def _ops():
    lats = np.linspace(-75, 75, NLAT)
    return LatLonOperations(spherical_area_weights(lats, NLON))


def _data(rng, batch=2):
    shape = (batch, NLAT, NLON)
    data = {
        "PRESsfc": jnp.asarray(1.0e5 + 1000.0 * rng.randn(*shape)),
        "LHTFLsfc": jnp.asarray(50.0 + 5.0 * rng.randn(*shape)),
        "SHTFLsfc": jnp.asarray(20.0 + 2.0 * rng.randn(*shape)),
        "PRATEsfc": jnp.asarray(np.abs(1e-4 * rng.randn(*shape)) + 1e-5),
        "DSWRFsfc": jnp.asarray(300.0 + 10.0 * rng.randn(*shape)),
        "USWRFsfc": jnp.asarray(50.0 + 5.0 * rng.randn(*shape)),
        "DLWRFsfc": jnp.asarray(300.0 + 10.0 * rng.randn(*shape)),
        "ULWRFsfc": jnp.asarray(350.0 + 10.0 * rng.randn(*shape)),
        "DSWRFtoa": jnp.asarray(400.0 + 10.0 * rng.randn(*shape)),
        "USWRFtoa": jnp.asarray(100.0 + 5.0 * rng.randn(*shape)),
        "ULWRFtoa": jnp.asarray(250.0 + 5.0 * rng.randn(*shape)),
        "HGTsfc": jnp.asarray(np.abs(100.0 * rng.randn(*shape))),
        "tendency_of_total_water_path_due_to_advection": jnp.asarray(
            1e-5 * rng.randn(*shape)
        ),
        "ocean_fraction": jnp.asarray(
            (rng.rand(*shape) > 0.5).astype(np.float32)
        ),
        "surface_temperature": jnp.asarray(288.0 + 5.0 * rng.randn(*shape)),
    }
    for k in range(NZ):
        data[f"specific_total_water_{k}"] = jnp.asarray(
            np.abs(1e-3 * rng.randn(*shape)) + 1e-4
        )
        data[f"air_temperature_{k}"] = jnp.asarray(
            250.0 + 10.0 * rng.randn(*shape)
        )
    return data


def test_dry_air_conservation():
    rng = np.random.RandomState(0)
    vc = _vertical_coordinate()
    ops = _ops()
    input_data = _data(rng)
    gen_data = _data(rng)
    config = AtmosphereCorrectorConfig(conserve_dry_air=True)
    corrector = config.build(ops, vc, TIMESTEP)
    state = corrector.init_state(input_data)
    out = corrector(input_data, gen_data, input_data, state)
    target = np.asarray(
        ops.area_weighted_mean(
            AtmosphereData(input_data, vc).surface_pressure_due_to_dry_air
        )
    )
    corrected = np.asarray(
        ops.area_weighted_mean(
            AtmosphereData(out.corrected, vc).surface_pressure_due_to_dry_air
        )
    )
    np.testing.assert_allclose(corrected, target, rtol=1e-5)
    # only surface pressure should be modified
    assert set(out.delta) == {"PRESsfc"}


def test_dry_air_state_persists_across_steps():
    rng = np.random.RandomState(1)
    vc = _vertical_coordinate()
    ops = _ops()
    ic = _data(rng)
    config = AtmosphereCorrectorConfig(conserve_dry_air=True)
    corrector = config.build(ops, vc, TIMESTEP)
    state = corrector.init_state(ic)
    # two different steps must both pin to the IC value
    target = np.asarray(ops.area_weighted_mean(
        AtmosphereData(ic, vc).surface_pressure_due_to_dry_air
    ))
    for seed in (2, 3):
        gen = _data(np.random.RandomState(seed))
        out = corrector(ic, gen, ic, state)
        state = out.corrector_state
        val = np.asarray(ops.area_weighted_mean(
            AtmosphereData(out.corrected, vc).surface_pressure_due_to_dry_air
        ))
        np.testing.assert_allclose(val, target, rtol=1e-5)


def test_zero_global_mean_moisture_advection():
    rng = np.random.RandomState(2)
    ops = _ops()
    gen = _data(rng)
    config = AtmosphereCorrectorConfig(zero_global_mean_moisture_advection=True)
    corrector = config.build(ops, _vertical_coordinate(), TIMESTEP)
    out = corrector(gen, gen, gen, {})
    mean_adv = np.asarray(ops.area_weighted_mean(
        out.corrected["tendency_of_total_water_path_due_to_advection"]
    ))
    np.testing.assert_allclose(mean_adv, 0.0, atol=1e-10)


@pytest.mark.parametrize(
    "terms", ["precipitation", "evaporation",
              "advection_and_precipitation", "advection_and_evaporation"]
)
def test_moisture_budget_closure(terms):
    rng = np.random.RandomState(3)
    vc = _vertical_coordinate()
    ops = _ops()
    input_data = _data(rng)
    gen = _data(rng)
    config = AtmosphereCorrectorConfig(moisture_budget_correction=terms)
    corrector = config.build(ops, vc, TIMESTEP)
    out = corrector(input_data, gen, input_data, {})
    gen_atm = AtmosphereData(out.corrected, vc)
    in_atm = AtmosphereData(input_data, vc)
    twp_tendency = np.asarray(ops.area_weighted_mean(
        (gen_atm.total_water_path - in_atm.total_water_path)
        / TIMESTEP.total_seconds()
    ))
    source = np.asarray(ops.area_weighted_mean(
        gen_atm.evaporation_rate - gen_atm.precipitation_rate
    ))
    np.testing.assert_allclose(twp_tendency, source, rtol=2e-2, atol=1e-10)
    if terms.startswith("advection"):
        # column-local budget closes exactly
        col_budget = np.asarray(
            (gen_atm.total_water_path - in_atm.total_water_path)
            / TIMESTEP.total_seconds()
            - (
                gen_atm.evaporation_rate
                - gen_atm.precipitation_rate
                + gen_atm.tendency_of_total_water_path_due_to_advection
            )
        )
        np.testing.assert_allclose(col_budget, 0.0, atol=1e-9)


def test_force_positive_and_gradient():
    rng = np.random.RandomState(4)
    ops = _ops()
    gen = _data(rng)
    gen["PRATEsfc"] = gen["PRATEsfc"] - 2e-4  # make some negative
    config = AtmosphereCorrectorConfig(force_positive_names=["PRATEsfc"])
    corrector = config.build(ops, None, TIMESTEP)
    out = corrector(gen, gen, gen, {})
    assert float(jnp.min(out.corrected["PRATEsfc"])) >= 0.0


def test_total_energy_conservation():
    rng = np.random.RandomState(5)
    vc = _vertical_coordinate()
    ops = _ops()
    input_data = _data(rng)
    gen = _data(rng)
    config = AtmosphereCorrectorConfig(
        total_energy_budget_correction=EnergyBudgetConfig(
            method="constant_temperature"
        )
    )
    corrector = config.build(ops, vc, TIMESTEP)
    out = corrector(input_data, gen, input_data, {})
    merged = dict(out.corrected)
    merged["DSWRFtoa"] = input_data["DSWRFtoa"]
    merged["HGTsfc"] = input_data["HGTsfc"]
    gen_atm = AtmosphereData(merged, vc)
    in_atm = AtmosphereData(input_data, vc)
    lhs = np.asarray(ops.area_weighted_mean(
        (gen_atm.total_energy_ace2_path - in_atm.total_energy_ace2_path)
        / TIMESTEP.total_seconds()
    ))
    rhs = np.asarray(ops.area_weighted_mean(
        gen_atm.net_energy_flux_into_atmosphere
    ))
    np.testing.assert_allclose(lhs, rhs, rtol=2e-2)


def test_ocean_prescribed_sst():
    rng = np.random.RandomState(6)
    data = _data(rng)
    target = _data(np.random.RandomState(7))
    ocean = OceanConfig(
        surface_temperature_name="surface_temperature",
        ocean_fraction_name="ocean_fraction",
    ).build(["surface_temperature"], ["surface_temperature"], TIMESTEP)
    out = ocean(data, data, target)
    mask = np.round(np.asarray(target["ocean_fraction"])) == 1
    np.testing.assert_array_equal(
        np.asarray(out["surface_temperature"])[mask],
        np.asarray(target["surface_temperature"])[mask],
    )
    np.testing.assert_array_equal(
        np.asarray(out["surface_temperature"])[~mask],
        np.asarray(data["surface_temperature"])[~mask],
    )
