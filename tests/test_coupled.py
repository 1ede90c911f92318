"""Coupled atmosphere-ocean stepper tests
(reference model: fme/coupled/test_stepper.py — inner/outer step counts,
SST exchange, flux averaging).
"""

from datetime import timedelta

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.config import from_dict, to_dict
from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.step.base import StepSelector
from ace_tpu.core.step.single_module import SingleModuleStepConfig
from ace_tpu.coupled.stepper import (
    CoupledComponentConfig,
    CoupledPrognosticState,
    CoupledStepperConfig,
)
from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

NLAT, NLON = 8, 16


def _info(hours):
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(NLAT),
            lon=np.linspace(0, 360, NLON, endpoint=False),
        ),
        timestep=timedelta(hours=hours),
    )


def _selector(in_names, out_names, ocean=None):
    names = sorted(set(in_names) | set(out_names))
    cfg = {
        "builder": {"type": "Linear", "config": {}},
        "in_names": in_names,
        "out_names": out_names,
        "normalization": {"network": {
            "means": {n: 0.0 for n in names},
            "stds": {n: 1.0 for n in names},
        }},
    }
    if ocean is not None:
        cfg["ocean"] = ocean
    parsed = from_dict(SingleModuleStepConfig, cfg)
    return StepSelector(type="single_module", config=to_dict(parsed))


def _coupled():
    atmos = StepperConfig(step=_selector(
        ["ta", "surface_temperature", "DSWRFtoa"],
        ["ta", "flux", "surface_temperature"],
        ocean={
            "surface_temperature_name": "surface_temperature",
            "ocean_fraction_name": "ocean_fraction",
        },
    ))
    ocean = StepperConfig(step=_selector(["sst", "flux"], ["sst"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="sst",
    )
    return config.get_stepper(_info(6), _info(12))


def test_n_inner_steps_from_timesteps():
    coupled = _coupled()
    assert coupled.n_inner_steps == 2
    assert coupled.surface_temperature_name == "surface_temperature"
    assert coupled._atmosphere_to_ocean_forcing_names == ["flux"]
    assert "sst" not in coupled.ocean_forcing_window_names
    assert "flux" not in coupled.ocean_forcing_window_names
    assert "surface_temperature" not in coupled.atmosphere_forcing_window_names


def test_coupled_rollout_shapes_and_exchange():
    coupled = _coupled()
    coupled.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n_outer = 3
    n_inner = coupled.n_inner_steps
    ic = CoupledPrognosticState(
        atmosphere_data=PrognosticState(data={
            "ta": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32),
            "surface_temperature": jnp.asarray(
                rng.randn(1, 1, NLAT, NLON), jnp.float32
            ),
        }),
        ocean_data=PrognosticState(data={
            "sst": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32),
        }),
    )
    atmos_forcing = {
        "DSWRFtoa": jnp.asarray(
            rng.randn(1, n_outer * n_inner + 1, NLAT, NLON), jnp.float32
        ),
        "ocean_fraction": jnp.ones(
            (1, n_outer * n_inner + 1, NLAT, NLON), jnp.float32
        ),
    }
    ocean_forcing = {}
    atmos_out, ocean_out, final = coupled.predict(
        ic, atmos_forcing, ocean_forcing
    )
    assert atmos_out["ta"].shape == (1, n_outer * n_inner, NLAT, NLON)
    assert ocean_out["sst"].shape == (1, n_outer, NLAT, NLON)

    # ocean_fraction == 1 everywhere, so the atmosphere's SST output at
    # inner steps of outer step 0 must equal the ocean IC SST (prescribed)
    np.testing.assert_allclose(
        np.asarray(atmos_out["surface_temperature"][:, 0]),
        np.asarray(ic.ocean_data.data["sst"][:, 0]),
        atol=1e-6,
    )
    # ... and at outer step 1 it must equal the ocean's first prediction
    np.testing.assert_allclose(
        np.asarray(atmos_out["surface_temperature"][:, n_inner]),
        np.asarray(ocean_out["sst"][:, 0]),
        atol=1e-6,
    )
    # final state carries both components
    assert "sst" in final.ocean_data.data
    assert "ta" in final.atmosphere_data.data


def test_incompatible_timesteps_raise():
    atmos = StepperConfig(step=_selector(
        ["ta", "surface_temperature"], ["ta", "flux", "surface_temperature"],
        ocean={
            "surface_temperature_name": "surface_temperature",
            "ocean_fraction_name": "ocean_fraction",
        },
    ))
    ocean = StepperConfig(step=_selector(["sst", "flux"], ["sst"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    import pytest

    with pytest.raises(ValueError, match="integer multiple"):
        config.get_stepper(_info(7), _info(12))
