"""FCN3 model + step tests (reference model:
fme/ace/models/makani_fcn3/models/networks/test_fourcastnet3.py and
fme/ace/step tests for FCN3Step)."""

from datetime import timedelta

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import (
    HybridSigmaPressureCoordinate,
    LatLonCoordinates,
    gaussian_latitudes,
)
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.step.base import StepArgs, StepSelector
import pytest

NLAT, NLON = 16, 32


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def _dataset_info():
    lats = gaussian_latitudes(NLAT)
    lons = np.linspace(0, 360, NLON, endpoint=False)
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(lat=lats, lon=lons),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.asarray([100.0, 1000.0, 0.0]),
            bk=np.asarray([0.0, 0.4, 1.0]),
        ),
        timestep=timedelta(hours=6),
    )


def _config_dict():
    names = (
        [f"ta_{i}" for i in range(2)]
        + [f"hus_{i}" for i in range(2)]
        + [f"omega_{i}" for i in range(2)]
        + ["ps", "t2m", "precip", "insolation", "lsm"]
    )
    means = {n: 0.0 for n in names}
    stds = {n: 1.0 for n in names}
    return {
        "builder": {
            "type": "FCN3",
            "config": {
                "model_grid_type": "legendre-gauss",
                "sht_grid_type": "legendre-gauss",
                "kernel_width": 2,
                "scale_factor": 2,
                "num_layers": 2,
                "atmo_embed_dim": 4,
                "surf_embed_dim": 4,
                "aux_embed_dim": 4,
            },
        },
        "forcing_names": ["insolation", "lsm"],
        "atmosphere_prognostic_names": ["ta", "hus"],
        "atmosphere_diagnostic_names": ["omega"],
        "atmosphere_levels": 2,
        "surface_prognostic_names": ["ps", "t2m"],
        "surface_diagnostic_names": ["precip"],
        "normalization": {"network": {"means": means, "stds": stds}},
    }


def test_fcn3_step_config_names():
    from ace_tpu.core.config import from_dict
    from ace_tpu.core.step.fcn3 import FCN3StepConfig

    cfg = from_dict(FCN3StepConfig, _config_dict())
    # level-major, variables fastest (reference: fcn3.py:192)
    assert cfg.atmosphere_input_names == [
        "ta_0", "hus_0", "ta_1", "hus_1"
    ]
    assert cfg.atmosphere_output_names == [
        "ta_0", "hus_0", "omega_0", "ta_1", "hus_1", "omega_1"
    ]
    assert set(cfg.prognostic_names) == {
        "ta_0", "ta_1", "hus_0", "hus_1", "ps", "t2m"
    }
    assert set(cfg.diagnostic_names) == {
        "omega_0", "omega_1", "precip"
    }
    assert set(cfg.forcing_names) == {"insolation", "lsm"}


def test_fcn3_step_runs_and_rolls_out():
    from ace_tpu.core.step.base import StepSelector

    selector = StepSelector(type="FCN3", config=_config_dict())
    step = selector.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)

    def field():
        return jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)

    inputs = {n: field() for n in step.input_names}
    args = StepArgs(
        input=inputs,
        next_step_input_data={
            n: field() for n in step.next_step_input_names
        },
        stepper_state=step.init_stepper_state(inputs),
    )
    out = step.step(params, args)
    assert set(out.output) == set(step.output_names)
    for v in out.output.values():
        assert v.shape == (2, NLAT, NLON)
        assert bool(jnp.all(jnp.isfinite(v)))


def test_fcn3_in_stepper_rollout():
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    selector = StepSelector(type="FCN3", config=_config_dict())
    stepper = StepperConfig(step=selector).get_stepper(_dataset_info())
    stepper.params = stepper.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ic = PrognosticState(data={
        n: jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32)
        for n in stepper.prognostic_names
    })
    forcing = {
        n: jnp.asarray(rng.randn(1, 4, NLAT, NLON), jnp.float32)
        for n in stepper.forcing_window_names
    }
    outputs, _ = stepper.predict(ic, forcing)
    assert outputs["ta_0"].shape == (1, 3, NLAT, NLON)
    assert bool(jnp.all(jnp.isfinite(outputs["precip"])))
