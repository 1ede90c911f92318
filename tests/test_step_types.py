"""Tests for multi_call, separate_radiation, and secondary_module steps
(reference models: fme/core/step/test_multi_call.py, test_radiation.py,
test_secondary_module.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.config import from_dict
from ace_tpu.core.step.base import StepArgs, StepSelector
from ace_tpu.core.step.multi_call import MultiCallStepConfig, get_multi_call_name
from ace_tpu.core.step.separate_radiation import (
    SecondaryModuleStepConfig,
    SeparateRadiationStepConfig,
)

from tests.test_step_stepper import NLAT, NLON, _dataset_info


def _norm(names):
    return {"network": {
        "means": {n: 0.0 for n in names},
        "stds": {n: 1.0 for n in names},
    }}


def test_multi_call_name_suffixing():
    assert get_multi_call_name("ULWRFtoa", "_2xCO2") == "ULWRFtoa_2xCO2"
    assert get_multi_call_name("T_0", "_2xCO2") == "T_2xCO2_0"


def test_multi_call_step():
    names = ["prog", "co2", "flux"]
    inner = {
        "builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "co2"],
        "out_names": ["prog", "flux"],
        "normalization": _norm(names),
    }
    cfg = from_dict(MultiCallStepConfig, {
        "wrapped_step": {"type": "single_module", "config": inner},
        "config": {
            "forcing_name": "co2",
            "forcing_multipliers": {"_2xCO2": 2.0, "_half_co2": 0.5},
            "output_names": ["flux"],
        },
    })
    assert set(cfg.output_names) == {
        "prog", "flux", "flux_2xCO2", "flux_half_co2"
    }
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "co2": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={},
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) == {"prog", "flux", "flux_2xCO2", "flux_half_co2"}
    # doubling co2 must differ from halving unless net ignores co2
    assert not np.allclose(
        np.asarray(out.output["flux_2xCO2"]),
        np.asarray(out.output["flux_half_co2"]),
    )
    # unperturbed flux differs from perturbed
    assert not np.allclose(
        np.asarray(out.output["flux"]), np.asarray(out.output["flux_2xCO2"])
    )


def test_multi_call_via_selector_rollout():
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    names = ["prog", "co2", "flux"]
    inner = {
        "builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "co2"],
        "out_names": ["prog", "flux"],
        "normalization": _norm(names),
    }
    sel = StepSelector(type="multi_call", config={
        "wrapped_step": {"type": "single_module", "config": inner},
        "config": {
            "forcing_name": "co2",
            "forcing_multipliers": {"_2xCO2": 2.0},
            "output_names": ["flux"],
        },
    })
    stepper = StepperConfig(step=sel).get_stepper(_dataset_info())
    stepper.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ic = PrognosticState(data={
        "prog": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32)
    })
    forcing = {"co2": jnp.asarray(rng.randn(1, 4, NLAT, NLON), jnp.float32)}
    outputs, _ = stepper.predict(ic, forcing)
    assert "flux_2xCO2" in outputs
    assert outputs["flux_2xCO2"].shape == (1, 3, NLAT, NLON)


def test_separate_radiation_step():
    all_names = ["T", "sw_down", "aerosol", "rad_flux", "precip"]
    cfg = from_dict(SeparateRadiationStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "radiation_builder": {"type": "Linear", "config": {}},
        "main_prognostic_names": ["T"],
        "shared_forcing_names": ["sw_down"],
        "radiation_only_forcing_names": ["aerosol"],
        "radiation_diagnostic_names": ["rad_flux"],
        "main_diagnostic_names": ["precip"],
        "normalization": _norm(all_names),
    })
    assert set(cfg.input_names) == {"T", "sw_down", "aerosol"}
    assert set(cfg.output_names) == {"T", "rad_flux", "precip"}
    assert cfg.prognostic_names == ["T"]
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    assert set(params) == {"radiation", "main"}
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            n: jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
            for n in ["T", "sw_down", "aerosol"]
        },
        next_step_input_data={},
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) == {"T", "rad_flux", "precip"}


def test_secondary_module_step():
    all_names = ["prog", "forcing", "diag", "extra", ]
    cfg = from_dict(SecondaryModuleStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "secondary_builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "forcing"],
        "out_names": ["prog", "diag"],
        "secondary_out_names": ["extra"],
        "secondary_residual_out_names": ["diag"],
        "normalization": _norm(all_names),
    })
    assert set(cfg.output_names) == {"prog", "diag", "extra"}
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "forcing": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={},
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) == {"prog", "diag", "extra"}
    # "diag" includes the secondary residual: differs from main-only output
    main_only_cfg = from_dict(SecondaryModuleStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "secondary_builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "forcing"],
        "out_names": ["prog", "diag"],
        "secondary_out_names": ["extra"],
        "normalization": _norm(all_names),
    })
    step2 = main_only_cfg.get_step(_dataset_info())
    params2 = step2.init_params(jax.random.PRNGKey(0))
    # same main-module params; secondary differs in output channels
    params2["main"] = params["main"]
    out2 = step2.step(params2, args)
    assert not np.allclose(
        np.asarray(out.output["diag"]), np.asarray(out2.output["diag"])
    )


def test_secondary_module_config_validations():
    base = {
        "builder": {"type": "Linear", "config": {}},
        "secondary_builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "forcing"],
        "out_names": ["prog", "diag"],
        "secondary_out_names": ["extra"],
        "normalization": _norm(["prog", "forcing", "diag", "extra"]),
    }
    # prescribed prognostic must be an out_name
    with pytest.raises(ValueError, match="prescribed_prognostic_name"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "prescribed_prognostic_names": ["forcing"]})
    # next-step forcing must be an in_name and not an out_name
    with pytest.raises(ValueError, match="not in in_names"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "next_step_forcing_names": ["nope"]})
    with pytest.raises(ValueError, match="output variable"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "next_step_forcing_names": ["prog"]})
    # secondary_out_names may not overlap secondary_residual_out_names
    with pytest.raises(ValueError, match="must not overlap"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "secondary_residual_out_names": ["extra"]})
    # decoder diagnostics may not collide with inputs or outputs
    dec = {"secondary_diagnostic_names": ["forcing"],
           "network": {"type": "Linear", "config": {}}}
    with pytest.raises(ValueError, match="is an input"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "secondary_decoder": dec})
    dec["secondary_diagnostic_names"] = ["extra"]
    with pytest.raises(ValueError, match="is an output"):
        from_dict(SecondaryModuleStepConfig,
                  {**base, "secondary_decoder": dec})


def test_secondary_module_decoder_and_normalize_names():
    all_names = ["prog", "forcing", "diag", "extra", "decoded"]
    cfg = from_dict(SecondaryModuleStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "secondary_builder": {"type": "Linear", "config": {}},
        "in_names": ["prog", "forcing"],
        "out_names": ["prog", "diag"],
        "secondary_out_names": ["extra"],
        "secondary_decoder": {
            "secondary_diagnostic_names": ["decoded"],
            "network": {"type": "Linear", "config": {}},
        },
        "normalization": _norm(all_names),
        "ocean": {
            "surface_temperature_name": "prog",
            "ocean_fraction_name": "ofrac",
        },
    })
    assert set(cfg.output_names) == {"prog", "diag", "extra", "decoded"}
    # ocean forcing names appear in input_names but are never normalized
    assert "ofrac" in cfg.input_names
    assert set(cfg._normalize_names) == set(all_names)
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    assert set(params) == {"main", "secondary", "secondary_decoder"}
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            n: jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
            for n in ["prog", "forcing", "ofrac"]
        },
        next_step_input_data={
            n: jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
            for n in ["forcing", "ofrac", "prog"]
        },
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) >= {"prog", "diag", "extra", "decoded"}
    # the decoder sees a stop_gradient of the primary outputs: its loss
    # cannot perturb the main module (smoke: grads through decoded output
    # w.r.t. main params are zero)
    def loss(p):
        o = step.step(p, args)
        return jnp.sum(o.output["decoded"] ** 2)

    grads = jax.grad(loss)(params)
    main_leaves = jax.tree_util.tree_leaves(grads["main"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in main_leaves)
    dec_leaves = jax.tree_util.tree_leaves(grads["secondary_decoder"])
    assert any(float(jnp.abs(g).max()) > 0.0 for g in dec_leaves)


def test_separate_radiation_normalize_names_exclude_ocean_forcings():
    all_names = ["T", "sw_down", "aerosol", "rad_flux", "precip"]
    cfg = from_dict(SeparateRadiationStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "radiation_builder": {"type": "Linear", "config": {}},
        "main_prognostic_names": ["T"],
        "shared_forcing_names": ["sw_down"],
        "radiation_only_forcing_names": ["aerosol"],
        "radiation_diagnostic_names": ["rad_flux"],
        "main_diagnostic_names": ["precip"],
        "normalization": _norm(all_names),
        "ocean": {
            "surface_temperature_name": "T",
            "ocean_fraction_name": "ofrac",
        },
    })
    assert "ofrac" in cfg.input_names
    assert set(cfg._normalize_names) == set(all_names)


@pytest.mark.parametrize("detach", [False, True])
def test_separate_radiation_detach_gradients(detach):
    """detach_radiation stops main-loss gradients at the radiation module
    (reference model: fme/core/step/test_radiation.py:125)."""
    all_names = ["T", "sw_down", "aerosol", "rad_flux", "precip"]
    cfg = from_dict(SeparateRadiationStepConfig, {
        "builder": {"type": "Linear", "config": {}},
        "radiation_builder": {"type": "Linear", "config": {}},
        "main_prognostic_names": ["T"],
        "shared_forcing_names": ["sw_down"],
        "radiation_only_forcing_names": ["aerosol"],
        "radiation_diagnostic_names": ["rad_flux"],
        "main_diagnostic_names": ["precip"],
        "normalization": _norm(all_names),
        "detach_radiation": detach,
    })
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            n: jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
            for n in ["T", "sw_down", "aerosol"]
        },
        next_step_input_data={},
        stepper_state={},
    )

    def main_loss(p):
        out = step.step(p, args)
        return jnp.sum(out.output["T"] ** 2) + jnp.sum(
            out.output["precip"] ** 2
        )

    grads = jax.grad(main_loss)(params)
    rad_mag = max(
        float(jnp.abs(g).max())
        for g in jax.tree_util.tree_leaves(grads["radiation"])
    )
    if detach:
        assert rad_mag == 0.0
    else:
        assert rad_mag > 0.0
    # rad_flux itself still trains the radiation module either way
    def rad_loss(p):
        out = step.step(p, args)
        return jnp.sum(out.output["rad_flux"] ** 2)

    grads2 = jax.grad(rad_loss)(params)
    assert max(
        float(jnp.abs(g).max())
        for g in jax.tree_util.tree_leaves(grads2["radiation"])
    ) > 0.0
