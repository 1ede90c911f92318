"""Coupled atmosphere-ocean stepper tests
(reference model: fme/coupled/test_stepper.py — inner/outer step counts,
SST exchange, flux averaging).
"""

from datetime import timedelta

import dataclasses

import jax
import pytest
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


def _selector(in_names, out_names, ocean=None, next_step_forcing_names=None):
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
    if next_step_forcing_names:
        cfg["next_step_forcing_names"] = next_step_forcing_names
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
    # atmosphere-supplied fluxes are window averages aligned to the END
    # of the ocean step, so the ocean must declare them next-step
    # forcings (reference coupled/stepper.py:571 validation)
    ocean = StepperConfig(step=_selector(
        ["sst", "flux"], ["sst"], next_step_forcing_names=["flux"]
    ))
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


@pytest.mark.medium_duration
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
    # atmosphere-supplied fluxes are window averages aligned to the END
    # of the ocean step, so the ocean must declare them next-step
    # forcings (reference coupled/stepper.py:571 validation)
    ocean = StepperConfig(step=_selector(
        ["sst", "flux"], ["sst"], next_step_forcing_names=["flux"]
    ))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    import pytest

    with pytest.raises(ValueError, match="integer multiple"):
        config.get_stepper(_info(7), _info(12))


# ---- ported reference scenarios (fme/coupled/test_stepper.py) ----

# (atmos_in, atmos_out, ocean_in, ocean_out) -> expected name partition
# (reference test_stepper.py:150 FORCING_TEST_PARAMS; the fixture adds
# a_sfc_temp/frac on the atmosphere and o_sfc_temp on the ocean)
FORCING_TEST_PARAMS = [
    ((["a", "c"], ["a", "b"], ["a", "c"], ["c", "d"]),
     (["a", "b"], [], ["a"], ["c", "d"], [], ["c"])),
    ((["a", "c", "f"], ["a", "b"], ["a", "c"], ["c", "d"]),
     (["a", "b", "f"], ["f"], ["a"], ["c", "d"], [], ["c"])),
    ((["a", "c"], ["a", "b"], ["a", "c", "f"], ["c", "d"]),
     (["a", "b"], [], ["a"], ["c", "d", "f"], ["f"], ["c"])),
    ((["a", "c", "f"], ["a", "b"], ["b", "c", "f"], ["d"]),
     (["a", "b", "c", "f"], ["c", "f"], ["b"], ["d"], ["c", "f"], [])),
    ((["a", "c", "f"], ["a", "b"], ["b", "f"], ["d"]),
     (["a", "b", "c", "f"], ["c", "f"], ["b"], ["d"], ["f"], [])),
]


def _named_coupled(atmos_in, atmos_out, ocean_in, ocean_out,
                   next_step_forcings, a_hours=6, o_hours=12):
    atmos = StepperConfig(step=_selector(
        atmos_in + ["a_sfc_temp", "frac"], atmos_out + ["a_sfc_temp"],
        ocean={"surface_temperature_name": "a_sfc_temp",
               "ocean_fraction_name": "frac"},
    ))
    ocean = StepperConfig(step=_selector(
        ocean_in + ["o_sfc_temp"], ocean_out + ["o_sfc_temp"],
        next_step_forcing_names=next_step_forcings,
    ))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="o_sfc_temp",
    )
    return config.get_stepper(_info(a_hours), _info(o_hours))


def test_config_names_partition():
    """Exact name-partition parity with the reference's table-driven
    scenarios (reference test_stepper.py:192 test_config_names)."""
    for inputs, exp in FORCING_TEST_PARAMS:
        atmos_in, atmos_out, ocean_in, ocean_out = inputs
        (all_atmos, atmos_exog, a2o, all_ocean, ocean_exog, o2a) = exp
        coupled = _named_coupled(
            atmos_in, atmos_out, ocean_in, ocean_out,
            next_step_forcings=a2o,
        )
        assert sorted(coupled._atmosphere_forcing_exogenous_names) == \
            sorted(atmos_exog + ["frac"]), inputs
        assert sorted(coupled._atmosphere_to_ocean_forcing_names) == \
            sorted(a2o), inputs
        assert sorted(coupled._ocean_forcing_exogenous_names) == \
            sorted(ocean_exog), inputs
        assert sorted(coupled._ocean_to_atmosphere_forcing_names) == \
            sorted(o2a + ["o_sfc_temp"]), inputs
        assert sorted(coupled.all_ocean_names) == \
            sorted(all_ocean + ["o_sfc_temp"]), inputs
        assert sorted(coupled.all_atmosphere_names) == \
            sorted(all_atmos + ["frac", "a_sfc_temp"]), inputs


def test_validation_errors():
    """Component-compatibility rules (reference test_stepper.py:409-535
    + stepper.py:524 _validate_component_configs)."""
    import pytest

    # missing atmosphere OceanConfig
    atmos = StepperConfig(step=_selector(["ta"], ["ta"]))
    ocean = StepperConfig(step=_selector(["sst"], ["sst"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    with pytest.raises(ValueError, match="'ocean' config is missing"):
        config.get_stepper(_info(6), _info(12))

    # duplicate output names across components
    atmos = StepperConfig(step=_selector(
        ["ta", "surface_temperature"], ["ta", "surface_temperature", "dup"],
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=_selector(["sst", "dup"], ["sst", "dup"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    with pytest.raises(ValueError, match="cannot overlap"):
        config.get_stepper(_info(6), _info(12))

    # ocean DIAGNOSTIC used as atmosphere forcing
    atmos = StepperConfig(step=_selector(
        ["ta", "surface_temperature", "o_diag"],
        ["ta", "surface_temperature"],
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=_selector(["sst"], ["sst", "o_diag"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    with pytest.raises(ValueError, match="diagnostic"):
        config.get_stepper(_info(6), _info(12))

    # atmosphere timestep larger than the ocean's
    atmos = StepperConfig(step=_selector(
        ["ta", "surface_temperature"], ["ta", "surface_temperature"],
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=_selector(["sst"], ["sst"]))
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
    )
    with pytest.raises(ValueError, match="must not be larger"):
        config.get_stepper(_info(24), _info(12))

    # configured timedelta contradicting the dataset timestep
    config = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos, timedelta="PT6H"),
        ocean=CoupledComponentConfig(stepper=ocean, timedelta="PT12H"),
    )
    with pytest.raises(ValueError, match="does not match"):
        config.get_stepper(_info(12), _info(12))

    # explicit config timedeltas work without dataset timesteps matching
    coupled = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos, timedelta="PT6H"),
        ocean=CoupledComponentConfig(stepper=ocean, timedelta="PT12H"),
    ).get_stepper(_info(6), _info(12))
    assert coupled.n_inner_steps == 2


def _echo_module(in_names, out_names, copy_map):
    """Prebuilt module: each output channel echoes a chosen input channel
    (zero where unmapped) — lets tests observe exactly which values the
    coupled exchange fed to a component."""
    import flax.linen as nn

    class Echo(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            # params so init works; unused
            _ = self.param("dummy", nn.initializers.zeros, (1,))
            outs = []
            for name in out_names:
                src = copy_map.get(name)
                if src is None:
                    outs.append(jnp.zeros_like(x[..., :1]))
                else:
                    outs.append(x[..., in_names.index(src):
                                  in_names.index(src) + 1])
            return jnp.concatenate(outs, axis=-1)

    return Echo()


def _echo_selector(key, in_names, out_names, copy_map, ocean=None,
                   next_step_forcing_names=None):
    from ace_tpu.models.registry import register_prebuilt_module

    register_prebuilt_module(key, _echo_module(
        in_names, out_names, copy_map
    ))
    names = sorted(set(in_names) | set(out_names))
    cfg = {
        "builder": {"type": "prebuilt", "config": {"module_key": key}},
        "in_names": in_names,
        "out_names": out_names,
        "normalization": {"network": {
            "means": {n: 0.0 for n in names},
            "stds": {n: 1.0 for n in names},
        }},
    }
    if next_step_forcing_names:
        cfg["next_step_forcing_names"] = next_step_forcing_names
    if ocean is not None:
        cfg["ocean"] = ocean
    parsed = from_dict(SingleModuleStepConfig, cfg)
    return StepSelector(type="single_module", config=to_dict(parsed))


def test_ic_sst_prescribed_every_outer_step():
    """The first inner step of EVERY outer window must see the CURRENT
    ocean SST as its input surface temperature (reference
    coupled/stepper.py:986 _prescribe_ic_sst runs per outer step). The
    atmosphere net echoes its input surface temperature into the 'flux'
    diagnostic, making the input SST observable."""
    atmos_in = ["ta", "surface_temperature"]
    atmos_out = ["ta", "flux", "surface_temperature"]
    atmos = StepperConfig(step=_echo_selector(
        "echo_atmos_icsst", atmos_in, atmos_out,
        {"flux": "surface_temperature", "ta": "ta",
         "surface_temperature": "surface_temperature"},
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    # ocean SST evolves: sst_out = sst_in + flux (echo can't add, so
    # echo the flux into a diagnostic and the sst into itself; evolve
    # SST via prescribed... instead: sst_out echoes the flux forcing, so
    # SST changes every ocean step as long as fluxes differ)
    ocean = StepperConfig(step=_echo_selector(
        "echo_ocean_icsst", ["sst", "flux"], ["sst"], {"sst": "flux"},
        next_step_forcing_names=["flux"],
    ))
    coupled = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="sst",
    ).get_stepper(_info(6), _info(12))
    coupled.init_params(jax.random.PRNGKey(0))

    n_inner, n_outer = coupled.n_inner_steps, 2
    rng = np.random.RandomState(0)
    ta0 = rng.randn(1, 1, NLAT, NLON).astype(np.float32)
    ts0 = rng.randn(1, 1, NLAT, NLON).astype(np.float32)
    sst0 = rng.randn(1, 1, NLAT, NLON).astype(np.float32)
    ic = CoupledPrognosticState(
        atmosphere_data=PrognosticState(data={
            "ta": jnp.asarray(ta0), "surface_temperature": jnp.asarray(ts0),
        }),
        ocean_data=PrognosticState(data={"sst": jnp.asarray(sst0)}),
    )
    atmos_forcing = {
        "ocean_fraction": jnp.ones(
            (1, n_outer * n_inner + 1, NLAT, NLON), jnp.float32
        ),
    }
    a_out, o_out, _ = coupled.predict(
        ic, atmos_forcing, {}, rng=jax.random.PRNGKey(1)
    )
    # outer step 0, inner step 0: flux echoes the prescribed IC SST,
    # which on all-ocean points is exactly the ocean's initial SST
    np.testing.assert_allclose(
        np.asarray(a_out["flux"][:, 0]), sst0[:, 0], rtol=1e-5
    )
    # ocean step 0 output: sst echoes the window-average flux, which is
    # constant (= sst0) over the window
    np.testing.assert_allclose(
        np.asarray(o_out["sst"][:, 0]), sst0[:, 0], rtol=1e-5
    )
    # outer step 1, inner step 0: flux echoes the NEW ocean SST — the
    # off-by-one failure mode would echo sst0's atmosphere-carried copy
    np.testing.assert_allclose(
        np.asarray(a_out["flux"][:, n_inner]),
        np.asarray(o_out["sst"][:, 0]),
        rtol=1e-5,
    )


def test_flux_averaging_across_inner_steps():
    """Atmosphere fluxes reach the ocean as the average over the inner
    window (reference coupled/stepper.py:1127 _get_ocean_forcings). The
    atmosphere's flux echoes its (time-varying) ta input, the ocean's
    sst echoes the flux forcing, so the ocean output must equal the
    window mean of the atmosphere's per-inner-step fluxes."""
    atmos = StepperConfig(step=_echo_selector(
        "echo_atmos_fluxavg", ["ta", "surface_temperature", "src"],
        ["ta", "flux", "surface_temperature"],
        {"flux": "src", "ta": "ta",
         "surface_temperature": "surface_temperature"},
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=_echo_selector(
        "echo_ocean_fluxavg", ["sst", "flux"], ["sst"], {"sst": "flux"},
        next_step_forcing_names=["flux"],
    ))
    coupled = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="sst",
    ).get_stepper(_info(6), _info(12))
    coupled.init_params(jax.random.PRNGKey(0))

    n_inner, n_outer = coupled.n_inner_steps, 2
    rng = np.random.RandomState(0)
    src = rng.randn(1, n_outer * n_inner + 1, NLAT, NLON).astype(
        np.float32
    )
    ic = CoupledPrognosticState(
        atmosphere_data=PrognosticState(data={
            "ta": jnp.zeros((1, 1, NLAT, NLON), jnp.float32),
            "surface_temperature": jnp.zeros(
                (1, 1, NLAT, NLON), jnp.float32
            ),
        }),
        ocean_data=PrognosticState(
            data={"sst": jnp.zeros((1, 1, NLAT, NLON), jnp.float32)}
        ),
    )
    atmos_forcing = {
        "ocean_fraction": jnp.ones(
            (1, n_outer * n_inner + 1, NLAT, NLON), jnp.float32
        ),
        "src": jnp.asarray(src),
    }
    a_out, o_out, _ = coupled.predict(
        ic, atmos_forcing, {}, rng=jax.random.PRNGKey(1)
    )
    for i_outer in range(n_outer):
        window = np.asarray(
            a_out["flux"][:, i_outer * n_inner:(i_outer + 1) * n_inner]
        )
        np.testing.assert_allclose(
            np.asarray(o_out["sst"][:, i_outer]),
            window.mean(axis=1),
            rtol=1e-5,
            err_msg=f"outer step {i_outer}",
        )


def test_ocean_fraction_prediction():
    """ocean_fraction_prediction computes the atmosphere's ocean fraction
    at runtime: ocean_fraction = clip(1 - land - sea_ice, 0), with the
    sea-ice fraction passed through NaN-filled (reference
    coupled/stepper.py:86 CoupledOceanFractionConfig + :171
    build_ocean_data)."""
    atmos = StepperConfig(step=_echo_selector(
        "echo_atmos_ofrac",
        ["ta", "surface_temperature", "ocean_fraction", "land_fraction"],
        ["ta", "ofrac_echo", "surface_temperature"],
        {"ofrac_echo": "ocean_fraction", "ta": "ta",
         "surface_temperature": "surface_temperature"},
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=_echo_selector(
        "echo_ocean_ofrac", ["sst", "sea_ice_fraction"],
        ["sst", "sea_ice_fraction"],
        {"sst": "sst", "sea_ice_fraction": "sea_ice_fraction"},
    ))
    coupled = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="sst",
        ocean_fraction_prediction=from_dict(
            __import__(
                "ace_tpu.coupled.stepper", fromlist=["x"]
            ).CoupledOceanFractionConfig,
            {"sea_ice_fraction_name": "sea_ice_fraction",
             "land_fraction_name": "land_fraction"},
        ),
    ).get_stepper(_info(6), _info(12))
    # runtime-computed names come off the atmosphere data requirements
    assert "ocean_fraction" not in coupled.all_atmosphere_names
    assert "land_fraction" in coupled.all_atmosphere_names
    coupled.init_params(jax.random.PRNGKey(0))

    n_inner, n_outer = coupled.n_inner_steps, 1
    rng = np.random.RandomState(0)
    land = np.clip(
        np.abs(rng.randn(1, n_outer * n_inner + 1, NLAT, NLON)), 0, 1
    ).astype(np.float32)
    sea_ice0 = np.clip(
        np.abs(rng.randn(1, 1, NLAT, NLON)), 0, 1
    ).astype(np.float32)
    ic = CoupledPrognosticState(
        atmosphere_data=PrognosticState(data={
            "ta": jnp.zeros((1, 1, NLAT, NLON), jnp.float32),
            "surface_temperature": jnp.zeros(
                (1, 1, NLAT, NLON), jnp.float32
            ),
        }),
        ocean_data=PrognosticState(data={
            "sst": jnp.zeros((1, 1, NLAT, NLON), jnp.float32),
            "sea_ice_fraction": jnp.asarray(sea_ice0),
        }),
    )
    atmos_forcing = {"land_fraction": jnp.asarray(land)}
    a_out, _, _ = coupled.predict(
        ic, atmos_forcing, {}, rng=jax.random.PRNGKey(1)
    )
    # the echo at inner step 0 sees the window's index-0 forcing; land
    # fraction stays time-varying through the window (the reference's
    # build_ocean_data also receives the whole window)
    expected = np.clip(1.0 - land[:, 0] - sea_ice0[:, 0], 0, None)
    np.testing.assert_allclose(
        np.asarray(a_out["ofrac_echo"][:, 0]), expected, rtol=1e-5
    )
