"""Step + Stepper rollout tests (reference model: fme/core/step/test_*.py
and fme/ace/stepper tests — step semantics, forcing insertion, rollout
consistency between scan and a python loop).
"""

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
from ace_tpu.core.step.single_module import SingleModuleStepConfig  # noqa: F401
from ace_tpu.stepper.stepper import PrognosticState, Stepper, StepperConfig

NLAT, NLON = 8, 16


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


def _step_config(**kwargs):
    defaults = dict(
        builder={"type": "Linear", "config": {}},
        in_names=["prog", "forcing_var"],
        out_names=["prog", "diag"],
        normalization={
            "network": {
                "means": {"prog": 0.0, "forcing_var": 0.0, "diag": 0.0},
                "stds": {"prog": 1.0, "forcing_var": 1.0, "diag": 1.0},
            }
        },
    )
    defaults.update(kwargs)
    from ace_tpu.core.config import from_dict

    return from_dict(SingleModuleStepConfig, defaults)


def _selector(**kwargs):
    from ace_tpu.core.config import to_dict

    cfg = _step_config(**kwargs)
    d = to_dict(cfg)
    return StepSelector(type="single_module", config=d)


def test_step_names():
    cfg = _step_config()
    assert cfg.prognostic_names == ["prog"]
    assert cfg.forcing_names == ["forcing_var"]
    assert cfg.diagnostic_names == ["diag"]
    assert set(cfg.next_step_input_names) == {"forcing_var"}


def test_single_step_runs():
    step = _step_config().get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) == {"prog", "diag"}
    assert out.output["prog"].shape == (2, NLAT, NLON)


def test_rollout_scan_matches_python_loop():
    stepper = StepperConfig(step=_selector()).get_stepper(_dataset_info())
    params = stepper.init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    n_steps = 4
    ic = PrognosticState(
        data={"prog": jnp.asarray(rng.randn(2, 1, NLAT, NLON), jnp.float32)}
    )
    forcing = {
        "forcing_var": jnp.asarray(
            rng.randn(2, n_steps + 1, NLAT, NLON), jnp.float32
        )
    }
    outputs, next_ic = stepper.predict(ic, forcing)
    assert outputs["prog"].shape == (2, n_steps, NLAT, NLON)

    # python-loop reference rollout
    step = stepper.step
    state = {"prog": ic.data["prog"][:, -1]}
    expected = []
    for t in range(n_steps):
        out = step.step(
            params,
            StepArgs(
                input={**state, "forcing_var": forcing["forcing_var"][:, t]},
                next_step_input_data={
                    "forcing_var": forcing["forcing_var"][:, t + 1]
                },
                stepper_state={},
            ),
        )
        state = {"prog": out.output["prog"]}
        expected.append(out.output["prog"])
    expected = jnp.stack(expected, axis=1)
    np.testing.assert_allclose(
        np.asarray(outputs["prog"]), np.asarray(expected), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(next_ic.data["prog"][:, 0]),
        np.asarray(expected[:, -1]),
        atol=1e-6,
    )


def test_next_step_forcing_names_use_future_slice():
    stepper = StepperConfig(
        step=_selector(next_step_forcing_names=["forcing_var"])
    ).get_stepper(_dataset_info())
    params = stepper.init_params(jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    n_steps = 2
    ic = PrognosticState(
        data={"prog": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32)}
    )
    forcing_arr = jnp.asarray(rng.randn(1, n_steps + 1, NLAT, NLON), jnp.float32)
    outputs, _ = stepper.predict(ic, {"forcing_var": forcing_arr})

    # manual: at step t the input forcing should be slice t+1
    step = stepper.step
    out = step.step(
        params,
        StepArgs(
            input={"prog": ic.data["prog"][:, -1],
                   "forcing_var": forcing_arr[:, 1]},
            next_step_input_data={"forcing_var": forcing_arr[:, 1]},
            stepper_state={},
        ),
    )
    np.testing.assert_allclose(
        np.asarray(outputs["prog"][:, 0]),
        np.asarray(out.output["prog"]),
        atol=1e-6,
    )


def test_ocean_prescription_in_rollout():
    sel = _selector(
        in_names=["prog", "surface_temperature"],
        out_names=["prog", "surface_temperature"],
        normalization={
            "network": {
                "means": {
                    "prog": 0.0,
                    "surface_temperature": 0.0,
                },
                "stds": {
                    "prog": 1.0,
                    "surface_temperature": 1.0,
                },
            }
        },
        ocean={
            "surface_temperature_name": "surface_temperature",
            "ocean_fraction_name": "ocean_fraction",
        },
    )
    stepper = StepperConfig(step=sel).get_stepper(_dataset_info())
    stepper.init_params(jax.random.PRNGKey(3))
    assert "ocean_fraction" in stepper.forcing_window_names
    assert "surface_temperature" in stepper.forcing_window_names
    rng = np.random.RandomState(3)
    n_steps = 3
    ic = PrognosticState(
        data={
            "prog": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32),
            "surface_temperature": jnp.asarray(
                rng.randn(1, 1, NLAT, NLON), jnp.float32
            ),
        }
    )
    forcing = {
        "ocean_fraction": jnp.asarray(
            (rng.rand(1, n_steps + 1, NLAT, NLON) > 0.5).astype(np.float32)
        ),
        "surface_temperature": jnp.asarray(
            rng.randn(1, n_steps + 1, NLAT, NLON), jnp.float32
        ),
    }
    outputs, _ = stepper.predict(ic, forcing)
    # where ocean_fraction rounds to 1, output SST must equal the forcing SST
    for t in range(n_steps):
        mask = np.round(np.asarray(forcing["ocean_fraction"][:, t + 1])) == 1
        np.testing.assert_allclose(
            np.asarray(outputs["surface_temperature"][:, t])[mask],
            np.asarray(forcing["surface_temperature"][:, t + 1])[mask],
            atol=1e-6,
        )


def test_corrector_state_threads_through_rollout():
    """Dry-air conservation must hold at every step of a scan rollout."""
    in_names = ["PRESsfc", "specific_total_water_0", "specific_total_water_1",
                "forcing_var"]
    out_names = ["PRESsfc", "specific_total_water_0", "specific_total_water_1"]
    stats = {n: 0.0 for n in set(in_names) | set(out_names)}
    # keep denormalized outputs at physical magnitudes so the water-weighted
    # dry-air solve stays well-conditioned (as it is for real data)
    stds = {n: 1e-3 for n in set(in_names) | set(out_names)}
    stds["PRESsfc"] = 100.0
    stds["forcing_var"] = 1.0
    means = dict(stats)
    means["PRESsfc"] = 1.0e5
    sel = _selector(
        in_names=in_names,
        out_names=out_names,
        normalization={"network": {"means": means, "stds": stds}},
        corrector={"conserve_dry_air": True},
    )
    stepper = StepperConfig(step=sel).get_stepper(_dataset_info())
    stepper.init_params(jax.random.PRNGKey(4))
    rng = np.random.RandomState(4)
    n_steps = 3
    ic_data = {
        "PRESsfc": jnp.asarray(
            1e5 + 100 * rng.randn(1, 1, NLAT, NLON), jnp.float32
        ),
        "specific_total_water_0": jnp.asarray(
            np.abs(1e-3 * rng.randn(1, 1, NLAT, NLON)), jnp.float32
        ),
        "specific_total_water_1": jnp.asarray(
            np.abs(1e-3 * rng.randn(1, 1, NLAT, NLON)), jnp.float32
        ),
    }
    ic = PrognosticState(data=ic_data)
    forcing = {
        "forcing_var": jnp.asarray(
            rng.randn(1, n_steps + 1, NLAT, NLON), jnp.float32
        )
    }
    outputs, next_ic = stepper.predict(ic, forcing)

    from ace_tpu.core.atmosphere_data import AtmosphereData

    info = _dataset_info()
    ops = info.gridded_operations
    vc = info.atmosphere_vertical_coordinate
    target = float(ops.area_weighted_mean(
        AtmosphereData(
            {k: v[:, 0] for k, v in ic_data.items()}, vc
        ).surface_pressure_due_to_dry_air
    )[0])
    for t in range(n_steps):
        step_data = {k: outputs[k][:, t] for k in out_names}
        val = float(ops.area_weighted_mean(
            AtmosphereData(step_data, vc).surface_pressure_due_to_dry_air
        )[0])
        assert abs(val - target) / abs(target) < 1e-5, (t, val, target)
    # final stepper state still carries the IC reference
    assert "corrector" in next_ic.stepper_state

def test_global_mean_removal_per_channel():
    cfg = _step_config(
        global_mean_removal={"names": ["prog"], "mode": "per_channel"}
    )
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # input with a large global-mean offset; offset must be removed
    # before the network and restored after (reference semantics)
    base = jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
    args = StepArgs(
        input={
            "prog": base + 100.0,
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    args0 = StepArgs(
        input={"prog": base, "forcing_var": args.input["forcing_var"]},
        next_step_input_data=args.next_step_input_data,
        stepper_state={},
    )
    out0 = step.step(params, args0)
    # network saw identical shifted fields -> outputs differ only by the
    # restored offset on the listed prognostic
    np.testing.assert_allclose(
        np.asarray(out.output["prog"]) - 100.0,
        np.asarray(out0.output["prog"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.output["diag"]),
        np.asarray(out0.output["diag"]),
        atol=1e-5,
    )


def test_global_mean_removal_append_as_input_channel_count():
    cfg = _step_config(
        global_mean_removal={
            "names": ["prog"],
            "mode": "per_channel",
            "append_as_input": True,
        }
    )
    step = cfg.get_step(_dataset_info())
    assert step.in_packer.names == ["prog", "forcing_var", "prog_global_mean"]
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32) + 7.0,
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    assert out.output["prog"].shape == (2, NLAT, NLON)


def test_global_mean_removal_shared_mode():
    cfg = _step_config(
        global_mean_removal={
            "names": ["prog", "diag"],
            "mode": "shared",
            "reference_field": "prog",
        }
    )
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    base = jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
    shift = 50.0
    args = StepArgs(
        input={
            "prog": base + shift,
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    args0 = StepArgs(
        input={"prog": base, "forcing_var": args.input["forcing_var"]},
        next_step_input_data=args.next_step_input_data,
        stepper_state={},
    )
    out0 = step.step(params, args0)
    # shared offset restored on BOTH listed outputs
    np.testing.assert_allclose(
        np.asarray(out.output["prog"]) - shift,
        np.asarray(out0.output["prog"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.output["diag"]) - shift,
        np.asarray(out0.output["diag"]),
        atol=1e-4,
    )


def test_global_mean_removal_validates_names():
    import pytest

    with pytest.raises(ValueError):
        _step_config(global_mean_removal={"names": ["bogus"]})


def test_input_dropout_training_only():
    cfg = _step_config(
        input_dropout={
            "override_groups": [
                {
                    "variables": ["forcing_var"],
                    "masking": {"rate": 1.0},
                }
            ]
        }
    )
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    args_kw = dict(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    # training step (deterministic=False, rng given): forcing always dropped
    out_train = step.step(
        params,
        StepArgs(
            **args_kw, rng=jax.random.PRNGKey(1), deterministic=False
        ),
    )
    # same input but forcing zeroed explicitly must match exactly
    zeroed = dict(args_kw["input"])
    zeroed["forcing_var"] = jnp.zeros_like(zeroed["forcing_var"])
    out_zeroed = step.step(
        params,
        StepArgs(
            input=zeroed,
            next_step_input_data=args_kw["next_step_input_data"],
            stepper_state={},
            rng=jax.random.PRNGKey(1),
            deterministic=False,
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out_train.output["prog"]),
        np.asarray(out_zeroed.output["prog"]),
        atol=1e-6,
    )
    # eval step: dropout inert, differs from the dropped result
    out_eval = step.step(params, StepArgs(**args_kw))
    assert not np.allclose(
        np.asarray(out_eval.output["prog"]),
        np.asarray(out_train.output["prog"]),
    )


def test_include_channel_mask_inputs():
    cfg = _step_config(include_channel_mask_inputs=True)
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    # Linear module saw 4 input channels (2 real + 2 mask)
    kernel = jax.tree_util.tree_leaves(params)[0]
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    assert out.output["prog"].shape == (2, NLAT, NLON)


def test_data_mask_zeroes_absent_inputs():
    cfg = _step_config(include_channel_mask_inputs=True)
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    inp = {
        "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
    }
    nsf = {"forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)}
    # sample 0 missing forcing_var; sample 1 has it
    mask = {"forcing_var": jnp.asarray([False, True])}
    out = step.step(
        params,
        StepArgs(
            input=inp, next_step_input_data=nsf, stepper_state={},
            data_mask=mask,
        ),
    )
    # sample 0 must match a run with forcing zeroed AND mask channel 0
    zeroed = dict(inp)
    zeroed["forcing_var"] = jnp.zeros_like(inp["forcing_var"])
    out_zeroed = step.step(
        params,
        StepArgs(
            input=zeroed, next_step_input_data=nsf, stepper_state={},
            data_mask={"forcing_var": jnp.asarray([False, False])},
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out.output["prog"][0]),
        np.asarray(out_zeroed.output["prog"][0]),
        atol=1e-6,
    )
    # sample 1 differs (mask channel flips)
    assert not np.allclose(
        np.asarray(out.output["prog"][1]),
        np.asarray(out_zeroed.output["prog"][1]),
    )


def test_secondary_decoder():
    cfg = _step_config(
        secondary_decoder={
            "secondary_diagnostic_names": ["sec_diag"],
            "network": {"type": "Linear", "config": {}},
        },
        normalization={
            "network": {
                "means": {
                    "prog": 0.0, "forcing_var": 0.0, "diag": 0.0,
                    "sec_diag": 0.0,
                },
                "stds": {
                    "prog": 1.0, "forcing_var": 1.0, "diag": 1.0,
                    "sec_diag": 1.0,
                },
            }
        },
    )
    assert set(cfg.output_names) == {"prog", "diag", "sec_diag"}
    assert "sec_diag" in cfg.loss_names
    step = cfg.get_step(_dataset_info())
    params = step.init_params(jax.random.PRNGKey(0))
    assert set(params) == {"main", "secondary_decoder"}
    rng = np.random.RandomState(0)
    args = StepArgs(
        input={
            "prog": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32),
        },
        next_step_input_data={
            "forcing_var": jnp.asarray(rng.randn(2, NLAT, NLON), jnp.float32)
        },
        stepper_state={},
    )
    out = step.step(params, args)
    assert set(out.output) == {"prog", "diag", "sec_diag"}

    # gradient isolation: loss on sec_diag must not reach main params
    # (decoder sees a stop_gradient of the main output)
    def sec_loss(p):
        o = step.step(p, args)
        return jnp.mean(o.output["sec_diag"] ** 2)

    grads = jax.grad(sec_loss)(params)
    main_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["main"])
    )
    sec_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["secondary_decoder"])
    )
    assert main_norm == 0.0
    assert sec_norm > 0.0


def test_output_masking_from_dataset_masks():
    """Dataset mask_* fields NaN-fill masked output regions each step
    (reference: spatial_mask_provider.py:116 fills outputs with NaN)."""
    import dataclasses as dc

    from ace_tpu.core.config import to_dict
    from ace_tpu.core.masking import MaskProvider
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    info = _dataset_info()
    mask = np.ones((NLAT, NLON), np.float32)
    mask[:, : NLON // 2] = 0.0
    info = dc.replace(
        info, mask_provider=MaskProvider({"mask_2d": mask})
    )
    sel = StepSelector(type="single_module", config=to_dict(_step_config()))
    stepper = StepperConfig(step=sel).get_stepper(info)
    stepper.params = stepper.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ic = PrognosticState(data={
        "prog": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32)
    })
    forcing = {
        "forcing_var": jnp.asarray(rng.randn(1, 3, NLAT, NLON), jnp.float32)
    }
    outputs, _ = stepper.predict(ic, forcing)
    out = np.asarray(outputs["prog"])
    assert np.all(np.isnan(out[..., : NLON // 2]))
    assert np.isfinite(out[..., NLON // 2 :]).all()
    assert np.abs(out[..., NLON // 2 :]).max() > 0.0
    # mask provider round-trips through dataset_info serialization
    from ace_tpu.core.dataset_info import DatasetInfo

    info2 = DatasetInfo.from_state(info.get_state())
    assert info2.mask_provider == info.mask_provider


def test_input_masking_fills_masked_regions():
    """input_masking replaces statically masked regions of step INPUTS
    with a fill value, so predictions are independent of input values
    there (reference: fme/core/spatial_masking.py
    StaticSpatialMaskingConfig, wired via single_module.py:536
    input_masking)."""
    import dataclasses as dc

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.masking import MaskProvider, StaticSpatialMaskingConfig
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    info = _dataset_info()
    mask = np.ones((NLAT, NLON), np.float32)
    mask[:, : NLON // 2] = 0.0
    info = dc.replace(info, mask_provider=MaskProvider({"mask_2d": mask}))
    sel = _selector()
    config = StepperConfig(
        step=sel,
        input_masking=StaticSpatialMaskingConfig(
            mask_value=0, fill_value=0.0
        ),
    )
    stepper = config.get_stepper(info)
    stepper.params = stepper.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ic_clean = rng.randn(1, 1, NLAT, NLON).astype(np.float32)
    forcing_clean = rng.randn(1, 3, NLAT, NLON).astype(np.float32)
    # garbage in the masked region only
    ic_dirty = ic_clean.copy()
    ic_dirty[..., : NLON // 2] += 1e3
    forcing_dirty = forcing_clean.copy()
    forcing_dirty[..., : NLON // 2] -= 1e3

    def run(stp, ic, forc):
        out, _ = stp.predict(
            PrognosticState(data={"prog": jnp.asarray(ic)}),
            {"forcing_var": jnp.asarray(forc)},
        )
        return {k: np.asarray(v) for k, v in out.items()}

    out_clean = run(stepper, ic_clean, forcing_clean)
    out_dirty = run(stepper, ic_dirty, forcing_dirty)
    for k in out_clean:
        np.testing.assert_allclose(
            out_clean[k], out_dirty[k], rtol=1e-6, err_msg=k
        )
    # the masker itself fills masked regions and leaves valid ones
    masked = stepper.input_masker(
        {"prog": jnp.asarray(ic_dirty[:, 0])}
    )
    np.testing.assert_array_equal(
        np.asarray(masked["prog"])[..., : NLON // 2], 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(masked["prog"])[..., NLON // 2 :],
        ic_dirty[:, 0, :, NLON // 2 :],
    )
    # without input_masking, the stepper applies no input fill
    bare = StepperConfig(step=sel).get_stepper(info)
    unmasked = bare.input_masker({"prog": jnp.asarray(ic_dirty[:, 0])})
    np.testing.assert_array_equal(
        np.asarray(unmasked["prog"]), ic_dirty[:, 0]
    )
    # config round-trips through checkpoint state
    config2 = StepperConfig.from_state(config.get_state())
    assert config2.input_masking == config.input_masking
    assert to_dict(config2.input_masking) == to_dict(config.input_masking)
    # validation mirrors the reference's __post_init__ errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mask_value"):
        from_dict(StaticSpatialMaskingConfig, {"mask_value": 2})
    with _pytest.raises(ValueError, match="fill_value"):
        from_dict(
            StaticSpatialMaskingConfig,
            {"mask_value": 0, "fill_value": "median"},
        )


def test_input_masking_mean_fill_and_exclude():
    """fill_value="mean" fills with per-variable normalizer means;
    exclude_names_and_prefixes leaves listed variables untouched
    (reference: spatial_masking.py build w/ means mapping)."""
    import dataclasses as dc

    from ace_tpu.core.masking import MaskProvider, StaticSpatialMaskingConfig
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    info = _dataset_info()
    mask = np.ones((NLAT, NLON), np.float32)
    mask[0, 0] = 0.0
    info = dc.replace(info, mask_provider=MaskProvider({"mask_2d": mask}))
    sel = _selector(
        normalization={
            "network": {
                "means": {"prog": 2.5, "forcing_var": -1.0, "diag": 0.0},
                "stds": {"prog": 1.0, "forcing_var": 1.0, "diag": 1.0},
            }
        },
    )
    config = StepperConfig(
        step=sel,
        input_masking=StaticSpatialMaskingConfig(
            mask_value=0,
            fill_value="mean",
            exclude_names_and_prefixes=["forcing_var"],
        ),
    )
    stepper = config.get_stepper(info)
    masked = stepper.input_masker({
        "prog": jnp.ones((1, NLAT, NLON)) * 7.0,
        "forcing_var": jnp.ones((1, NLAT, NLON)) * 7.0,
    })
    # masked cell of prog takes the normalizer mean; excluded forcing_var
    # is untouched everywhere
    assert np.asarray(masked["prog"])[0, 0, 0] == 2.5
    assert np.asarray(masked["prog"])[0, 1, 1] == 7.0
    np.testing.assert_array_equal(np.asarray(masked["forcing_var"]), 7.0)
