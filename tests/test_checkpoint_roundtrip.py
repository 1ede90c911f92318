"""End-to-end checkpoint-conversion round trip against the reference's
OWN serialization: build a real reference Stepper (reference:
fme/ace/stepper/single_module.py:803), save its ``get_state()`` as the
training .tar layout (:1337), convert through
scripts/convert_torch_checkpoint.py, load with the ace_tpu inference
path, and assert autoregressive rollout parity between the reference's
``predict_generator`` (:1124) and this framework's ``predict_fn``.

Covers the full converted surface: config schema (step selector, builder
with conditional/allow_missing_variables, normalization means/stds,
ocean prescription, corrector fields), dataset-info round trip
(timestep in MICROSECONDS, fme/core/dataset/utils.py encode_timestep),
and the torch->flax parameter mapping.
"""

import datetime
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_stack import load_reference_stepper

IN_NAMES = ["prog_a", "prog_sst", "forcing_c"]
OUT_NAMES = ["prog_a", "prog_sst", "diag_d"]
ALL_NAMES = sorted(set(IN_NAMES) | set(OUT_NAMES))
NLAT, NLON, NZ = 8, 16, 3
N_STEPS = 4


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

@pytest.fixture(scope="module")
def reference_checkpoint(tmp_path_factory):
    """A real reference checkpoint .tar written via Stepper.get_state."""
    sm = load_reference_stepper()
    import dacite
    import torch

    torch.manual_seed(0)
    import importlib

    coords = importlib.import_module("fme.core.coordinates")
    dsinfo = importlib.import_module("fme.core.dataset_info")

    hc = coords.LatLonCoordinates(
        lat=torch.linspace(-82.5, 82.5, NLAT),
        lon=torch.arange(0, 360, 360 / NLON),
    )
    vc = coords.HybridSigmaPressureCoordinate(
        ak=torch.linspace(100.0, 0.0, NZ + 1),
        bk=torch.linspace(0.0, 1.0, NZ + 1),
    )
    dataset_info = dsinfo.DatasetInfo(
        horizontal_coordinates=hc,
        vertical_coordinate=vc,
        timestep=datetime.timedelta(hours=6),
    )
    stepper_config = dacite.from_dict(sm.StepperConfig, {
        "step": {"type": "single_module", "config": {
            "builder": {
                "type": "SphericalFourierNeuralOperatorNet",
                "config": {
                    "embed_dim": 8, "num_layers": 2,
                    "operator_type": "dhconv", "scale_factor": 1,
                    "data_grid": "equiangular",
                },
            },
            "in_names": IN_NAMES,
            "out_names": OUT_NAMES,
            "normalization": {"network": {
                "means": {n: 0.1 * i for i, n in enumerate(ALL_NAMES)},
                "stds": {n: 1.0 + 0.1 * i for i, n in enumerate(ALL_NAMES)},
            }},
            "ocean": {
                "surface_temperature_name": "prog_sst",
                "ocean_fraction_name": "forcing_c",
            },
        }},
    })
    stepper = stepper_config.get_stepper(dataset_info)
    path = tmp_path_factory.mktemp("ref") / "ref_ckpt.tar"
    torch.save({"stepper": stepper.get_state()}, str(path))
    return str(path), stepper


def _reference_rollout(stepper, ic, forcing):
    """Drive the reference's own predict_generator."""
    import importlib

    import torch

    opt_mod = importlib.import_module("fme.core.optimization")
    ic_t = {k: torch.as_tensor(v) for k, v in ic.items()}
    forcing_t = {k: torch.as_tensor(v) for k, v in forcing.items()}
    outs: dict[str, list] = {n: [] for n in OUT_NAMES}
    with torch.no_grad():
        for result in stepper.predict_generator(
            ic_t, forcing_t, N_STEPS, opt_mod.NullOptimization(),
            labels=None,
        ):
            for n in OUT_NAMES:
                outs[n].append(result.output[n].numpy())
    return {n: np.stack(v, axis=1) for n, v in outs.items()}


def test_roundtrip_rollout_parity(reference_checkpoint, tmp_path):
    tar_path, ref_stepper = reference_checkpoint
    out_path = str(tmp_path / "converted.msgpack")

    from ace_tpu.utils.torch_convert import convert_reference_checkpoint

    convert_reference_checkpoint(tar_path, out_path)

    from ace_tpu.stepper.checkpoint import load_stepper
    from ace_tpu.stepper.stepper import PrognosticState

    stepper = load_stepper(out_path)
    assert stepper.prognostic_names == ["prog_a", "prog_sst"]
    # dataset-info round trip: 6h timestep survives the µs encoding
    assert stepper.step.dataset_info.timestep == datetime.timedelta(
        hours=6
    )

    rng = np.random.RandomState(0)
    ic = {
        n: rng.randn(2, 1, NLAT, NLON).astype(np.float32)
        for n in ["prog_a", "prog_sst"]
    }
    forcing = {
        n: rng.randn(2, N_STEPS + 1, NLAT, NLON).astype(np.float32)
        for n in ["forcing_c", "prog_sst"]
    }
    # ocean fraction in [0, 1] so the SST prescription branches both ways
    forcing["forcing_c"] = np.clip(
        np.abs(forcing["forcing_c"]), 0.0, 1.0
    ).astype(np.float32)

    expected = _reference_rollout(ref_stepper, ic, forcing)

    state = stepper.get_initial_state(
        PrognosticState(data={k: jnp.asarray(v) for k, v in ic.items()})
    )
    outputs, _, _ = stepper.predict_fn(
        stepper.params,
        state.data,
        {k: jnp.asarray(v) for k, v in forcing.items()},
        state.stepper_state,
        jax.random.PRNGKey(0),
    )
    for name in OUT_NAMES:
        np.testing.assert_allclose(
            np.asarray(outputs[name]), expected[name],
            atol=2e-5, rtol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_convert_cli(reference_checkpoint, tmp_path):
    """The converter CLI itself runs and writes a loadable checkpoint."""
    tar_path, _ = reference_checkpoint
    out_path = str(tmp_path / "cli_converted.msgpack")
    # pin the subprocess to CPU: the default platform is the remote-TPU
    # tunnel, whose backend init alone can exceed the test timeout
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo"
        + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    }
    res = subprocess.run(
        [sys.executable, "scripts/convert_torch_checkpoint.py",
         tar_path, out_path],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    from ace_tpu.stepper.checkpoint import load_stepper

    stepper = load_stepper(out_path)
    assert stepper.prognostic_names == ["prog_a", "prog_sst"]
