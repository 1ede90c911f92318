"""Headline benchmark: ACE2-scale SFNO autoregressive rollout throughput
on one chip (north star: BASELINE.json — rollout steps/sec/chip at 1°).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The benchmarked path is the full production stepper pipeline (normalize ->
pack -> SFNO forward -> unpack -> denormalize -> dry-air corrector) rolled
out with lax.scan, bfloat16 compute / fp32 transforms, batch 1, on the 1°
Gaussian grid with ACE2-ERA5 channel counts (reference scale:
configs/baselines/era5/ace-train-config-1-step-pretrain.yaml).
"""

import json
import time
from datetime import timedelta

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate,
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    nlat, nlon, nz = 180, 360, 8
    n_steps = 20
    batch = 1

    # ACE2-ERA5-like variable set: 8-level T/q/u/v + surface/flux fields
    prognostic = (
        [f"air_temperature_{k}" for k in range(nz)]
        + [f"specific_total_water_{k}" for k in range(nz)]
        + [f"eastward_wind_{k}" for k in range(nz)]
        + [f"northward_wind_{k}" for k in range(nz)]
        + ["PRESsfc", "surface_temperature"]
    )
    diagnostics = ["LHTFLsfc", "SHTFLsfc", "PRATEsfc", "ULWRFsfc",
                   "ULWRFtoa", "DLWRFsfc", "DSWRFsfc", "USWRFsfc", "USWRFtoa"]
    forcings = ["DSWRFtoa", "HGTsfc", "ocean_fraction"]
    in_names = prognostic + forcings
    out_names = prognostic + diagnostics
    all_names = sorted(set(in_names) | set(out_names))

    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(nlat),
            lon=np.linspace(0, 360, nlon, endpoint=False),
        ),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.concatenate([np.linspace(100.0, 5000.0, nz // 2),
                               np.linspace(5000.0, 0.0, nz // 2 + 1)]),
            bk=np.linspace(0.0, 1.0, nz + 1),
        ),
        timestep=timedelta(hours=6),
    )
    step_cfg = from_dict(SingleModuleStepConfig, dict(
        builder={"type": "SphericalFourierNeuralOperatorNet", "config": {
            "embed_dim": 256, "num_layers": 8, "operator_type": "dhconv",
            "scale_factor": 1, "compute_dtype": "bfloat16",
        }},
        in_names=in_names,
        out_names=out_names,
        normalization={"network": {
            "means": {n: 0.0 for n in all_names},
            "stds": {n: 1.0 for n in all_names},
        }},
        corrector={"conserve_dry_air": True},
    ))
    stepper = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    ).get_stepper(info)
    params = stepper.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)

    def field(shape):
        return jnp.asarray(rng.randn(*shape), jnp.float32)

    ic = PrognosticState(
        data={k: field((batch, 1, nlat, nlon)) for k in prognostic}
    )
    ic_phys = dict(ic.data)
    ic_phys["PRESsfc"] = ic_phys["PRESsfc"] * 100 + 1.0e5
    for k in ic_phys:
        if k.startswith("specific_total_water"):
            ic_phys[k] = jnp.abs(ic_phys[k]) * 1e-3
    ic = PrognosticState(data=ic_phys)
    forcing = {
        k: field((batch, n_steps + 1, nlat, nlon)) for k in forcings
    }

    ic2 = stepper.get_initial_state(ic)

    @jax.jit
    def rollout(params, ic_data, forcing, st):
        outputs, _, final = stepper.predict_fn(
            params, ic_data, forcing, st, jax.random.PRNGKey(0)
        )
        # scalar result: reading it on the host guarantees completion
        # (block_until_ready does not reliably block over remote-TPU
        # tunnels)
        return jnp.mean(outputs["PRESsfc"][:, -1])

    # warmup/compile
    t0 = time.time()
    float(rollout(params, ic2.data, forcing, ic2.stepper_state))
    compile_time = time.time() - t0

    n_repeats = 3
    t0 = time.time()
    for _ in range(n_repeats):
        float(rollout(params, ic2.data, forcing, ic2.stepper_state))
    elapsed = time.time() - t0
    steps_per_sec = n_steps * n_repeats / elapsed
    # 6h steps -> simulated years per wall-clock day
    sim_years_per_day = steps_per_sec * 86400 * (6 * 3600) / (
        365.25 * 86400
    ) / 86400 * 86400  # = steps_per_sec * 6h / 1yr * 86400
    sim_years_per_day = steps_per_sec * (6 * 3600.0) / (365.25 * 86400.0) * 86400.0

    print(json.dumps({
        "metric": "ace2_1deg_rollout_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "simulated_years_per_day": round(sim_years_per_day, 1),
        "compile_time_s": round(compile_time, 1),
        "device": str(jax.devices()[0]),
        "config": "SFNO dhconv embed=256 layers=8 grid=180x360 bf16",
    }))


if __name__ == "__main__":
    main()
