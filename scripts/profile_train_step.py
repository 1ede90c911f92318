"""Training-step throughput at ACE2 scale on one chip: full
loss->grad->update pipeline via TrainStepper.build_train_step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_step.py [batch]
"""

import sys
import time
from datetime import timedelta

import numpy as np


def main(batch=1, n_steps=1, embed=256, layers=8, nlat=180, nlon=360):
    import jax
    import jax.numpy as jnp

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate,
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.loss import StepLossConfig
    from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.stepper import StepperConfig
    from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper

    nz = 8
    prognostic = (
        [f"air_temperature_{k}" for k in range(nz)]
        + [f"specific_total_water_{k}" for k in range(nz)]
        + [f"eastward_wind_{k}" for k in range(nz)]
        + [f"northward_wind_{k}" for k in range(nz)]
        + ["PRESsfc", "surface_temperature"]
    )
    diagnostics = ["LHTFLsfc", "SHTFLsfc", "PRATEsfc", "ULWRFsfc",
                   "ULWRFtoa", "DLWRFsfc", "DSWRFsfc", "USWRFsfc",
                   "USWRFtoa"]
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
            ak=np.linspace(100.0, 0.0, nz + 1),
            bk=np.linspace(0.0, 1.0, nz + 1),
        ),
        timestep=timedelta(hours=6),
    )
    step_cfg = from_dict(SingleModuleStepConfig, dict(
        builder={"type": "SphericalFourierNeuralOperatorNet", "config": {
            "embed_dim": embed, "num_layers": layers,
            "operator_type": "dhconv", "scale_factor": 1,
        }},
        in_names=in_names,
        out_names=out_names,
        normalization={"network": {
            "means": {n: 0.0 for n in all_names},
            "stds": {n: 1.0 for n in all_names},
        }},
    ))
    stepper = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    ).get_stepper(info)
    ts = TrainStepper(
        stepper,
        StepperTrainConfig(
            loss=StepLossConfig(type="AreaWeightedMSE"),
            n_forward_steps=n_steps,
        ),
        OptimizationConfig(lr=1e-4, optimizer_type="AdamW",
                           max_grad_norm=1.0),
        EMAConfig(),
    )
    t0 = time.perf_counter()
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"param init: {time.perf_counter() - t0:.1f}s", flush=True)
    train_step = ts.build_train_step(donate=True)
    rng = np.random.RandomState(0)
    batch_data = {
        name: jnp.asarray(
            rng.randn(batch, n_steps + 1, nlat, nlon), jnp.float32
        )
        for name in all_names
    }
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, metrics = train_step(
        params, opt_state, batch_data, key, n_steps, None
    )
    float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        params, opt_state, metrics = train_step(
            params, opt_state, batch_data, key, n_steps, None
        )
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"batch={batch} n_steps={n_steps}: {ms:.1f} ms/step "
          f"= {batch / min(times):.2f} samples/s/chip")


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         n_steps=int(sys.argv[2]) if len(sys.argv) > 2 else 1)
