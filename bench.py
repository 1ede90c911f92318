"""Headline benchmark: ACE2-ERA5 flagship throughput on one chip.

North star (BASELINE.json): rollout steps/sec/chip at 1° ACE2. The
benchmarked model is the FLAGSHIP config — NoiseConditionedSFNO
embed_dim=512 / 8 layers on the 1° Gaussian grid, the same architecture
the reference trains in
configs/baselines/era5/ace-train-config-1-step-pretrain.yaml:95-109 and
this repo's configs/ace2-era5-train.yaml — through the full production
stepper pipeline (normalize -> pack -> net -> unpack -> denormalize ->
ocean overwrite -> correctors) rolled out with lax.scan.

Also measured (extra JSON fields):
- a CRPS training step (n_ensemble=2, EnsembleLoss crps 0.9 / energy
  0.1, fwd+bwd+optimizer), reporting samples/s and model FLOP
  utilization (reference counters: fme/core/generics/trainer.py:583-585)
- the round-1 SFNO-256 rollout config for continuity with BENCH_r01

Prints ONE JSON line.
"""

import json
import time
from datetime import timedelta

import numpy as np

NLAT, NLON, NZ = 180, 360, 8  # noqa: module-level, overridden by --smoke


def _names():
    prognostic = (
        [f"air_temperature_{k}" for k in range(NZ)]
        + [f"specific_total_water_{k}" for k in range(NZ)]
        + [f"eastward_wind_{k}" for k in range(NZ)]
        + [f"northward_wind_{k}" for k in range(NZ)]
        + ["PRESsfc", "surface_temperature", "h500"]
    )
    diagnostics = ["LHTFLsfc", "SHTFLsfc", "PRATEsfc", "ULWRFsfc",
                   "ULWRFtoa", "DLWRFsfc", "DSWRFsfc", "USWRFsfc",
                   "USWRFtoa"]
    forcings = ["DSWRFtoa", "HGTsfc", "ocean_fraction"]
    return prognostic, diagnostics, forcings


def _dataset_info():
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate,
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo

    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(NLAT),
            lon=np.linspace(0, 360, NLON, endpoint=False),
        ),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.concatenate([np.linspace(100.0, 5000.0, NZ // 2),
                               np.linspace(5000.0, 0.0, NZ // 2 + 1)]),
            bk=np.linspace(0.0, 1.0, NZ + 1),
        ),
        timestep=timedelta(hours=6),
    )


def _stepper(builder: dict):
    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.stepper import StepperConfig

    prognostic, diagnostics, forcings = _names()
    in_names = prognostic + forcings
    out_names = prognostic + diagnostics
    all_names = sorted(set(in_names) | set(out_names))
    step_cfg = from_dict(SingleModuleStepConfig, dict(
        builder=builder,
        in_names=in_names,
        out_names=out_names,
        normalization={"network": {
            "means": {n: 0.0 for n in all_names},
            "stds": {n: 1.0 for n in all_names},
        }},
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
        corrector={"conserve_dry_air": True},
    ))
    return StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    ).get_stepper(_dataset_info())


def _synthetic(batch, n_steps, forcing_names=None):
    import jax.numpy as jnp

    prognostic, _, forcings = _names()
    forcing_names = sorted(set(forcing_names or forcings))
    rng = np.random.RandomState(0)

    def field(shape):
        return jnp.asarray(rng.randn(*shape), jnp.float32)

    ic = {k: field((batch, 1, NLAT, NLON)) for k in prognostic}
    ic["PRESsfc"] = ic["PRESsfc"] * 100 + 1.0e5
    for k in ic:
        if k.startswith("specific_total_water"):
            ic[k] = jnp.abs(ic[k]) * 1e-3
    forcing = {
        k: field((batch, n_steps + 1, NLAT, NLON))
        for k in forcing_names
    }
    if "ocean_fraction" in forcing:
        forcing["ocean_fraction"] = jnp.clip(
            jnp.abs(forcing["ocean_fraction"]), 0, 1
        )
    return ic, forcing


def _device_peak_flops(device) -> float | None:
    """bf16 peak for MFU accounting; None when unknown."""
    kind = getattr(device, "device_kind", "").lower()
    # TPU v5 lite (v5e): 197 TFLOP/s bf16; v5p: 459; v4: 275; v6e: 918
    for key, peak in (("v5 lite", 197e12), ("v5litepod", 197e12),
                      ("v5p", 459e12), ("v6 lite", 918e12),
                      ("v6e", 918e12), ("v4", 275e12)):
        if key in kind:
            return peak
    return None


def _bench_rollout(stepper, batch, n_steps, n_repeats=3):
    import jax
    import jax.numpy as jnp

    from ace_tpu.stepper.stepper import PrognosticState

    params = stepper.init_params(jax.random.PRNGKey(0))
    ic, forcing = _synthetic(
        batch, n_steps, forcing_names=stepper.forcing_window_names
    )
    state = stepper.get_initial_state(PrognosticState(data=ic))

    @jax.jit
    def rollout(params, ic_data, forcing, st):
        outputs, _, final = stepper.predict_fn(
            params, ic_data, forcing, st, jax.random.PRNGKey(0)
        )
        # scalar result: reading it on the host guarantees completion
        # (block_until_ready does not reliably block over remote-TPU
        # tunnels)
        return jnp.mean(outputs["PRESsfc"][:, -1])

    t0 = time.time()
    float(rollout(params, state.data, forcing, state.stepper_state))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_repeats):
        float(rollout(params, state.data, forcing, state.stepper_state))
    elapsed = time.time() - t0
    steps_per_sec = n_steps * n_repeats / elapsed
    # model FLOPs PER STEP from a 1-step program: cost_analysis of the
    # n-step rollout counts the lax.scan body once, so dividing the
    # 20-step program's flops by 20 understates per-step work ~20x
    try:
        ic1, forcing1 = _synthetic(
            batch, 1, forcing_names=stepper.forcing_window_names
        )
        state1 = stepper.get_initial_state(PrognosticState(data=ic1))

        @jax.jit
        def one_step(params, ic_data, forcing, st):
            outputs, _, final = stepper.predict_fn(
                params, ic_data, forcing, st, jax.random.PRNGKey(0)
            )
            return jnp.mean(outputs["PRESsfc"][:, -1])

        cost = one_step.lower(
            params, state1.data, forcing1, state1.stepper_state
        ).compile().cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        flops_per_step = None
    return steps_per_sec, compile_s, flops_per_step


def _bench_train_step(stepper, batch, n_repeats=5):
    """CRPS (n_ensemble=2) training step: fwd + bwd + optimizer update
    (the flagship pretraining recipe, ace-train-config-1-step-pretrain
    .yaml + this repo's configs/ace2-era5-train.yaml)."""
    import jax
    import jax.numpy as jnp

    from ace_tpu.core.config import from_dict
    from ace_tpu.core.loss import StepLossConfig
    from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
    from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper

    prognostic, diagnostics, forcings = _names()
    ts = TrainStepper(
        stepper,
        StepperTrainConfig(
            n_forward_steps=1,
            n_ensemble=2,
            # per-block rematerialization (builder checkpointing=1)
            # bounds activations to one block at a time; whole-step remat
            # on top would recompute every forward a third time for no
            # extra memory win at n_forward_steps=1
            remat=False,
            loss=from_dict(StepLossConfig, {
                "type": "EnsembleLoss",
                "kwargs": {"crps_weight": 0.9,
                           "energy_score_weight": 0.1},
            }),
        ),
        OptimizationConfig(lr=1e-4, optimizer_type="AdamW",
                           max_grad_norm=1.0,
                           # bf16 Adam first moment: the flagship's f32
                           # moments alone are 6.3 GB; this recovers
                           # 1.6 GB so the step fits one 16 GB v5e
                           first_moment_dtype="bfloat16"),
        EMAConfig(),
    )
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    # EMA updates run in a separate jitted pass outside the step being
    # timed; drop its device-resident copy (3.2 GB) for the single-chip
    # memory budget
    if ts.ema is not None:
        ts.ema.ema_params = None
    rng = np.random.RandomState(1)
    all_names = sorted(set(prognostic + diagnostics + forcings))
    batch_data = {}
    for k in all_names:
        arr = jnp.asarray(
            rng.randn(batch, 2, NLAT, NLON), jnp.float32
        )
        if k == "PRESsfc":
            arr = arr * 100 + 1.0e5
        if k.startswith("specific_total_water"):
            arr = jnp.abs(arr) * 1e-3
        if k == "ocean_fraction":
            arr = jnp.clip(jnp.abs(arr), 0, 1)
        batch_data[k] = arr
    # donate=True: old params/opt buffers are reused for the update,
    # halving optimizer-state HBM (760M params x f32 x {p, mu, nu} would
    # otherwise be double-buffered across the step boundary). AOT
    # lower/compile once and execute the compiled object directly so
    # exactly ONE executable exists (the jit-cache path would build a
    # second one for cost_analysis, and on a 16 GB chip the flagship has
    # no headroom for duplicated program allocations).
    train_step = ts.build_train_step(donate=True)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    compiled = train_step.lower(
        params, opt_state, batch_data, key
    ).compile()
    compile_s = time.time() - t0
    try:
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        flops = None

    def run(params, opt_state):
        new_params, new_opt, metrics = compiled(
            params, opt_state, batch_data, key
        )
        return new_params, new_opt, float(metrics["loss"])

    params, opt_state, _ = run(params, opt_state)  # warm-up execution
    t0 = time.time()
    for _ in range(n_repeats):
        params, opt_state, _ = run(params, opt_state)
    elapsed = time.time() - t0
    sps = batch * n_repeats / elapsed
    return sps, elapsed / n_repeats, compile_s, flops


def _bench_coupled(n_repeats=2, embed=384, ch_width=(200, 250, 300, 400)):
    """SamudrACE-scale coupled rollout (BASELINE config #3 /
    cm4-piControl, reference fme/coupled/stepper.py): SFNO embed-384
    atmosphere (44 in / 52 out, 6 h) + Samudra ConvNeXt U-Net ocean
    (ch_width [200,250,300,400], 90 in / 80 out, 5 d) at 1 degree; one
    outer step = 20 inner atmosphere steps + 1 ocean step, the
    production exchange (SST prescription + flux window-averaging)
    included. Returns (atmos steps/s, compile_s, flops per outer step)."""
    import jax
    import jax.numpy as jnp

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import (
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.coupled.stepper import (
        CoupledComponentConfig,
        CoupledPrognosticState,
        CoupledStepperConfig,
    )
    from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

    def info(hours):
        return DatasetInfo(
            horizontal_coordinates=LatLonCoordinates(
                lat=gaussian_latitudes(NLAT),
                lon=np.linspace(0, 360, NLON, endpoint=False),
            ),
            timestep=timedelta(hours=hours),
        )

    def selector(builder, in_names, out_names, ocean=None,
                 next_step_forcing_names=None):
        names = sorted(set(in_names) | set(out_names))
        cfg = {
            "builder": builder,
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

    # channel counts from configs/baselines/cm4-piControl (uncoupled
    # components): atmosphere 44 in / 52 out, ocean 90 in / 80 out
    atm_prog = [f"a{i}" for i in range(40)] + ["surface_temperature"]
    fluxes = [f"flux{i}" for i in range(8)]
    atm_in = atm_prog + ["DSWRFtoa", "ocean_fraction"]  # +st = 44
    atm_out = atm_prog + fluxes + [f"adiag{i}" for i in range(3)]  # 52
    ocean_prog = [f"o{i}" for i in range(78)] + ["sst"]
    ocean_in = ocean_prog + fluxes + [f"oforc{i}" for i in range(3)]  # 90
    ocean_out = ocean_prog + ["odiag0"]  # 80
    atmos = StepperConfig(step=selector(
        {"type": "SphericalFourierNeuralOperatorNet", "config": {
            "embed_dim": embed, "num_layers": 8, "operator_type": "dhconv",
            "scale_factor": 1, "filter_type": "linear", "use_mlp": True,
            "separable": False, "spectral_layers": 3,
            "compute_dtype": "bfloat16",
        }},
        atm_in, atm_out,
        ocean={"surface_temperature_name": "surface_temperature",
               "ocean_fraction_name": "ocean_fraction"},
    ))
    ocean = StepperConfig(step=selector(
        {"type": "Samudra", "config": {
            "ch_width": list(ch_width),
            "compute_dtype": "bfloat16",
        }},
        ocean_in, ocean_out, next_step_forcing_names=fluxes,
    ))
    coupled = CoupledStepperConfig(
        atmosphere=CoupledComponentConfig(stepper=atmos),
        ocean=CoupledComponentConfig(stepper=ocean),
        sst_name="sst",
    ).get_stepper(info(6), info(120))  # 5 d ocean / 6 h atmos = 20 inner
    n_inner = coupled.n_inner_steps
    params = coupled.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch, n_outer = 1, 1

    def field(n_time):
        return jnp.asarray(
            rng.randn(batch, n_time, NLAT, NLON), jnp.float32
        )

    ic = CoupledPrognosticState(
        atmosphere_data=PrognosticState(
            data={k: field(1) for k in atm_prog}
        ),
        ocean_data=PrognosticState(
            data={k: field(1) for k in ocean_prog}
        ),
    )
    n_time = n_outer * n_inner + 1
    atmos_forcing = {
        "DSWRFtoa": field(n_time),
        "ocean_fraction": jnp.clip(jnp.abs(field(n_time)), 0, 1),
    }
    ocean_forcing = {k: field(n_outer + 1)
                     for k in [f"oforc{i}" for i in range(3)]}

    def run():
        # predict's component rollouts are jitted internally; reading two
        # scalars blocks until the whole coupled step has executed
        atmos_out, ocean_out, final = coupled.predict(
            ic, atmos_forcing, ocean_forcing
        )
        return float(
            jnp.mean(atmos_out["a0"][:, -1])
            + jnp.mean(ocean_out["sst"][:, -1])
        )

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_repeats):
        run()
    elapsed = time.time() - t0
    steps_per_sec = n_outer * n_inner * n_repeats / elapsed
    return steps_per_sec, compile_s, None, elapsed / n_repeats


def _bench_downscaling(n_repeats=3, res=256, channels=128,
                       dtype=None):
    """EDM generation at a HiRO-representative patch (BASELINE config
    #5, reference fme/downscaling/modules/physicsnemo_unets_v2/
    benchmark.py:347-350): SongUNetV2 (model_channels 128, mults
    [1,2,2,2], the configs/downscaling-train.yaml module) on a 256x256
    fine patch (coarse 64 x downscale 4), 18-step stochastic sampler
    with Heun correction = 35 denoiser evaluations per sample.
    Returns (samples/s, compile_s, flops per sampler call)."""
    import jax
    import jax.numpy as jnp

    from ace_tpu.downscaling.diffusion import (
        edm_precondition,
        stochastic_sampler,
    )
    from ace_tpu.downscaling.song_unet import SongUNetV2

    n_cond, n_out, batch, n_steps = 3, 1, 4, 18
    net = SongUNetV2(
        img_resolution=res, in_channels=n_cond + n_out,
        out_channels=n_out, model_channels=channels,
        channel_mult=(1, 2, 2, 2), num_blocks=2, attn_resolutions=(32,),
        dtype=dtype if dtype is not None else jnp.float32,
    )
    rng = np.random.RandomState(0)
    latents = jnp.asarray(
        rng.randn(batch, res, res, n_out), jnp.float32
    )
    condition = jnp.asarray(
        rng.randn(batch, res, res, n_cond), jnp.float32
    )
    params = net.init(
        jax.random.PRNGKey(0), latents, condition,
        jnp.zeros((batch,), jnp.float32),
    )

    @jax.jit
    def sample(params, latents, condition, key):
        denoiser = edm_precondition(
            lambda x, c, s: net.apply(params, x, c, s)
        )
        out = stochastic_sampler(
            denoiser, latents, condition, key,
            num_steps=n_steps, S_churn=0.5,
        )
        return jnp.mean(out)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    float(sample(params, latents, condition, key))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_repeats):
        float(sample(params, latents, condition, key))
    elapsed = time.time() - t0
    samples_per_sec = batch * n_repeats / elapsed
    # MFU from a single denoiser evaluation: cost_analysis of the
    # sampler counts the fori_loop body ONCE while the loop executes it
    # 2*n_steps-1 times, so the sampler program's flops understate the
    # executed work ~35x
    try:
        @jax.jit
        def one_eval(params, x, condition, sig):
            return jnp.mean(net.apply(params, x, condition, sig))

        sig = jnp.ones((batch,), jnp.float32)
        cost = (
            one_eval.lower(params, latents, condition, sig)
            .compile().cost_analysis()
        )
        flops = float(cost.get("flops", 0.0)) or None
        float(one_eval(params, latents, condition, sig))
        t0 = time.time()
        for _ in range(10):
            float(one_eval(params, latents, condition, sig))
        eval_s = (time.time() - t0) / 10
    except Exception:
        flops, eval_s = None, None
    return samples_per_sec, compile_s, flops, eval_s


def _get_device_with_retry(max_tries: int = 5):
    """jax.devices() with backoff retries on transient backend-init
    failures (round-2 failure mode: the remote-TPU tunnel raised
    UNAVAILABLE at startup and the whole bench died with no JSON).
    Clears the cached failed backend between attempts; as a last resort
    re-execs this script once in a fresh process."""
    import os
    import sys

    import jax

    delay = 10.0
    last_err = None
    for attempt in range(max_tries):
        try:
            return jax.devices()[0]
        except Exception as e:  # noqa: BLE001 — any init error is retryable
            last_err = e
            print(
                f"bench: backend init failed (attempt {attempt + 1}/"
                f"{max_tries}): {e}; retrying in {delay:.0f}s",
                file=sys.stderr,
            )
            time.sleep(delay)
            delay = min(delay * 2, 120.0)
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass
    if os.environ.get("ACE_BENCH_REEXEC") != "1":
        # a fresh process clears any unserviceable cached client state
        os.environ["ACE_BENCH_REEXEC"] = "1"
        print("bench: re-executing in a fresh process", file=sys.stderr)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    raise last_err


def main(smoke: bool = False):
    from ace_tpu.core.cli import enable_compilation_cache

    enable_compilation_cache()
    device = _get_device_with_retry()
    peak = _device_peak_flops(device)

    global NLAT, NLON
    embed, layers = 512, 8
    if smoke:  # tiny shapes to validate the bench code path quickly
        NLAT, NLON, embed, layers = 16, 32, 16, 2

    flagship_builder = {"type": "NoiseConditionedSFNO", "config": {
        "embed_dim": embed, "noise_embed_dim": 32,
        "noise_type": "isotropic", "filter_type": "linear",
        "use_mlp": True, "num_layers": layers, "operator_type": "dhconv",
        "separable": False, "spectral_layers": 3,
        "spectral_transform": "sht", "affine_norms": True,
        "normalize_big_skip": True, "compute_dtype": "bfloat16",
    }}
    sfno256_builder = {"type": "SphericalFourierNeuralOperatorNet",
                       "config": {
                           "embed_dim": 256, "num_layers": 8,
                           "operator_type": "dhconv", "scale_factor": 1,
                           "compute_dtype": "bfloat16",
                       }}

    n_steps = 20

    # train bench FIRST, with nothing else resident: the flagship train
    # step peaks at ~14.7 GB of 15.5 GB usable HBM (args 8.0 + temps 6.4
    # + code 0.3, memory_analysis), so executables/constants left over
    # from a prior rollout phase would push it over. checkpointing=1
    # remats per block so the backward holds one block's activations at
    # a time; batch 1 x2 CRPS ensemble members (the reference trains
    # this on 4x80 GB GPUs; multi-chip runs shard the batch).
    import gc
    import sys
    import traceback

    # every phase is independently fenced so one phase's crash cannot
    # zero the whole round's measurement (round-2 lesson); whatever
    # succeeded is emitted in the single JSON line, with per-phase
    # errors recorded
    result: dict = {
        "metric": "ace2_era5_flagship_rollout_steps_per_sec_per_chip",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "device": str(device),
        "config": ("NoiseConditionedSFNO dhconv embed=512 layers=8 "
                   "grid=180x360 bf16; train: CRPS n_ensemble=2 batch=2"),
    }
    errors: dict = {}

    def phase(name, fn):
        try:
            fn()
        except Exception:
            errors[name] = traceback.format_exc(limit=3)
            print(f"bench: phase {name!r} failed:\n{errors[name]}",
                  file=sys.stderr)
        gc.collect()

    def train_phase():
        flagship_train = _stepper(
            {**flagship_builder,
             "config": {**flagship_builder["config"], "checkpointing": 1}}
        )
        # per-chip batch 2 — the reference's flagship recipe trains
        # batch 2/device (configs/baselines/era5/run-ace-train.sh:10,51).
        # Fits one 16 GB v5e since round 4 (bf16 filter outputs +
        # per-block remat); batch 4 needs 17.8 GB and OOMs (measured).
        train_batch = 1 if smoke else 2
        tr_sps, tr_step_s, tr_compile, tr_flops = _bench_train_step(
            flagship_train, batch=train_batch
        )
        result["train_batch_per_chip"] = train_batch
        result["train_samples_per_sec_per_chip"] = round(tr_sps, 3)
        result["train_step_seconds"] = round(tr_step_s, 4)
        result["train_mfu"] = (
            round(tr_flops / tr_step_s / peak, 4)
            if (peak and tr_flops) else None
        )
        result["train_compile_time_s"] = round(tr_compile, 1)

    def rollout_phase():
        flagship = _stepper(flagship_builder)
        fl_steps, fl_compile, fl_flops = _bench_rollout(
            flagship, 1, n_steps
        )
        result["value"] = round(fl_steps, 3)
        result["compile_time_s"] = round(fl_compile, 1)
        result["rollout_mfu"] = (
            round(fl_steps * fl_flops / peak, 4)
            if (peak and fl_flops) else None
        )
        result["simulated_years_per_day"] = round(
            fl_steps * (6 * 3600.0) / (365.25 * 86400.0) * 86400.0, 1
        )
        # batched/ensemble inference (the reference's production
        # workload: multi-year multi-IC ensembles — steps/s counts all
        # ICs, fme/ace/inference/inference.py:455-465). Batch amortizes
        # the 2x94 MB/step filter-weight streaming; measured r5 sweep:
        # 24.05 (b2) / 24.46 (b4) / 24.55 (b8) aggregate sample-steps/s
        # at 32.3 / 32.9 / 33.0% MFU vs 21.1 at 28.4% for batch 1.
        sweep = {}
        for b in ((2, 8) if not smoke else (2,)):
            st, _, fl = _bench_rollout(flagship, b, n_steps, n_repeats=2)
            sweep[b] = {
                "steps_per_sec": round(st, 3),
                "agg_sample_steps_per_sec": round(st * b, 3),
                "mfu": (round(st * fl / peak, 4)
                        if (peak and fl) else None),
            }
        result["rollout_batch_sweep"] = {
            str(b): v for b, v in sweep.items()
        }
        best_b = max(sweep, key=lambda b: sweep[b]["agg_sample_steps_per_sec"])
        best = sweep[best_b]
        result["ensemble_rollout_batch"] = best_b
        result["ensemble_rollout_sample_steps_per_sec_per_chip"] = (
            best["agg_sample_steps_per_sec"]
        )
        result["ensemble_rollout_mfu"] = best["mfu"]
        result["ensemble_simulated_years_per_day_per_chip"] = round(
            best["agg_sample_steps_per_sec"]
            * (6 * 3600.0) / (365.25 * 86400.0) * 86400.0, 1
        )

    def sfno256_phase():
        sfno256 = _stepper(sfno256_builder)
        s256_steps, _, _ = _bench_rollout(sfno256, 1, n_steps)
        result["sfno256_rollout_steps_per_sec"] = round(s256_steps, 3)
        # continuity anchor: round 1 measured the SFNO-256 rollout at
        # 49.293 steps/s on this same chip (BENCH_r01.json); the
        # headline metric is now the flagship config, so the baseline
        # ratio tracks the shared SFNO-256 measurement
        if not smoke:
            result["vs_baseline"] = round(s256_steps / 49.293, 4)

    def accum_phase():
        # the full reference recipe on ONE chip: global batch 8 via
        # gradient accumulation (run-ace-train.sh trains 4 devices x
        # batch 2; a single-chip user runs accumulation instead).
        # batch 2 x 4 accumulation OOMs (the f32 MultiSteps gradient
        # accumulator adds ~3 GB on top of the 14.7 GB batch-2 step:
        # 17.99 of 15.75 GB, measured r5), so the fitting configuration
        # is batch 1 x 8 micro-steps.
        if smoke:
            return
        import jax

        from ace_tpu.core.config import from_dict
        from ace_tpu.core.loss import StepLossConfig
        from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
        from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper
        import jax.numpy as jnp

        stepper = _stepper(
            {**flagship_builder,
             "config": {**flagship_builder["config"], "checkpointing": 1}}
        )
        prognostic, diagnostics, forcings = _names()
        ts = TrainStepper(
            stepper,
            StepperTrainConfig(
                n_forward_steps=1, n_ensemble=2, remat=False,
                loss=from_dict(StepLossConfig, {
                    "type": "EnsembleLoss",
                    "kwargs": {"crps_weight": 0.9,
                               "energy_score_weight": 0.1},
                }),
            ),
            OptimizationConfig(lr=1e-4, optimizer_type="AdamW",
                               max_grad_norm=1.0,
                               first_moment_dtype="bfloat16",
                               use_gradient_accumulation=True,
                               gradient_accumulation_steps=8),
            EMAConfig(),
        )
        params, opt_state = ts.init(jax.random.PRNGKey(0))
        if ts.ema is not None:
            ts.ema.ema_params = None
        rng = np.random.RandomState(1)
        all_names = sorted(set(prognostic + diagnostics + forcings))
        batch_data = {}
        for k in all_names:
            arr = jnp.asarray(rng.randn(1, 2, NLAT, NLON), jnp.float32)
            if k == "PRESsfc":
                arr = arr * 100 + 1.0e5
            if k.startswith("specific_total_water"):
                arr = jnp.abs(arr) * 1e-3
            if k == "ocean_fraction":
                arr = jnp.clip(jnp.abs(arr), 0, 1)
            batch_data[k] = arr
        train_step = ts.build_train_step(donate=True)
        key = jax.random.PRNGKey(2)
        compiled = train_step.lower(
            params, opt_state, batch_data, key
        ).compile()

        def run(params, opt_state):
            p, o, metrics = compiled(params, opt_state, batch_data, key)
            return p, o, float(metrics["loss"])

        params, opt_state, _ = run(params, opt_state)
        n_micro = 8
        t0 = time.time()
        for _ in range(n_micro):
            params, opt_state, _ = run(params, opt_state)
        elapsed = time.time() - t0
        micro_s = elapsed / n_micro
        result["train_global_batch8_samples_per_sec"] = round(
            n_micro / elapsed, 3
        )
        result["train_global_batch8_step_seconds"] = round(micro_s * 8, 4)
        result["train_accum_config"] = "batch 1 x 8 micro-steps"

    def coupled_phase():
        if smoke:
            return
        c_steps, c_compile, _, c_outer_s = _bench_coupled()
        result["coupled_atmos_steps_per_sec"] = round(c_steps, 3)
        result["coupled_outer_step_seconds"] = round(c_outer_s, 3)
        result["coupled_compile_time_s"] = round(c_compile, 1)

    def downscaling_phase():
        if smoke:
            return
        import jax.numpy as jnp

        # f32 = exact reference parity semantics; bf16 = the AMP
        # analogue (f32 params/softmax/GroupNorm stats), measured +18%
        # sampler throughput on v5e
        d_sps, d_compile, d_flops, d_eval_s = _bench_downscaling()
        result["downscaling_edm_samples_per_sec"] = round(d_sps, 3)
        result["downscaling_denoiser_mfu"] = (
            round(d_flops / d_eval_s / peak, 4)
            if (peak and d_flops and d_eval_s) else None
        )
        result["downscaling_compile_time_s"] = round(d_compile, 1)
        b_sps, _, b_flops, b_eval_s = _bench_downscaling(
            dtype=jnp.bfloat16
        )
        result["downscaling_edm_samples_per_sec_bf16"] = round(b_sps, 3)
        result["downscaling_denoiser_mfu_bf16"] = (
            round(b_flops / b_eval_s / peak, 4)
            if (peak and b_flops and b_eval_s) else None
        )

    phase("train", train_phase)
    phase("accum", accum_phase)
    phase("rollout", rollout_phase)
    phase("coupled", coupled_phase)
    phase("downscaling", downscaling_phase)
    phase("sfno256", sfno256_phase)
    if errors:
        result["errors"] = {k: v.splitlines()[-1] for k, v in errors.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    main(smoke="--smoke" in sys.argv)
