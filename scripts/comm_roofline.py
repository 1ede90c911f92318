"""Flagship-scale collective accounting + scaling-efficiency roofline.

AOT-lowers (compile-only, no execution, no materialized parameters) the
FLAGSHIP NoiseConditionedSFNO (embed 512 / 8 layers / 180x360) CRPS
train step and the inference rollout step over virtual CPU meshes, and
emits per-collective instruction counts and per-chip bytes from the
optimized SPMD HLO — the exact evidence of what would move over ICI,
at the real channel width (the embed-32 dryrun understates all-to-all
traffic ~16x because spatial-collective bytes scale with the channel
dim; reference comparison point:
fme/core/distributed/model_torch_distributed.py:372-399).

Usage (from the repo root):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/comm_roofline.py [--out COMM_FLAGSHIP.json]

The roofline section converts bytes to exposed-communication time
against interconnect bandwidths and combines with the MEASURED 1-chip
step times (BENCH_r04: train batch-2 0.751 s/step; rollout 47.3 ms/step)
to project scaling efficiency — see STATUS.md for the derivation.
"""

import argparse
import json
import os
import sys
import time
from datetime import timedelta

# must precede any jax import/backed init
n_dev = int(os.environ.get("ACE_ROOFLINE_DEVICES", "8"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the Pallas dhconv kernel cannot lower for CPU devices (and this image
# pins the default backend to the TPU tunnel, so the kernel's
# auto-gate would still pick it); the einsum filter is collective-
# identical for comm accounting
os.environ["ACE_TPU_PALLAS_FILTER"] = "0"
os.environ["ACE_TPU_PALLAS_BLOCK"] = "0"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# interconnect assumptions (documented, conservative):
# - v5e ICI: 1600 Gbps aggregate per chip (Cloud TPU v5e spec) = 200 GB/s
#   bidirectional; we charge collectives against 100 GB/s effective
#   one-way per chip.
# - DCN: 200 Gbps host NIC shared by 8 chips = ~3.1 GB/s per chip.
ICI_BYTES_PER_S = 100e9
DCN_BYTES_PER_S = 3.1e9
# measured 1-chip per-step compute (BENCH_r04.json, real v5e):
TRAIN_STEP_S = 0.7514      # batch 2/chip CRPS train step
ROLLOUT_STEP_S = 1.0 / 21.162  # batch-1 flagship rollout


def _flagship_stepper(embed: int):
    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate,
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.stepper import StepperConfig

    nlat, nlon, nz = 180, 360, 8
    prognostic = (
        [f"air_temperature_{k}" for k in range(nz)]
        + [f"specific_total_water_{k}" for k in range(nz)]
        + [f"eastward_wind_{k}" for k in range(nz)]
        + [f"northward_wind_{k}" for k in range(nz)]
        + ["PRESsfc", "surface_temperature", "h500"]
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
            ak=np.concatenate([np.linspace(100.0, 5000.0, nz // 2),
                               np.linspace(5000.0, 0.0, nz // 2 + 1)]),
            bk=np.linspace(0.0, 1.0, nz + 1),
        ),
        timestep=timedelta(hours=6),
    )
    step_cfg = from_dict(SingleModuleStepConfig, dict(
        builder={"type": "NoiseConditionedSFNO", "config": {
            "embed_dim": embed, "noise_embed_dim": 32,
            "noise_type": "isotropic", "filter_type": "linear",
            "use_mlp": True, "num_layers": 8, "operator_type": "dhconv",
            "separable": False, "spectral_layers": 3,
            "spectral_transform": "sht", "affine_norms": True,
            "normalize_big_skip": True, "compute_dtype": "bfloat16",
            "checkpointing": 1,
        }},
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
    stepper = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(step_cfg))
    ).get_stepper(info)
    return stepper, all_names, (nlat, nlon)


def _shape_sharded(tree, mesh, spec_fn):
    """eval_shape pytree -> ShapeDtypeStructs with NamedShardings (no
    materialization: AOT lowering needs only avals + shardings)."""
    import jax
    from jax.sharding import NamedSharding

    def put(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(mesh, spec_fn(leaf)),
        )

    return jax.tree_util.tree_map(put, tree)


def account(mesh_shape, embed: int, what: str, fsdp: bool = True):
    import jax
    from jax.sharding import PartitionSpec as P

    from ace_tpu.core.loss import StepLossConfig
    from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
    from ace_tpu.parallel.comm_stats import (
        compiled_collective_stats, format_comm_stats,
    )
    from ace_tpu.parallel.mesh import (
        MeshConfig, batch_spec, parameter_spec, spatial_parallel,
    )
    from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper

    data_par, h, w = mesh_shape
    n = data_par * h * w
    mesh = MeshConfig(data_par, h, w).build(jax.devices("cpu")[:n])
    stepper, all_names, (nlat, nlon) = _flagship_stepper(embed)
    t0 = time.time()
    with jax.set_mesh(mesh), spatial_parallel(mesh):
        if what == "train":
            ts = TrainStepper(
                stepper,
                StepperTrainConfig(
                    n_forward_steps=1, n_ensemble=2,
                    loss=StepLossConfig(
                        type="EnsembleLoss",
                        kwargs={"crps_weight": 0.9,
                                "energy_score_weight": 0.1},
                    ),
                ),
                OptimizationConfig(lr=1e-4, optimizer_type="AdamW",
                                   max_grad_norm=1.0,
                                   first_moment_dtype="bfloat16"),
                EMAConfig(),
            )
            key = jax.random.PRNGKey(0)
            params_s, opt_s = jax.eval_shape(ts.init, key)
            spec_fn = (
                (lambda l: parameter_spec(l.shape, mesh)
                 if l.ndim else P())
                if fsdp else (lambda l: P())
            )
            params_s = _shape_sharded(params_s, mesh, spec_fn)
            opt_s = _shape_sharded(opt_s, mesh, spec_fn)
            # per-chip batch 2 on the data axis (the reference recipe)
            batch = 2 * data_par
            batch_s = {
                name: jax.ShapeDtypeStruct(
                    (batch, 2, nlat, nlon), np.float32,
                    sharding=jax.NamedSharding(mesh, batch_spec(4)),
                )
                for name in all_names
            }
            key_s = jax.ShapeDtypeStruct(key.shape, key.dtype)
            step = ts.build_train_step(donate=False)
            compiled = step.lower(params_s, opt_s, batch_s, key_s).compile()
        else:  # rollout: one forward step of the inference scan
            from ace_tpu.stepper.stepper import PrognosticState

            key = jax.random.PRNGKey(0)
            params_s = jax.eval_shape(stepper.init_params, key)
            params_s = _shape_sharded(params_s, mesh, lambda l: P())
            prognostic = stepper.prognostic_names
            batch = max(1, data_par)
            ic_s = {
                k: jax.ShapeDtypeStruct(
                    (batch, 1, nlat, nlon), np.float32,
                    sharding=jax.NamedSharding(mesh, batch_spec(4)),
                )
                for k in prognostic
            }
            forcing_s = {
                k: jax.ShapeDtypeStruct(
                    (batch, 2, nlat, nlon), np.float32,
                    sharding=jax.NamedSharding(mesh, batch_spec(4)),
                )
                for k in stepper.forcing_window_names
            }
            state_s = jax.eval_shape(
                lambda: stepper.get_initial_state(
                    PrognosticState(data={
                        k: np.zeros((batch, 1, nlat, nlon), np.float32)
                        for k in prognostic
                    })
                ).stepper_state
            )

            def one_step(params, ic, forcing, st):
                outputs, _, final = stepper.predict_fn(
                    params, ic, forcing, st, jax.random.PRNGKey(0)
                )
                return outputs

            compiled = (
                jax.jit(one_step)
                .lower(params_s, ic_s, forcing_s, state_s)
                .compile()
            )
        comm = compiled_collective_stats(compiled)
    elapsed = time.time() - t0
    print(f"{what} mesh={mesh_shape} embed={embed}: "
          f"{format_comm_stats(comm)} (lower+compile {elapsed:.0f}s)",
          flush=True)
    return comm


def roofline(comm: dict, step_1chip_s: float, mesh_shape) -> dict:
    """First-order exposed-comm model: every collective byte charged
    serially against the interconnect (no overlap — the worst case;
    the chunked SHT/DISCO pipelines and XLA's latency-hiding scheduler
    recover part of this).

    Scaling model: the data axis is weak-scaled (per-chip batch fixed,
    so per-chip compute is unchanged by data_parallel) and the spatial
    (h, w) axes are strong-scaled (per-chip compute = measured 1-chip
    step / (h*w), assuming perfect compute partitioning — optimistic
    for compute, pessimistic for comm; the two bracket reality).

    ICI case: all axes inside one slice. DCN case: the data axis
    crosses hosts, so data-axis collectives (all-reduce / all-gather /
    reduce-scatter = gradient + FSDP traffic) ride DCN while spatial
    all-to-all stays on ICI.
    """
    data_par, h, w = mesh_shape
    n_chips = data_par * h * w
    a2a = comm.get("all-to-all", {}).get("bytes", 0)
    permute = comm.get("collective-permute", {}).get("bytes", 0)
    reduce_like = sum(
        comm.get(k, {}).get("bytes", 0)
        for k in ("all-reduce", "all-gather", "reduce-scatter")
    )
    spatial = a2a + permute
    t_c = step_1chip_s / (h * w)
    t_ici = (spatial + reduce_like) / ICI_BYTES_PER_S
    t_dcn_mixed = spatial / ICI_BYTES_PER_S + reduce_like / DCN_BYTES_PER_S
    return {
        "n_chips": n_chips,
        "per_chip_compute_s": round(t_c, 6),
        "spatial_bytes_per_chip": spatial,
        "reduce_bytes_per_chip": reduce_like,
        "comm_s_ici": round(t_ici, 6),
        "efficiency_ici": round(t_c / (t_c + t_ici), 4),
        "step_s_ici": round(t_c + t_ici, 6),
        "comm_s_dcn_data_axis": round(t_dcn_mixed, 6),
        "efficiency_dcn_data_axis": round(
            t_c / (t_c + t_dcn_mixed), 4
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="COMM_FLAGSHIP.json")
    ap.add_argument("--embed", type=int, default=512)
    args = ap.parse_args()
    out = {"embed": args.embed, "grid": "180x360",
           "assumptions": {
               "ici_bytes_per_s": ICI_BYTES_PER_S,
               "dcn_bytes_per_s_per_chip": DCN_BYTES_PER_S,
               "train_step_s_measured_1chip": TRAIN_STEP_S,
               "rollout_step_s_measured_1chip": ROLLOUT_STEP_S,
           },
           "meshes": {}}
    # (1,2,2)/(2,2,2): spatial decomposition (+FSDP on the data axis);
    # (8,1,1): pure data parallel + FSDP — the throughput-scaling
    # configuration (rollout has no cross-chip comm there: skipped)
    for mesh_shape in ((1, 2, 2), (2, 2, 2), (8, 1, 1)):
        entry = {}
        whats = (("train", TRAIN_STEP_S), ("rollout", ROLLOUT_STEP_S))
        if mesh_shape[1] * mesh_shape[2] == 1:
            # pure DP: account both parameter placements — replicated
            # (gradient all-reduce only; the right default while params
            # + optimizer state fit, as measured on one 16 GB v5e) and
            # FSDP-sharded (where XLA resolves the sharded-weight
            # contractions with partial-sum activation all-reduces — a
            # measured anti-pattern at this scale, see STATUS)
            whats = ()
            for tag, use_fsdp in (("train_replicated", False),
                                  ("train_fsdp", True)):
                comm = account(mesh_shape, args.embed, "train",
                               fsdp=use_fsdp)
                entry[tag] = {
                    "comm_per_step": comm,
                    "roofline": roofline(comm, TRAIN_STEP_S, mesh_shape),
                }
        for what, step_s in whats:
            comm = account(mesh_shape, args.embed, what)
            entry[what] = {
                "comm_per_step": comm,
                "roofline": roofline(comm, step_s, mesh_shape),
            }
        out["meshes"]["x".join(map(str, mesh_shape))] = entry
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
