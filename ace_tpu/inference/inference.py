"""Inference entry point: ``python -m ace_tpu.inference <config.yaml>``
(reference: fme/ace/inference/inference.py:225 InferenceConfig, :360
run_inference_from_config).
"""

import dataclasses
import logging
import os

import jax
import numpy as np

from ace_tpu.aggregator.inference import (
    InferenceAggregatorConfig,
    InferenceEvaluatorAggregator,
)
from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.timing import GlobalTimer
from ace_tpu.data.inference import (
    ExplicitIndices,
    InferenceDataLoaderConfig,
    InferenceInitialConditionIndices,
    TimestampList,
)
from ace_tpu.inference.data_writer import DataWriterConfig, save_restart
from ace_tpu.parallel.mesh import MeshConfig
from ace_tpu.inference.loop import run_inference
from ace_tpu.stepper.checkpoint import load_stepper
from ace_tpu.stepper.stepper import StepperOverrideConfig
from ace_tpu.stepper.insolation import DerivedForcingsConfig
from ace_tpu.stepper.stepper import PrognosticState
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class InitialConditionConfig:
    """External initial-condition dataset (reference:
    fme/ace/inference/inference.py:63 InitialConditionConfig): each
    selected time becomes one IC sample, and the forcing windows start
    at the matching times located in the forcing dataset (reference:
    inference.py:195-216 + ForcingDataLoaderConfig.build_inference_config,
    data_loading/inference.py:193).

    path: the IC dataset file (netCDF or zarr) with [time, lat, lon]
        variables; for restart.nc files (one realized state per
        sample) use ``initial_condition_path`` instead.
    engine: accepted for reference config parity; the store autodetects.
    start_indices: optional subset of IC times (list/times/first-n).
    """

    path: str
    engine: str | None = None
    start_indices: (
        ExplicitIndices | TimestampList
        | InferenceInitialConditionIndices | None
    ) = None

    def load(self, names: list[str]):
        """Returns ({name: [n_ic, 1, lat, lon]}, ic time values)."""
        from ace_tpu.data.store import open_file_dataset

        ds = open_file_dataset(self.path)
        time = ds.read_time("time")
        tvals = time.values.reshape(-1)
        if self.start_indices is not None:
            from ace_tpu.data.time import TimeCoord

            idx = self.start_indices.resolve(
                TimeCoord(tvals, time.calendar)
            )
        else:
            idx = list(range(len(tvals)))
        data = {}
        for name in names:
            arr = np.asarray(ds[name].read(()), dtype=np.float32)
            if arr.ndim != 3:
                raise ValueError(
                    f"initial condition variable {name!r} must be "
                    f"[time, lat, lon]; got shape {arr.shape}"
                )
            data[name] = arr[idx][:, None]
        return data, tvals[idx], time.calendar


@dataclasses.dataclass
class InferenceConfig:
    """(reference: fme/ace/inference/inference.py:225)."""

    experiment_dir: str
    checkpoint_path: str
    n_forward_steps: int
    forcing_loader: InferenceDataLoaderConfig
    forward_steps_in_memory: int = 10
    data_writer: DataWriterConfig = dataclasses.field(
        default_factory=DataWriterConfig
    )
    aggregator: InferenceAggregatorConfig = dataclasses.field(
        default_factory=InferenceAggregatorConfig
    )
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    derived_forcings: DerivedForcingsConfig = dataclasses.field(
        default_factory=DerivedForcingsConfig
    )
    # restart file to use as the initial condition instead of the forcing
    # dataset (used by segmented inference; reference: inference.py:514)
    initial_condition_path: str | None = None
    # external IC dataset with time selection: forcing windows align to
    # the IC times (reference: inference.py:63 InitialConditionConfig)
    initial_condition: InitialConditionConfig | None = None
    stepper_override: StepperOverrideConfig | None = None
    # N ensemble members per initial condition: the IC batch is tiled
    # member-major and the stochastic model's noise stream differentiates
    # members; spread/skill/CRPS are aggregated (reference:
    # fme/ace/inference/inference.py:296 n_ensemble_per_ic)
    n_ensemble_per_ic: int = 1
    # (data, h, w) device mesh: ICs sharded over "data", the lat/lon grid
    # decomposed over (h, w) with the explicit all-to-all distributed SHT
    # inside spectral models (reference: inference runs under Distributed
    # with per-rank batch scatter, fme/ace/data_loading/
    # gridded_data.py:76-80). None = single-device placement.
    mesh: MeshConfig | None = None

    def __post_init__(self):
        self.data_writer.validate_time_coarsen(
            self.n_forward_steps, self.forward_steps_in_memory
        )
        if self.n_ensemble_per_ic > 1 and self.initial_condition_path:
            # a restart file holds one realized state per IC; members
            # cannot be re-broadcast consistently (reference:
            # inference.py:529-534)
            raise ValueError(
                "n_ensemble_per_ic > 1 is not supported with "
                "initial_condition_path (restart-seeded runs)"
            )


def load_restart_initial_condition(path: str, names: list[str]):
    """Read a restart.nc written by save_restart into an IC dict."""
    from ace_tpu.data.store import open_file_dataset

    ds = open_file_dataset(path)
    data = {}
    for name in names:
        arr = np.asarray(ds[name].read(()), dtype=np.float32)
        if arr.ndim == 3:  # [sample, lat, lon] -> add time dim
            arr = arr[:, None]
        data[name] = arr
    return data


def run_inference_from_config(config: InferenceConfig) -> dict:
    import contextlib

    from ace_tpu.parallel import distributed as dist
    from ace_tpu.parallel.mesh import spatial_parallel

    config.logging.configure(config.experiment_dir)
    with contextlib.ExitStack() as stack:
        if config.mesh is not None:
            mesh = config.mesh.build()
            placement = dist.BatchPlacement(mesh)
            stack.enter_context(jax.set_mesh(mesh))
            # h*w > 1 switches spectral models to the all-to-all
            # distributed SHT (ops/sht.py build_sht dispatch)
            stack.enter_context(spatial_parallel(mesh))
        else:
            placement = None
        return _run_inference_impl(config, placement)


def _run_inference_impl(config: InferenceConfig, placement) -> dict:
    stepper = load_stepper(
        config.checkpoint_path, override=config.stepper_override
    )
    if placement is not None:
        # replicate weights over the mesh (FSDP-style sharding buys
        # nothing at inference: there is no optimizer state and the
        # all-gathers would repeat every window)
        stepper.params = jax.tree_util.tree_map(
            placement.put_replicated, stepper.params
        )
    deriver = config.derived_forcings.build(stepper.dataset_info)
    forcing_names = [
        n for n in stepper.forcing_window_names
        if n not in deriver.provided_names
    ]
    loader = config.forcing_loader
    external_ic = None
    if config.initial_condition is not None:
        # external ICs: each selected IC time becomes a sample, and the
        # forcing windows start at the matching forcing-dataset times
        # (reference: inference.py:195-216 start-index derivation)
        external_ic, ic_times, _cal = config.initial_condition.load(
            stepper.prognostic_names
        )
        # build the forcing dataset ONCE: reused below via the
        # pre-built-dataset loader path instead of a second open
        forcing_ds = loader.dataset.build()
        forcing_time = forcing_ds.all_time.values.reshape(-1)
        positions = np.searchsorted(forcing_time, ic_times)
        bad = (positions >= len(forcing_time)) | (
            forcing_time[np.minimum(positions, len(forcing_time) - 1)]
            != ic_times
        )
        if bad.any():
            raise ValueError(
                "initial condition time(s) not present in the forcing "
                f"dataset: {np.asarray(ic_times)[bad]}"
            )
        from ace_tpu.data.inference import InferenceGriddedData

        forcing_data = InferenceGriddedData(
            dataset=forcing_ds,
            start_indices=ExplicitIndices(
                list=[int(p) for p in positions]
            ),
            forcing_names=forcing_names,
            prognostic_names=stepper.prognostic_names,
            n_forward_steps=config.n_forward_steps,
            forward_steps_in_memory=config.forward_steps_in_memory,
        )
    else:
        forcing_data = loader.build(
            forcing_names=forcing_names,
            prognostic_names=stepper.prognostic_names,
            n_forward_steps=config.n_forward_steps,
            forward_steps_in_memory=config.forward_steps_in_memory,
        )
    # training/inference dataset compatibility check
    # (reference: inference.py:413)
    stepper.dataset_info.assert_compatible_with(forcing_data.dataset_info)
    if external_ic is not None:
        ic_data = external_ic
    elif config.initial_condition_path is not None:
        ic_data = load_restart_initial_condition(
            config.initial_condition_path, stepper.prognostic_names
        )
    else:
        ic_data = forcing_data.initial_condition(
            stepper.prognostic_names
        ).data
    n_ens = config.n_ensemble_per_ic
    if n_ens > 1:
        # member-major tiling: members of one IC are contiguous
        ic_data = {
            k: np.repeat(np.asarray(v), n_ens, axis=0)
            for k, v in ic_data.items()
        }
    if placement is not None:
        ic = PrognosticState(
            data={
                k: placement.put_global(np.asarray(v))
                for k, v in ic_data.items()
            }
        )
    else:
        ic = PrognosticState(
            data={k: jax.device_put(v) for k, v in ic_data.items()}
        )
    info = forcing_data.dataset_info
    multiproc = placement is not None and placement.multiprocess
    from ace_tpu.parallel import distributed as dist

    root = dist.is_root() if multiproc else True
    aggregator = config.aggregator.build(
        info, n_timesteps=config.n_forward_steps,
        normalizer=getattr(stepper.step, "normalizer", None),
        n_ensemble_per_ic=n_ens,
    )
    # multi-process: only the root writes files (outputs are gathered to
    # every host by placement.fetch; reference gates writers per rank,
    # fme/ace/inference/data_writer/raw.py:96)
    if root:
        writer = config.data_writer.build(config.experiment_dir, info)
    else:
        from ace_tpu.inference.data_writer import NullDataWriter

        writer = NullDataWriter()
    summary = run_inference(
        stepper, ic, forcing_data, writer=writer, aggregator=aggregator,
        forcing_deriver=deriver, placement=placement, n_ensemble=n_ens,
    )
    logs = aggregator.get_logs()
    if root:
        aggregator.flush_diagnostics(
            os.path.join(config.experiment_dir, "diagnostics")
        )
        aggregator.flush_images(
            os.path.join(config.experiment_dir, "plots")
        )
    final_state: PrognosticState = summary["final_state"]
    final_np = (
        placement.fetch(final_state.data)
        if multiproc else jax.device_get(final_state.data)
    )
    last_time = forcing_data.dataset.all_time[
        [s + config.n_forward_steps
         for s in forcing_data._starts
         for _ in range(n_ens)]
    ]
    from ace_tpu.data.time import TimeCoord

    if root:
        save_restart(
            os.path.join(config.experiment_dir, "restart.nc"),
            {k: np.asarray(v) for k, v in final_np.items()},
            TimeCoord(last_time.values[:, None], last_time.calendar),
            info,
        )
    writer.close()
    GlobalTimer.get_instance().log_durations()
    summary["logs"] = logs
    return summary


def run_segmented_inference(config: InferenceConfig, segments: int):
    """Chain segments via restart.nc (reference: inference.py:514
    run_segmented_inference). Completed segments (restart.nc present) are
    skipped, so interrupted multi-segment runs resume where they left off.
    """
    import copy

    from ace_tpu.data.inference import ExplicitIndices

    summary = None
    base_starts = None  # resolved lazily, once, for continuation segments
    for segment in range(segments):
        segment_dir = os.path.join(
            config.experiment_dir, f"segment_{segment:04d}"
        )
        restart_path = os.path.join(segment_dir, "restart.nc")
        if os.path.exists(restart_path):
            logging.info(f"Skipping completed segment {segment}")
            continue
        seg_config = copy.deepcopy(config)
        seg_config.experiment_dir = segment_dir
        if segment > 0:
            prev_dir = os.path.join(
                config.experiment_dir, f"segment_{segment - 1:04d}"
            )
            seg_config.initial_condition_path = os.path.join(
                prev_dir, "restart.nc"
            )
            # shift IC start indices forward by the completed steps;
            # resolve against the dataset once, not per segment (the
            # build re-reads every file's time index)
            if base_starts is None:
                base_starts = config.forcing_loader.start_indices.resolve(
                    config.forcing_loader.dataset.build().all_time
                )
            seg_config.forcing_loader.start_indices = ExplicitIndices(
                list=[
                    s + segment * config.n_forward_steps
                    for s in base_starts
                ]
            )
        logging.info(f"Running segment {segment}")
        summary = run_inference_from_config(seg_config)
    return summary


def main(argv=None):
    parser = get_parser()
    parser.add_argument(
        "--segments", type=int, default=None,
        help="run in N chained segments via restart files",
    )
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(InferenceConfig, data)
    prepare_directory(config.experiment_dir, data)
    logging.info("Starting inference")
    if args.segments is not None:
        return run_segmented_inference(config, args.segments)
    return run_inference_from_config(config)


if __name__ == "__main__":
    main()
