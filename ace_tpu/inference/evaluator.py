"""Evaluator entry: rollout vs target data with paired aggregation
(reference: fme/ace/inference/evaluator.py:168,333).
"""

import dataclasses
import logging
import os

import jax

from ace_tpu.aggregator.inference import InferenceAggregatorConfig
from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.timing import GlobalTimer
from ace_tpu.data.inference import InferenceDataLoaderConfig
from ace_tpu.inference.data_writer import DataWriterConfig
from ace_tpu.inference.loop import run_inference
from ace_tpu.parallel.mesh import MeshConfig
from ace_tpu.stepper.checkpoint import load_stepper
from ace_tpu.stepper.insolation import DerivedForcingsConfig
from ace_tpu.stepper.stepper import PrognosticState, StepperOverrideConfig
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class EvaluatorConfig:
    """(reference: fme/ace/inference/evaluator.py:168)."""

    experiment_dir: str
    checkpoint_path: str
    n_forward_steps: int
    loader: InferenceDataLoaderConfig
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
    stepper_override: StepperOverrideConfig | None = None
    # N ensemble members per IC (see InferenceConfig.n_ensemble_per_ic)
    n_ensemble_per_ic: int = 1
    # (data, h, w) device mesh for sharded evaluation (see
    # ace_tpu/inference/inference.py InferenceConfig.mesh)
    mesh: MeshConfig | None = None

    def __post_init__(self):
        self.data_writer.validate_time_coarsen(
            self.n_forward_steps, self.forward_steps_in_memory
        )


def run_evaluator_from_config(config: EvaluatorConfig) -> dict:
    import contextlib

    from ace_tpu.parallel import distributed as dist
    from ace_tpu.parallel.mesh import spatial_parallel

    config.logging.configure(config.experiment_dir)
    with contextlib.ExitStack() as stack:
        if config.mesh is not None:
            mesh = config.mesh.build()
            placement = dist.BatchPlacement(mesh)
            stack.enter_context(jax.set_mesh(mesh))
            stack.enter_context(spatial_parallel(mesh))
        else:
            placement = None
        return _run_evaluator_impl(config, placement)


def _run_evaluator_impl(config: EvaluatorConfig, placement) -> dict:
    import numpy as np

    from ace_tpu.parallel import distributed as dist

    stepper = load_stepper(
        config.checkpoint_path, override=config.stepper_override
    )
    if placement is not None:
        stepper.params = jax.tree_util.tree_map(
            placement.put_replicated, stepper.params
        )
    deriver = config.derived_forcings.build(stepper.dataset_info)
    forcing_names = [
        n for n in stepper.forcing_window_names
        if n not in deriver.provided_names
    ]
    data = config.loader.build(
        forcing_names=forcing_names,
        prognostic_names=stepper.prognostic_names,
        n_forward_steps=config.n_forward_steps,
        forward_steps_in_memory=config.forward_steps_in_memory,
    )
    stepper.dataset_info.assert_compatible_with(data.dataset_info)
    ic_batch = data.initial_condition(stepper.prognostic_names)
    n_ens = config.n_ensemble_per_ic
    if n_ens > 1:
        ic_batch.data = {
            k: np.repeat(np.asarray(v), n_ens, axis=0)
            for k, v in ic_batch.data.items()
        }
    if placement is not None:
        ic = PrognosticState(
            data={
                k: placement.put_global(np.asarray(v))
                for k, v in ic_batch.data.items()
            }
        )
    else:
        ic = PrognosticState(
            data={k: jax.device_put(v) for k, v in ic_batch.data.items()}
        )
    info = data.dataset_info
    multiproc = placement is not None and placement.multiprocess
    root = dist.is_root() if multiproc else True
    aggregator = config.aggregator.build(
        info, n_timesteps=config.n_forward_steps,
        normalizer=getattr(stepper.step, "normalizer", None),
        n_ensemble_per_ic=n_ens,
    )
    if root:
        writer = config.data_writer.build(config.experiment_dir, info)
    else:
        from ace_tpu.inference.data_writer import NullDataWriter

        writer = NullDataWriter()
    # target variables available in the dataset
    target_names = [
        n for n in stepper.out_names if n in data.dataset.names
    ]
    summary = run_inference(
        stepper, ic, data, writer=writer, aggregator=aggregator,
        target_names=target_names, forcing_deriver=deriver,
        placement=placement, n_ensemble=n_ens,
    )
    summary["logs"] = aggregator.get_logs()
    if root:
        aggregator.flush_diagnostics(
            os.path.join(config.experiment_dir, "diagnostics")
        )
        aggregator.flush_images(
            os.path.join(config.experiment_dir, "plots")
        )
    writer.close()
    GlobalTimer.get_instance().log_durations()
    return summary


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(EvaluatorConfig, data)
    prepare_directory(config.experiment_dir, data)
    logging.info("Starting evaluator")
    return run_evaluator_from_config(config)


if __name__ == "__main__":
    main()


@dataclasses.dataclass
class DatasetComparisonConfig:
    """Compare a prediction dataset against a target dataset through the
    paired aggregators, with no model in the loop
    (reference: fme/ace/inference/loop.py:29 run_dataset_comparison +
    fme/ace/inference/evaluator.py dataset-comparison mode).
    """

    experiment_dir: str
    n_forward_steps: int
    prediction_loader: InferenceDataLoaderConfig
    target_loader: InferenceDataLoaderConfig
    variable_names: list[str]
    forward_steps_in_memory: int = 10
    aggregator: InferenceAggregatorConfig = dataclasses.field(
        default_factory=InferenceAggregatorConfig
    )
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)


def run_dataset_comparison(config: DatasetComparisonConfig) -> dict:
    """(reference: loop.py:29)."""
    config.logging.configure(config.experiment_dir)
    pred = config.prediction_loader.build(
        forcing_names=config.variable_names,
        prognostic_names=[],
        n_forward_steps=config.n_forward_steps,
        forward_steps_in_memory=config.forward_steps_in_memory,
    )
    target = config.target_loader.build(
        forcing_names=config.variable_names,
        prognostic_names=[],
        n_forward_steps=config.n_forward_steps,
        forward_steps_in_memory=config.forward_steps_in_memory,
    )
    aggregator = config.aggregator.build(
        target.dataset_info, n_timesteps=config.n_forward_steps
    )
    from ace_tpu.data.time import TimeCoord

    n_windows = 0
    for (pred_batch, _), (tgt_batch, _) in zip(
        pred.windows(), target.windows()
    ):
        gen = {
            k: jax.numpy.asarray(v[:, 1:])
            for k, v in pred_batch.data.items()
            if k in config.variable_names
        }
        tgt = {
            k: jax.numpy.asarray(v[:, 1:])
            for k, v in tgt_batch.data.items()
            if k in config.variable_names
        }
        time = TimeCoord(
            tgt_batch.time.values[:, 1:], tgt_batch.time.calendar
        )
        aggregator.record_batch(gen, tgt, time=time)
        n_windows += 1
        logging.info(f"dataset comparison window {n_windows} done")
    logs = aggregator.get_logs()
    aggregator.flush_diagnostics(
        os.path.join(config.experiment_dir, "diagnostics")
    )
    aggregator.flush_images(
        os.path.join(config.experiment_dir, "plots")
    )
    return {"logs": logs, "n_windows": n_windows}
