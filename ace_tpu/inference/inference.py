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
from ace_tpu.inference.loop import run_inference
from ace_tpu.stepper.checkpoint import load_stepper
from ace_tpu.stepper.insolation import DerivedForcingsConfig
from ace_tpu.stepper.stepper import PrognosticState
from ace_tpu.train.trainer import LoggingConfig


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


def run_inference_from_config(config: InferenceConfig) -> dict:
    config.logging.configure(config.experiment_dir)
    stepper = load_stepper(config.checkpoint_path)
    forcing_data = config.forcing_loader.build(
        forcing_names=stepper.forcing_window_names,
        prognostic_names=stepper.prognostic_names,
        n_forward_steps=config.n_forward_steps,
        forward_steps_in_memory=config.forward_steps_in_memory,
    )
    # training/inference dataset compatibility check
    # (reference: inference.py:413)
    stepper.dataset_info.assert_compatible_with(forcing_data.dataset_info)
    ic_batch = forcing_data.initial_condition(stepper.prognostic_names)
    ic = PrognosticState(
        data={k: jax.device_put(v) for k, v in ic_batch.data.items()}
    )
    info = forcing_data.dataset_info
    aggregator = config.aggregator.build(
        info, n_timesteps=config.n_forward_steps
    )
    writer = config.data_writer.build(config.experiment_dir, info)
    deriver = config.derived_forcings.build(stepper.dataset_info)
    summary = run_inference(
        stepper, ic, forcing_data, writer=writer, aggregator=aggregator,
        forcing_deriver=deriver,
    )
    logs = aggregator.get_logs()
    aggregator.flush_diagnostics(
        os.path.join(config.experiment_dir, "diagnostics")
    )
    final_state: PrognosticState = summary["final_state"]
    last_time = forcing_data.dataset.all_time[
        [s + config.n_forward_steps for s in forcing_data._starts]
    ]
    from ace_tpu.data.time import TimeCoord

    save_restart(
        os.path.join(config.experiment_dir, "restart.nc"),
        {k: np.asarray(v) for k, v in final_state.data.items()},
        TimeCoord(last_time.values[:, None], last_time.calendar),
        info,
    )
    writer.close()
    GlobalTimer.get_instance().log_durations()
    summary["logs"] = logs
    return summary


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(InferenceConfig, data)
    prepare_directory(config.experiment_dir, data)
    logging.info("Starting inference")
    return run_inference_from_config(config)


if __name__ == "__main__":
    main()
