"""Coupled (atmosphere + ocean) inference and evaluation entries
(reference: fme/coupled/inference/inference.py:115 InferenceConfig,
fme/coupled/inference/evaluator.py, fme/coupled/inference/loop.py).

Runs the coupled rollout in memory windows of ``coupled_steps_in_memory``
outer (ocean) steps; each window is one jitted coupled scan per component.
Predictions stream to per-component netCDF writers, and (in evaluator
mode) paired RMSE/bias aggregates are computed against the target data.
"""

import dataclasses
import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.metrics import root_mean_squared_error, weighted_mean_bias
from ace_tpu.core.typing_ import TensorDict
from ace_tpu.coupled.stepper import (
    CoupledPrognosticState,
    CoupledStepper,
    CoupledStepperConfig,
)
from ace_tpu.coupled.train import CoupledDatasetsConfig
from ace_tpu.data.dataset import (
    ConcatDatasetConfig,
    MergeDatasetConfig,
    XarrayDataConfig,
)
from ace_tpu.data.inference import (
    ExplicitIndices,
    InferenceInitialConditionIndices,
    TimestampList,
)
from ace_tpu.data.time import TimeCoord
from ace_tpu.inference.data_writer import DataWriterConfig
from ace_tpu.aggregator.inference import InferenceAggregatorConfig
from ace_tpu.inference.data_writer import H5DataWriter
from ace_tpu.stepper.stepper import PrognosticState
from ace_tpu.train.trainer import LoggingConfig
from ace_tpu.core.wandb import DiskMetricLogger


@dataclasses.dataclass
class ComponentCheckpointsConfig:
    """Two standalone component checkpoints (reference:
    fme/coupled/inference/inference.py StandaloneComponentCheckpointsConfig).
    """

    atmosphere: str
    ocean: str


@dataclasses.dataclass
class CoupledDataWriterConfig:
    """Per-component writer options (reference: the coupled
    evaluator's data_writer: {atmosphere, ocean} block)."""

    atmosphere: DataWriterConfig = dataclasses.field(
        default_factory=DataWriterConfig
    )
    ocean: DataWriterConfig = dataclasses.field(
        default_factory=DataWriterConfig
    )


@dataclasses.dataclass
class CoupledInitialConditionConfig:
    """Initial-condition selection for both components (reference:
    fme/coupled/inference/inference.py CoupledInitialConditionConfig).
    The same dataset supplies forcing windows. Datasets may be given
    flat or under a nested ``dataset: {atmosphere, ocean}`` block (the
    reference evaluator's ``loader`` spelling), each a plain/merged/
    concatenated source; start_indices accepts an index list or the
    timestamp/first-n selectors."""

    atmosphere: (
        XarrayDataConfig | MergeDatasetConfig | ConcatDatasetConfig
        | None
    ) = None
    ocean: (
        XarrayDataConfig | MergeDatasetConfig | ConcatDatasetConfig
        | None
    ) = None
    dataset: CoupledDatasetsConfig | None = None
    start_indices: (
        list[int] | ExplicitIndices | TimestampList
        | InferenceInitialConditionIndices
    ) = dataclasses.field(default_factory=lambda: [0])
    num_data_workers: int = 2

    def __post_init__(self):
        flat = self.atmosphere is not None and self.ocean is not None
        if flat == (self.dataset is not None):
            raise ValueError(
                "set either dataset: {atmosphere, ocean} or the flat "
                "atmosphere/ocean fields"
            )

    def build_atmosphere(self):
        return (
            self.dataset.atmosphere if self.dataset is not None
            else self.atmosphere
        ).build()

    def build_ocean(self):
        return (
            self.dataset.ocean if self.dataset is not None
            else self.ocean
        ).build()

    def resolve_starts(self, ocean_time) -> list[int]:
        """Outer (ocean) step start indices; timestamp selectors are
        resolved against the ocean time axis."""
        if isinstance(self.start_indices, list):
            return [int(i) for i in self.start_indices]
        return self.start_indices.resolve(ocean_time)


@dataclasses.dataclass
class CoupledInferenceConfig:
    """(reference: fme/coupled/inference/inference.py:115)."""

    experiment_dir: str
    n_coupled_steps: int
    checkpoint: ComponentCheckpointsConfig | None = None
    # a coupled-trainer output directory holding
    # atmosphere_ckpt.msgpack/ocean_ckpt.msgpack (the reference's single
    # coupled checkpoint_path)
    checkpoint_path: str | None = None
    initial_condition: CoupledInitialConditionConfig | None = None
    # the reference evaluator's paired-target loader spelling; implies
    # evaluate=True (cm4-piControl/evaluator-config.yaml)
    loader: CoupledInitialConditionConfig | None = None
    # per-component writer options (reference: coupled data_writer block)
    data_writer: CoupledDataWriterConfig | None = None
    sst_name: str = "sst"
    coupled_steps_in_memory: int = 4
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    save_prediction_files: bool = True
    evaluate: bool = False  # paired aggregation vs target data
    # full per-component aggregation (time-mean maps, spectra, zonal
    # means, ...), namespaced per component as in the reference
    # (fme/coupled/aggregator.py)
    aggregator: "InferenceAggregatorConfig" = dataclasses.field(
        default_factory=lambda: InferenceAggregatorConfig()
    )

    def __post_init__(self):
        if self.n_coupled_steps % self.coupled_steps_in_memory != 0:
            raise ValueError(
                "n_coupled_steps must be divisible by coupled_steps_in_memory"
            )
        if (self.checkpoint is None) == (self.checkpoint_path is None):
            raise ValueError(
                "set exactly one of checkpoint or checkpoint_path"
            )
        if (self.initial_condition is None) == (self.loader is None):
            raise ValueError(
                "set exactly one of initial_condition or loader"
            )
        if self.loader is not None:
            self.initial_condition = self.loader
            self.evaluate = True
        if self.data_writer is not None:
            self.save_prediction_files = (
                self.data_writer.atmosphere.save_prediction_files
                or self.data_writer.ocean.save_prediction_files
            )

    def load_coupled_stepper(self) -> CoupledStepper:
        from ace_tpu.coupled.stepper import CoupledComponentConfig
        from ace_tpu.stepper.checkpoint import (
            build_stepper_from_state,
            load_msgpack,
        )

        ckpt = self.checkpoint
        if ckpt is None:
            ckpt = ComponentCheckpointsConfig(
                atmosphere=os.path.join(
                    self.checkpoint_path, "atmosphere_ckpt.msgpack"
                ),
                ocean=os.path.join(
                    self.checkpoint_path, "ocean_ckpt.msgpack"
                ),
            )
        atmos, atmos_cfg = build_stepper_from_state(
            load_msgpack(ckpt.atmosphere)["stepper"]
        )
        ocean, ocean_cfg = build_stepper_from_state(
            load_msgpack(ckpt.ocean)["stepper"]
        )
        coupled_config = CoupledStepperConfig(
            atmosphere=CoupledComponentConfig(stepper=atmos_cfg),
            ocean=CoupledComponentConfig(stepper=ocean_cfg),
            sst_name=self.sst_name,
        )
        return CoupledStepper(coupled_config, ocean=ocean, atmosphere=atmos)


class _PairedStats:
    """Streaming per-variable paired RMSE/bias over a rollout.

    One jitted program per record call, drained in one parallel D2H at
    get_logs (see aggregator/inference.py docstring for why record must
    not block or run eager ops)."""

    def __init__(self, area_weights):
        self._weights = area_weights
        self._sq: dict[str, float] = {}
        self._bias: dict[str, float] = {}
        self._n: dict[str, int] = {}
        self._pending: list = []
        self._compute = None

    def record(self, gen: TensorDict, target: TensorDict):
        import jax

        if self._compute is None:
            def compute(gen, target):
                out = {}
                for name, g in gen.items():
                    if name not in target:
                        continue
                    t = jnp.asarray(target[name])
                    out[name] = (
                        root_mean_squared_error(t, g, self._weights) ** 2,
                        weighted_mean_bias(t, g, self._weights),
                    )
                return out

            self._compute = jax.jit(compute)
        self._pending.append(self._compute(dict(gen), dict(target)))
        for name in gen:
            if name in target:
                self._n[name] = self._n.get(name, 0) + 1

    def get_logs(self, label: str) -> dict[str, float]:
        if self._pending:
            import jax

            for window in jax.device_get(self._pending):
                for name, (sq, bias) in window.items():
                    self._sq[name] = self._sq.get(name, 0.0) + float(sq)
                    self._bias[name] = (
                        self._bias.get(name, 0.0) + float(bias)
                    )
            self._pending = []
        logs = {}
        for name, n in self._n.items():
            logs[f"{label}/rmse/{name}"] = float(
                np.sqrt(self._sq[name] / n)
            )
            logs[f"{label}/bias/{name}"] = self._bias[name] / n
        return logs


def run_coupled_inference(config: CoupledInferenceConfig) -> dict[str, float]:
    coupled = config.load_coupled_stepper()
    n_inner = coupled.n_inner_steps
    atmos_ds = config.initial_condition.build_atmosphere()
    ocean_ds = config.initial_condition.build_ocean()

    atmos_names = sorted(
        set(coupled.atmosphere.step.input_names)
        | set(coupled.atmosphere.step.output_names)
    )
    # exclude coupling-supplied fields from the dataset reads
    atmos_read = sorted(
        (set(atmos_names) & set(atmos_ds.names))
        | (set(coupled.atmosphere_forcing_window_names) & set(atmos_ds.names))
    )
    ocean_read = sorted(
        (
            set(coupled.ocean.step.input_names)
            | set(coupled.ocean.step.output_names)
        )
        & set(ocean_ds.names)
    )

    starts = config.initial_condition.resolve_starts(ocean_ds.all_time)
    w = config.coupled_steps_in_memory
    n_windows = config.n_coupled_steps // w

    # initial conditions (batch over ICs)
    atmos_ic_windows = [atmos_ds.get_window(s * n_inner, 1, atmos_read)
                        for s in starts]
    ocean_ic_windows = [ocean_ds.get_window(s, 1, ocean_read)
                        for s in starts]

    def _stack(windows, names):
        return {
            k: jnp.asarray(np.stack([wd[0][k] for wd in windows]))
            for k in names
        }

    atmos_prog = coupled.atmosphere.prognostic_names
    ocean_prog = coupled.ocean.prognostic_names
    state = CoupledPrognosticState(
        atmosphere_data=PrognosticState(
            data=_stack(atmos_ic_windows,
                        [n for n in atmos_prog if n in atmos_read])
        ),
        ocean_data=PrognosticState(
            data=_stack(ocean_ic_windows,
                        [n for n in ocean_prog if n in ocean_read])
        ),
    )

    writers: dict[str, H5DataWriter] = {}
    dw = config.data_writer
    write_atmos = (
        dw.atmosphere.save_prediction_files if dw is not None
        else config.save_prediction_files
    )
    write_ocean = (
        dw.ocean.save_prediction_files if dw is not None
        else config.save_prediction_files
    )
    if write_atmos or write_ocean:
        os.makedirs(config.experiment_dir, exist_ok=True)
    if write_atmos:
        writers["atmosphere"] = H5DataWriter(
            os.path.join(
                config.experiment_dir, "autoregressive_predictions.nc"
            ),
            atmos_ds.dataset_info,
        )
    if write_ocean:
        writers["ocean"] = H5DataWriter(
            os.path.join(
                config.experiment_dir, "autoregressive_predictions_ocean.nc"
            ),
            ocean_ds.dataset_info,
        )

    stats_a = _PairedStats(
        jnp.asarray(
            atmos_ds.dataset_info.horizontal_coordinates.area_weights
        )
    )
    stats_o = _PairedStats(
        jnp.asarray(
            ocean_ds.dataset_info.horizontal_coordinates.area_weights
        )
    )
    agg_a = agg_o = None
    if config.evaluate:
        agg_a = config.aggregator.build(
            atmos_ds.dataset_info,
            n_timesteps=config.n_coupled_steps * n_inner,
        )
        agg_o = config.aggregator.build(
            ocean_ds.dataset_info, n_timesteps=config.n_coupled_steps
        )

    rng = jax.random.PRNGKey(0)
    for i_win in range(n_windows):
        o_start = i_win * w
        a_start = o_start * n_inner
        atmos_f_windows = [
            atmos_ds.get_window(
                s * n_inner + a_start, w * n_inner + 1, atmos_read
            )
            for s in starts
        ]
        ocean_f_windows = [
            ocean_ds.get_window(s + o_start, w + 1, ocean_read)
            for s in starts
        ]
        atmos_forcing = _stack(atmos_f_windows, atmos_read)
        ocean_forcing = _stack(ocean_f_windows, ocean_read)
        rng, sub = jax.random.split(rng)
        a_out, o_out, state = coupled.predict(
            state, atmos_forcing, ocean_forcing, rng=sub
        )
        atmos_time = TimeCoord(
            np.stack([wd[1].values[1:] for wd in atmos_f_windows]),
            atmos_f_windows[0][1].calendar,
        )
        ocean_time = TimeCoord(
            np.stack([wd[1].values[1:] for wd in ocean_f_windows]),
            ocean_f_windows[0][1].calendar,
        )
        if writers:
            # one parallel D2H for both components (per-variable
            # np.asarray inside the writer would serialize round trips)
            a_host, o_host = jax.device_get((a_out, o_out))
            writers["atmosphere"].append_batch(a_host, atmos_time)
            writers["ocean"].append_batch(o_host, ocean_time)
        if config.evaluate:
            atmos_target = {k: v[:, 1:] for k, v in atmos_forcing.items()}
            ocean_target = {k: v[:, 1:] for k, v in ocean_forcing.items()}
            stats_a.record(a_out, atmos_target)
            stats_o.record(o_out, ocean_target)
            agg_a.record_batch(a_out, atmos_target, time=atmos_time)
            agg_o.record_batch(o_out, ocean_target, time=ocean_time)
        logging.info(
            f"coupled window {i_win + 1}/{n_windows} complete "
            f"({(i_win + 1) * w}/{config.n_coupled_steps} ocean steps)"
        )

    for writer in writers.values():
        writer.flush()
    logs: dict[str, Any] = {}
    if config.evaluate:
        logs.update(stats_a.get_logs("inference/atmosphere"))
        logs.update(stats_o.get_logs("inference/ocean"))
        for comp, agg in (("atmosphere", agg_a), ("ocean", agg_o)):
            logs.update({
                f"{comp}/{k}": v for k, v in agg.get_logs().items()
            })
            agg.flush_diagnostics(os.path.join(
                config.experiment_dir, "diagnostics", comp
            ))
            agg.flush_images(os.path.join(
                config.experiment_dir, "plots", comp
            ))
        DiskMetricLogger(
            os.path.join(config.experiment_dir, "metrics.jsonl")
        ).log(logs)
    return logs


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(CoupledInferenceConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    logging.info("Starting coupled inference")
    return run_coupled_inference(config)


if __name__ == "__main__":
    main()
