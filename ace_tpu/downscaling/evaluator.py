"""Downscaling evaluator entry
(reference: fme/downscaling/evaluator.py:34 Evaluator,
EvaluatorConfig :172).

Generates ensemble samples conditioned on held-out coarse snapshots
(patched over large domains) and scores them against the paired fine
truth: area-weighted ensemble-mean RMSE, bias, almost-fair CRPS, and
spread-skill ratio per variable.
"""

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.wandb import DiskMetricLogger
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.downscaling.models import (
    CheckpointModelConfig,
    DenoisingMoEBundledConfig,
    DenoisingMoEConfig,
)
from ace_tpu.downscaling.train import ClosedInterval, PairedDataConfig
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class EventConfig:
    """A named case-study snapshot evaluated over a region (reference:
    fme/downscaling/predict.py:39 EventConfig + evaluator.py:143
    PairedEventConfig): the snapshot at ``date`` is cropped to the
    lat/lon extents and scored with its own ensemble size, logged under
    the event name.
    """

    name: str
    date: str
    lat_extent: ClosedInterval | None = None
    lon_extent: ClosedInterval | None = None
    n_samples: int = 16
    date_format: str = "%Y-%m-%dT%H:%M"
    save_generated_samples: bool = False


@dataclasses.dataclass
class DownscalingEvaluatorConfig:
    """(reference: fme/downscaling/evaluator.py:172)."""

    experiment_dir: str
    # either a paired-data block (reference: evaluator.py:175 data) or
    # the explicit coarse_data/fine_data pair
    coarse_data: XarrayDataConfig | None = None
    fine_data: XarrayDataConfig | None = None
    data: PairedDataConfig | None = None
    events: list[EventConfig] | None = None
    checkpoint_path: str | None = None
    # mixture of denoising experts (reference: evaluator.py:173 model
    # union with DenoisingMoEConfig | DenoisingMoEBundledConfig)
    model: (
        DenoisingMoEConfig | DenoisingMoEBundledConfig
        | CheckpointModelConfig | None
    ) = None
    n_samples: int = 4
    n_timesteps: int = 4
    start_index: int = 0
    coarse_patch_extent_lat: int | None = None
    coarse_patch_extent_lon: int | None = None
    coarse_horizontal_overlap: int = 1
    seed: int = 0
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)

    def __post_init__(self):
        if (self.coarse_patch_extent_lat is None) != (
            self.coarse_patch_extent_lon is None
        ):
            raise ValueError(
                "set both or neither of coarse_patch_extent_lat/lon"
            )
        if (self.checkpoint_path is None) == (self.model is None):
            raise ValueError(
                "exactly one of checkpoint_path or model must be set"
            )
        has_pair = (
            self.coarse_data is not None and self.fine_data is not None
        )
        if has_pair == (self.data is not None):
            raise ValueError(
                "set either data (paired block) or both "
                "coarse_data and fine_data"
            )

    def build_datasets(self, downscale_factor: int):
        if self.data is not None:
            return self.data.build_pair(downscale_factor)
        return self.coarse_data.build(), self.fine_data.build()


def _evaluate_event(config, event, model, coarse_ds, fine_ds, generate,
                    in_names, out_names) -> dict[str, float]:
    """Score one event snapshot over its region (reference:
    fme/downscaling/evaluator.py EventEvaluator — first snapshot at the
    event date, event-sized ensemble, metrics logged under the name)."""
    from datetime import datetime

    from ace_tpu.aggregator.one_step import EnsembleOneStepAggregator
    from ace_tpu.data.time import parse_datetime_string

    time = coarse_ds.all_time
    stamp = datetime.strptime(event.date, event.date_format).isoformat()
    micros = parse_datetime_string(stamp, time.calendar)
    pos = int(np.searchsorted(time.values, micros))
    if pos >= len(time.values) or time.values[pos] != micros:
        raise ValueError(
            f"event {event.name!r} date {event.date} not in the dataset"
        )
    coarse_window, _ = coarse_ds.get_window(pos, 1, in_names)
    fine_window, _ = fine_ds.get_window(pos, 1, out_names)
    # crop to the event region (indices from the coarse grid, scaled to
    # the fine grid by the model factor)
    hc = coarse_ds.dataset_info.horizontal_coordinates
    f = model.config.downscale_factor
    lat_r = (
        event.lat_extent.index_range(np.asarray(hc.lat))
        if event.lat_extent is not None else (0, len(np.asarray(hc.lat)))
    )
    lon_r = (
        event.lon_extent.index_range(np.asarray(hc.lon))
        if event.lon_extent is not None else (0, len(np.asarray(hc.lon)))
    )
    coarse = {
        k: jnp.asarray(v[..., lat_r[0]:lat_r[1], lon_r[0]:lon_r[1]])
        for k, v in coarse_window.items()
    }
    fine = {
        k: jnp.asarray(
            v[..., lat_r[0] * f:lat_r[1] * f, lon_r[0] * f:lon_r[1] * f]
        )
        for k, v in fine_window.items()
    }
    rng = jax.random.PRNGKey(config.seed + pos)
    gen = generate(
        coarse, rng, params=model.params, n_samples=event.n_samples
    )
    from ace_tpu.core.gridded_ops import LatLonOperations
    from ace_tpu.core.metrics import spherical_area_weights

    # metrics run on the FINE grid: weights come from the fine
    # latitudes over the event's (factor-scaled) index range
    fine_lat = np.asarray(
        fine_ds.dataset_info.horizontal_coordinates.lat
    )[lat_r[0] * f:lat_r[1] * f]
    ops = LatLonOperations(spherical_area_weights(
        fine_lat, (lon_r[1] - lon_r[0]) * f
    ))
    agg = EnsembleOneStepAggregator(ops)
    agg.record_batch(gen, fine)
    if event.save_generated_samples:
        from ace_tpu.data.store import write_h5

        write_h5(
            os.path.join(
                config.experiment_dir, f"event_{event.name}_samples.nc"
            ),
            {k: np.asarray(v) for k, v in gen.items()},
            dims={
                k: tuple(f"dim{i}" for i in range(np.ndim(v)))
                for k, v in gen.items()
            },
        )
    logging.info(f"evaluated event {event.name!r} at {event.date}")
    return agg.get_logs(f"event/{event.name}")


def run_downscaling_evaluator(
    config: DownscalingEvaluatorConfig,
) -> dict[str, float]:
    from ace_tpu.aggregator.one_step import EnsembleOneStepAggregator
    from ace_tpu.downscaling.models import PatchPredictor
    from ace_tpu.downscaling.predict import load_downscaling_predictor

    model = load_downscaling_predictor(
        config.checkpoint_path, config.model
    )
    coarse_ds, fine_ds = config.build_datasets(
        model.config.downscale_factor
    )
    in_names = model.config.in_names
    out_names = model.config.out_names

    if config.coarse_patch_extent_lat is not None:
        predictor = PatchPredictor(
            model,
            coarse_patch_shape=(
                config.coarse_patch_extent_lat,
                config.coarse_patch_extent_lon,
            ),
            coarse_horizontal_overlap=config.coarse_horizontal_overlap,
        )
        generate = predictor.generate
    else:
        generate = model.generate

    agg = EnsembleOneStepAggregator(
        fine_ds.dataset_info.gridded_operations
    )
    from ace_tpu.downscaling.metrics import GenerationMetricsAggregator

    gen_agg = GenerationMetricsAggregator(model.config.downscale_factor)
    rng = jax.random.PRNGKey(config.seed)
    for t in range(config.start_index,
                   config.start_index + config.n_timesteps):
        coarse_window, _ = coarse_ds.get_window(t, 1, in_names)
        fine_window, _ = fine_ds.get_window(t, 1, out_names)
        coarse = {k: jnp.asarray(v) for k, v in coarse_window.items()}
        rng, sub = jax.random.split(rng)
        gen = generate(
            coarse, sub, params=model.params,
            n_samples=config.n_samples,
        )  # [1, S, H_f, W_f] per variable
        fine = {k: jnp.asarray(v) for k, v in fine_window.items()}
        agg.record_batch(gen, fine)
        gen_agg.record_batch(fine, gen, coarse)
        logging.info(f"evaluated downscaling timestep {t}")

    logs = agg.get_logs("downscaling")
    logs.update(gen_agg.get_logs("downscaling"))
    # event case studies: one named snapshot each, cropped to the event
    # region, scored with its own ensemble size (reference:
    # evaluator.py:261-267 builds an EventEvaluator per entry)
    for event in config.events or []:
        logs.update(_evaluate_event(
            config, event, model, coarse_ds, fine_ds, generate,
            in_names, out_names,
        ))
    os.makedirs(config.experiment_dir, exist_ok=True)
    DiskMetricLogger(
        os.path.join(config.experiment_dir, "metrics.jsonl")
    ).log(logs)
    diagnostics = gen_agg.get_diagnostics()
    if diagnostics:
        from ace_tpu.data.store import write_h5

        write_h5(
            os.path.join(
                config.experiment_dir, "generation_diagnostics.nc"
            ),
            diagnostics,
            dims={
                k: tuple(f"dim{i}" for i in range(np.ndim(v)))
                for k, v in diagnostics.items()
            },
        )
    return logs


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(DownscalingEvaluatorConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    return run_downscaling_evaluator(config)


if __name__ == "__main__":
    main()
