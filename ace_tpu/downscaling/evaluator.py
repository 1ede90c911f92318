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
    DenoisingMoEBundledConfig,
    DenoisingMoEConfig,
)
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class DownscalingEvaluatorConfig:
    """(reference: fme/downscaling/evaluator.py:172, subset — event
    evaluation lands later)."""

    experiment_dir: str
    coarse_data: XarrayDataConfig
    fine_data: XarrayDataConfig
    checkpoint_path: str | None = None
    # mixture of denoising experts (reference: evaluator.py:173 model
    # union with DenoisingMoEConfig | DenoisingMoEBundledConfig)
    model: DenoisingMoEConfig | DenoisingMoEBundledConfig | None = None
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


def run_downscaling_evaluator(
    config: DownscalingEvaluatorConfig,
) -> dict[str, float]:
    from ace_tpu.aggregator.one_step import EnsembleOneStepAggregator
    from ace_tpu.downscaling.models import PatchPredictor
    from ace_tpu.downscaling.predict import load_downscaling_predictor

    model = load_downscaling_predictor(
        config.checkpoint_path, config.model
    )
    coarse_ds = config.coarse_data.build()
    fine_ds = config.fine_data.build()
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
