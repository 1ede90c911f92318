"""Downscaling generation entry (reference: fme/downscaling/predict.py:173
Downscaler, DownscalerConfig :249).

Loads a trained diffusion checkpoint, generates fine-resolution samples
conditioned on coarse snapshots over a time range (optionally patched
over large domains), and writes them to a netCDF file.
"""

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.data.store import write_h5
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class DownscalerConfig:
    """(reference: fme/downscaling/predict.py:249 DownscalerConfig)."""

    experiment_dir: str
    checkpoint_path: str
    coarse_data: XarrayDataConfig
    n_samples: int = 1
    start_index: int = 0
    n_timesteps: int = 1
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


def run_downscaler(config: DownscalerConfig) -> str:
    from ace_tpu.downscaling.models import PatchPredictor
    from ace_tpu.downscaling.train import load_downscaling_model

    model = load_downscaling_model(config.checkpoint_path)
    ds = config.coarse_data.build()
    names = model.config.in_names
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

    rng = jax.random.PRNGKey(config.seed)
    outputs: dict[str, list[np.ndarray]] = {}
    for t in range(config.start_index,
                   config.start_index + config.n_timesteps):
        window, _ = ds.get_window(t, 1, names)
        coarse = {k: jnp.asarray(v) for k, v in window.items()}
        rng, sub = jax.random.split(rng)
        gen = generate(
            coarse, sub, params=model.params, n_samples=config.n_samples
        )
        for k, v in gen.items():
            outputs.setdefault(k, []).append(np.asarray(v[0]))
        logging.info(f"downscaled timestep {t}")

    os.makedirs(config.experiment_dir, exist_ok=True)
    path = os.path.join(config.experiment_dir, "downscaled_predictions.nc")
    arrays = {
        k: np.stack(v, axis=0) for k, v in outputs.items()
    }  # [time, sample, H, W]
    dims = {k: ("time", "sample", "lat", "lon") for k in arrays}
    write_h5(path, arrays, dims)
    logging.info(f"wrote {path}")
    return path


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(DownscalerConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    return run_downscaler(config)


if __name__ == "__main__":
    main()
