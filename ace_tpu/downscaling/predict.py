"""Downscaling generation entry (reference: fme/downscaling/predict.py:173
Downscaler, DownscalerConfig :249).

Loads a trained diffusion checkpoint, generates fine-resolution samples
conditioned on coarse snapshots over a time range (optionally patched
over large domains), and writes them to a netCDF file.
"""

import dataclasses
import logging


class StreamingMoments:
    """Welford streaming mean/std over ensemble members delivered in
    groups (the count advances per member)."""

    def __init__(self):
        self.count = 0
        self._mean = None
        self._m2 = None

    def update(self, members):
        import numpy as np

        if self._mean is None:
            self._mean = np.zeros(members.shape[1:], np.float64)
            self._m2 = np.zeros(members.shape[1:], np.float64)
        for member in members:
            self.count += 1
            delta = member - self._mean
            self._mean += delta / self.count
            self._m2 += delta * (member - self._mean)

    @property
    def mean(self):
        return self._mean

    @property
    def std(self):
        import numpy as np

        return np.sqrt(self._m2 / max(self.count - 1, 1))
import os

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.typing_ import Slice
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.data.store import write_h5
from ace_tpu.data.time import RepeatedInterval, TimeSlice
from ace_tpu.downscaling.models import (
    DenoisingMoEBundledConfig,
    DenoisingMoEConfig,
)
from ace_tpu.train.trainer import LoggingConfig


def _region_indices(lat, lon, lat_extent, lon_extent, label=""):
    """Resolve lat/lon extents to index selections: returns
    (y0, y1, xs, contiguous). Longitude extents may wrap the prime
    meridian (e.g. [350, 10])."""
    lat = np.asarray(lat)
    lon = np.asarray(lon)
    lat_sel = np.ones(len(lat), bool)
    lon_sel = np.ones(len(lon), bool)
    if lat_extent is not None:
        lat_sel = (lat >= lat_extent[0]) & (lat <= lat_extent[1])
    if lon_extent is not None:
        lo = lon_extent[0] % 360.0
        hi = lon_extent[1] % 360.0
        lon_n = lon % 360.0
        if lo <= hi:
            lon_sel = (lon_n >= lo) & (lon_n <= hi)
        else:  # wraps the prime meridian
            lon_sel = (lon_n >= lo) | (lon_n <= hi)
    if not lat_sel.any() or not lon_sel.any():
        raise ValueError(
            f"{label}: lat/lon extent selects no grid points "
            f"(lat_extent={lat_extent}, lon_extent={lon_extent})"
        )
    y0, y1 = np.nonzero(lat_sel)[0][[0, -1]]
    xs = np.nonzero(lon_sel)[0]
    contiguous = len(xs) == xs[-1] - xs[0] + 1
    return int(y0), int(y1), xs, contiguous


def _crop_window(window, y0, y1, xs, contiguous):
    import jax.numpy as jnp

    if contiguous:
        return {
            k: jnp.asarray(v[..., y0 : y1 + 1, xs[0] : xs[-1] + 1])
            for k, v in window.items()
        }
    return {
        k: jnp.asarray(np.take(v[..., y0 : y1 + 1, :], xs, axis=-1))
        for k, v in window.items()
    }


def _crop_static(model, y0, y1, xs, contiguous):
    """Fine-grid static fields cropped to the same coarse region."""
    full_static = getattr(model, "static_inputs", None)
    if not getattr(model.config, "use_fine_topography", False) or (
        full_static is None
    ):
        return None
    f = model.config.downscale_factor
    rows = np.asarray(full_static)[y0 * f : (y1 + 1) * f]
    if contiguous:
        return rows[:, xs[0] * f : (xs[-1] + 1) * f]
    fine_xs = (xs[:, None] * f + np.arange(f)).ravel()
    return np.take(rows, fine_xs, axis=1)


def zarr_output_chunks(shape, max_mb: float = 10.0):
    """Chunk shape for [..., lat, lon] float32 output: leading dims get
    chunk 1; lat/lon halve (larger dim first) until a chunk is <= max_mb
    (reference: fme/downscaling/inference/zarr_utils.py:88
    determine_zarr_chunks)."""
    h, w = int(shape[-2]), int(shape[-1])
    while h * w * 4 > max_mb * 2**20:
        if h >= w:
            h = max(1, -(-h // 2))
        else:
            w = max(1, -(-w // 2))
    return [1] * (len(shape) - 2) + [h, w]


@dataclasses.dataclass
class EventConfig:
    """Large-ensemble downscaling of a single dated snapshot over an
    optional lat/lon crop (reference: fme/downscaling/predict.py:39
    EventConfig, EventDownscaler :89).
    """

    name: str
    date: str  # "%Y-%m-%dT%H:%M"
    lat_extent: list[float] | None = None
    lon_extent: list[float] | None = None
    n_samples: int = 64
    save_generated_samples: bool = False


@dataclasses.dataclass
class TimeRangeOutputConfig:
    """Named time-segment + region output written to zarr
    (reference: fme/downscaling/inference/output.py:411 TimeRangeConfig).

    time_range selects coarse timesteps by timestamps (TimeSlice),
    repeating pattern (RepeatedInterval), or integer indices (Slice).
    Output: ``<experiment_dir>/<name>.zarr`` with dims
    (time, sample, lat, lon), lat/lon chunks auto-sized to <=10 MB.
    """

    name: str
    time_range: "TimeSlice | RepeatedInterval | Slice"
    n_samples: int = 1
    lat_extent: list[float] | None = None
    lon_extent: list[float] | None = None
    save_vars: list[str] | None = None
    # samples generated per sampler call, bounding device memory
    # (reference output.py max_samples_per_gpu)
    max_samples_per_call: int = 8


@dataclasses.dataclass
class DownscalerConfig:
    """(reference: fme/downscaling/predict.py:249 DownscalerConfig).

    Exactly one of ``checkpoint_path`` (single diffusion/deterministic
    model) or ``model`` (mixture-of-denoising-experts, by expert
    checkpoints or a saved bundle) selects the generator.
    """

    experiment_dir: str
    coarse_data: XarrayDataConfig
    checkpoint_path: str | None = None
    model: DenoisingMoEConfig | DenoisingMoEBundledConfig | None = None
    n_samples: int = 1
    start_index: int = 0
    n_timesteps: int = 1
    coarse_patch_extent_lat: int | None = None
    coarse_patch_extent_lon: int | None = None
    coarse_horizontal_overlap: int = 1
    seed: int = 0
    events: list[EventConfig] = dataclasses.field(default_factory=list)
    time_ranges: list[TimeRangeOutputConfig] = dataclasses.field(
        default_factory=list
    )
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


def load_downscaling_predictor(checkpoint_path, model_config):
    """Resolve the checkpoint_path/model union into a generator."""
    from ace_tpu.downscaling.train import load_downscaling_model

    if model_config is not None:
        return model_config.build()
    return load_downscaling_model(checkpoint_path)


def run_downscaler(config: DownscalerConfig) -> str:
    from ace_tpu.downscaling.models import PatchPredictor

    model = load_downscaling_predictor(
        config.checkpoint_path, config.model
    )
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

    for event in config.events:
        run_event(config, model, generate, event)
    for out_cfg in config.time_ranges:
        run_time_range(config, model, generate, out_cfg)

    os.makedirs(config.experiment_dir, exist_ok=True)
    path = os.path.join(config.experiment_dir, "downscaled_predictions.nc")
    arrays = {
        k: np.stack(v, axis=0) for k, v in outputs.items()
    }  # [time, sample, H, W]
    dims = {k: ("time", "sample", "lat", "lon") for k in arrays}
    write_h5(path, arrays, dims)
    logging.info(f"wrote {path}")
    return path


def run_event(config, model, generate, event: EventConfig):
    """(reference: predict.py:89 EventDownscaler.run): generate a large
    ensemble for one dated snapshot in groups, stream mean/variance, and
    optionally keep all samples.
    """
    from ace_tpu.data.time import parse_datetime_string

    ds = config.coarse_data.build()
    target_us = parse_datetime_string(event.date, ds.all_time.calendar)
    t = int(np.argmin(np.abs(
        np.asarray(ds.all_time.values, np.int64) - target_us
    )))
    names = model.config.in_names
    window, _ = ds.get_window(t, 1, names)
    hc = ds.dataset_info.horizontal_coordinates
    y0, y1, xs, contiguous = _region_indices(
        hc.lat, hc.lon, event.lat_extent, event.lon_extent,
        label=f"event {event.name}",
    )
    coarse = _crop_window(window, y0, y1, xs, contiguous)
    # fine-grid static conditioning follows the event crop
    static = _crop_static(model, y0, y1, xs, contiguous)
    import zlib

    # stable across processes (hash() is salted per interpreter)
    rng = jax.random.PRNGKey(
        config.seed + zlib.crc32(event.name.encode()) % 2**16
    )
    group = 8
    count = 0
    moments: dict[str, StreamingMoments] = {}
    samples = []
    while count < event.n_samples:
        n = min(group, event.n_samples - count)
        rng, sub = jax.random.split(rng)
        gen = generate(
            coarse, sub, params=model.params, n_samples=n, static=static
        )
        for k, v in gen.items():
            arr = np.asarray(v[0])  # [n, H, W]
            moments.setdefault(k, StreamingMoments()).update(arr)
        if event.save_generated_samples:
            samples.append(
                {k: np.asarray(v[0]) for k, v in gen.items()}
            )
        count += n
        logging.info(
            f"event {event.name}: {count}/{event.n_samples} samples"
        )
    os.makedirs(config.experiment_dir, exist_ok=True)
    arrays = {}
    dims = {}
    for k, mom in moments.items():
        arrays[f"{k}_mean"] = mom.mean.astype(np.float32)
        arrays[f"{k}_std"] = mom.std.astype(np.float32)
        dims[f"{k}_mean"] = ("lat", "lon")
        dims[f"{k}_std"] = ("lat", "lon")
        if event.save_generated_samples:
            arrays[k] = np.concatenate(
                [s[k] for s in samples], axis=0
            ).astype(np.float32)
            dims[k] = ("sample", "lat", "lon")
    path = os.path.join(
        config.experiment_dir, f"{event.name}_event.nc"
    )
    write_h5(path, arrays, dims)
    logging.info(f"wrote {path}")
    return path


def run_time_range(config, model, generate, out_cfg: TimeRangeOutputConfig):
    """(reference: fme/downscaling/inference/output.py:411
    TimeRangeConfig + inference.py Downscaler.run_output_generation):
    generate an ensemble over a time segment and region, written to
    ``<experiment_dir>/<name>.zarr`` with [time, sample, lat, lon] dims
    and auto-sized lat/lon chunks."""
    import datetime
    import zlib

    from ace_tpu.data.store import write_zarr
    from ace_tpu.data.time import TimeCoord

    ds = config.coarse_data.build()
    tr = out_cfg.time_range
    if isinstance(tr, Slice):
        t_indices = np.arange(ds.n_times)[tr.slice]
    elif isinstance(tr, RepeatedInterval):
        step = ds.all_time.timestep_seconds()
        t_indices = tr.indices(
            ds.all_time,
            datetime.timedelta(seconds=step) if step else None,
        )
    else:
        t_indices = tr.indices(ds.all_time)
    if len(t_indices) == 0:
        raise ValueError(
            f"time range output {out_cfg.name!r} selects no timesteps"
        )
    names = model.config.in_names
    hc = ds.dataset_info.horizontal_coordinates
    y0, y1, xs, contiguous = _region_indices(
        hc.lat, hc.lon, out_cfg.lat_extent, out_cfg.lon_extent,
        label=f"time range {out_cfg.name}",
    )
    static = _crop_static(model, y0, y1, xs, contiguous)
    rng = jax.random.PRNGKey(
        config.seed + zlib.crc32(out_cfg.name.encode()) % 2**16
    )
    save_vars = out_cfg.save_vars or model.config.out_names
    per_time: dict[str, list[np.ndarray]] = {}
    for t in t_indices:
        window, _ = ds.get_window(int(t), 1, names)
        coarse = _crop_window(window, y0, y1, xs, contiguous)
        members: dict[str, list[np.ndarray]] = {}
        count = 0
        while count < out_cfg.n_samples:
            n = min(out_cfg.max_samples_per_call,
                    out_cfg.n_samples - count)
            rng, sub = jax.random.split(rng)
            gen = generate(
                coarse, sub, params=model.params, n_samples=n,
                static=static,
            )
            for k in save_vars:
                members.setdefault(k, []).append(
                    np.asarray(gen[k][0], np.float32)
                )
            count += n
        for k, parts in members.items():
            per_time.setdefault(k, []).append(
                np.concatenate(parts, axis=0)
            )
        logging.info(
            f"time range {out_cfg.name}: timestep {int(t)} done "
            f"({out_cfg.n_samples} samples)"
        )
    arrays = {k: np.stack(v, axis=0) for k, v in per_time.items()}
    dims = {k: ("time", "sample", "lat", "lon") for k in arrays}
    chunks = {
        k: zarr_output_chunks(v.shape) for k, v in arrays.items()
    }
    os.makedirs(config.experiment_dir, exist_ok=True)
    path = os.path.join(config.experiment_dir, f"{out_cfg.name}.zarr")
    sel_times = ds.all_time[np.asarray(t_indices)]
    write_zarr(
        path, arrays, dims,
        coords={"sample": np.arange(out_cfg.n_samples)},
        time=TimeCoord(sel_times.values, sel_times.calendar),
        chunks=chunks,
    )
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
