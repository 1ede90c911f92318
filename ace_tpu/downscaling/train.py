"""Downscaling training entry (reference: fme/downscaling/train.py:85
Trainer, TrainerConfig :391).

Trains the EDM diffusion model on paired (coarse, fine) snapshots. The
loss step is one jitted XLA program; optional coarse-patch training
iterates random patches of the coarse grid each batch.
"""

import dataclasses
import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict, to_dict
from ace_tpu.core.optimization import EMAConfig, OptimizationConfig
from ace_tpu.core.wandb import DiskMetricLogger
from ace_tpu.core.coordinates import LatLonCoordinates
from ace_tpu.data.dataset import XarrayDataConfig
from ace_tpu.downscaling.models import (
    DeterministicModelConfig,
    DiffusionModel,
    DiffusionModelConfig,
)
from ace_tpu.stepper.checkpoint import load_msgpack, save_msgpack
from ace_tpu.train.trainer import LoggingConfig


@dataclasses.dataclass
class ClosedInterval:
    """[start, stop] coordinate interval (reference:
    fme/downscaling/data/config.py lat_extent/lon_extent)."""

    start: float | None = None
    stop: float | None = None

    def index_range(self, coords: np.ndarray) -> tuple[int, int]:
        sel = np.ones(len(coords), bool)
        if self.start is not None:
            sel &= coords >= self.start
        if self.stop is not None:
            sel &= coords <= self.stop
        idx = np.nonzero(sel)[0]
        if len(idx) == 0:
            raise ValueError(
                f"extent [{self.start}, {self.stop}] selects no points"
            )
        return int(idx[0]), int(idx[-1]) + 1


class _CroppedDataset:
    """Lat/lon index-cropped view of a dataset: get_window outputs and
    the horizontal coordinates are subset to the region (reference:
    fme/downscaling/data applies lat/lon extents when batching)."""

    def __init__(self, ds, lat_range, lon_range):
        self._ds = ds
        self._lat = slice(*lat_range)
        self._lon = slice(*lon_range)

    def __getattr__(self, name):
        return getattr(self._ds, name)

    @property
    def dataset_info(self):
        info = self._ds.dataset_info
        hc = info.horizontal_coordinates
        cropped = LatLonCoordinates(
            lat=np.asarray(hc.lat)[self._lat],
            lon=np.asarray(hc.lon)[self._lon],
        )
        return dataclasses.replace(info, horizontal_coordinates=cropped)

    def get_window(self, start, n, names):
        data, time = self._ds.get_window(start, n, names)
        return (
            {k: v[..., self._lat, self._lon] for k, v in data.items()},
            time,
        )


@dataclasses.dataclass
class PairedDataConfig:
    """Time-aligned coarse/fine datasets with optional multi-source
    pooling and region extents (reference:
    fme/downscaling/data/config.py:390 PairedDataLoaderConfig — fine/
    coarse source lists, lat_extent/lon_extent, strict_ensemble).
    """

    coarse: XarrayDataConfig | list[XarrayDataConfig]
    fine: XarrayDataConfig | list[XarrayDataConfig]
    batch_size: int = 1
    num_data_workers: int = 2
    # region selection in coarse-grid coordinates; the fine crop is the
    # same index range scaled by the model's downscale factor so the
    # grids stay aligned
    lat_extent: ClosedInterval | None = None
    lon_extent: ClosedInterval | None = None
    # multi-source lists must pair up member-for-member with matching
    # time axes (reference: config.py strict_ensemble)
    strict_ensemble: bool = True
    # draw this many snapshots per epoch with replacement instead of one
    # pass over the time axis (reference: config.py
    # sample_with_replacement)
    sample_with_replacement: int | None = None

    def _build_one(self, cfg_or_list):
        from ace_tpu.data.dataset import ConcatXarrayDataset

        if isinstance(cfg_or_list, list):
            members = [c.build() for c in cfg_or_list]
            if len(members) == 1:
                return members[0]
            # ensemble-of-sources pooled along the sample axis (time
            # windows are drawn per source; pooling is equivalent for
            # snapshot sampling)
            return ConcatXarrayDataset(members, strict=True)
        return cfg_or_list.build()

    def build_pair(self, downscale_factor: int):
        """Build (coarse_ds, fine_ds) with extents applied."""
        if self.strict_ensemble and isinstance(self.coarse, list) and (
            isinstance(self.fine, list)
        ):
            if len(self.coarse) != len(self.fine):
                raise ValueError(
                    "strict_ensemble: coarse and fine source lists must "
                    f"pair up ({len(self.coarse)} vs {len(self.fine)})"
                )
        coarse_ds = self._build_one(self.coarse)
        fine_ds = self._build_one(self.fine)
        if self.lat_extent is None and self.lon_extent is None:
            return coarse_ds, fine_ds
        hc = coarse_ds.dataset_info.horizontal_coordinates
        lat_r = (
            self.lat_extent.index_range(np.asarray(hc.lat))
            if self.lat_extent is not None
            else (0, len(np.asarray(hc.lat)))
        )
        lon_r = (
            self.lon_extent.index_range(np.asarray(hc.lon))
            if self.lon_extent is not None
            else (0, len(np.asarray(hc.lon)))
        )
        f = downscale_factor
        fine_lat = (lat_r[0] * f, lat_r[1] * f)
        fine_lon = (lon_r[0] * f, lon_r[1] * f)
        return (
            _CroppedDataset(coarse_ds, lat_r, lon_r),
            _CroppedDataset(fine_ds, fine_lat, fine_lon),
        )


@dataclasses.dataclass
class RegionSamplingConfig:
    """Oversample training patches whose center falls in a lat/lon region
    (reference: fme/downscaling/data/datasets.py:657
    RegionSamplingConfig): in-region patch origins carry relative weight
    ``weight``, others weight 1; total patches per batch unchanged.
    """

    lat_interval: list[float] | None = None
    lon_interval: list[float] | None = None
    weight: float = 1.0

    def __post_init__(self):
        if self.weight <= 0:
            raise ValueError("region sampling weight must be > 0")

    def origin_weights(self, lat: np.ndarray, lon: np.ndarray,
                       patch_shape: tuple[int, int]) -> np.ndarray:
        """Weight per valid (y0, x0) patch origin based on the patch
        CENTER's coordinates."""
        ph, pw = patch_shape
        n_y = len(lat) - ph + 1
        n_x = len(lon) - pw + 1
        center_lat = lat[np.arange(n_y) + ph // 2]
        center_lon = lon[np.arange(n_x) + pw // 2]
        in_lat = np.ones(n_y, bool)
        in_lon = np.ones(n_x, bool)
        if self.lat_interval is not None:
            lo, hi = self.lat_interval
            in_lat = (center_lat >= lo) & (center_lat <= hi)
        if self.lon_interval is not None:
            lo, hi = self.lon_interval
            in_lon = (center_lon >= lo) & (center_lon <= hi)
        weights = np.where(
            in_lat[:, None] & in_lon[None, :], self.weight, 1.0
        )
        return weights / weights.sum()


@dataclasses.dataclass
class DownscalingTrainConfig:
    """(reference: fme/downscaling/train.py:391 TrainerConfig)."""

    experiment_dir: str
    max_epochs: int
    model: DeterministicModelConfig | DiffusionModelConfig
    train_data: PairedDataConfig
    validation_data: PairedDataConfig | None = None
    optimization: OptimizationConfig = dataclasses.field(
        default_factory=OptimizationConfig
    )
    ema: EMAConfig = dataclasses.field(default_factory=EMAConfig)
    validate_using_ema: bool = False
    # validate every N epochs (reference: train.py:427 validate_interval)
    validate_interval: int = 1
    # ensemble size for validation-time sample generation metrics
    # (reference: train.py:425 generate_n_samples via :279)
    generate_n_samples: int = 1
    save_checkpoints: bool = True
    segment_epochs: int | None = None
    coarse_patch_extent_lat: int | None = None
    coarse_patch_extent_lon: int | None = None
    region_sampling: RegionSamplingConfig | None = None
    # fine-grid static conditioning fields: {field_name: file_path},
    # normalized at load (reference: fme/downscaling/train.py:422
    # static_inputs + data/static.py load_static_inputs)
    static_inputs: dict[str, str] = dataclasses.field(default_factory=dict)
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    seed: int = 0

    def __post_init__(self):
        if (self.coarse_patch_extent_lat is None) != (
            self.coarse_patch_extent_lon is None
        ):
            raise ValueError(
                "set both or neither of coarse_patch_extent_lat/lon"
            )
        if (
            self.region_sampling is not None
            and self.coarse_patch_extent_lat is None
        ):
            raise ValueError(
                "region_sampling requires coarse_patch_extent_lat/lon"
            )

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.experiment_dir, "checkpoints")


def load_static_inputs(static_inputs_config: dict[str, str]) -> np.ndarray:
    """Load and standard-score-normalize fine-grid static fields into one
    [H, W, n_fields] array (reference: fme/downscaling/data/static.py:245
    load_static_inputs; normalization at :105)."""
    from ace_tpu.data.store import open_file_dataset

    if not static_inputs_config:
        raise ValueError("load_static_inputs requires at least one field.")
    fields = []
    shape = None
    for field_name, path in static_inputs_config.items():
        ds = open_file_dataset(path)
        arr = np.asarray(ds[field_name].read(()), dtype=np.float64)
        if arr.ndim == 3:  # squeeze a time dimension by its first step
            arr = arr[0]
        if arr.ndim != 2:
            raise ValueError(
                f"unexpected shape {arr.shape} for static input "
                f"{field_name!r}; only 2-D lat/lon fields are supported"
            )
        if shape is None:
            shape = arr.shape
        elif arr.shape != shape:
            raise ValueError(
                f"static input {field_name!r} shape {arr.shape} does not "
                f"match {shape}"
            )
        fields.append(((arr - arr.mean()) / arr.std()).astype(np.float32))
    return np.stack(fields, axis=-1)


def save_downscaling_checkpoint(path: str, model: DiffusionModel,
                                params: Any):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    import json

    payload = {
        "config": json.dumps(to_dict(model.config)),
        "model_type": type(model.config).__name__,
        "dataset_info": json.dumps(model.dataset_info.get_state()),
        "params": jax.tree_util.tree_map(np.asarray, params),
    }
    static = getattr(model, "static_inputs", None)
    if static is not None:
        # bundle the normalized static fields so predict/evaluate reload
        # them without the original files (reference: models.py get_state
        # stores static_inputs)
        payload["static_inputs"] = np.asarray(static)
    save_msgpack(path, payload)


def load_downscaling_model(path: str):
    import json

    from ace_tpu.core.dataset_info import DatasetInfo
    from flax import serialization

    payload = load_msgpack(path)
    cls = (
        DeterministicModelConfig
        if payload.get("model_type") == "DeterministicModelConfig"
        else DiffusionModelConfig
    )
    config = from_dict(cls, json.loads(payload["config"]))
    dataset_info = DatasetInfo.from_state(
        json.loads(payload["dataset_info"])
    )
    if payload.get("static_inputs") is not None and cls is DiffusionModelConfig:
        model = config.build(
            dataset_info, static_inputs=np.asarray(payload["static_inputs"])
        )
    else:
        model = config.build(dataset_info)
    # abstract init: the template only supplies pytree structure, so skip
    # the real (device-executing) parameter initialization
    template = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    model.params = serialization.from_state_dict(
        template, payload["params"]
    )
    return model


class DownscalingTrainer:
    def __init__(self, config: DownscalingTrainConfig):
        self.config = config
        self._val_datasets = None
        self.coarse_ds, self.fine_ds = config.train_data.build_pair(
            config.model.downscale_factor
        )
        coarse_shape = self.coarse_ds.dataset_info.img_shape
        fine_shape = self.fine_ds.dataset_info.img_shape
        factor = config.model.downscale_factor
        if (coarse_shape[0] * factor, coarse_shape[1] * factor) != tuple(
            fine_shape
        ):
            raise ValueError(
                f"fine shape {fine_shape} is not coarse {coarse_shape} x "
                f"downscale_factor {factor}"
            )
        if config.coarse_patch_extent_lat is not None:
            self.patch_shape: tuple[int, int] | None = (
                config.coarse_patch_extent_lat,
                config.coarse_patch_extent_lon,
            )
            model_coarse_shape = self.patch_shape
        else:
            self.patch_shape = None
            model_coarse_shape = coarse_shape
        self._static_full = (
            load_static_inputs(config.static_inputs)
            if config.static_inputs else None
        )
        if self._static_full is not None and (
            tuple(self._static_full.shape[:2]) != tuple(fine_shape)
        ):
            raise ValueError(
                f"static input shape {self._static_full.shape[:2]} does "
                f"not match the fine grid {tuple(fine_shape)}"
            )
        if isinstance(config.model, DiffusionModelConfig):
            self.model = config.model.build(
                self.coarse_ds.dataset_info,
                static_inputs=self._static_full,
            )
        else:
            self.model = config.model.build(self.coarse_ds.dataset_info)
        self.params = self.model.init_params(
            jax.random.PRNGKey(config.seed), img_shape=model_coarse_shape
        )
        self.optimization = config.optimization.build(
            max_epochs=config.max_epochs,
            steps_per_epoch=max(1, self.coarse_ds.n_times
                                // config.train_data.batch_size),
        )
        self.opt_state = self.optimization.init(self.params)
        self.ema = config.ema.build()
        self.ema.init(self.params)
        self._disk_logger = DiskMetricLogger(
            os.path.join(config.experiment_dir, "metrics.jsonl")
        )

        use_static = getattr(
            self.model.config, "use_fine_topography", False
        )

        def loss_fn(params, coarse, fine, rng, static):
            if use_static:
                return self.model.loss_fn(
                    params, coarse, fine, rng, static=static
                )
            return self.model.loss_fn(params, coarse, fine, rng)

        def train_step(params, opt_state, coarse, fine, rng, static):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, coarse, fine, rng, static
            )
            updates, new_opt_state = self.optimization.tx.update(
                grads, opt_state, params
            )
            return (
                optax.apply_updates(params, updates),
                new_opt_state,
                loss,
            )

        self._train_step = jax.jit(train_step)
        self._valid_loss = jax.jit(loss_fn)

    def _batches(self, rng: np.random.RandomState, shuffle: bool):
        n = min(self.coarse_ds.n_times, self.fine_ds.n_times)
        bs = self.config.train_data.batch_size
        swr = self.config.train_data.sample_with_replacement
        if swr:
            order = rng.randint(0, n, size=swr)
            n = swr
        else:
            order = np.arange(n)
            if shuffle:
                rng.shuffle(order)
        names_c = self.model.config.in_names
        names_f = self.model.config.out_names
        for i in range(0, n - bs + 1, bs):
            idx = order[i : i + bs]
            coarse = {
                k: jnp.asarray(np.stack([
                    self.coarse_ds.get_window(int(j), 1, names_c)[0][k][0]
                    for j in idx
                ]))
                for k in names_c
            }
            fine = {
                k: jnp.asarray(np.stack([
                    self.fine_ds.get_window(int(j), 1, names_f)[0][k][0]
                    for j in idx
                ]))
                for k in names_f
            }
            if self.patch_shape is not None:
                ph, pw = self.patch_shape
                f = self.model.config.downscale_factor
                h, w = self.coarse_ds.dataset_info.img_shape
                if self.config.region_sampling is not None:
                    hc = self.coarse_ds.dataset_info.horizontal_coordinates
                    weights = self.config.region_sampling.origin_weights(
                        np.asarray(hc.lat), np.asarray(hc.lon),
                        self.patch_shape,
                    )
                    flat = rng.choice(weights.size, p=weights.ravel())
                    y0, x0 = np.unravel_index(flat, weights.shape)
                    y0, x0 = int(y0), int(x0)
                else:
                    y0 = int(rng.randint(0, h - ph + 1))
                    x0 = int(rng.randint(0, w - pw + 1))
                coarse = {
                    k: v[..., y0 : y0 + ph, x0 : x0 + pw]
                    for k, v in coarse.items()
                }
                fine = {
                    k: v[
                        ...,
                        y0 * f : (y0 + ph) * f,
                        x0 * f : (x0 + pw) * f,
                    ]
                    for k, v in fine.items()
                }
                static = (
                    self._static_full[
                        y0 * f : (y0 + ph) * f, x0 * f : (x0 + pw) * f
                    ]
                    if self._static_full is not None else None
                )
            else:
                static = self._static_full
            yield coarse, fine, static

    def train(self):
        config = self.config
        rng = jax.random.PRNGKey(config.seed + 1)
        np_rng = np.random.RandomState(config.seed)
        if config.segment_epochs is None:
            end_epoch = config.max_epochs
        else:
            end_epoch = min(config.segment_epochs, config.max_epochs)
        last = {}
        for epoch in range(end_epoch):
            losses = []
            for coarse, fine, static in self._batches(np_rng, shuffle=True):
                rng, sub = jax.random.split(rng)
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, coarse, fine, sub, static
                )
                self.ema(self.params)
                losses.append(float(loss))
            last = {"epoch": epoch, "train_loss": float(np.mean(losses))}
            if (
                config.validation_data is not None
                and epoch % max(config.validate_interval, 1) == 0
            ):
                val = self._validate(rng)
                last["val_loss"] = val
            logging.info(f"downscaling epoch {epoch}: {last}")
            self._disk_logger.log(last)
            if config.save_checkpoints:
                save_downscaling_checkpoint(
                    os.path.join(config.checkpoint_dir, "ckpt.msgpack"),
                    self.model, self.params,
                )
                ema_params = self.ema.ema_params
                if ema_params is not None:
                    save_downscaling_checkpoint(
                        os.path.join(
                            config.checkpoint_dir, "ema_ckpt.msgpack"
                        ),
                        self.model, ema_params,
                    )
        self.model.params = self.params
        return self

    def _validate(self, rng) -> float:
        assert self.config.validation_data is not None
        # built once and cached: rebuilding re-opens the stores per epoch
        if self._val_datasets is None:
            self._val_datasets = (
                *self.config.validation_data.build_pair(
                    self.config.model.downscale_factor
                ),
            )
        val_coarse, val_fine = self._val_datasets
        names_c = self.model.config.in_names
        names_f = self.model.config.out_names
        params = (
            self.ema.ema_params
            if self.config.validate_using_ema and self.ema.ema_params
            is not None
            else self.params
        )
        losses = []
        n = min(val_coarse.n_times, val_fine.n_times)
        for j in range(n):
            coarse = {
                k: jnp.asarray(
                    val_coarse.get_window(j, 1, names_c)[0][k]
                )
                for k in names_c
            }
            fine = {
                k: jnp.asarray(val_fine.get_window(j, 1, names_f)[0][k])
                for k in names_f
            }
            static = self._static_full
            if self.patch_shape is not None:
                ph, pw = self.patch_shape
                f = self.model.config.downscale_factor
                coarse = {
                    k: v[..., :ph, :pw] for k, v in coarse.items()
                }
                fine = {
                    k: v[..., : ph * f, : pw * f]
                    for k, v in fine.items()
                }
                if static is not None:
                    static = static[: ph * f, : pw * f]
            rng, sub = jax.random.split(rng)
            losses.append(float(
                self._valid_loss(params, coarse, fine, sub, static)
            ))
        return float(np.mean(losses))


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(DownscalingTrainConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    logging.info("Starting downscaling training")
    return DownscalingTrainer(config).train()
