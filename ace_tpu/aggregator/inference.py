"""Streaming inference aggregators (reference: fme/ace/aggregator/inference/
— time-mean maps/RMSE (time_mean.py), zonal means (zonal_mean.py),
spherical power spectra (spectrum.py), global-mean time series, budget
diagnostics).

Aggregators consume paired (prediction, target) batches window by window
and maintain O(1)-memory running reductions on device; `get_logs` returns
scalars, `get_diagnostics` returns named arrays for netCDF output.
"""

import dataclasses
import logging
from typing import Any

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.gridded_ops import GriddedOperations
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.ops.sht import RealSHT


class TimeMeanAggregator:
    """Running time-mean maps of gen and target; final bias/RMSE of the
    time-mean (reference: inference/time_mean.py).
    """

    def __init__(self, ops: GriddedOperations):
        self._ops = ops
        self._gen_sum: TensorDict = {}
        self._target_sum: TensorDict = {}
        self._n = 0

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        n_time = next(iter(gen.values())).shape[1]
        self._n += n_time
        for k, v in gen.items():
            s = jnp.sum(v, axis=1)
            self._gen_sum[k] = self._gen_sum.get(k, 0.0) + s
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    s = jnp.sum(v, axis=1)
                    self._target_sum[k] = self._target_sum.get(k, 0.0) + s

    def get_logs(self, label: str = "time_mean") -> dict[str, float]:
        logs = {}
        for k in self._gen_sum:
            # RMSE between the SAMPLE-MEAN time-mean maps (the reference
            # divides by n_timesteps and n_samples before one RMSE,
            # inference/time_mean.py); a mean of per-sample RMSEs would
            # be systematically larger by Jensen's inequality
            gen_mean = jnp.mean(self._gen_sum[k] / self._n, axis=0)[None]
            if k in self._target_sum:
                target_mean = jnp.mean(
                    self._target_sum[k] / self._n, axis=0
                )[None]
                logs[f"{label}/rmse/{k}"] = float(
                    jnp.mean(self._ops.area_weighted_rmse(
                        target_mean, gen_mean, name=k
                    ))
                )
                logs[f"{label}/bias/{k}"] = float(
                    jnp.mean(self._ops.area_weighted_mean_bias(
                        target_mean, gen_mean, name=k
                    ))
                )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {}
        for k in self._gen_sum:
            out[f"gen_map-{k}"] = np.asarray(
                jnp.mean(self._gen_sum[k] / self._n, axis=0)
            )
            if k in self._target_sum:
                out[f"bias_map-{k}"] = np.asarray(jnp.mean(
                    (self._gen_sum[k] - self._target_sum[k]) / self._n, axis=0
                ))
        return out


class GlobalMeanTimeSeriesAggregator:
    """Area-weighted global-mean time series of every variable
    (reference: inference/main.py scalar time series).
    """

    def __init__(self, ops: GriddedOperations):
        self._ops = ops
        self._gen: dict[str, list[np.ndarray]] = {}
        self._target: dict[str, list[np.ndarray]] = {}

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        for k, v in gen.items():
            val = np.asarray(
                jnp.mean(self._ops.area_weighted_mean(v, name=k), axis=0)
            )
            self._gen.setdefault(k, []).append(val)
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    val = np.asarray(jnp.mean(
                        self._ops.area_weighted_mean(v, name=k), axis=0
                    ))
                    self._target.setdefault(k, []).append(val)

    def get_logs(self, label: str = "mean") -> dict[str, float]:
        logs = {}
        for k, chunks in self._gen.items():
            series = np.concatenate(chunks)
            logs[f"{label}/final/{k}"] = float(series[-1])
            if k in self._target:
                tseries = np.concatenate(self._target[k])
                logs[f"{label}/series_rmse/{k}"] = float(
                    np.sqrt(np.mean((series - tseries) ** 2))
                )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {}
        for k, chunks in self._gen.items():
            out[f"gen_series-{k}"] = np.concatenate(chunks)
        for k, chunks in self._target.items():
            out[f"target_series-{k}"] = np.concatenate(chunks)
        return out


class ZonalMeanAggregator:
    """Zonal-mean (Hovmöller) state as a function of latitude and time,
    batch-averaged, for generated and target data
    (reference: inference/zonal_mean.py ZonalMeanAggregator)."""

    def __init__(self):
        self._gen: dict[str, list[np.ndarray]] = {}
        self._target: dict[str, list[np.ndarray]] = {}
        self._n = 0

    def record_batch(self, gen: TensorMapping, target=None):
        n_time = next(iter(gen.values())).shape[1]
        self._n += n_time
        for k, v in gen.items():
            # mean over lon and batch -> [time, lat]
            zm = np.asarray(jnp.mean(jnp.mean(v, axis=-1), axis=0))
            self._gen.setdefault(k, []).append(zm)
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    zm = np.asarray(
                        jnp.mean(jnp.mean(v, axis=-1), axis=0)
                    )
                    self._target.setdefault(k, []).append(zm)

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {}
        for k, chunks in self._gen.items():
            hov = np.concatenate(chunks, axis=0)  # [time, lat]
            # lat on y, time on x, as the reference's images
            out[f"gen_hovmoller-{k}"] = hov.T
            out[f"zonal_mean-{k}"] = hov.mean(axis=0)
            if k in self._target:
                thov = np.concatenate(self._target[k], axis=0)
                out[f"error_hovmoller-{k}"] = (hov - thov).T
        return out


class SpectrumAggregator:
    """Mean spherical power spectrum over time
    (reference: inference/spectrum.py:22 PairedSphericalPowerSpectrum).
    """

    def __init__(self, nlat: int, nlon: int, grid: str = "legendre-gauss"):
        from ace_tpu.core.fill import SmoothFloodFill

        self._sht = RealSHT(nlat, nlon, grid=grid)
        self._gen_sum: TensorDict = {}
        self._target_sum: TensorDict = {}
        self._n = 0
        # fill masked (e.g. land) regions before the SHT so mask edges do
        # not alias into the spectrum (reference: inference/main.py:848
        # nan_fill_fn=SmoothFloodFill(num_steps=4))
        self._nan_fill = SmoothFloodFill(num_steps=4)

    @classmethod
    def for_dataset_info(cls, dataset_info) -> "SpectrumAggregator":
        """Grid-appropriate spectrum aggregator: lat-lon SHT, or the
        HEALPix SHT via gridded operations (reference:
        fme/core/gridded_ops.py:518 get_real_sht)."""
        img = dataset_info.img_shape
        if len(img) == 2:
            return cls(
                img[0], img[1], dataset_info.horizontal_coordinates.grid
            )
        self = cls.__new__(cls)
        hpx_sht = dataset_info.gridded_operations.get_real_sht()
        # hpx forward is channels-last; fields here carry no channel axis
        self._sht = lambda x: hpx_sht(x[..., None])[..., 0]
        self._gen_sum = {}
        self._target_sum = {}
        self._n = 0
        self._nan_fill = None  # flood fill is lat-lon only
        return self

    def _power_sum(self, field) -> tuple[jnp.ndarray, int]:
        """Per-l power summed over the leading (batch, time) axes.

        The reference sums raw |coeffs|^2 over m with no Hermitian
        doubling (fme/core/metrics.py spherical_power_spectrum), and
        weights its running mean by batch*time (spectrum.py), so partial
        final windows are not over-weighted."""
        coeffs = self._sht(field)
        power = jnp.sum(jnp.abs(coeffs) ** 2, axis=-1)
        lead = tuple(range(power.ndim - 1))
        n = int(np.prod(power.shape[:-1])) if power.ndim > 1 else 1
        return jnp.sum(power, axis=lead), n

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        n_added = None
        for k, v in gen.items():
            if self._nan_fill is not None:
                v = self._nan_fill(v, k)
            p, n_added = self._power_sum(v)
            self._gen_sum[k] = self._gen_sum.get(k, 0.0) + p
        if n_added is not None:
            self._n += n_added
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    if self._nan_fill is not None:
                        v = self._nan_fill(v, f"target/{k}")
                    p, _ = self._power_sum(v)
                    self._target_sum[k] = (
                        self._target_sum.get(k, 0.0) + p
                    )

    def get_logs(self, label: str = "spectrum") -> dict[str, float]:
        logs = {}
        for k in self._gen_sum:
            if k in self._target_sum:
                gen_s = np.asarray(self._gen_sum[k] / self._n)
                tgt_s = np.asarray(self._target_sum[k] / self._n)
                # log-space mean abs error over resolved wavenumbers
                eps = 1e-20
                logs[f"{label}/log_error/{k}"] = float(np.mean(np.abs(
                    np.log(gen_s[1:] + eps) - np.log(tgt_s[1:] + eps)
                )))
                # normalized bias metrics (reference: inference/spectrum.py
                # _get_spectrum_metrics / get_smallest_scale_power_bias /
                # get_positive_and_negative_power_bias)
                ratio = gen_s / np.where(tgt_s == 0.0, np.nan, tgt_s) - 1.0
                n_modes = ratio.shape[0]
                pos = float(np.nansum(np.where(ratio > 0, ratio, 0.0)) / n_modes)
                neg = float(np.nansum(np.where(ratio < 0, ratio, 0.0)) / n_modes)
                logs[f"{label}/positive_norm_bias/{k}"] = pos
                logs[f"{label}/negative_norm_bias/{k}"] = neg
                logs[f"{label}/mean_abs_norm_bias/{k}"] = abs(pos) + abs(neg)
                logs[f"{label}/smallest_scale_norm_bias/{k}"] = (
                    float(ratio[-1]) if np.isfinite(ratio[-1]) else 0.0
                )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {
            f"gen_power-{k}": np.asarray(v / self._n)
            for k, v in self._gen_sum.items()
        }
        out.update({
            f"target_power-{k}": np.asarray(v / self._n)
            for k, v in self._target_sum.items()
        })
        return out


@dataclasses.dataclass
class InferenceAggregatorConfig:
    """(reference: fme/ace/aggregator config surface, subset)."""

    log_global_mean_time_series: bool = True
    log_zonal_mean_images: bool = True
    log_spectra: bool = True
    log_histograms: bool = False
    log_annual_means: bool = True
    monthly_reference_data: str | None = None  # accepted for config parity
    log_enso_index: bool = False
    enso_sst_name: str = "surface_temperature"
    log_seasonal_means: bool = False
    log_near_zero_fraction: bool = False
    log_video: bool = False
    log_extended_video: bool = False
    log_trends: bool = False

    def build(self, dataset_info, n_timesteps: int,
              record_step_20: bool = False) -> "InferenceEvaluatorAggregator":
        return InferenceEvaluatorAggregator(
            dataset_info=dataset_info,
            config=self,
            n_timesteps=n_timesteps,
        )


class InferenceEvaluatorAggregator:
    """Multiplexes the inference aggregators
    (reference: fme/ace/aggregator/inference/main.py:526).
    """

    def __init__(self, dataset_info, config=None, n_timesteps: int = 0):
        config = config or InferenceAggregatorConfig()
        ops = dataset_info.gridded_operations
        is_latlon = len(dataset_info.img_shape) == 2
        self._aggregators: dict[str, Any] = {
            "time_mean": TimeMeanAggregator(ops),
        }
        if config.log_global_mean_time_series:
            self._aggregators["mean"] = GlobalMeanTimeSeriesAggregator(ops)
        if config.log_zonal_mean_images and is_latlon:
            self._aggregators["zonal_mean"] = ZonalMeanAggregator()
        if config.log_spectra:
            self._aggregators["spectrum"] = (
                SpectrumAggregator.for_dataset_info(dataset_info)
            )
        if config.log_histograms:
            from ace_tpu.aggregator.histogram import HistogramAggregator

            self._aggregators["histogram"] = HistogramAggregator()
        if config.log_enso_index:
            from ace_tpu.aggregator.enso import EnsoIndexAggregator

            self._aggregators["enso"] = EnsoIndexAggregator(
                dataset_info.horizontal_coordinates,
                sst_name=config.enso_sst_name,
            )
        if config.log_near_zero_fraction:
            from ace_tpu.aggregator.seasonal import (
                NearZeroFractionAggregator,
            )

            self._aggregators["near_zero_fraction"] = (
                NearZeroFractionAggregator()
            )
        self._trend = None
        if config.log_trends:
            from ace_tpu.aggregator.trend import TrendAggregator

            self._trend = TrendAggregator()
        self._seasonal = None
        if config.log_seasonal_means:
            from ace_tpu.aggregator.seasonal import SeasonalAggregator

            self._seasonal = SeasonalAggregator()
        if (config.log_video or config.log_extended_video) and n_timesteps:
            from ace_tpu.aggregator.video import VideoAggregator

            self._aggregators["video"] = VideoAggregator(
                n_timesteps,
                enable_extended_videos=config.log_extended_video,
            )
        self._annual = None
        if config.log_annual_means:
            from ace_tpu.aggregator.histogram import (
                GlobalMeanAnnualAggregator,
            )

            self._annual = GlobalMeanAnnualAggregator(ops)
        self._n_steps = 0

    def record_batch(self, gen: TensorMapping,
                     target: TensorMapping | None = None, time=None):
        self._n_steps += next(iter(gen.values())).shape[1]
        for name, agg in self._aggregators.items():
            if name in ("enso", "ipo"):
                # index aggregators need timestamps for the monthly
                # climatology anomaly step
                agg.record_batch(gen, target, time=time)
            else:
                agg.record_batch(gen, target)
        if self._annual is not None and time is not None:
            self._annual.record_batch(gen, time, target)
        if self._seasonal is not None and time is not None:
            self._seasonal.record_batch(gen, time, target)
        if self._trend is not None and time is not None:
            self._trend.record_batch(gen, time, target)

    def get_logs(self) -> dict[str, float]:
        logs: dict[str, float] = {"n_forward_steps": self._n_steps}
        for label, agg in self._aggregators.items():
            if hasattr(agg, "get_logs"):
                logs.update(agg.get_logs(label))
        if self._annual is not None:
            logs.update(self._annual.get_logs("annual"))
        if self._seasonal is not None:
            logs.update(self._seasonal.get_logs("seasonal"))
        if self._trend is not None:
            logs.update(self._trend.get_logs("trend"))
        return logs

    def flush_diagnostics(self, output_dir: str):
        """Write reduced diagnostics to HDF5 files
        (reference: fme/core/diagnostics.py:39).
        """
        import os

        from ace_tpu.data.store import write_h5

        os.makedirs(output_dir, exist_ok=True)
        items = dict(self._aggregators)
        if self._annual is not None:
            items["annual"] = self._annual
        if self._trend is not None:
            items["trend"] = self._trend
        if self._seasonal is not None:
            items["seasonal"] = self._seasonal
        for label, agg in items.items():
            if not hasattr(agg, "get_diagnostics"):
                continue
            diags = agg.get_diagnostics()
            if not diags:
                continue
            dims = {}
            for k, v in diags.items():
                dims[k] = tuple(f"dim{i}" for i in range(np.ndim(v)))
            write_h5(
                os.path.join(output_dir, f"{label}_diagnostics.nc"),
                {k: np.asarray(v) for k, v in diags.items()},
                dims,
            )

    def flush_images(self, output_dir: str):
        """Render diagnostic maps/videos to PNG/GIF files, and mirror
        them to wandb as Image/Video media when a run is active
        (reference: fme/ace/aggregator/inference/main.py get_logs media;
        plotting.py plot_imshow; fme/core/wandb.py:96 media types)."""
        import os

        from ace_tpu.aggregator import plotting
        from ace_tpu.core.wandb import Image, Video, WandB

        wandb = WandB.get_instance()
        media: dict = {}
        os.makedirs(output_dir, exist_ok=True)
        items = dict(self._aggregators)
        if self._annual is not None:
            items["annual"] = self._annual
        if self._trend is not None:
            items["trend"] = self._trend
        if self._seasonal is not None:
            items["seasonal"] = self._seasonal
        for label, agg in items.items():
            if not hasattr(agg, "get_diagnostics"):
                continue
            for key, arr in agg.get_diagnostics().items():
                arr = np.asarray(arr)
                safe = f"{label}.{key}".replace("/", "_")
                diverging = any(
                    t in key for t in ("bias", "err", "anomaly", "trend")
                )
                try:
                    if key.startswith("video-"):
                        gif_path = os.path.join(output_dir, safe + ".gif")
                        plotting.save_video_gif(
                            gif_path, arr, diverging=diverging,
                        )
                        media[f"inference/{label}/{key}"] = Video(gif_path)
                    elif arr.ndim == 2 or (
                        arr.ndim == 3 and arr.shape[0] == 12
                    ):
                        vmin, vmax = plotting.get_cmap_limits(
                            arr, diverging
                        )
                        # the lon roll is for maps only: Hovmoller /
                        # series arrays have time on the last axis and
                        # must not be rolled (reference passes
                        # roll_lon=False for zonal-mean images)
                        is_map = not any(
                            t in key for t in
                            ("hovmoller", "series", "index", "spectrum")
                        )
                        fig = plotting.plot_imshow(
                            arr, vmin=vmin, vmax=vmax,
                            cmap="RdBu_r" if diverging else None,
                            roll_lon=is_map,
                        )
                        png_path = os.path.join(output_dir, safe + ".png")
                        plotting.save_figure(fig, png_path)
                        media[f"inference/{label}/{key}"] = Image(png_path)
                except Exception:  # rendering must never fail a run
                    logging.exception("failed to render %s", safe)
        if media and wandb.enabled:
            wandb.log(media)
