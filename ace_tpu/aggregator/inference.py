"""Streaming inference aggregators (reference: fme/ace/aggregator/inference/
— time-mean maps/RMSE (time_mean.py), zonal means (zonal_mean.py),
spherical power spectra (spectrum.py), global-mean time series, budget
diagnostics).

Aggregators consume paired (prediction, target) batches window by window
and maintain O(1)-memory running reductions on device; `get_logs` returns
scalars, `get_diagnostics` returns named arrays for netCDF output.

record_batch never blocks on a device value, and dispatches ONE compiled
program per window: each aggregator's per-window reductions are wrapped
in jax.jit (running sums as inputs/outputs for the O(1)-state
aggregators, pending-list appends for the rest) and materialized at
finalization time by ONE parallel device->host transfer
(jax.device_get prefetches every leaf before reading). Both halves are
load-bearing: a blocking per-variable np.asarray inside record_batch
costs a full device round trip at the tail of the dispatch queue, and
even non-blocking EAGER ops cost ~30 ms of per-op dispatch each over a
remote-tunnel TPU (measured: 300+ eager aggregator ops made a 20-step
flagship window take 110 s against ~1 s of rollout compute; the same
reductions as one jitted call run in ~10 ms). Blocking reads would also
defeat the pipelined inference loop (inference/loop.py), which counts
on record_batch returning before the next window's rollout completes.
"""

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.gridded_ops import GriddedOperations
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.ops.sht import RealSHT


# inline inference rebuilds its aggregator every epoch; cache the
# offline reference loads per path so the netCDFs are read and
# coarsened once per process, not once per epoch
_REFERENCE_CACHE: dict = {}


def load_time_mean_reference(path: str) -> dict[str, np.ndarray]:
    """Load a time-mean reference netCDF into per-variable [lat, lon]
    maps (reference: fme/ace/aggregator/inference/main.py:114-118 +
    time_mean.py reference_means). Leading singleton/sample dims are
    averaged out."""
    from ace_tpu.data.store import open_file_dataset

    cached = _REFERENCE_CACHE.get(("time_mean", path))
    if cached is not None:
        return cached

    ds = open_file_dataset(path)
    out = {}
    for name in ds.keys():
        if name in ("lat", "lon", "latitude", "longitude", "time",
                    "valid_time", "counts", "init_time"):
            continue
        arr = np.asarray(ds[name].read(()), dtype=np.float32)
        while arr.ndim > 2:
            arr = arr.mean(axis=0)
        if arr.ndim == 2:
            out[name] = arr
    _REFERENCE_CACHE[("time_mean", path)] = out
    return out


def load_monthly_reference(
    path: str, ops: GriddedOperations
) -> dict[str, dict[int, float]]:
    """Load a monthly-means reference netCDF ([sample, month, lat, lon]
    variables + ``counts`` + cftime ``valid_time``) and coarsen to
    per-variable {year: annual global mean} (sample-averaged), matching
    the reference's process_monthly_reference
    (fme/ace/aggregator/inference/annual.py:285-309)."""
    from ace_tpu.data.store import open_file_dataset

    # keyed by path only: the grid (and hence ops) is fixed per process
    cached = _REFERENCE_CACHE.get(("monthly", path))
    if cached is not None:
        return cached

    ds = open_file_dataset(path)
    time = ds.read_time("valid_time")
    years = time.components()["year"]
    counts = np.asarray(ds["counts"].read(()), dtype=np.float64)
    # broadcast to [sample, month]
    if years.ndim == 1:
        years = years[None]
    if counts.ndim == 1:
        counts = np.broadcast_to(counts[None], years.shape)
    out: dict[str, dict[int, float]] = {}
    for name in ds.keys():
        if name in ("lat", "lon", "latitude", "longitude", "time",
                    "valid_time", "counts", "init_time"):
            continue
        arr = np.asarray(ds[name].read(()), dtype=np.float32)
        if arr.ndim < 3:
            continue
        if arr.ndim == 3:  # no sample dim
            arr = arr[None]
        gm = np.asarray(
            ops.area_weighted_mean(jnp.asarray(arr), name=name)
        )  # [sample, month]
        per_year: dict[int, float] = {}
        for year in np.unique(years):
            mask = years == year
            # count-weighted annual mean per sample, then sample mean
            # (all samples share one time axis, as the reference asserts)
            num = np.sum(gm * counts * mask, axis=1)
            den = np.sum(counts * mask, axis=1)
            valid = den > 0
            if valid.any():
                per_year[int(year)] = float(
                    np.mean(num[valid] / den[valid])
                )
        out[name] = per_year
    _REFERENCE_CACHE[("monthly", path)] = out
    return out


class TimeMeanAggregator:
    """Running time-mean maps of gen and target; final bias/RMSE of the
    time-mean, and bias/RMSE vs an offline reference time-mean dataset
    when one is configured (reference: inference/time_mean.py
    ref_bias/ref_rmse at :190-205).
    """

    def __init__(self, ops: GriddedOperations,
                 reference_means: dict[str, np.ndarray] | None = None):
        self._ops = ops
        self._gen_sum: TensorDict = {}
        self._target_sum: TensorDict = {}
        self._reference_means = reference_means or {}
        self._n = 0

    @staticmethod
    @jax.jit
    def _update(gen_sum, target_sum, gen, target):
        new_gen = {
            k: gen_sum.get(k, 0.0) + jnp.sum(v, axis=1)
            for k, v in gen.items()
        }
        new_target = dict(target_sum)
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    new_target[k] = (
                        target_sum.get(k, 0.0) + jnp.sum(v, axis=1)
                    )
        return new_gen, new_target

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        n_time = next(iter(gen.values())).shape[1]
        self._n += n_time
        self._gen_sum, self._target_sum = self._update(
            self._gen_sum, self._target_sum, dict(gen),
            dict(target) if target is not None else None,
        )

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
            if k in self._reference_means:
                ref = jnp.asarray(self._reference_means[k])[None]
                logs[f"{label}/ref_rmse/{k}"] = float(
                    jnp.mean(self._ops.area_weighted_rmse(
                        ref, gen_mean, name=k
                    ))
                )
                logs[f"{label}/ref_bias/{k}"] = float(
                    jnp.mean(self._ops.area_weighted_mean_bias(
                        ref, gen_mean, name=k
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
            if k in self._reference_means:
                out[f"ref_bias_map-{k}"] = (
                    np.asarray(jnp.mean(self._gen_sum[k] / self._n, axis=0))
                    - self._reference_means[k]
                )
        return out


@dataclasses.dataclass
class StepMeanEntry:
    """Log per-variable mean metrics at one rollout step (reference:
    fme/ace/aggregator/inference/main.py:365 StepMeanEntry; the default
    mirrors the reference's step-20 entry)."""

    step: int
    name: str | None = None

    def get_name(self) -> str:
        return self.name or f"mean_step_{self.step}"


class StepMeanSeriesAggregator:
    """Per-forward-step series of area-weighted RMSE / bias / global
    means over the whole rollout, with selected steps logged as scalars
    (reference: fme/ace/aggregator/inference/reduced.py:221
    MeanAggregator + main.py:443 step-mean entries). With a normalizer,
    metrics run on normalized fields (the reference's mean_norm target,
    main.py:239)."""

    def __init__(self, ops: GriddedOperations, n_timesteps: int,
                 entries: "list[StepMeanEntry] | None" = None,
                 normalizer=None):
        self._ops = ops
        self._n_timesteps = n_timesteps
        self._entries = [
            e for e in (entries or []) if e.step <= n_timesteps
        ]
        for e in entries or []:
            if e.step > n_timesteps:
                logging.warning(
                    "log_step_means entry step=%d exceeds "
                    "n_forward_steps=%d; skipping it", e.step, n_timesteps
                )
        self._normalizer = normalizer
        self._rmse: dict[str, np.ndarray] = {}
        self._bias: dict[str, np.ndarray] = {}
        self._gen_mean: dict[str, np.ndarray] = {}
        self._counts: dict[str, np.ndarray] = {}
        # per-window device reductions awaiting one batched D2H transfer
        self._pending: list = []
        self._compute = jax.jit(self._compute_impl)

    def _series(self, store: dict, name: str) -> np.ndarray:
        if name not in store:
            store[name] = np.zeros(self._n_timesteps, np.float64)
        return store[name]

    def _compute_impl(self, gen, target):
        if self._normalizer is not None:
            # only variables with stats belong in a normalized series
            names = self._normalizer.names
            gen = self._normalizer.normalize(
                {k: v for k, v in gen.items() if k in names}
            )
            if target is not None:
                target = self._normalizer.normalize(
                    {k: v for k, v in target.items() if k in names}
                )
        window: dict[str, dict] = {}
        for k, v in gen.items():
            entry = {
                "gen_mean": jnp.mean(
                    self._ops.area_weighted_mean(v, name=k), axis=0
                ),
            }
            if target is not None and k in target:
                t = target[k]
                entry["rmse"] = jnp.mean(
                    self._ops.area_weighted_rmse(t, v, name=k), axis=0
                )
                entry["bias"] = jnp.mean(
                    self._ops.area_weighted_mean_bias(t, v, name=k),
                    axis=0,
                )
            window[k] = entry
        return window

    def record_batch(self, gen: TensorMapping,
                     target: TensorMapping | None, i_time_start: int):
        window = self._compute(
            dict(gen), dict(target) if target is not None else None
        )
        self._pending.append((i_time_start, window))

    def _drain(self):
        if not self._pending:
            return
        import jax

        for i_time_start, window in jax.device_get(self._pending):
            for k, entry in window.items():
                n_time = entry["gen_mean"].shape[0]
                sl = slice(i_time_start, i_time_start + n_time)
                self._series(self._gen_mean, k)[sl] += entry["gen_mean"]
                self._series(self._counts, k)[sl] += 1
                if "rmse" in entry:
                    self._series(self._rmse, k)[sl] += entry["rmse"]
                    self._series(self._bias, k)[sl] += entry["bias"]
        self._pending = []

    def get_logs(self, label: str = "mean_step") -> dict[str, float]:
        self._drain()
        logs: dict[str, float] = {}
        for entry in self._entries:
            idx = entry.step - 1
            name = entry.get_name()
            for k, counts in self._counts.items():
                if counts[idx] == 0:
                    continue
                n = counts[idx]
                logs[f"{name}/weighted_mean_gen/{k}"] = float(
                    self._gen_mean[k][idx] / n
                )
                if k in self._rmse:
                    logs[f"{name}/weighted_rmse/{k}"] = float(
                        self._rmse[k][idx] / n
                    )
                    logs[f"{name}/weighted_bias/{k}"] = float(
                        self._bias[k][idx] / n
                    )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        for k, counts in self._counts.items():
            n = np.where(counts == 0, 1, counts)
            out[f"weighted_mean_gen_series-{k}"] = self._gen_mean[k] / n
            if k in self._rmse:
                out[f"weighted_rmse_series-{k}"] = self._rmse[k] / n
                out[f"weighted_bias_series-{k}"] = self._bias[k] / n
        return out


class InferenceEnsembleAggregator:
    """Ensemble spread/skill/CRPS over rollout time when inference runs
    N ensemble members per initial condition (reference:
    fme/ace/aggregator/inference/main.py:102,343 n_ensemble_per_ic +
    one_step/ensemble.py spread-skill machinery).

    Batches arrive member-major: [n_ic * n_ensemble, time, ...] with the
    members of one IC contiguous (np.repeat layout).
    """

    def __init__(self, ops: GriddedOperations, n_ensemble: int):
        self._ops = ops
        self._n_ens = n_ensemble
        self._crps: dict[str, float] = {}
        self._spread_sq: dict[str, float] = {}
        self._skill_sq: dict[str, float] = {}
        self._n: dict[str, int] = {}
        self._pending: list = []
        self._compute = jax.jit(self._compute_impl)

    def _compute_impl(self, gen, target):
        from ace_tpu.core.loss import get_crps

        e = self._n_ens
        window: dict[str, dict] = {}
        for k, v in gen.items():
            if v.shape[0] % e:
                continue
            b = v.shape[0] // e
            g = jnp.reshape(jnp.asarray(v), (b, e) + v.shape[1:])
            # ensemble variance (unbiased) -> area/time-mean spread^2
            var = jnp.var(g, axis=1, ddof=1)
            entry = {
                "n_time": v.shape[1],
                "spread_sq": jnp.mean(
                    self._ops.area_weighted_mean(var, name=k)
                ),
            }
            if target is not None and k in target:
                t = jnp.asarray(target[k])
                t = jnp.reshape(t, (b, e) + t.shape[1:])[:, 0]
                entry["crps"] = jnp.mean(self._ops.area_weighted_mean(
                    get_crps(g, t[:, None], alpha=0.95), name=k
                ))
                # skill: MSE of the ensemble mean vs target, with the
                # unbiased -spread^2/E correction (one_step/ensemble.py)
                err = jnp.mean(g, axis=1) - t
                entry["mse"] = jnp.mean(self._ops.area_weighted_mean(
                    err * err, name=k
                ))
            window[k] = entry
        return window

    def record_batch(self, gen: TensorMapping,
                     target: TensorMapping | None):
        self._pending.append(self._compute(
            dict(gen), dict(target) if target is not None else None
        ))

    def _drain(self):
        if not self._pending:
            return
        import jax

        e = self._n_ens
        for window in jax.device_get(self._pending):
            for k, entry in window.items():
                n_time = entry["n_time"]
                spread_sq = float(entry["spread_sq"])
                self._spread_sq[k] = (
                    self._spread_sq.get(k, 0.0) + spread_sq * n_time
                )
                self._n[k] = self._n.get(k, 0) + n_time
                if "crps" in entry:
                    self._crps[k] = (
                        self._crps.get(k, 0.0)
                        + float(entry["crps"]) * n_time
                    )
                    self._skill_sq[k] = (
                        self._skill_sq.get(k, 0.0)
                        + max(float(entry["mse"]) - spread_sq / e, 0.0)
                        * n_time
                    )
        self._pending = []

    def get_logs(self, label: str = "ensemble") -> dict[str, float]:
        self._drain()
        logs: dict[str, float] = {}
        for k, n in self._n.items():
            spread = float(np.sqrt(self._spread_sq[k] / n))
            logs[f"{label}/spread/{k}"] = spread
            if k in self._crps:
                logs[f"{label}/crps/{k}"] = self._crps[k] / n
                skill = float(np.sqrt(self._skill_sq[k] / n))
                logs[f"{label}/rmse_of_ensemble_mean/{k}"] = skill
                if skill > 0:
                    logs[f"{label}/spread_skill_ratio/{k}"] = (
                        spread / skill
                    )
        return logs


class GlobalMeanTimeSeriesAggregator:
    """Area-weighted global-mean time series of every variable
    (reference: inference/main.py scalar time series).
    """

    def __init__(self, ops: GriddedOperations):
        self._ops = ops
        # per-window chunks stay device-resident until finalization
        self._gen: dict[str, list] = {}
        self._target: dict[str, list] = {}
        self._compute = jax.jit(self._compute_impl)

    def _compute_impl(self, gen, target):
        g = {
            k: jnp.mean(self._ops.area_weighted_mean(v, name=k), axis=0)
            for k, v in gen.items()
        }
        t = {
            k: jnp.mean(self._ops.area_weighted_mean(v, name=k), axis=0)
            for k, v in (target or {}).items() if k in gen
        }
        return g, t

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        g, t = self._compute(
            dict(gen), dict(target) if target is not None else None
        )
        for k, val in g.items():
            self._gen.setdefault(k, []).append(val)
        for k, val in t.items():
            self._target.setdefault(k, []).append(val)

    def _drain(self):
        import jax

        self._gen = jax.device_get(self._gen)
        self._target = jax.device_get(self._target)

    def get_logs(self, label: str = "mean") -> dict[str, float]:
        self._drain()
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
        self._drain()
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
        # per-window [time, lat] chunks stay device-resident until
        # finalization (~15 KB per variable per window)
        self._gen: dict[str, list] = {}
        self._target: dict[str, list] = {}
        self._n = 0

    @staticmethod
    @jax.jit
    def _compute(gen, target):
        # mean over lon and batch -> [time, lat]
        g = {k: jnp.mean(jnp.mean(v, axis=-1), axis=0)
             for k, v in gen.items()}
        t = {k: jnp.mean(jnp.mean(v, axis=-1), axis=0)
             for k, v in (target or {}).items() if k in gen}
        return g, t

    def record_batch(self, gen: TensorMapping, target=None):
        n_time = next(iter(gen.values())).shape[1]
        self._n += n_time
        g, t = self._compute(
            dict(gen), dict(target) if target is not None else None
        )
        for k, zm in g.items():
            self._gen.setdefault(k, []).append(zm)
        for k, zm in t.items():
            self._target.setdefault(k, []).append(zm)

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        import jax

        self._gen = jax.device_get(self._gen)
        self._target = jax.device_get(self._target)
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
        self._spatial_rank = 2
        self._update = jax.jit(self._update_impl)

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
        self._spatial_rank = 3  # [face, H, W]
        self._update = jax.jit(self._update_impl)
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

    def _prime_masks(self, data: TensorMapping, prefix: str = ""):
        """Compute the flood-fill NaN masks for any not-yet-seen variable
        OUTSIDE the jitted update (the masks derive from data values, so
        they cannot be traced). Pulls one [H, W] sample slice per new
        variable — first window only."""
        if self._nan_fill is None:
            return
        for k, v in data.items():
            name = f"{prefix}{k}"
            if name not in self._nan_fill._masks:
                spatial = np.asarray(v[(0,) * (np.ndim(v) - 2)])
                self._nan_fill._get_masks(spatial[None], name)

    def _update_impl(self, gen_sum, target_sum, gen, target):
        new_gen = dict(gen_sum)
        for k, v in gen.items():
            if self._nan_fill is not None:
                v = self._nan_fill(v, k)
            p, _ = self._power_sum(v)
            new_gen[k] = gen_sum.get(k, 0.0) + p
        new_target = dict(target_sum)
        if target is not None:
            for k, v in target.items():
                if k in gen:
                    if self._nan_fill is not None:
                        v = self._nan_fill(v, f"target/{k}")
                    p, _ = self._power_sum(v)
                    new_target[k] = target_sum.get(k, 0.0) + p
        return new_gen, new_target

    def record_batch(self, gen: TensorMapping, target: TensorMapping | None):
        gen = dict(gen)
        target = dict(target) if target is not None else None
        self._prime_masks(gen)
        if target is not None:
            self._prime_masks(
                {k: v for k, v in target.items() if k in gen}, "target/"
            )
        first = next(iter(gen.values()))
        lead = first.shape[: max(first.ndim - self._spatial_rank, 0)]
        self._n += int(np.prod(lead)) if lead else 1
        self._gen_sum, self._target_sum = self._update(
            self._gen_sum, self._target_sum, gen, target
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
    # path to a monthly-means reference netCDF: enables annual R2 vs the
    # reference simulation (fme/ace/aggregator/inference/main.py:284)
    monthly_reference_data: str | None = None
    # path to a time-mean reference netCDF: enables ref_bias/ref_rmse of
    # the generated time-mean vs offline reference maps (main.py:285)
    time_mean_reference_data: str | None = None
    log_enso_index: bool = False
    enso_sst_name: str = "surface_temperature"
    log_seasonal_means: bool = False
    log_near_zero_fraction: bool = False
    # per-variable mean metrics at selected rollout steps (reference:
    # main.py:422 log_step_means, default step-20 entry) plus full
    # per-step metric series diagnostics; entries beyond the rollout
    # length are skipped with a warning
    log_step_means: list[StepMeanEntry] = dataclasses.field(
        default_factory=lambda: [StepMeanEntry(step=20)]
    )
    # global-mean time series on NORMALIZED fields (reference:
    # main.py:239 mean_norm target); requires the stepper's normalizer,
    # passed by the inference/evaluator entries
    log_global_mean_norm_time_series: bool = True
    log_video: bool = False
    log_extended_video: bool = False
    log_trends: bool = False

    def build(self, dataset_info, n_timesteps: int,
              record_step_20: bool = False,
              normalizer=None,
              n_ensemble_per_ic: int = 1,
              ) -> "InferenceEvaluatorAggregator":
        return InferenceEvaluatorAggregator(
            dataset_info=dataset_info,
            config=self,
            n_timesteps=n_timesteps,
            normalizer=normalizer,
            n_ensemble_per_ic=n_ensemble_per_ic,
        )


class InferenceEvaluatorAggregator:
    """Multiplexes the inference aggregators
    (reference: fme/ace/aggregator/inference/main.py:526).
    """

    def __init__(self, dataset_info, config=None, n_timesteps: int = 0,
                 normalizer=None, n_ensemble_per_ic: int = 1):
        config = config or InferenceAggregatorConfig()
        ops = dataset_info.gridded_operations
        is_latlon = len(dataset_info.img_shape) == 2
        time_mean_ref = (
            load_time_mean_reference(config.time_mean_reference_data)
            if config.time_mean_reference_data is not None else None
        )
        self._aggregators: dict[str, Any] = {
            "time_mean": TimeMeanAggregator(
                ops, reference_means=time_mean_ref
            ),
        }
        if config.log_global_mean_time_series:
            self._aggregators["mean"] = GlobalMeanTimeSeriesAggregator(ops)
        self._step_mean = None
        if config.log_step_means and n_timesteps:
            self._step_mean = StepMeanSeriesAggregator(
                ops, n_timesteps, entries=list(config.log_step_means)
            )
        if n_ensemble_per_ic > 1:
            self._aggregators["ensemble"] = InferenceEnsembleAggregator(
                ops, n_ensemble_per_ic
            )
        self._mean_norm = None
        if (config.log_global_mean_norm_time_series
                and normalizer is not None and n_timesteps):
            self._mean_norm = StepMeanSeriesAggregator(
                ops, n_timesteps, entries=[], normalizer=normalizer
            )
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

            monthly_ref = (
                load_monthly_reference(config.monthly_reference_data, ops)
                if config.monthly_reference_data is not None else None
            )
            self._annual = GlobalMeanAnnualAggregator(
                ops, monthly_reference=monthly_ref
            )
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
        i_start = self._n_steps - next(iter(gen.values())).shape[1]
        if self._step_mean is not None:
            self._step_mean.record_batch(gen, target, i_start)
        if self._mean_norm is not None:
            self._mean_norm.record_batch(gen, target, i_start)

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
        if self._step_mean is not None:
            logs.update(self._step_mean.get_logs())
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
        if self._step_mean is not None:
            items["mean_step"] = self._step_mean
        if self._mean_norm is not None:
            items["mean_norm"] = self._mean_norm
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
