"""Video aggregator: per-timestep batch-mean map sequences
(reference: fme/ace/aggregator/inference/video.py:290 VideoAggregator,
_MeanVideoData, _ErrorVideoData, _VarianceVideoData).

Accumulates [n_time, H, W] arrays per variable: ensemble/batch-mean of
generated and target fields, and (extended mode) bias, per-timestep
ensemble RMSE, min/max error, and generated-ensemble variance. Windows
are recorded in rollout order; the aggregator advances its own time
cursor per batch.

record_batch reduces each window over the batch axis on device and
appends the [n_keep, H, W] partials to a pending list; the host-side
f64 accumulation runs after a batched D2H transfer — at finalization,
or every ``DRAIN_EVERY`` windows so device memory stays bounded (see
aggregator/inference.py docstring for why record_batch must not block
per window).
"""

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.typing_ import TensorMapping


class VideoAggregator:
    """(reference: video.py:290)."""

    # caps on device-resident pending partials before a forced drain:
    # by estimated bytes (the binding constraint at high resolution —
    # extended mode holds up to 6 [n_keep, H, W] f32 arrays per
    # variable per window) and, as a backstop, by window count
    DRAIN_BYTES = 256 * 1024 * 1024
    DRAIN_EVERY = 32

    def __init__(self, n_timesteps: int,
                 enable_extended_videos: bool = False):
        self._n_timesteps = n_timesteps
        self._extended = enable_extended_videos
        self._i_time = 0
        self._gen_sum: dict[str, np.ndarray] = {}
        self._target_sum: dict[str, np.ndarray] = {}
        self._count: np.ndarray | None = None
        self._sq_err_sum: dict[str, np.ndarray] = {}
        self._gen_sq_sum: dict[str, np.ndarray] = {}
        self._min_err: dict[str, np.ndarray] = {}
        self._max_err: dict[str, np.ndarray] = {}
        self._pending: list = []
        self._pending_bytes = 0
        self._compute = None

    def _ensure(self, store, name, spatial, fill=0.0):
        if name not in store:
            store[name] = np.full(
                (self._n_timesteps, *spatial), fill, np.float64
            )
        return store[name]

    def record_batch(self, gen: TensorMapping,
                     target: TensorMapping | None = None,
                     i_time_start: int | None = None):
        first = next(iter(gen.values()))
        n_batch, n_time = first.shape[:2]
        start = self._i_time if i_time_start is None else i_time_start
        end = min(start + n_time, self._n_timesteps)
        n_keep = end - start
        if n_keep <= 0:
            return
        if self._compute is None:
            import jax

            def compute(gen, target, n_keep):
                out = {}
                for name, value in gen.items():
                    arr = jnp.asarray(value)[:, :n_keep]
                    entry = {"gen_sum": jnp.sum(arr, axis=0)}
                    if self._extended:
                        entry["gen_sq_sum"] = jnp.sum(arr * arr, axis=0)
                    if target is not None and name in target:
                        tgt = jnp.asarray(target[name])[:, :n_keep]
                        entry["target_sum"] = jnp.sum(tgt, axis=0)
                        if self._extended:
                            err = arr - tgt
                            entry["sq_err_sum"] = jnp.sum(err * err, axis=0)
                            entry["min_err"] = jnp.min(err, axis=0)
                            entry["max_err"] = jnp.max(err, axis=0)
                    out[name] = entry
                return out

            self._compute = jax.jit(
                compute, static_argnames=("n_keep",)
            )
        window = {"start": start, "n_keep": n_keep, "n_batch": n_batch,
                  "vars": self._compute(
                      dict(gen),
                      dict(target) if target is not None else None,
                      n_keep,
                  )}
        self._pending.append(window)
        self._pending_bytes += sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for entry in window["vars"].values()
            for a in entry.values()
        )
        if i_time_start is None:
            self._i_time += n_time
        if (
            len(self._pending) >= self.DRAIN_EVERY
            or self._pending_bytes >= self.DRAIN_BYTES
        ):
            self._drain()

    def _drain(self):
        if not self._pending:
            return
        import jax

        for window in jax.device_get(self._pending):
            sl = slice(window["start"], window["start"] + window["n_keep"])
            if self._count is None:
                self._count = np.zeros((self._n_timesteps,), np.int64)
            self._count[sl] += window["n_batch"]
            for name, entry in window["vars"].items():
                spatial = entry["gen_sum"].shape[1:]
                self._ensure(self._gen_sum, name, spatial)[sl] += (
                    entry["gen_sum"].astype(np.float64)
                )
                if "gen_sq_sum" in entry:
                    self._ensure(self._gen_sq_sum, name, spatial)[sl] += (
                        entry["gen_sq_sum"].astype(np.float64)
                    )
                if "target_sum" in entry:
                    self._ensure(self._target_sum, name, spatial)[sl] += (
                        entry["target_sum"].astype(np.float64)
                    )
                if "sq_err_sum" in entry:
                    self._ensure(self._sq_err_sum, name, spatial)[sl] += (
                        entry["sq_err_sum"].astype(np.float64)
                    )
                    mn = self._ensure(
                        self._min_err, name, spatial, fill=np.inf
                    )
                    mx = self._ensure(
                        self._max_err, name, spatial, fill=-np.inf
                    )
                    mn[sl] = np.minimum(mn[sl], entry["min_err"])
                    mx[sl] = np.maximum(mx[sl], entry["max_err"])
        self._pending = []
        self._pending_bytes = 0

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        if self._count is None:
            return {}
        first = next(iter(self._gen_sum.values()))
        # broadcast the per-timestep count over any spatial rank
        # ([H, W] lat-lon or [12, H, W] HEALPix faces)
        n = np.maximum(self._count, 1).reshape(
            (-1,) + (1,) * (first.ndim - 1)
        )
        out: dict[str, np.ndarray] = {}
        for name, s in self._gen_sum.items():
            gen_mean = (s / n).astype(np.float32)
            out[f"video-gen-{name}"] = gen_mean
            if name in self._target_sum:
                tgt_mean = (self._target_sum[name] / n).astype(np.float32)
                out[f"video-target-{name}"] = tgt_mean
                if self._extended:
                    out[f"video-bias-{name}"] = gen_mean - tgt_mean
            if self._extended and name in self._sq_err_sum:
                out[f"video-rmse-{name}"] = np.sqrt(
                    self._sq_err_sum[name] / n
                ).astype(np.float32)
                out[f"video-min_err-{name}"] = self._min_err[name].astype(
                    np.float32
                )
                out[f"video-max_err-{name}"] = self._max_err[name].astype(
                    np.float32
                )
            if self._extended and name in self._gen_sq_sum:
                var = self._gen_sq_sum[name] / n - (self._gen_sum[name] / n) ** 2
                out[f"video-gen_var-{name}"] = np.maximum(var, 0.0).astype(
                    np.float32
                )
        return out

    def get_logs(self, label: str = "video") -> dict[str, float]:
        # videos are array diagnostics; logs carry only a size marker
        diags = self.get_diagnostics()
        return {f"{label}/n_videos": float(len(diags))}
