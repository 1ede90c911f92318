"""Streaming per-grid-cell linear trend maps
(reference: fme/ace/aggregator/inference/trend.py
TrendEvaluatorAggregator): OLS slope of each variable against time in
years, accumulated via running sums so memory is independent of rollout
length.

Per-window partial sums are computed on device (f32 over the <=~100
(sample, step) pairs of one window) and accumulated across windows on
the host in f64 after ONE batched D2H transfer at finalization —
record_batch never blocks on a device value (see aggregator/inference.py
docstring).
"""

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.typing_ import TensorMapping
from ace_tpu.data.time import TimeCoord, parse_datetime_string

SECONDS_PER_YEAR = 365.25 * 24 * 60 * 60


class TrendAggregator:
    """slope = (n*sum(t*y) - sum(t)*sum(y)) / (n*sum(t^2) - sum(t)^2)."""

    def __init__(self):
        self._n = 0
        self._sum_t = 0.0
        self._sum_t2 = 0.0
        self._sum_y: dict[str, np.ndarray] = {}
        self._sum_ty: dict[str, np.ndarray] = {}
        self._target_sum_y: dict[str, np.ndarray] = {}
        self._target_sum_ty: dict[str, np.ndarray] = {}
        self._ref_us: int | None = None
        self._pending: list = []
        self._compute = None

    def _years(self, time: TimeCoord) -> np.ndarray:
        if self._ref_us is None:
            # fixed epoch keeps running sums consistent across batches;
            # the slope is shift-invariant (reference: trend.py:27)
            self._ref_us = int(parse_datetime_string("2000-01-01T00:00"))
        seconds = (
            np.asarray(time.values, np.float64) - self._ref_us
        ) / 1e6
        return seconds / SECONDS_PER_YEAR

    def record_batch(self, gen: TensorMapping, time: TimeCoord,
                     target: TensorMapping | None = None):
        t = self._years(time)  # [B, T]
        self._n += t.size
        self._sum_t += float(t.sum())
        self._sum_t2 += float((t**2).sum())
        # center t within the window before forming t*y on device: the
        # slope numerator n*sum_ty - sum_t*sum_y is a small difference of
        # large terms, so f32 partials of raw t*y (t ~ decades from the
        # epoch) would round visibly; with dt = t - mean(t) the device
        # partial sum(dt*y) is well-conditioned (|dt| <= window length in
        # years) and sum_ty is recovered exactly in f64 at drain time
        t_mean = float(t.mean())
        if self._compute is None:
            import jax

            def compute(t_dev, gen, target):
                t_dev = t_dev[..., None, None]
                window = {"gen": {}, "target": {}}
                for name, value in gen.items():
                    arr = jnp.asarray(value)
                    window["gen"][name] = (
                        jnp.sum(arr, axis=(0, 1)),
                        jnp.sum(arr * t_dev, axis=(0, 1)),
                    )
                    if target is not None and name in target:
                        tarr = jnp.asarray(target[name])
                        window["target"][name] = (
                            jnp.sum(tarr, axis=(0, 1)),
                            jnp.sum(tarr * t_dev, axis=(0, 1)),
                        )
                return window

            self._compute = jax.jit(compute)
        self._pending.append((t_mean, self._compute(
            np.asarray(t - t_mean, np.float32), dict(gen),
            dict(target) if target is not None else None,
        )))

    def _drain(self):
        if not self._pending:
            return
        import jax

        for t_mean, window in jax.device_get(self._pending):
            # device partials are centered: sum(dt*y); undo the shift in
            # f64: sum(t*y) = sum(dt*y) + t_mean * sum(y)
            for name, (y, dty) in window["gen"].items():
                y64 = y.astype(np.float64)
                self._sum_y[name] = self._sum_y.get(name, 0.0) + y64
                self._sum_ty[name] = (
                    self._sum_ty.get(name, 0.0)
                    + dty.astype(np.float64) + t_mean * y64
                )
            for name, (y, dty) in window["target"].items():
                y64 = y.astype(np.float64)
                self._target_sum_y[name] = (
                    self._target_sum_y.get(name, 0.0) + y64
                )
                self._target_sum_ty[name] = (
                    self._target_sum_ty.get(name, 0.0)
                    + dty.astype(np.float64) + t_mean * y64
                )
        self._pending = []

    def _slope(self, sum_y, sum_ty):
        denom = self._n * self._sum_t2 - self._sum_t**2
        if denom == 0:
            return np.zeros_like(np.asarray(sum_y))
        return (self._n * sum_ty - self._sum_t * sum_y) / denom

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        for name in self._sum_y:
            out[f"trend-gen-{name}"] = self._slope(
                self._sum_y[name], self._sum_ty[name]
            ).astype(np.float32)
            if name in self._target_sum_y:
                out[f"trend-target-{name}"] = self._slope(
                    self._target_sum_y[name], self._target_sum_ty[name]
                ).astype(np.float32)
        return out

    def get_logs(self, label: str = "trend") -> dict[str, float]:
        return {
            f"{label}/global_mean/{k.removeprefix('trend-')}": float(
                v.mean()
            )
            for k, v in self.get_diagnostics().items()
        }
