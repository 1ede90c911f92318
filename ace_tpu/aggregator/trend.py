"""Streaming per-grid-cell linear trend maps
(reference: fme/ace/aggregator/inference/trend.py
TrendEvaluatorAggregator): OLS slope of each variable against time in
years, accumulated via running sums so memory is independent of rollout
length.
"""

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
        for name, value in gen.items():
            arr = np.asarray(value, np.float64)
            y = arr.sum(axis=(0, 1))
            ty = (arr * t[..., None, None]).sum(axis=(0, 1))
            self._sum_y[name] = self._sum_y.get(name, 0.0) + y
            self._sum_ty[name] = self._sum_ty.get(name, 0.0) + ty
            if target is not None and name in target:
                tarr = np.asarray(target[name], np.float64)
                self._target_sum_y[name] = (
                    self._target_sum_y.get(name, 0.0)
                    + tarr.sum(axis=(0, 1))
                )
                self._target_sum_ty[name] = (
                    self._target_sum_ty.get(name, 0.0)
                    + (tarr * t[..., None, None]).sum(axis=(0, 1))
                )

    def _slope(self, sum_y, sum_ty):
        denom = self._n * self._sum_t2 - self._sum_t**2
        if denom == 0:
            return np.zeros_like(np.asarray(sum_y))
        return (self._n * sum_ty - self._sum_t * sum_y) / denom

    def get_diagnostics(self) -> dict[str, np.ndarray]:
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
