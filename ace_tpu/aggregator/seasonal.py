"""Seasonal-mean and near-zero-fraction aggregators
(reference: fme/ace/aggregator/inference/seasonal.py:22
SeasonalAggregator, near_zero_fraction.py).
"""

import numpy as np

from ace_tpu.core.typing_ import TensorMapping
from ace_tpu.data.time import TimeCoord

SEASON_OF_MONTH = {
    12: "DJF", 1: "DJF", 2: "DJF",
    3: "MAM", 4: "MAM", 5: "MAM",
    6: "JJA", 7: "JJA", 8: "JJA",
    9: "SON", 10: "SON", 11: "SON",
}
SEASONS = ("DJF", "MAM", "JJA", "SON")


class SeasonalAggregator:
    """Mean maps per meteorological season (DJF/MAM/JJA/SON). Each
    sample bins by its own calendar month — with staggered initial
    conditions, samples sit in different seasons at the same step
    (reference groups per-sample valid_time.dt.season)."""

    def __init__(self):
        self._sums: dict[str, dict[str, np.ndarray]] = {}
        self._counts: dict[str, int] = {s: 0 for s in SEASONS}

    def record_batch(self, gen: TensorMapping, time: TimeCoord,
                     target=None):
        months = np.atleast_2d(time.components()["month"])
        n_samples, n_time = months.shape
        for b in range(n_samples):
            for t in range(n_time):
                season = SEASON_OF_MONTH[int(months[b, t])]
                self._counts[season] += 1
                for name, value in gen.items():
                    arr = np.asarray(value)[b, t]
                    sums = self._sums.setdefault(name, {})
                    if season in sums:
                        sums[season] = sums[season] + arr
                    else:
                        sums[season] = arr.copy()

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {}
        for name, sums in self._sums.items():
            for season, total in sums.items():
                out[f"seasonal_mean-{season}-{name}"] = (
                    total / max(self._counts[season], 1)
                )
        return out

    def get_logs(self, label: str = "seasonal") -> dict[str, float]:
        logs = {}
        for name, sums in self._sums.items():
            for season, total in sums.items():
                logs[f"{label}/{season}/global_mean/{name}"] = float(
                    (total / max(self._counts[season], 1)).mean()
                )
        return logs


class NearZeroFractionAggregator:
    """Area-weighted fraction of values at or below a small threshold
    (reference: near_zero_fraction.py) — detects collapsing fields
    (e.g. precipitation shutting off or drifting negative in long
    rollouts). One-sided (v <= eps): a field collapsing negative still
    counts as near-zero.
    """

    def __init__(self, threshold: float = 1e-9,
                 area_weights: np.ndarray | None = None):
        self._threshold = threshold
        self._weights = (
            None if area_weights is None
            else np.asarray(area_weights)
        )
        self._near_zero: dict[str, float] = {}
        self._total: dict[str, float] = {}

    def record_batch(self, gen: TensorMapping, target=None, time=None):
        for name, value in gen.items():
            arr = np.asarray(value)
            near = (arr <= self._threshold).astype(np.float64)
            if self._weights is not None:
                w = self._weights / self._weights.mean()
                near = near * w
            self._near_zero[name] = (
                self._near_zero.get(name, 0.0) + float(near.sum())
            )
            self._total[name] = self._total.get(name, 0.0) + arr.size

    def get_logs(self, label: str = "near_zero_fraction") -> dict[str, float]:
        return {
            f"{label}/{name}": self._near_zero[name] / self._total[name]
            for name in self._near_zero
        }
