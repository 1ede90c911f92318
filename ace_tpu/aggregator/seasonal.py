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
    """Mean maps per meteorological season (DJF/MAM/JJA/SON)."""

    def __init__(self):
        self._sums: dict[str, dict[str, np.ndarray]] = {}
        self._counts: dict[str, int] = {s: 0 for s in SEASONS}

    def record_batch(self, gen: TensorMapping, time: TimeCoord,
                     target=None):
        months = time.components()["month"]
        n_time = time.values.shape[-1]
        for t in range(n_time):
            month = int(months[0, t] if months.ndim > 1 else months[t])
            season = SEASON_OF_MONTH[month]
            self._counts[season] += 1
            for name, value in gen.items():
                arr = np.asarray(value)[:, t].mean(axis=0)
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
    """Fraction of values within +-threshold of zero per variable
    (reference: near_zero_fraction.py) — detects collapsing fields
    (e.g. precipitation shutting off in long rollouts).
    """

    def __init__(self, threshold: float = 1e-9):
        self._threshold = threshold
        self._near_zero: dict[str, int] = {}
        self._total: dict[str, int] = {}

    def record_batch(self, gen: TensorMapping, target=None, time=None):
        for name, value in gen.items():
            arr = np.asarray(value)
            self._near_zero[name] = self._near_zero.get(name, 0) + int(
                (np.abs(arr) < self._threshold).sum()
            )
            self._total[name] = self._total.get(name, 0) + arr.size

    def get_logs(self, label: str = "near_zero_fraction") -> dict[str, float]:
        return {
            f"{label}/{name}": self._near_zero[name] / self._total[name]
            for name in self._near_zero
        }
