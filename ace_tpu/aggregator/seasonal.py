"""Seasonal-mean and near-zero-fraction aggregators
(reference: fme/ace/aggregator/inference/seasonal.py:22
SeasonalAggregator, near_zero_fraction.py).

Both keep their running reductions device-resident and materialize at
finalization (see aggregator/inference.py docstring for why record_batch
must never block on a device value).
"""

import jax.numpy as jnp
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
_SEASON_INDEX = {s: i for i, s in enumerate(SEASONS)}


class SeasonalAggregator:
    """Mean maps per meteorological season (DJF/MAM/JJA/SON). Each
    sample bins by its own calendar month — with staggered initial
    conditions, samples sit in different seasons at the same step
    (reference groups per-sample valid_time.dt.season). The per-season
    sums run as one masked contraction per season on device instead of
    a host loop over every (sample, step)."""

    def __init__(self):
        self._sums: dict[str, dict[str, np.ndarray]] = {}
        self._counts: dict[str, int] = {s: 0 for s in SEASONS}
        self._compute = None
        self._pending: list = []

    def record_batch(self, gen: TensorMapping, time: TimeCoord,
                     target=None):
        months = np.atleast_2d(time.components()["month"])
        season_idx = np.vectorize(
            lambda m: _SEASON_INDEX[SEASON_OF_MONTH[int(m)]]
        )(months)  # [B, T]
        # all-season masked contraction as one jitted program per window
        # (zero-count seasons contribute zero sums and are skipped below)
        masks = np.stack(
            [season_idx == i for i in range(len(SEASONS))]
        ).astype(np.float32)  # [4, B, T]
        if self._compute is None:
            import jax

            def compute(masks, gen):
                return {
                    name: jnp.einsum("sbt,bt...->s...", masks, value)
                    for name, value in gen.items()
                }

            self._compute = jax.jit(compute)
        sums4 = self._compute(masks, dict(gen))  # {name: [4, lat, lon]}
        counts = masks.sum(axis=(1, 2)).astype(np.int64)  # [4]
        for i, season in enumerate(SEASONS):
            self._counts[season] += int(counts[i])
        self._pending.append((counts, sums4))

    def _drain(self):
        if self._pending:
            import jax

            for counts, sums4 in jax.device_get(self._pending):
                for name, s4 in sums4.items():
                    sums = self._sums.setdefault(name, {})
                    for i, season in enumerate(SEASONS):
                        if counts[i] == 0:
                            continue
                        if season in sums:
                            sums[season] = sums[season] + s4[i]
                        else:
                            sums[season] = s4[i]
            self._pending = []

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        for name, sums in self._sums.items():
            for season, total in sums.items():
                out[f"seasonal_mean-{season}-{name}"] = (
                    total / max(self._counts[season], 1)
                )
        return out

    def get_logs(self, label: str = "seasonal") -> dict[str, float]:
        self._drain()
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
        self._near_zero: dict = {}
        self._total: dict[str, float] = {}
        self._compute = None

    def record_batch(self, gen: TensorMapping, target=None, time=None):
        if self._compute is None:
            import jax

            def compute(gen):
                out = {}
                for name, value in gen.items():
                    near = (jnp.asarray(value) <= self._threshold).astype(
                        jnp.float32
                    )
                    if self._weights is not None:
                        w = self._weights / self._weights.mean()
                        near = near * w
                    # reduce only the spatial axes on device: each
                    # [sample, step] partial stays below one grid's worth
                    # of counts (< 2^24 even at 0.25 degrees), so the f32
                    # sum is exact; the [B, T] partials are summed in f64
                    # on the host at finalization
                    out[name] = jnp.sum(
                        near, axis=tuple(range(2, near.ndim))
                    )
                return out

            self._compute = jax.jit(compute)
        sums = self._compute(dict(gen))
        for name, value in gen.items():
            self._near_zero.setdefault(name, []).append(sums[name])
            self._total[name] = (
                self._total.get(name, 0.0) + float(np.prod(value.shape))
            )

    def get_logs(self, label: str = "near_zero_fraction") -> dict[str, float]:
        import jax

        counts = jax.device_get(self._near_zero)
        # per-window partials are [B, T] (windows may differ in T); sum
        # each in f64 on the host
        return {
            f"{label}/{name}": float(
                sum(np.asarray(c, np.float64).sum() for c in counts[name])
            ) / self._total[name]
            for name in counts
        }
