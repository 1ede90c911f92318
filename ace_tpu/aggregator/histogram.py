"""Dynamic histograms and annual-mean aggregation
(reference: fme/core/histogram.py:121 DynamicHistogram,
fme/ace/aggregator/inference/annual.py GlobalMeanAnnualAggregator).
"""

import numpy as np

from ace_tpu.core.gridded_ops import GriddedOperations
from ace_tpu.core.typing_ import TensorMapping
from ace_tpu.data.time import TimeCoord

EPSILON = 1e-8


class DynamicHistogram:
    """Fixed-bin-count histogram that doubles its range to cover new values
    (reference: fme/core/histogram.py:121).
    """

    def __init__(self, n_bins: int = 300):
        self._n_bins = n_bins
        self.bin_edges: np.ndarray | None = None
        self.counts = np.zeros(n_bins, dtype=np.int64)

    def add(self, value: np.ndarray):
        value = np.asarray(value).ravel()
        value = value[np.isfinite(value)]
        if value.size == 0:
            return
        vmin = float(value.min()) - EPSILON
        vmax = float(value.max()) + EPSILON
        if self.bin_edges is None:
            self.bin_edges = np.linspace(vmin, vmax, self._n_bins + 1)
        else:
            while vmin < self.bin_edges[0]:
                self._double_size_left()
            while vmax > self.bin_edges[-1]:
                self._double_size_right()
        counts, _ = np.histogram(value, bins=self.bin_edges)
        self.counts += counts

    def _combine_bins(self):
        """Halve resolution: pairwise-sum counts into n_bins/2 bins."""
        half = self.counts[: 2 * (self._n_bins // 2)].reshape(-1, 2).sum(1)
        return half

    def _double_size_left(self):
        assert self.bin_edges is not None
        width = self.bin_edges[-1] - self.bin_edges[0]
        new_edges = np.linspace(
            self.bin_edges[0] - width, self.bin_edges[-1], self._n_bins + 1
        )
        new_counts = np.zeros(self._n_bins, dtype=np.int64)
        new_counts[self._n_bins // 2 :] = self._combine_bins()
        self.bin_edges, self.counts = new_edges, new_counts

    def _double_size_right(self):
        assert self.bin_edges is not None
        width = self.bin_edges[-1] - self.bin_edges[0]
        new_edges = np.linspace(
            self.bin_edges[0], self.bin_edges[-1] + width, self._n_bins + 1
        )
        new_counts = np.zeros(self._n_bins, dtype=np.int64)
        new_counts[: self._n_bins // 2] = self._combine_bins()
        self.bin_edges, self.counts = new_edges, new_counts

    def percentile(self, q: float) -> float:
        """Value at percentile q (0-100) via linear interpolation within
        the containing bin (reference fme/core/histogram.py quantile():
        c0 + (c1-c0)*(p-p0)/(p1-p0); bins can be wide after range
        doublings, so the right-edge alone is biased by up to a bin)."""
        if self.bin_edges is None or self.counts.sum() == 0:
            return float("nan")
        target = q / 100.0
        cdf = np.cumsum(self.counts) / self.counts.sum()
        idx = int(np.searchsorted(cdf, target))
        idx = min(idx, self._n_bins - 1)
        p1 = cdf[idx]
        p0 = cdf[idx - 1] if idx > 0 else 0.0
        c0, c1 = self.bin_edges[idx], self.bin_edges[idx + 1]
        if p1 <= p0:
            return float(c1)
        return float(c0 + (c1 - c0) * (target - p0) / (p1 - p0))


class HistogramAggregator:
    """Per-variable dynamic histograms over generated (and, when
    provided, target) values with tail-percentile metrics (reference:
    fme/core/histogram.py ComparedDynamicTailsHistograms).

    Variables default to upper-tailed; ``two_tailed_variables`` emit both
    the p-th and (100-p)-th percentiles and ``left_tailed_variables``
    only the lower tail. When targets are recorded,
    ``prediction_frac_of_target/...`` ratios are emitted per percentile
    (the reference's histogram-tail checkpoint-selection metric).
    """

    def __init__(self, n_bins: int = 300,
                 percentiles: list[float] | None = None,
                 two_tailed_variables: list[str] | None = None,
                 left_tailed_variables: list[str] | None = None,
                 default_tail: str = "upper"):
        self._hists: dict[str, DynamicHistogram] = {}
        self._target_hists: dict[str, DynamicHistogram] = {}
        self._n_bins = n_bins
        self._percentiles = percentiles or [99.9999]
        self._two_tailed = set(two_tailed_variables or [])
        self._left_tailed = set(left_tailed_variables or [])
        self._default_tail = default_tail

    def record_batch(self, gen: TensorMapping, target=None):
        for name, value in gen.items():
            if name not in self._hists:
                self._hists[name] = DynamicHistogram(self._n_bins)
            self._hists[name].add(np.asarray(value))
        if target is not None:
            for name, value in target.items():
                if name not in gen:
                    continue
                if name not in self._target_hists:
                    self._target_hists[name] = DynamicHistogram(self._n_bins)
                self._target_hists[name].add(np.asarray(value))

    def _tail_percentiles(self, name: str) -> list[float]:
        if name in self._two_tailed:
            tails = ("upper", "lower")
        elif name in self._left_tailed:
            tails = ("lower",)
        else:
            tails = (self._default_tail,) if self._default_tail != "both" \
                else ("upper", "lower")
        qs = []
        for q in self._percentiles:
            if "upper" in tails:
                qs.append(q)
            if "lower" in tails:
                qs.append(100.0 - q)
        return qs

    def get_logs(self, label: str = "histogram") -> dict[str, float]:
        logs = {}
        for name, hist in self._hists.items():
            for q in self._tail_percentiles(name):
                key = f"{label}/{q:g}th-percentile/{name}"
                logs[key] = hist.percentile(q)
                tgt = self._target_hists.get(name)
                if tgt is not None:
                    tval = tgt.percentile(q)
                    logs[
                        f"{label}/prediction_frac_of_target/"
                        f"{q:g}th-percentile/{name}"
                    ] = logs[key] / tval if tval != 0 else float("nan")
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        out = {}
        for name, hist in self._hists.items():
            if hist.bin_edges is not None:
                out[f"counts-{name}"] = hist.counts
                out[f"bin_edges-{name}"] = hist.bin_edges
        for name, hist in self._target_hists.items():
            if hist.bin_edges is not None:
                out[f"target_counts-{name}"] = hist.counts
                out[f"target_bin_edges-{name}"] = hist.bin_edges
        return out


class GlobalMeanAnnualAggregator:
    """Area-weighted global means grouped by calendar year
    (reference: fme/ace/aggregator/inference/annual.py:169). Incomplete
    first/last years (fewer than ~350 days of samples) are excluded
    from the logged means (reference _get_min_samples, annual.py:418),
    and paired target data yields an annual RMSE over complete years.
    """

    # a year counts as complete with >= this many days of samples
    MIN_COMPLETE_YEAR_DAYS = 350.0

    def __init__(self, ops: GriddedOperations,
                 timestep_seconds: float | None = None,
                 monthly_reference: "dict[str, dict[int, float]] | None"
                 = None):
        self._ops = ops
        self._timestep_seconds = timestep_seconds
        self._sums: dict[str, dict[int, float]] = {}
        self._counts: dict[str, dict[int, int]] = {}
        self._target_sums: dict[str, dict[int, float]] = {}
        self._pending: list = []
        self._compute = None
        # per-variable {year: reference annual global mean} from an
        # offline monthly-means dataset (reference: annual.py:285
        # process_monthly_reference -> get_r2 at :128-142)
        self._reference = monthly_reference or {}

    def record_batch(self, gen: TensorMapping, time: TimeCoord,
                     target=None):
        years = time.components()["year"]  # [batch, n_time]
        if self._timestep_seconds is None and time.values.shape[-1] > 1:
            self._timestep_seconds = float(
                (time.values[..., 1] - time.values[..., 0]).ravel()[0]
                / 1e6
            )
        # keep the per-window global means device-resident (one jitted
        # program per window); the year bucketing runs at finalization
        # after ONE batched D2H transfer (blocking reads / eager ops in
        # record_batch — see aggregator/inference.py docstring)
        if self._compute is None:
            import jax

            def compute(gen, target):
                return (
                    {name: self._ops.area_weighted_mean(v, name=name)
                     for name, v in gen.items()},  # each [batch, n_time]
                    {name: self._ops.area_weighted_mean(v, name=name)
                     for name, v in (target or {}).items() if name in gen},
                )

            self._compute = jax.jit(compute)
        g, t = self._compute(
            dict(gen), dict(target) if target is not None else None
        )
        self._pending.append(
            {"years": np.asarray(years), "gen": g, "target": t}
        )

    def _drain(self):
        if not self._pending:
            return
        import jax

        for window in jax.device_get(self._pending):
            years = window["years"]
            for name, gm in window["gen"].items():
                sums = self._sums.setdefault(name, {})
                counts = self._counts.setdefault(name, {})
                for year in np.unique(years):
                    mask = years == year
                    sums[int(year)] = sums.get(int(year), 0.0) + float(
                        gm[mask].sum()
                    )
                    counts[int(year)] = counts.get(int(year), 0) + int(
                        mask.sum()
                    )
            for name, gm in window["target"].items():
                tsums = self._target_sums.setdefault(name, {})
                for year in np.unique(years):
                    mask = years == year
                    tsums[int(year)] = tsums.get(int(year), 0.0) + float(
                        gm[mask].sum()
                    )
        self._pending = []

    def _min_samples(self) -> float:
        if not self._timestep_seconds:
            return 0.0
        return self.MIN_COMPLETE_YEAR_DAYS * 86400.0 / (
            self._timestep_seconds
        )

    def _complete_years(self, name: str) -> list[int]:
        min_samples = self._min_samples()
        return sorted(
            y for y, c in self._counts[name].items() if c > min_samples
        )

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        for name, sums in self._sums.items():
            years = sorted(sums)
            out[f"annual_mean-{name}"] = np.asarray(
                [sums[y] / self._counts[name][y] for y in years]
            )
            out[f"annual_mean_years-{name}"] = np.asarray(years)
            if name in self._target_sums:
                tsums = self._target_sums[name]
                out[f"annual_mean_target-{name}"] = np.asarray([
                    tsums.get(y, np.nan) / self._counts[name][y]
                    for y in years
                ])
        return out

    def get_logs(self, label: str = "annual") -> dict[str, float]:
        self._drain()
        logs = {}
        for name, sums in self._sums.items():
            years = self._complete_years(name)
            if years:
                logs[f"{label}/mean/{name}"] = float(
                    np.mean([
                        sums[y] / self._counts[name][y] for y in years
                    ])
                )
                tsums = self._target_sums.get(name)
                if tsums:
                    paired = [y for y in years if y in tsums]
                    if paired:
                        diffs = [
                            (sums[y] - tsums[y]) / self._counts[name][y]
                            for y in paired
                        ]
                        logs[f"{label}/rmse/{name}"] = float(
                            np.sqrt(np.mean(np.square(diffs)))
                        )
                ref = self._reference.get(name)
                if ref:
                    gen_means = {
                        y: sums[y] / self._counts[name][y] for y in years
                    }
                    r2 = _get_r2(gen_means, ref)
                    if r2 is not None:
                        logs[f"{label}/r2/{name}_gen"] = r2
                    tsums = self._target_sums.get(name)
                    if tsums:
                        t_means = {
                            y: tsums[y] / self._counts[name][y]
                            for y in years if y in tsums
                        }
                        r2_t = _get_r2(t_means, ref)
                        if r2_t is not None:
                            logs[f"{label}/r2/{name}_target"] = r2_t
        return logs


def _get_r2(series: dict[int, float],
            reference: dict[int, float]) -> float | None:
    """R2 of an annual series vs the reference series over shared years
    (reference: fme/ace/aggregator/inference/annual.py get_r2)."""
    years = sorted(set(series) & set(reference))
    if len(years) < 2:
        return None
    pred = np.asarray([series[y] for y in years], dtype=np.float64)
    ref = np.asarray([reference[y] for y in years], dtype=np.float64)
    ss_ref = np.sum((ref - ref.mean()) ** 2)
    ss_res = np.sum((ref - pred) ** 2)
    if ss_ref == 0.0:
        return None
    return float(1.0 - ss_res / ss_ref)
