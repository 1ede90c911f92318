"""ENSO (Nino3.4) and IPO index aggregators
(reference: fme/ace/aggregator/inference/enso/ and IPO index aggregators).

The Nino3.4 index is the regional-mean SST anomaly over 5S-5N, 170W-120W;
the IPO (tripole) index combines three Pacific regions. Anomalies are
relative to the aggregated time mean. When target data is present, the
correlation between generated and target index series is reported.
"""

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import LatLonCoordinates
from ace_tpu.core.typing_ import TensorMapping

NINO34 = dict(lat=(-5.0, 5.0), lon=(190.0, 240.0))  # 170W-120W
IPO_REGIONS = [
    dict(lat=(25.0, 45.0), lon=(140.0, 215.0), weight=-0.5),
    dict(lat=(-10.0, 10.0), lon=(170.0, 270.0), weight=1.0),
    dict(lat=(-50.0, -15.0), lon=(150.0, 200.0), weight=-0.5),
]


def _region_mask(coords: LatLonCoordinates, lat, lon):
    lat_bounds, lon_bounds = lat, lon
    lat = np.asarray(coords.lat)
    lon = np.asarray(coords.lon) % 360.0
    lat_in = (lat >= lat_bounds[0]) & (lat <= lat_bounds[1])
    lo, hi = lon_bounds[0] % 360.0, lon_bounds[1] % 360.0
    if lo <= hi:
        lon_in = (lon >= lo) & (lon <= hi)
    else:
        lon_in = (lon >= lo) | (lon <= hi)
    mask = lat_in[:, None] & lon_in[None, :]
    weights = np.cos(np.deg2rad(lat))[:, None] * mask
    return weights / max(weights.sum(), 1e-12)


class EnsoIndexAggregator:
    """Streams regional-mean SST; index = series - its own time mean
    (reference: fme/ace/aggregator/inference/enso/index.py).
    """

    def __init__(self, coords: LatLonCoordinates,
                 sst_name: str = "surface_temperature",
                 running_mean_n_months: int = 5):
        self._weights = _region_mask(coords, **NINO34)
        self._sst_name = sst_name
        self._running_mean_n_months = running_mean_n_months
        self._gen: list[np.ndarray] = []
        self._target: list[np.ndarray] = []
        self._years: list[np.ndarray] = []
        self._months: list[np.ndarray] = []
        self._compute = None

    def record_batch(self, gen: TensorMapping,
                     target: TensorMapping | None = None, time=None):
        if self._sst_name not in gen:
            return
        # regional contraction on device (jitted); the small [B, T]
        # series stay device-resident until finalization (one batched
        # D2H — see aggregator/inference.py docstring)
        if self._compute is None:
            import jax

            w = jnp.asarray(self._weights, jnp.float32)
            self._compute = jax.jit(
                lambda x: jnp.tensordot(
                    jnp.asarray(x), w, axes=([-2, -1], [0, 1])
                )
            )
        self._gen.append(self._compute(gen[self._sst_name]))
        if time is not None:
            comps = time.components()
            self._years.append(np.atleast_2d(comps["year"])[0])
            self._months.append(np.atleast_2d(comps["month"])[0])
        if target is not None and self._sst_name in target:
            self._target.append(self._compute(target[self._sst_name]))

    def _drain(self):
        import jax

        self._gen = jax.device_get(self._gen)
        self._target = jax.device_get(self._target)

    def _index(self, chunks):
        """Anomalies vs the per-calendar-month climatology followed by a
        5-month running monthly mean (reference
        inference/enso/dynamic_index.py RegionalIndexAggregator via
        anomalies_from_monthly_climo + running_monthly_mean). Without
        the climatology step the 'index' would mostly measure the SST
        seasonal cycle. Falls back to mean removal when no times were
        recorded."""
        series = np.concatenate(chunks, axis=-1)  # [B, T_total]
        if not self._months:
            return series - series.mean(axis=-1, keepdims=True)
        months = np.concatenate(self._months)[: series.shape[-1]]
        years = np.concatenate(self._years)[: series.shape[-1]]
        series = series[..., : len(months)].astype(np.float64)
        anom = series.copy()
        for m in range(1, 13):
            sel = months == m
            if sel.any():
                anom[..., sel] -= series[..., sel].mean(
                    axis=-1, keepdims=True
                )
        # monthly means, then a trailing n-month running mean
        keys = years * 12 + (months - 1)
        uniq = np.unique(keys)
        monthly = np.stack(
            [anom[..., keys == k].mean(axis=-1) for k in uniq], axis=-1
        )
        n = self._running_mean_n_months
        if monthly.shape[-1] < n:
            return monthly
        running = np.stack(
            [
                monthly[..., i - n + 1 : i + 1].mean(axis=-1)
                for i in range(n - 1, monthly.shape[-1])
            ],
            axis=-1,
        )
        return running

    def get_logs(self, label: str = "enso") -> dict[str, float]:
        if not self._gen:
            return {}
        self._drain()
        logs = {}
        gen_idx = self._index(self._gen)
        logs[f"{label}/index_std"] = float(gen_idx.std())
        if self._target:
            tgt_idx = self._index(self._target)
            n = min(gen_idx.shape[-1], tgt_idx.shape[-1])
            g, t = gen_idx[..., :n].ravel(), tgt_idx[..., :n].ravel()
            denom = g.std() * t.std()
            if denom > 0:
                logs[f"{label}/index_correlation"] = float(
                    np.mean((g - g.mean()) * (t - t.mean())) / denom
                )
        return logs

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        self._drain()
        out = {}
        if self._gen:
            out["gen_index"] = self._index(self._gen)
        if self._target:
            out["target_index"] = self._index(self._target)
        return out


class IpoIndexAggregator:
    """IPO tripole index from three Pacific SST regions
    (reference: fme/ace/aggregator/inference IPO index).
    """

    def __init__(self, coords: LatLonCoordinates,
                 sst_name: str = "surface_temperature"):
        self._weights = [
            (_region_mask(coords, r["lat"], r["lon"]), r["weight"])
            for r in IPO_REGIONS
        ]
        self._compute = None
        self._sst_name = sst_name
        self._gen: list[np.ndarray] = []

    def record_batch(self, gen: TensorMapping, target=None, time=None):
        if self._sst_name not in gen:
            return
        if self._compute is None:
            import jax

            masks = [(jnp.asarray(m, jnp.float32), w)
                     for m, w in self._weights]
            self._compute = jax.jit(lambda g: sum(
                w * jnp.tensordot(jnp.asarray(g), m,
                                  axes=([-2, -1], [0, 1]))
                for m, w in masks
            ))
        self._gen.append(self._compute(gen[self._sst_name]))

    def get_diagnostics(self) -> dict[str, np.ndarray]:
        if not self._gen:
            return {}
        import jax

        self._gen = jax.device_get(self._gen)
        series = np.concatenate(self._gen, axis=-1)
        return {"ipo_index": series - series.mean(axis=-1, keepdims=True)}
