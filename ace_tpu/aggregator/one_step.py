"""One-step validation aggregator: per-variable RMSE/bias/gradient-
magnitude metrics and snapshot maps for single-step predictions
(reference: fme/ace/aggregator/one_step/main.py:47 OneStepAggregator).
"""

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.gridded_ops import GriddedOperations
from ace_tpu.core.typing_ import TensorMapping


class OneStepAggregator:
    def __init__(self, ops: GriddedOperations,
                 record_snapshots: bool = True):
        self._ops = ops
        self._sums: dict[str, float] = {}
        self._counts: dict[str, int] = {}
        self._snapshots: dict[str, np.ndarray] = {}
        self._record_snapshots = record_snapshots

    def record_batch(self, gen: TensorMapping, target: TensorMapping):
        """gen/target: [batch, (time,) lat, lon] per variable."""
        for name in gen:
            if name not in target:
                continue
            g, t = gen[name], target[name]
            metrics = {
                f"rmse/{name}": float(jnp.mean(
                    self._ops.area_weighted_rmse(t, g, name=name)
                )),
                f"bias/{name}": float(jnp.mean(
                    self._ops.area_weighted_mean_bias(t, g, name=name)
                )),
                f"gradient_magnitude_percent_diff/{name}": float(jnp.mean(
                    self._ops.area_weighted_gradient_magnitude_percent_diff(
                        t, g, name=name
                    )
                )),
            }
            for k, v in metrics.items():
                self._sums[k] = self._sums.get(k, 0.0) + v
                self._counts[k] = self._counts.get(k, 0) + 1
            if self._record_snapshots and name not in self._snapshots:
                g0 = np.asarray(g)
                t0 = np.asarray(t)
                while g0.ndim > 2:
                    g0, t0 = g0[0], t0[0]
                self._snapshots[f"snapshot/gen/{name}"] = g0
                self._snapshots[f"snapshot/error/{name}"] = g0 - t0

    def get_logs(self, label: str = "one_step") -> dict[str, float]:
        return {
            f"{label}/{k}": self._sums[k] / self._counts[k]
            for k in self._sums
        }

    def get_snapshots(self) -> dict[str, np.ndarray]:
        return dict(self._snapshots)
