"""One-step validation aggregator: per-variable RMSE/bias/gradient-
magnitude metrics and snapshot maps for single-step predictions
(reference: fme/ace/aggregator/one_step/main.py:47 OneStepAggregator).

record_batch keeps every per-batch reduction device-resident (pending
list) and materializes them in one parallel D2H transfer at get_logs /
flush time — a blocking read per metric per batch costs a device round
trip each (see aggregator/inference.py docstring), which serializes the
validation loop against the device queue.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.gridded_ops import GriddedOperations
from ace_tpu.core.typing_ import TensorMapping


class OneStepAggregator:
    def __init__(self, ops: GriddedOperations,
                 record_snapshots: bool = True,
                 record_mean_maps: bool = False):
        self._ops = ops
        self._sums: dict[str, float] = {}
        self._counts: dict[str, int] = {}
        self._snapshots: dict[str, np.ndarray] = {}
        self._record_snapshots = record_snapshots
        self._record_mean_maps = record_mean_maps
        self._map_sums: dict[str, np.ndarray] = {}
        self._map_counts: dict[str, int] = {}
        self._pending: list = []
        self._compute = jax.jit(self._compute_impl)

    def _compute_impl(self, gen, target):
        batch: dict = {"metrics": {}, "snapshots": {}, "maps": {}}
        for name in gen:
            if name not in target:
                continue
            g, t = gen[name], target[name]
            batch["metrics"].update({
                f"rmse/{name}": jnp.mean(
                    self._ops.area_weighted_rmse(t, g, name=name)
                ),
                f"bias/{name}": jnp.mean(
                    self._ops.area_weighted_mean_bias(t, g, name=name)
                ),
                f"gradient_magnitude_percent_diff/{name}": jnp.mean(
                    self._ops.area_weighted_gradient_magnitude_percent_diff(
                        t, g, name=name
                    )
                ),
            })
            if self._record_snapshots:
                # last batch wins at drain time (records in batch order)
                g0, t0 = jnp.asarray(g), jnp.asarray(t)
                while g0.ndim > 2:
                    g0, t0 = g0[0], t0[0]
                batch["snapshots"][name] = (g0, g0 - t0)
            if self._record_mean_maps:
                g_map = jnp.mean(
                    jnp.asarray(g).reshape((-1,) + g.shape[-2:]), axis=0
                )
                t_map = jnp.mean(
                    jnp.asarray(t).reshape((-1,) + t.shape[-2:]), axis=0
                )
                batch["maps"][name] = (g_map, g_map - t_map)
        return batch

    def record_batch(self, gen: TensorMapping, target: TensorMapping):
        """gen/target: [batch, (time,) lat, lon] per variable."""
        self._pending.append(self._compute(dict(gen), dict(target)))

    def _drain(self):
        if not self._pending:
            return
        import jax

        for batch in jax.device_get(self._pending):
            for k, v in batch["metrics"].items():
                self._sums[k] = self._sums.get(k, 0.0) + float(v)
                self._counts[k] = self._counts.get(k, 0) + 1
            for name, (g0, err) in batch["snapshots"].items():
                self._snapshots[f"snapshot/gen/{name}"] = g0
                self._snapshots[f"snapshot/error/{name}"] = err
            for name, (g_map, bias_map) in batch["maps"].items():
                self._map_sums[f"gen_map-{name}"] = (
                    self._map_sums.get(f"gen_map-{name}", 0.0) + g_map
                )
                self._map_sums[f"bias_map-{name}"] = (
                    self._map_sums.get(f"bias_map-{name}", 0.0) + bias_map
                )
                self._map_counts[name] = self._map_counts.get(name, 0) + 1
        self._pending = []

    def get_logs(self, label: str = "one_step") -> dict[str, float]:
        self._drain()
        return {
            f"{label}/{k}": self._sums[k] / self._counts[k]
            for k in self._sums
        }

    def get_snapshots(self) -> dict[str, np.ndarray]:
        self._drain()
        return dict(self._snapshots)

    def flush_diagnostics(self, output_dir: str):
        """Write per-epoch validation diagnostics: scalar means
        (mean_diagnostics.nc), first-batch snapshots
        (snapshot_diagnostics.nc), and batch-mean maps
        (mean_map_diagnostics.nc) — the reference's
        save_per_epoch_diagnostics layout (fme/core/generics/trainer.py
        validation output dirs, fme/ace/test_ocean_train.py:134-151)."""
        import os

        from ace_tpu.data.store import write_h5

        self._drain()
        os.makedirs(output_dir, exist_ok=True)
        groups: dict[str, dict[str, np.ndarray]] = {
            "mean": {
                k.replace("/", "-"): np.asarray(
                    self._sums[k] / self._counts[k]
                )
                for k in self._sums
            },
        }
        if self._snapshots:
            groups["snapshot"] = {
                k.replace("/", "-"): v for k, v in self._snapshots.items()
            }
        if self._map_sums:
            groups["mean_map"] = {
                k: v / self._map_counts[k.split("-", 1)[1]]
                for k, v in self._map_sums.items()
            }
        for label, diags in groups.items():
            if not diags:
                continue
            write_h5(
                os.path.join(output_dir, f"{label}_diagnostics.nc"),
                {k: np.asarray(v) for k, v in diags.items()},
                {k: tuple(f"dim{i}" for i in range(np.ndim(v)))
                 for k, v in diags.items()},
            )


class EnsembleOneStepAggregator:
    """One-step ensemble validation metrics
    (reference: fme/ace/aggregator/one_step/ensemble.py CRPSMetric,
    EnsembleMeanRMSEMetric, SSRBiasMetric).

    record_batch(gen [B, E, ...spatial], target [B, ...spatial]):
    accumulates almost-fair CRPS, ensemble-mean RMSE, and the
    spread-skill-ratio bias (stdev / unbiased-RMSE - 1; 0 is perfectly
    calibrated).
    """

    def __init__(self, ops: GriddedOperations):
        self._ops = ops
        self._crps: dict[str, float] = {}
        self._mse: dict[str, float] = {}
        self._mse_map: dict[str, np.ndarray] = {}
        self._var_map: dict[str, np.ndarray] = {}
        self._n_ens: int | None = None
        self._count = 0
        self._pending: list = []
        self._compute = jax.jit(self._compute_impl)

    # zero-spread cells whose unbiased MSE is below this fraction of the
    # field's largest MSE are prescribed (reference ensemble.py:20)
    _PRESCRIBED_MSE_RTOL = 1e-6

    def _compute_impl(self, gen, target):
        from ace_tpu.core.loss import get_crps

        batch: dict = {}
        for name in gen:
            if name not in target:
                continue
            g = jnp.asarray(gen[name])  # [B, E, ...]
            t = jnp.asarray(target[name])  # [B, ...]
            self._n_ens = g.shape[1]
            mean = jnp.mean(g, axis=1)
            # per-cell maps: the SSR is spread/skill per grid cell, then
            # averaged (reference SSRBiasMetric keeps the spatial dims;
            # a ratio of global means differs wherever spread/skill vary
            # spatially, e.g. half-prescribed fields)
            batch[name] = {
                "crps": jnp.mean(get_crps(g, t[:, None], alpha=0.95)),
                "mse_map": jnp.mean((mean - t) ** 2, axis=0),
                "var_map": jnp.mean(jnp.var(g, axis=1, ddof=1), axis=0),
                "scalar_mse": jnp.mean(
                    self._ops.area_weighted_mean((mean - t) ** 2, name=name)
                ),
            }
        return batch

    def record_batch(self, gen: TensorMapping, target: TensorMapping):
        self._count += 1
        self._pending.append(self._compute(dict(gen), dict(target)))

    def _drain(self):
        if not self._pending:
            return
        import jax

        for batch in jax.device_get(self._pending):
            for name, entry in batch.items():
                self._crps[name] = (
                    self._crps.get(name, 0.0) + float(entry["crps"])
                )
                self._mse[name] = (
                    self._mse.get(name, 0.0) + float(entry["scalar_mse"])
                )
                self._mse_map[name] = (
                    self._mse_map.get(name, 0.0) + entry["mse_map"]
                )
                self._var_map[name] = (
                    self._var_map.get(name, 0.0) + entry["var_map"]
                )
        self._pending = []

    def _ssr_bias_map(self, name: str) -> np.ndarray:
        """(reference ensemble.py:110-173 SSRBiasMetric.get)."""
        n_ens = max(self._n_ens or 1, 1)
        total_var = self._var_map[name]
        total_umse = self._mse_map[name] - total_var / n_ens
        spread = np.sqrt(total_var)
        skill = np.sqrt(np.clip(total_umse, 0.0, None))
        ssr = np.where(skill > 0, spread / np.maximum(skill, 1e-300) - 1.0,
                       -1.0)
        # prescribed cells (zero spread, ~zero error) report 0
        mse_floor = self._PRESCRIBED_MSE_RTOL * float(
            np.max(np.square(skill), initial=0.0)
        )
        prescribed = (total_var == 0) & (total_umse <= mse_floor)
        return np.where(prescribed, 0.0, ssr)

    def get_logs(self, label: str = "ensemble") -> dict[str, float]:
        self._drain()
        logs = {}
        n = max(self._count, 1)
        for name in self._crps:
            mse = self._mse[name] / n
            logs[f"{label}/crps/{name}"] = self._crps[name] / n
            logs[f"{label}/rmse_of_ensemble_mean/{name}"] = mse**0.5
            logs[f"{label}/spread_skill_ratio_bias/{name}"] = float(
                np.mean(self._ssr_bias_map(name))
            )
        return logs
