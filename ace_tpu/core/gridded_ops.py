"""Grid-aware reduction operations (reference: fme/core/gridded_ops.py).

``GriddedOperations`` abstracts "reduce over the horizontal grid" so that
metrics, correctors and losses are grid-agnostic (lat-lon vs HEALPix).
Reductions operate over the last two axes for lat-lon data.
"""

import abc
from typing import Any, Callable

import jax.numpy as jnp

from ace_tpu.core import metrics
from ace_tpu.core.typing_ import TensorDict, TensorMapping


class GriddedOperations(abc.ABC):
    def __eq__(self, other) -> bool:
        if not isinstance(other, GriddedOperations):
            return False
        return self.get_state() == other.get_state()

    @property
    @abc.abstractmethod
    def zonal_mean(self) -> Callable[[jnp.ndarray], jnp.ndarray] | None: ...

    @abc.abstractmethod
    def area_weighted_sum(self, data, keepdim: bool = False,
                          name: str | None = None) -> jnp.ndarray: ...

    @abc.abstractmethod
    def area_weighted_mean(self, data, keepdim: bool = False,
                           name: str | None = None) -> jnp.ndarray: ...

    def area_weighted_sum_dict(self, data: TensorMapping) -> TensorDict:
        return {k: self.area_weighted_sum(v, name=k) for k, v in data.items()}

    def area_weighted_mean_dict(self, data: TensorMapping) -> TensorDict:
        return {k: self.area_weighted_mean(v, name=k) for k, v in data.items()}

    def area_weighted_mean_bias(self, truth, predicted, name=None):
        return self.area_weighted_mean(predicted - truth, name=name)

    def area_weighted_mean_bias_dict(
        self, truth: TensorMapping, predicted: TensorMapping
    ) -> TensorDict:
        return {
            k: self.area_weighted_mean_bias(truth[k], predicted[k], name=k)
            for k in truth
        }

    def area_weighted_rmse(self, truth, predicted, name=None):
        return jnp.sqrt(
            self.area_weighted_mean((predicted - truth) ** 2, name=name)
        )

    def area_weighted_rmse_dict(
        self, truth: TensorMapping, predicted: TensorMapping
    ) -> TensorDict:
        return {
            k: self.area_weighted_rmse(truth[k], predicted[k], name=k)
            for k in truth
        }

    def area_weighted_std(self, data, name=None):
        mean = self.area_weighted_mean(data, keepdim=True, name=name)
        return jnp.sqrt(
            self.area_weighted_mean((data - mean) ** 2, name=name)
        )

    def area_weighted_std_dict(self, data: TensorMapping) -> TensorDict:
        return {k: self.area_weighted_std(v, name=k) for k, v in data.items()}

    @abc.abstractmethod
    def area_weighted_gradient_magnitude_percent_diff(
        self, truth, predicted, name=None
    ): ...

    def area_weighted_gradient_magnitude_percent_diff_dict(
        self, truth: TensorMapping, predicted: TensorMapping
    ) -> TensorDict:
        return {
            k: self.area_weighted_gradient_magnitude_percent_diff(
                truth[k], predicted[k], name=k
            )
            for k in truth
        }

    @abc.abstractmethod
    def get_state(self) -> dict[str, Any]: ...

    @classmethod
    def from_state(cls, state: dict[str, Any]) -> "GriddedOperations":
        for subclass in _all_subclasses(cls):
            if subclass.__name__ == state["type"]:
                return subclass(**subclass_init_kwargs(subclass, state["state"]))
        raise ValueError(f"Unknown GriddedOperations type {state['type']}")


def _all_subclasses(cls):
    out = []
    for sub in cls.__subclasses__():
        out.append(sub)
        out.extend(_all_subclasses(sub))
    return out


def subclass_init_kwargs(subclass, state):
    import numpy as np

    def convert(v):
        if isinstance(v, list):
            return np.asarray(v)
        if isinstance(v, dict):
            return {k: convert(x) for k, x in v.items()}
        return v

    return {k: convert(v) for k, v in state.items()}


class LatLonOperations(GriddedOperations):
    """Reductions over the last two (lat, lon) axes with cos-lat area
    weights (reference: fme/core/gridded_ops.py:284).
    """

    HORIZONTAL_DIMS = (-2, -1)

    def __init__(self, area_weights, spatial_masks: TensorMapping | None = None):
        self._area_weights = jnp.asarray(area_weights)
        self._spatial_masks = (
            {k: jnp.asarray(v) for k, v in spatial_masks.items()}
            if spatial_masks
            else None
        )

    @property
    def area_weights(self) -> jnp.ndarray:
        return self._area_weights

    def _weights_for(self, name: str | None) -> jnp.ndarray:
        if (
            self._spatial_masks is not None
            and name is not None
            and name in self._spatial_masks
        ):
            return self._area_weights * self._spatial_masks[name]
        return self._area_weights

    @property
    def zonal_mean(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        return lambda data: jnp.mean(data, axis=-1)

    def area_weighted_sum(self, data, keepdim: bool = False, name=None):
        return metrics.weighted_sum(
            data, self._weights_for(name), dim=self.HORIZONTAL_DIMS,
            keepdim=keepdim,
        )

    def area_weighted_mean(self, data, keepdim: bool = False, name=None):
        return metrics.weighted_mean(
            data, self._weights_for(name), dim=self.HORIZONTAL_DIMS,
            keepdim=keepdim,
        )

    def regional_area_weighted_mean(self, data, regional_mask, keepdim=False,
                                    name=None):
        return metrics.weighted_mean(
            data, self._weights_for(name) * regional_mask,
            dim=self.HORIZONTAL_DIMS, keepdim=keepdim,
        )

    def area_weighted_gradient_magnitude_percent_diff(
        self, truth, predicted, name=None
    ):
        return metrics.gradient_magnitude_percent_diff(
            truth, predicted, self._weights_for(name), dim=self.HORIZONTAL_DIMS
        )

    def get_state(self) -> dict[str, Any]:
        import numpy as np

        state: dict[str, Any] = {
            "area_weights": np.asarray(self._area_weights).tolist()
        }
        if self._spatial_masks is not None:
            state["spatial_masks"] = {
                k: np.asarray(v).tolist() for k, v in self._spatial_masks.items()
            }
        return {"type": type(self).__name__, "state": state}
