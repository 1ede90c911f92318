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

    def area_weighted_mean_channels_last(self, data) -> jnp.ndarray:
        """Area-weighted spatial mean of a channels-LAST tensor
        [..., *spatial, C] -> [..., C] (the packed layout the losses
        see); layout-aware across lat-lon and HEALPix grids."""
        moved = jnp.moveaxis(data, -1, 0)
        out = self.area_weighted_mean(moved)
        return jnp.moveaxis(out, 0, -1)

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

    def __init__(self, area_weights, spatial_masks: TensorMapping | None = None,
                 mask_provider=None):
        """``spatial_masks`` are exact-name keyed masks; ``mask_provider``
        (a core.masking.MaskProvider) resolves masks with the reference's
        name > level-suffix > mask_2d priority and multiplies them into the
        area weights so masked cells get zero weight in every scalar metric
        (reference: fme/core/gridded_ops.py:271 _spatial_mask_area_weights).
        """
        self._area_weights = jnp.asarray(area_weights)
        self._spatial_masks = (
            {k: jnp.asarray(v) for k, v in spatial_masks.items()}
            if spatial_masks
            else None
        )
        self._mask_provider = mask_provider
        self._provider_cache: dict[str, jnp.ndarray | None] = {}

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
        if self._mask_provider is not None and name is not None:
            if name not in self._provider_cache:
                import numpy as np

                mask = self._mask_provider.get_mask_for(name)
                # cache in NUMPY: this runs inside jit traces, where any
                # jnp value (even one built from constants) is a tracer
                # belonging to that trace — caching it across calls
                # would leak it into later traces
                self._provider_cache[name] = (
                    np.asarray(self._area_weights) * np.asarray(mask)
                    if mask is not None else None
                )
            cached = self._provider_cache[name]
            if cached is not None:
                return jnp.asarray(cached)
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


class HEALPixOperations(GriddedOperations):
    """Reductions over (face, height, width); HEALPix pixels are
    equal-area so plain means/sums suffice
    (reference: fme/core/gridded_ops.py:463 HEALPixOperations).
    """

    HORIZONTAL_DIMS = (-3, -2, -1)

    def __init__(self, nside: int | None = None):
        self.nside = nside

    @property
    def zonal_mean(self) -> None:
        return None

    def area_weighted_sum(self, data, keepdim: bool = False, name=None):
        return jnp.sum(data, axis=self.HORIZONTAL_DIMS, keepdims=keepdim)

    def area_weighted_mean(self, data, keepdim: bool = False, name=None):
        return jnp.mean(data, axis=self.HORIZONTAL_DIMS, keepdims=keepdim)

    def regional_area_weighted_mean(self, data, regional_mask,
                                    keepdim=False, name=None):
        raise NotImplementedError(
            "regional means are not implemented for HEALPix"
        )

    def area_weighted_gradient_magnitude_percent_diff(
        self, truth, predicted, name=None
    ):
        return metrics.gradient_magnitude_percent_diff(
            truth, predicted, None, dim=(-2, -1)
        )

    def get_real_sht(self):
        """xy-ordered [..., 12, nside, nside, C] -> spectral coefficients
        (reference: gridded_ops.py:518 get_real_sht; lmax = 2*nside - 1).
        """
        from ace_tpu.ops.hpx import HealpixSHT, xy_to_ring_indices

        if self.nside is None:
            raise ValueError("nside must be specified for SHT")
        nside = self.nside
        lmax = 2 * nside - 1
        sht = HealpixSHT(nside, lmax=lmax, mmax=lmax)
        idx = jnp.asarray(xy_to_ring_indices(nside))

        def forward(x):
            flat = x.reshape(*x.shape[:-4], 12 * nside * nside, x.shape[-1])
            return sht(jnp.take(flat, idx, axis=-2))

        return forward

    def get_real_isht(self):
        from ace_tpu.ops.hpx import HealpixISHT, ring_to_xy_indices

        if self.nside is None:
            raise ValueError("nside must be specified for SHT")
        nside = self.nside
        lmax = 2 * nside - 1
        isht = HealpixISHT(nside, lmax=lmax, mmax=lmax)
        idx = jnp.asarray(ring_to_xy_indices(nside))

        def inverse(coeffs):
            ring = isht(coeffs)
            xy = jnp.take(ring, idx, axis=-2)
            return xy.reshape(
                *xy.shape[:-2], 12, nside, nside, xy.shape[-1]
            )

        return inverse

    def get_state(self) -> dict[str, Any]:
        return {
            "type": type(self).__name__,
            "state": {"nside": self.nside},
        }
