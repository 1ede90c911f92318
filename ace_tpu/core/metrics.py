"""Weighted statistics and physics flux helpers on JAX arrays
(reference: fme/core/metrics.py).

All reductions accept an optional ``weights`` array broadcastable against
the data; NaNs at zero-weight points are treated as "expected" and zeroed
before the reduction, matching the reference semantics.
"""

from collections.abc import Iterable
from typing import Union

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.constants import GRAVITY, LATENT_HEAT_OF_FREEZING

Dimension = Union[int, Iterable[int], None]


def spherical_area_weights(lats, num_lon: int) -> jnp.ndarray:
    """Area weights for a regular lat-lon grid, normalized to sum to 1
    (reference: fme/core/metrics.py:14).

    Args:
        lats: array of shape (..., num_lat) of cell-center latitudes, degrees.
        num_lon: number of longitude points.

    Returns:
        array of shape (..., num_lat, num_lon).
    """
    lats = jnp.asarray(lats)
    weights = jnp.cos(jnp.deg2rad(lats))[..., None]
    weights = jnp.broadcast_to(weights, (*weights.shape[:-1], num_lon))
    return weights / jnp.sum(weights, axis=(-1, -2), keepdims=True)


def _normalize_dim(dim: Dimension):
    if dim is None:
        return None
    if isinstance(dim, int):
        return (dim,)
    dims = tuple(dim)
    return dims if dims else None


def weighted_sum(tensor, weights=None, dim: Dimension = (), keepdim=False):
    axis = _normalize_dim(dim)
    if weights is None:
        return jnp.sum(tensor, axis=axis, keepdims=keepdim)
    weights = jnp.broadcast_to(weights, tensor.shape)
    tensor = jnp.where(weights != 0.0, tensor, 0.0)
    return jnp.sum(tensor * weights, axis=axis, keepdims=keepdim)


def weighted_mean(tensor, weights=None, dim: Dimension = (), keepdim=False):
    axis = _normalize_dim(dim)
    if weights is None:
        return jnp.mean(tensor, axis=axis, keepdims=keepdim)
    weights = jnp.broadcast_to(weights, tensor.shape)
    tensor = jnp.where(weights != 0.0, tensor, 0.0)
    return jnp.sum(tensor * weights, axis=axis, keepdims=keepdim) / jnp.sum(
        weights, axis=axis, keepdims=keepdim
    )


def weighted_nanmean(tensor, weights=None, dim: Dimension = (), keepdim=False):
    """Weighted mean ignoring NaN points (reference: fme/core/metrics.py:93)."""
    axis = _normalize_dim(dim)
    valid = ~jnp.isnan(tensor)
    if weights is None:
        weights = jnp.ones_like(tensor)
    weights = jnp.broadcast_to(weights, tensor.shape) * valid
    tensor = jnp.where(valid & (weights != 0.0), tensor, 0.0)
    return jnp.sum(tensor * weights, axis=axis, keepdims=keepdim) / jnp.sum(
        weights, axis=axis, keepdims=keepdim
    )


def weighted_std(tensor, weights=None, dim: Dimension = (), keepdim=False):
    mean = weighted_mean(tensor, weights=weights, dim=dim, keepdim=True)
    var = weighted_mean(
        (tensor - mean) ** 2, weights=weights, dim=dim, keepdim=keepdim
    )
    return jnp.sqrt(var)


def weighted_mean_bias(truth, predicted, weights=None, dim: Dimension = ()):
    """Mean bias of predicted vs truth (reference: fme/core/metrics.py)."""
    return weighted_mean(predicted - truth, weights=weights, dim=dim)


def mean_squared_error(truth, predicted, weights=None, dim: Dimension = ()):
    return weighted_mean((predicted - truth) ** 2, weights=weights, dim=dim)


def root_mean_squared_error(truth, predicted, weights=None, dim: Dimension = ()):
    return jnp.sqrt(mean_squared_error(truth, predicted, weights=weights, dim=dim))


def _central_diff(tensor, axis: int):
    """torch.gradient semantics: central differences in the interior,
    one-sided at both edges, unit spacing."""
    upper = jnp.concatenate(
        [
            jnp.take(tensor, jnp.array([1]), axis=axis),
            jnp.take(
                tensor,
                jnp.arange(2, tensor.shape[axis]),
                axis=axis,
            ),
            jnp.take(tensor, jnp.array([-1]), axis=axis),
        ],
        axis=axis,
    )
    lower = jnp.concatenate(
        [
            jnp.take(tensor, jnp.array([0]), axis=axis),
            jnp.take(
                tensor,
                jnp.arange(0, tensor.shape[axis] - 2),
                axis=axis,
            ),
            jnp.take(tensor, jnp.array([-2]), axis=axis),
        ],
        axis=axis,
    )
    n = tensor.shape[axis]
    spacing = jnp.concatenate(
        [jnp.ones(1), 2.0 * jnp.ones(max(n - 2, 0)), jnp.ones(1)]
    )
    shape = [1] * tensor.ndim
    shape[axis] = n
    return (upper - lower) / spacing.reshape(shape)


def gradient_magnitude(tensor, dim: tuple[int, int] = (-2, -1)):
    """Gradient magnitude over the two spatial dims with torch.gradient
    semantics — central differences in the interior, one-sided at the
    edges (reference: fme/core/metrics.py gradient_magnitude)."""
    dy = _central_diff(tensor, dim[0] % tensor.ndim)
    dx = _central_diff(tensor, dim[1] % tensor.ndim)
    return jnp.sqrt(dx**2 + dy**2)


def weighted_mean_gradient_magnitude(tensor, weights=None, dim=(-2, -1)):
    # nan-aware: NaN cells (masked regions) must not poison the metric
    # (reference uses weighted_nanmean here)
    return weighted_nanmean(
        gradient_magnitude(tensor, dim), weights=weights, dim=dim
    )


def gradient_magnitude_percent_diff(truth, predicted, weights=None, dim=(-2, -1)):
    truth_grad = weighted_mean_gradient_magnitude(truth, weights, dim)
    pred_grad = weighted_mean_gradient_magnitude(predicted, weights, dim)
    return 100.0 * (pred_grad - truth_grad) / truth_grad


def surface_pressure_due_to_dry_air(surface_pressure, total_water_path):
    """Surface pressure due to dry-air mass only, Pa
    (reference: fme/core/metrics.py:283).
    """
    return surface_pressure - GRAVITY * total_water_path


def net_surface_energy_flux(
    lw_rad_down,
    lw_rad_up,
    sw_rad_down,
    sw_rad_up,
    latent_heat_flux,
    sensible_heat_flux,
    frozen_precipitation_rate=None,
):
    """Net surface energy flux, W/m^2, positive = into surface
    (reference: fme/core/metrics.py:299).
    """
    if frozen_precipitation_rate is not None:
        frozen_precip_heat_flux = frozen_precipitation_rate * LATENT_HEAT_OF_FREEZING
    else:
        frozen_precip_heat_flux = 0.0
    net_surface_radiative_flux = sw_rad_down - sw_rad_up + lw_rad_down - lw_rad_up
    net_surface_turbulent_heat_flux = -latent_heat_flux - sensible_heat_flux
    return (
        net_surface_radiative_flux
        + net_surface_turbulent_heat_flux
        - frozen_precip_heat_flux
    )


def net_top_of_atmosphere_energy_flux(sw_rad_down, sw_rad_up, lw_rad_up):
    """Net TOA energy flux, W/m^2, positive = into the atmosphere
    (reference: fme/core/metrics.py:337).
    """
    return sw_rad_down - sw_rad_up - lw_rad_up


def quantile(bins: np.ndarray, hist: np.ndarray, probability: float) -> float:
    """Quantile of a histogram via linear interpolation within bins
    (reference: fme/core/metrics.py quantile).
    """
    if not 0 <= probability <= 1:
        raise ValueError(f"probability must be in [0, 1], got {probability}")
    cdf = np.cumsum(hist).astype(np.float64)
    total = cdf[-1]
    if total == 0:
        return float("nan")
    cdf = cdf / total
    idx = int(np.searchsorted(cdf, probability))
    if idx >= len(hist):
        return float(bins[-1])
    prev_cdf = cdf[idx - 1] if idx > 0 else 0.0
    frac_within = (probability - prev_cdf) / max(cdf[idx] - prev_cdf, 1e-30)
    return float(bins[idx] + frac_within * (bins[idx + 1] - bins[idx]))
