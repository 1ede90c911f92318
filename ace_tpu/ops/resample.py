"""Bilinear resampling between spherical lat-lon grids
(reference behavior: torch_harmonics ResampleS2 with mode="bilinear",
as used by fme/ace/models/makani_fcn3/.../fourcastnet3.py:213).

Latitudes interpolate linearly in colatitude between bracketing input
rows (clamped at the poles); longitudes interpolate circularly on the
uniform grid. Implemented as two precomputed gather+lerp passes.
"""

import numpy as np

import jax.numpy as jnp

from ace_tpu.ops.sht import quadrature_for_grid


def grid_colatitudes(nlat: int, grid: str) -> np.ndarray:
    """Ascending colatitudes matching the SHT/DISCO row ordering
    (north-to-south rows = theta ascending; see ops/sht.py:100)."""
    cost, _, _ = quadrature_for_grid(grid, nlat)
    return np.flip(np.arccos(cost)).copy()


def _lat_interp_weights(theta_in: np.ndarray, theta_out: np.ndarray):
    """Bracketing indices + weights for 1D linear interp (ascending)."""
    idx_hi = np.searchsorted(theta_in, theta_out)
    idx_hi = np.clip(idx_hi, 1, len(theta_in) - 1)
    idx_lo = idx_hi - 1
    denom = theta_in[idx_hi] - theta_in[idx_lo]
    w_hi = np.where(denom > 0, (theta_out - theta_in[idx_lo]) / denom, 0.0)
    w_hi = np.clip(w_hi, 0.0, 1.0)
    return idx_lo.astype(np.int32), idx_hi.astype(np.int32), w_hi


class ResampleS2:
    """Channels-last bilinear regridding [..., H_in, W_in, C] ->
    [..., H_out, W_out, C].
    """

    def __init__(self, nlat_in: int, nlon_in: int, nlat_out: int,
                 nlon_out: int, grid_in: str = "equiangular",
                 grid_out: str = "equiangular"):
        theta_in = grid_colatitudes(nlat_in, grid_in)
        theta_out = grid_colatitudes(nlat_out, grid_out)
        lo, hi, w_hi = _lat_interp_weights(theta_in, theta_out)
        self._lat_lo = jnp.asarray(lo)
        self._lat_hi = jnp.asarray(hi)
        self._lat_w = jnp.asarray(w_hi, jnp.float32)[:, None, None]
        # circular longitude interpolation on uniform grids
        pos = np.arange(nlon_out) * (nlon_in / nlon_out)
        lon_lo = np.floor(pos).astype(np.int32) % nlon_in
        lon_hi = (lon_lo + 1) % nlon_in
        self._lon_lo = jnp.asarray(lon_lo)
        self._lon_hi = jnp.asarray(lon_hi)
        self._lon_w = jnp.asarray(
            (pos - np.floor(pos)).astype(np.float32)
        )[:, None]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        lo = jnp.take(x, self._lat_lo, axis=-3)
        hi = jnp.take(x, self._lat_hi, axis=-3)
        x = lo * (1.0 - self._lat_w) + hi * self._lat_w
        lo = jnp.take(x, self._lon_lo, axis=-2)
        hi = jnp.take(x, self._lon_hi, axis=-2)
        return lo * (1.0 - self._lon_w) + hi * self._lon_w
