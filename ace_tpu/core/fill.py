"""Smooth flood fill of NaN regions (reference: fme/core/fill.py:13
SmoothFloodFill).

Used by the spectrum aggregators to fill masked (e.g. land) regions of
ocean fields before taking an SHT, so the mask edge does not alias into
the power spectrum.

TPU-native design: the three NaN-pattern-derived masks (interior, valid,
blurred-valid) are precomputed once per variable name on the host with
numpy (they are static for a fixed mask), and the fill itself is a pure
jittable function built from 3x3 shifted sums — XLA fuses the expansion
steps into a handful of elementwise kernels, no scatter/gather.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pad_lon_circular(x, p=1):
    return jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)


def _sum3x3(x):
    """3x3 box sum with circular lon padding and zero lat padding."""
    x = _pad_lon_circular(x)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (0, 0)])
    return sum(
        x[..., i : i + x.shape[-2] - 2, j : j + x.shape[-1] - 2]
        for i in range(3)
        for j in range(3)
    )


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    # note: (-size) // 2, matching the reference's `-k // 2 + 1` floor
    # division (for odd k this gives a symmetric kernel)
    coords = np.arange(-size // 2 + 1.0, size // 2 + 1.0)
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _separable_blur(x, kernel):
    """Separable Gaussian blur: replicate-pad latitude, circular longitude
    (reference: fme/core/fill.py:_separable_gaussian_blur)."""
    k = kernel.shape[0]
    h = k // 2
    # latitude pass (replicate pad)
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :1, :], h, axis=-2), x,
         jnp.repeat(x[..., -1:, :], h, axis=-2)],
        axis=-2,
    )
    x = sum(kernel[i] * xp[..., i : i + x.shape[-2], :] for i in range(k))
    # longitude pass (circular pad)
    xp = _pad_lon_circular(x, h)
    return sum(kernel[j] * xp[..., :, j : j + x.shape[-1]] for j in range(k))


def _interior_mask(nan_mask: np.ndarray, num_steps: int) -> np.ndarray:
    """NaN pixels unreachable within num_steps of 3x3 edge expansion
    (reference: fme/core/fill.py:_get_interior_mask)."""
    isnan = nan_mask.copy()
    valid = (~isnan).astype(np.float32)
    for _ in range(num_steps):
        padded = np.pad(
            np.concatenate([valid[:, -1:], valid, valid[:, :1]], axis=1),
            ((1, 1), (0, 0)),
        )
        neighbor = sum(
            padded[i : i + valid.shape[0], j : j + valid.shape[1]]
            for i in range(3)
            for j in range(3)
        )
        can_update = isnan & (neighbor > 0)
        valid = np.where(can_update, 1.0, valid)
        isnan = isnan & ~can_update
    return isnan


@functools.partial(jax.jit, static_argnames=("num_steps",))
def _flood_fill(x, interior, valid0, blurred_valid, kernel, num_steps):
    """Jittable fill given precomputed masks; x is [..., H, W]."""
    isnan0 = ~valid0
    x = jnp.nan_to_num(x, nan=0.0)
    mean_vals = jnp.sum(
        x * valid0, axis=(-2, -1), keepdims=True
    ) / jnp.maximum(jnp.sum(valid0, axis=(-2, -1), keepdims=True), 1.0)
    x = jnp.where(interior, mean_vals, x)
    valid = jnp.where(interior, 1.0, valid0.astype(x.dtype))
    valid = jnp.broadcast_to(valid, x.shape)
    isnan = jnp.broadcast_to(isnan0 & ~interior, x.shape)
    for _ in range(num_steps):
        neighbor_count = _sum3x3(valid)
        neighbor_sum = _sum3x3(x)
        can_update = isnan & (neighbor_count > 0)
        local_avg = jnp.where(
            neighbor_count > 0, neighbor_sum / jnp.maximum(neighbor_count, 1e-30), 0.0
        )
        x = jnp.where(can_update, local_avg, x)
        valid = jnp.where(can_update, 1.0, valid)
        isnan = isnan & ~can_update
    blurred = _separable_blur(x, kernel)
    return x * blurred_valid + blurred * (1.0 - blurred_valid)


class SmoothFloodFill:
    """Fill NaN regions with smooth boundary transitions (reference:
    fme/core/fill.py:13 SmoothFloodFill — same three phases: interior
    mean-fill, iterative neighbor-average expansion, Gaussian blend).

    Masks are computed once per variable name from the first sample's NaN
    pattern and cached; the NaN region per variable must not change
    between calls (same contract as the reference).
    """

    def __init__(self, num_steps: int = 4, blur_kernel_size: int = 5,
                 blur_sigma: float = 1.0):
        self._num_steps = num_steps
        self._kernel = jnp.asarray(_gaussian_kernel(blur_kernel_size, blur_sigma))
        self._blur_kernel_size = blur_kernel_size
        self._blur_sigma = blur_sigma
        self._masks: dict[str, tuple | None] = {}

    def _get_masks(self, arr: np.ndarray, name: str):
        if name in self._masks:
            return self._masks[name]
        spatial = np.asarray(arr[(0,) * (arr.ndim - 2)], np.float32)
        nan_mask = np.isnan(spatial)
        if not nan_mask.any():
            self._masks[name] = None
        else:
            interior = _interior_mask(nan_mask, self._num_steps)
            valid = ~nan_mask
            blurred_valid = np.asarray(
                _separable_blur(
                    jnp.asarray(valid.astype(np.float32)), self._kernel
                )
            )
            self._masks[name] = (
                jnp.asarray(interior),
                jnp.asarray(valid),
                jnp.asarray(blurred_valid),
            )
        return self._masks[name]

    def __call__(self, arr, name: str):
        """Fill NaNs in [..., H, W] ``arr`` for variable ``name``.

        Jit-traceable once the masks for ``name`` are cached (prime them
        with a concrete array first — e.g. SpectrumAggregator._prime_masks);
        the host conversion below only runs on a cache miss."""
        if name not in self._masks:
            self._get_masks(np.asarray(arr), name)
        masks = self._masks[name]
        if masks is None:
            return jnp.asarray(arr)
        interior, valid, blurred_valid = masks
        return _flood_fill(
            jnp.asarray(arr, jnp.float32), interior, valid, blurred_valid,
            self._kernel, self._num_steps,
        )
