"""Smooth flood fill of NaN regions (reference: fme/core/fill.py:13
SmoothFloodFill) — used to fill masked ocean regions before plotting and
spectral analysis.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _neighbor_mean(x, valid):
    """Average of valid 4-neighbors at each pixel."""
    total = jnp.zeros_like(x)
    count = jnp.zeros_like(x)
    for shift, axis in [(1, -2), (-1, -2), (1, -1), (-1, -1)]:
        total = total + jnp.roll(jnp.where(valid, x, 0.0), shift, axis)
        count = count + jnp.roll(valid.astype(x.dtype), shift, axis)
    return total / jnp.maximum(count, 1.0), count > 0


def _gaussian_kernel(size: int, sigma: float):
    ax = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-(ax**2) / (2 * sigma**2))
    k = k / k.sum()
    return jnp.asarray(np.outer(k, k), jnp.float32)


class SmoothFloodFill:
    """Fill NaN regions by (1) mean-filling the deep interior, (2)
    iterative neighbor-average expansion from the valid boundary, and (3)
    Gaussian-blur smoothing across the seam (reference: fme/core/fill.py).
    """

    def __init__(self, num_steps: int = 4, blur_kernel_size: int = 5,
                 blur_sigma: float = 1.0):
        self._num_steps = num_steps
        self._kernel = _gaussian_kernel(blur_kernel_size, blur_sigma)
        self._ksize = blur_kernel_size

    def _blur(self, x):
        pad = self._ksize // 2
        x4 = x[..., None]
        padded = jnp.pad(
            x4, [(0, 0)] * (x4.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)],
            mode="edge",
        )
        kernel = self._kernel[:, :, None, None]
        batch_shape = padded.shape[:-3]
        flat = padded.reshape(-1, *padded.shape[-3:])
        out = jax.lax.conv_general_dilated(
            flat, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(*batch_shape, *out.shape[-3:])[..., 0]

    def __call__(self, data: jax.Array) -> jax.Array:
        """Fill NaNs of [..., H, W] data."""
        valid0 = ~jnp.isnan(data)
        x = jnp.where(valid0, data, 0.0)
        # phase 1: mean-fill everywhere invalid (interior fallback)
        mean = jnp.sum(x, axis=(-2, -1), keepdims=True) / jnp.maximum(
            jnp.sum(valid0, axis=(-2, -1), keepdims=True), 1
        )
        filled = jnp.where(valid0, x, mean)
        # phase 2: grow valid pixels inward with neighbor averaging
        valid = valid0
        for _ in range(self._num_steps):
            nb_mean, nb_any = _neighbor_mean(filled, valid)
            newly = (~valid) & nb_any
            filled = jnp.where(newly, nb_mean, filled)
            valid = valid | newly
        # phase 3: blur across the seam (original NaN region only)
        blurred = self._blur(filled)
        return jnp.where(valid0, data, blurred)
