"""Real spherical harmonic transforms for TPU (JAX/XLA).

TPU-first design (reference semantics: fme/sht_fix.py:61-230):

- The longitudinal DFT is computed as a *matmul* against precomputed
  cos/sin matrices rather than an FFT: on TPU the MXU makes an O(N·M)
  matmul faster than a poorly-tiled FFT for the grid sizes used here
  (nlon ≤ ~1440), and it fuses with neighboring contractions. A
  ``jnp.fft``-based path is kept for cross-checking.
- The Legendre contraction is an einsum with precomputed, quadrature-
  weighted associated Legendre tensors ``w[m, l, k]`` (host-side float64
  precompute, cast to float32).
- Transforms always compute in float32 regardless of input dtype
  (the reference forces fp32 under autocast, fme/sht_fix.py:128-131),
  and return complex64 coefficients.

Conventions match torch-harmonics ``norm="ortho", csphase=True``:
forward = (2π/nlon)·DFT(lon), truncated to ``mmax`` modes, then
Gauss-quadrature Legendre contraction; inverse is the adjoint evaluation
with un-normalized inverse DFT (Hermitian-doubled).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.ops.legendre import precompute_legpoly
from ace_tpu.ops.quadrature import (
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    lobatto_weights,
)

_GRIDS = ("legendre-gauss", "lobatto", "equiangular")


def quadrature_for_grid(grid: str, nlat: int):
    """Return (cost ascending, weights, default lmax) for a grid type."""
    if grid == "legendre-gauss":
        cost, w = legendre_gauss_weights(nlat, -1, 1)
        lmax = nlat
    elif grid == "lobatto":
        cost, w = lobatto_weights(nlat, -1, 1)
        lmax = nlat - 1
    elif grid == "equiangular":
        cost, w = clenshaw_curtiss_weights(nlat, -1, 1)
        lmax = nlat
    else:
        raise ValueError(f"Unknown quadrature mode {grid!r}; options: {_GRIDS}")
    return cost, w, lmax


@functools.lru_cache(maxsize=32)
def _dft_matrices(nlon: int, mmax: int):
    """Precompute forward/inverse real-DFT matrices for the lon axis.

    Forward: ``xm = x @ (cosF - i sinF)`` equals ``rfft(x)`` rows 0..mmax-1
    (zero rows beyond nlon//2+1 if mmax is larger). Scaling (2π/nlon) is
    folded in. Inverse matrices implement the Hermitian-doubled irfft with
    "forward" normalization (no 1/n).
    """
    m = np.arange(mmax)
    j = np.arange(nlon)
    ang = 2.0 * np.pi * np.outer(j, m) / nlon  # [nlon, mmax]
    valid = m <= nlon // 2  # modes beyond nyquist are zero-padding
    scale = 2.0 * np.pi / nlon
    fwd_cos = (scale * np.cos(ang) * valid).astype(np.float32)
    fwd_sin = (-scale * np.sin(ang) * valid).astype(np.float32)
    # inverse: f_j = sum_m alpha_m (cr_m cos - ci_m sin)
    alpha = np.where((m == 0) | (2 * m == nlon), 1.0, 2.0) * valid
    inv_cos = (alpha[:, None] * np.cos(ang.T)).astype(np.float32)  # [mmax, nlon]
    inv_sin = (-alpha[:, None] * np.sin(ang.T)).astype(np.float32)
    return fwd_cos, fwd_sin, inv_cos, inv_sin


class RealSHT:
    """Forward real SHT: grid (..., nlat, nlon[, C]) -> coeffs
    (..., lmax, mmax[, C]) complex64.

    Args:
        nlat, nlon: input grid size.
        lmax, mmax: spectral truncation (defaults per grid type).
        grid: latitude grid ("legendre-gauss", "lobatto", "equiangular").
        channels_last: if True, operates on axes (-3, -2) with a trailing
            channel axis — the native TPU layout used by the models.
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True, channels_last=False,
                 precision=jax.lax.Precision.HIGH):
        self.precision = precision
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        cost, w, default_lmax = quadrature_for_grid(grid, nlat)
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        self.channels_last = channels_last
        # colatitudes ascending (north pole first), matching the reference's
        # flipped arccos ordering (fme/sht_fix.py:107)
        tq = np.flip(np.arccos(cost))
        pct = precompute_legpoly(self.mmax, self.lmax, tq, norm=norm,
                                 csphase=csphase)
        # weights are symmetric in latitude so no flip is needed
        weights = pct * w[None, None, :]
        self.weights = jnp.asarray(weights, dtype=jnp.float32)  # [m, l, k]
        self._fc, self._fs, _, _ = map(
            jnp.asarray, _dft_matrices(nlon, self.mmax)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.lax.complex(*self.forward_pair(x))

    def forward_pair(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Forward SHT returning (real, imag) float32 arrays.

        Preferred over ``__call__`` in hot paths: skipping the complex64
        pack/unpack at the API boundary keeps XLA on pure f32 matmul
        fusions end to end.
        """
        if self.channels_last:
            return self._forward(x, "...kjc,jm->...kmc", "...kmc,mlk->...lmc")
        return self._forward(x, "...kj,jm->...km", "...km,mlk->...lm")

    def forward_fused(self, x: jax.Array, l_tile=8, c_tile=128,
                      k_tile=8, interpret=False) -> jax.Array:
        """Fused DFT+Legendre Pallas path (channels-last [B, K, J, C]
        only): keeps the DFT intermediate in VMEM instead of HBM — see
        ops/pallas_sht.py. Pads M to a multiple of 8 and L/C/K to the
        tile grid, then slices back. True f32 accumulation in-kernel.
        """
        from ace_tpu.ops.pallas_sht import fused_sht

        if not self.channels_last or x.ndim != 4:
            raise ValueError("forward_fused needs [B, K, J, C] input")
        x = x.astype(jnp.float32)
        b, k_dim, j_dim, c_dim = x.shape

        def pad_to(v, mult):
            return (mult - v % mult) % mult

        pk = pad_to(k_dim, k_tile)
        pm = pad_to(self.mmax, 8)
        plt = pad_to(self.lmax, l_tile)
        pc = pad_to(c_dim, c_tile)
        xp = jnp.pad(x, ((0, 0), (0, pk), (0, 0), (0, pc)))
        dft_r = jnp.pad(self._fc, ((0, 0), (0, pm)))
        dft_i = jnp.pad(self._fs, ((0, 0), (0, pm)))
        # kernel wants leg as [L, K, M]
        leg = jnp.pad(
            self.weights, ((0, pm), (0, plt), (0, pk))
        ).transpose(1, 2, 0)
        out_r, out_i = fused_sht(
            xp, dft_r, dft_i, leg,
            l_tile=l_tile, c_tile=c_tile, k_tile=k_tile,
            interpret=interpret,
        )
        out_r = out_r[:, : self.lmax, : self.mmax, :c_dim]
        out_i = out_i[:, : self.lmax, : self.mmax, :c_dim]
        return jax.lax.complex(out_r, out_i)

    def _forward(self, x, dft_eq, leg_eq):
        # JAX's TPU default decomposes f32 matmuls to ONE bf16 pass
        # (~2e-2 relative error) — unacceptable for a spectral transform.
        # Default here is HIGH (3-pass bf16, ~2e-4), which matches the
        # reference's effective precision: its Docker forces TF32 matmuls
        # (TORCH_ALLOW_TF32_CUBLAS_OVERRIDE=1, docker/Dockerfile:5) inside
        # the fp32-autocast-disabled transform. Pass
        # precision=Precision.HIGHEST for true fp32 (6-pass, ~2x cost).
        prec = self.precision
        x = x.astype(jnp.float32)
        xr = jnp.einsum(dft_eq, x, self._fc, precision=prec,
                        preferred_element_type=jnp.float32)
        xi = jnp.einsum(dft_eq, x, self._fs, precision=prec,
                        preferred_element_type=jnp.float32)
        cr = jnp.einsum(leg_eq, xr, self.weights, precision=prec,
                        preferred_element_type=jnp.float32)
        ci = jnp.einsum(leg_eq, xi, self.weights, precision=prec,
                        preferred_element_type=jnp.float32)
        return cr, ci


class InverseRealSHT:
    """Inverse real SHT: coeffs (..., lmax, mmax[, C]) complex ->
    grid (..., nlat, nlon[, C]) float32.
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True, channels_last=False,
                 precision=jax.lax.Precision.HIGH):
        self.precision = precision
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        cost, _, default_lmax = quadrature_for_grid(grid, nlat)
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        self.channels_last = channels_last
        t = np.flip(np.arccos(cost))
        pct = precompute_legpoly(self.mmax, self.lmax, t, norm=norm,
                                 inverse=True, csphase=csphase)
        self.pct = jnp.asarray(pct, dtype=jnp.float32)  # [m, l, k]
        _, _, self._ic, self._is = map(
            jnp.asarray, _dft_matrices(nlon, self.mmax)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.inverse_pair(jnp.real(x), jnp.imag(x))

    def inverse_pair(self, cr: jax.Array, ci: jax.Array) -> jax.Array:
        """Inverse SHT from (real, imag) float32 coefficient arrays —
        the no-complex hot path (see RealSHT.forward_pair)."""
        if self.channels_last:
            return self._inverse(cr, ci, "...lmc,mlk->...kmc", "...kmc,mj->...kjc")
        return self._inverse(cr, ci, "...lm,mlk->...km", "...km,mj->...kj")

    def _inverse(self, cr, ci, leg_eq, dft_eq):
        prec = self.precision  # see RealSHT._forward
        cr = cr.astype(jnp.float32)
        ci = ci.astype(jnp.float32)
        xr = jnp.einsum(leg_eq, cr, self.pct, precision=prec,
                        preferred_element_type=jnp.float32)
        xi = jnp.einsum(leg_eq, ci, self.pct, precision=prec,
                        preferred_element_type=jnp.float32)
        # Hermitian cleanup (imag of m=0 / nyquist) is implicit: the sin
        # rows of the inverse DFT matrix are identically zero there
        # (reference applies it explicitly, fme/fft.py:85-99).
        out = jnp.einsum(dft_eq, xr, self._ic, precision=prec,
                         preferred_element_type=jnp.float32)
        out = out + jnp.einsum(dft_eq, xi, self._is, precision=prec,
                               preferred_element_type=jnp.float32)
        return out
