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
import os

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


def _parity_split_tables(tensor: np.ndarray):
    """Split a Legendre tensor [m, l, k] by the equatorial symmetry
    P_l^m(pi - theta) = (-1)^(l+m) P_l^m(theta).

    Returns (wp0, wp1, pmask):
      wp0 [m, jp, h+odd] — rows with (l+m) even (symmetric in latitude),
          row j holding l = 2j + (m % 2); includes the equator column;
      wp1 [m, jp, h]     — rows with (l+m) odd (antisymmetric; the
          equator column is dropped because P_l^m vanishes there),
          row j holding l = 2j + 1 - (m % 2);
      pmask [l, m]       — True where (l + m) is even.

    Contracting the folded halves x[:h] +/- flip(x[h+odd:]) against
    these tables halves the Legendre matmul FLOPs; the full-l result is
    recovered with a repeat + select because row j of either table maps
    back to l with l // 2 == j for every m parity.
    """
    M, L, K = tensor.shape
    h, odd = K // 2, K % 2
    jp = (L + 1) // 2
    m_idx = np.arange(M)[:, None]
    j = np.arange(jp)[None, :]
    l0 = 2 * j + (m_idx % 2)
    l1 = 2 * j + 1 - (m_idx % 2)
    w0 = tensor[m_idx, np.minimum(l0, L - 1), :] * (l0 < L)[..., None]
    w1 = tensor[m_idx, np.minimum(l1, L - 1), :] * (l1 < L)[..., None]
    pmask = (np.arange(L)[:, None] + np.arange(M)[None, :]) % 2 == 0
    return (
        w0[:, :, : h + odd].astype(np.float32),
        w1[:, :, :h].astype(np.float32),
        pmask,
    )


def _is_equatorially_symmetric(tq: np.ndarray, w: np.ndarray) -> bool:
    """True when colatitudes and quadrature weights mirror about the
    equator (holds for legendre-gauss, lobatto, and equiangular grids;
    guards the parity-split fast path against exotic node sets)."""
    return bool(
        np.allclose(tq + tq[::-1], np.pi, atol=1e-12)
        and np.allclose(w, w[::-1], atol=1e-12)
    )


class RealSHT:
    """Forward real SHT: grid (..., nlat, nlon[, C]) -> coeffs
    (..., lmax, mmax[, C]) complex64.

    The Legendre contraction is the dense [m, l, k] einsum the
    reference evaluates (fme/sht_fix.py:133-151). A parity-split
    variant (fold the grid about the equator, contract symmetric/
    antisymmetric halves separately — exact up to float reassociation,
    half the matmul FLOPs) is available via ``parity_split=True`` or
    ``ACE_TPU_SHT_PARITY_SPLIT=1`` but is OFF by default: measured on
    one TPU v5e at ACE2 scale it is slower (sht+isht roundtrip 2.87 ms
    vs 2.45 ms at 180x360x256; 4.55 vs 3.60 ms at C=512) because the
    einsums are HBM-bound there and the fold/select passes add traffic
    that outweighs the halved FLOPs.

    Args:
        nlat, nlon: input grid size.
        lmax, mmax: spectral truncation (defaults per grid type).
        grid: latitude grid ("legendre-gauss", "lobatto", "equiangular").
        channels_last: if True, operates on axes (-3, -2) with a trailing
            channel axis — the native TPU layout used by the models.
        parity_split: True enables the folded Legendre contraction
            (see class docstring); None reads ACE_TPU_SHT_PARITY_SPLIT.
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True, channels_last=False,
                 precision=jax.lax.Precision.HIGH, parity_split=None):
        if parity_split is None:
            parity_split = os.environ.get(
                "ACE_TPU_SHT_PARITY_SPLIT", "0"
            ) == "1"
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
        self.parity_split = parity_split and _is_equatorially_symmetric(
            tq, w
        )
        if self.parity_split:
            wp0, wp1, pmask = _parity_split_tables(weights)
            self._wp0 = jnp.asarray(wp0)
            self._wp1 = jnp.asarray(wp1)
            self._pmask = jnp.asarray(pmask)
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
        if self.parity_split:
            return self._legendre_folded(xr), self._legendre_folded(xi)
        cr = jnp.einsum(leg_eq, xr, self.weights, precision=prec,
                        preferred_element_type=jnp.float32)
        ci = jnp.einsum(leg_eq, xi, self.weights, precision=prec,
                        preferred_element_type=jnp.float32)
        return cr, ci

    def _legendre_folded(self, xm):
        """Parity-split Legendre contraction: fold the latitude axis
        about the equator and contract the symmetric/antisymmetric
        halves against the even/odd-(l+m) weight rows — half the
        matmul FLOPs of the dense [m, l, k] einsum."""
        prec = self.precision
        ax = -3 if self.channels_last else -2
        h, odd = self.nlat // 2, self.nlat % 2
        north = jax.lax.slice_in_dim(xm, 0, h, axis=ax)
        south = jnp.flip(
            jax.lax.slice_in_dim(xm, h + odd, self.nlat, axis=ax), axis=ax
        )
        xs = north + south
        xa = north - south
        if odd:
            # the equator row contributes to symmetric rows only
            # (P_l^m vanishes at the equator for odd l+m)
            xs = jnp.concatenate(
                [xs, jax.lax.slice_in_dim(xm, h, h + 1, axis=ax)], axis=ax
            )
        eq = "...kmc,mjk->...jmc" if self.channels_last else "...km,mjk->...jm"
        ce = jnp.einsum(eq, xs, self._wp0, precision=prec,
                        preferred_element_type=jnp.float32)
        co = jnp.einsum(eq, xa, self._wp1, precision=prec,
                        preferred_element_type=jnp.float32)
        # row j of either parity holds the l with l // 2 == j, so a
        # repeat + parity select restores the interleaved l axis
        ce = jax.lax.slice_in_dim(
            jnp.repeat(ce, 2, axis=ax), 0, self.lmax, axis=ax
        )
        co = jax.lax.slice_in_dim(
            jnp.repeat(co, 2, axis=ax), 0, self.lmax, axis=ax
        )
        mask = (self._pmask[:, :, None] if self.channels_last
                else self._pmask)
        return jnp.where(mask, ce, co)


class InverseRealSHT:
    """Inverse real SHT: coeffs (..., lmax, mmax[, C]) complex ->
    grid (..., nlat, nlon[, C]) float32.
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True, channels_last=False,
                 precision=jax.lax.Precision.HIGH, parity_split=None):
        if parity_split is None:
            parity_split = os.environ.get(
                "ACE_TPU_SHT_PARITY_SPLIT", "0"
            ) == "1"
        self.precision = precision
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        cost, w, default_lmax = quadrature_for_grid(grid, nlat)
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        self.channels_last = channels_last
        t = np.flip(np.arccos(cost))
        pct = precompute_legpoly(self.mmax, self.lmax, t, norm=norm,
                                 inverse=True, csphase=csphase)
        self.pct = jnp.asarray(pct, dtype=jnp.float32)  # [m, l, k]
        self.parity_split = parity_split and _is_equatorially_symmetric(
            t, w
        )
        if self.parity_split:
            wp0, wp1, pmask = _parity_split_tables(np.asarray(pct))
            self._wp0 = jnp.asarray(wp0)
            self._wp1 = jnp.asarray(wp1)
            self._pmask = jnp.asarray(pmask)
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

    def _legendre_folded_inv(self, c):
        """Parity-split inverse Legendre evaluation (see
        RealSHT._legendre_folded): contract even/odd-(l+m) coefficient
        rows against the half-latitude tables, then unfold the
        symmetric/antisymmetric halves back onto the full grid."""
        prec = self.precision
        ax = (-3 if self.channels_last else -2) % c.ndim
        h, odd = self.nlat // 2, self.nlat % 2
        jp = (self.lmax + 1) // 2
        pad = 2 * jp - self.lmax
        mask = (self._pmask[:, :, None] if self.channels_last
                else self._pmask)
        ce = jnp.where(mask, c, 0.0)
        co = jnp.where(mask, 0.0, c)
        if pad:
            widths = [(0, 0)] * c.ndim
            widths[ax] = (0, pad)
            ce = jnp.pad(ce, widths)
            co = jnp.pad(co, widths)
        # fold l-pairs (2j, 2j+1) -> row j: exactly one of the two is
        # nonzero per (l, m) parity, so a pair-sum is a gather
        pair_shape = ce.shape[:ax] + (jp, 2) + ce.shape[ax + 1:]
        cp0 = ce.reshape(pair_shape).sum(axis=ax + 1)
        cp1 = co.reshape(pair_shape).sum(axis=ax + 1)
        eq = "...jmc,mjk->...kmc" if self.channels_last else "...jm,mjk->...km"
        xe = jnp.einsum(eq, cp0, self._wp0, precision=prec,
                        preferred_element_type=jnp.float32)
        xo = jnp.einsum(eq, cp1, self._wp1, precision=prec,
                        preferred_element_type=jnp.float32)
        xe_n = jax.lax.slice_in_dim(xe, 0, h, axis=ax - c.ndim)
        north = xe_n + xo
        south = jnp.flip(xe_n - xo, axis=ax - c.ndim)
        parts = [north]
        if odd:
            parts.append(
                jax.lax.slice_in_dim(xe, h, h + 1, axis=ax - c.ndim)
            )
        parts.append(south)
        return jnp.concatenate(parts, axis=ax - c.ndim)

    def _inverse(self, cr, ci, leg_eq, dft_eq):
        prec = self.precision  # see RealSHT._forward
        cr = cr.astype(jnp.float32)
        ci = ci.astype(jnp.float32)
        if self.parity_split:
            xr = self._legendre_folded_inv(cr)
            xi = self._legendre_folded_inv(ci)
        else:
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


def build_sht(nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
              norm="ortho", csphase=True, channels_last=False,
              precision=jax.lax.Precision.HIGH, parity_split=None):
    """Auto-dispatching forward-SHT constructor.

    When a spatial (h*w > 1) mesh is active (declared via
    ``ace_tpu.parallel.mesh.spatial_parallel``) and the layout is
    channels-last, returns the explicit all-to-all
    ``DistributedRealSHT`` — the reference swaps thd.DistributedRealSHT
    into EVERY spectral model under its spatial backend
    (fme/core/distributed/model_torch_distributed.py:454-465); this
    factory is the single place that swap happens here. Otherwise
    returns the single-device ``RealSHT``.
    """
    if channels_last:
        from ace_tpu.parallel.mesh import get_spatial_mesh

        mesh = get_spatial_mesh()
        if mesh is not None:
            from ace_tpu.ops.distributed_sht import DistributedRealSHT

            return DistributedRealSHT(
                mesh, nlat, nlon, lmax=lmax, mmax=mmax, grid=grid,
                norm=norm, csphase=csphase, precision=precision,
            )
    return RealSHT(
        nlat, nlon, lmax=lmax, mmax=mmax, grid=grid, norm=norm,
        csphase=csphase, channels_last=channels_last,
        precision=precision, parity_split=parity_split,
    )


def build_isht(nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
               norm="ortho", csphase=True, channels_last=False,
               precision=jax.lax.Precision.HIGH, parity_split=None):
    """Auto-dispatching inverse-SHT constructor (see ``build_sht``)."""
    if channels_last:
        from ace_tpu.parallel.mesh import get_spatial_mesh

        mesh = get_spatial_mesh()
        if mesh is not None:
            from ace_tpu.ops.distributed_sht import (
                DistributedInverseRealSHT,
            )

            return DistributedInverseRealSHT(
                mesh, nlat, nlon, lmax=lmax, mmax=mmax, grid=grid,
                norm=norm, csphase=csphase, precision=precision,
            )
    return InverseRealSHT(
        nlat, nlon, lmax=lmax, mmax=mmax, grid=grid, norm=norm,
        csphase=csphase, channels_last=channels_last,
        precision=precision, parity_split=parity_split,
    )
