"""Vector spherical harmonic transforms (spheroidal/toroidal) for TPU.

TPU-native replacement for torch_harmonics' RealVectorSHT /
InverseRealVectorSHT (consumed by the reference's wind analysis,
scripts/vort_div/winds.py): matmul DFT along longitude + Legendre
contractions against host-precomputed dP̂/dθ and mP̂/sinθ tensors
(ops/legendre.py:precompute_dlegpoly), everything MXU-friendly einsums
like the scalar transforms in ops/sht.py.

Conventions: a tangent field F = (F_θ, F_φ) decomposes as

    F = Σ_lm [ S_lm ∇Y_lm + T_lm (r̂ × ∇Y_lm) ]

with ∇Y_lm = (dP̂/dθ, imP̂/sinθ)e^{imφ}. The analysis returns the
*potential* coefficients (S = velocity-potential χ_lm, T =
streamfunction ψ_lm in the scalar SHT basis of ops/sht.py): dividing
the vector-harmonic projection by l(l+1) here means divergence and
vorticity follow by scaling with -l(l+1) and a scalar inverse SHT —
exactly how the reference consumes the transform (winds.py:33-45).
Grid layout matches ops/sht.py: colatitude ascending (north pole at
index 0); fields are stacked (θ, φ) on axis -3. Note u = F_φ and
v = -F_θ with this colatitude orientation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.ops.legendre import precompute_dlegpoly
from ace_tpu.ops.sht import (
    InverseRealSHT,
    RealSHT,
    _dft_matrices,
    quadrature_for_grid,
)


class RealVectorSHT:
    """Forward vector SHT: (..., 2, nlat, nlon) float (θ, φ components)
    -> (..., 2, lmax, mmax) complex64 (spheroidal, toroidal potentials).
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None,
                 grid="legendre-gauss", csphase=True,
                 precision=jax.lax.Precision.HIGH):
        self.precision = precision
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        cost, w, default_lmax = quadrature_for_grid(grid, nlat)
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        tq = np.flip(np.arccos(cost))
        dp, q = precompute_dlegpoly(self.mmax, self.lmax, tq,
                                    csphase=csphase)
        ell = np.arange(self.lmax)
        inv_ll1 = np.zeros(self.lmax)
        inv_ll1[1:] = 1.0 / (ell[1:] * (ell[1:] + 1.0))
        # fold the quadrature weight and the 1/(l(l+1)) potential
        # normalization into the Legendre tensors
        wdp = dp * w[None, None, :] * inv_ll1[None, :, None]
        wq = q * w[None, None, :] * inv_ll1[None, :, None]
        self.wdp = jnp.asarray(wdp, jnp.float32)  # [m, l, k]
        self.wq = jnp.asarray(wq, jnp.float32)
        self._fc, self._fs, _, _ = map(
            jnp.asarray, _dft_matrices(nlon, self.mmax)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        prec = self.precision
        kw = dict(precision=prec, preferred_element_type=jnp.float32)
        x = x.astype(jnp.float32)
        x_th, x_ph = x[..., 0, :, :], x[..., 1, :, :]
        # longitudinal DFT (matmul; see ops/sht.py:_dft_matrices)
        tr = jnp.einsum("...kj,jm->...km", x_th, self._fc, **kw)
        ti = jnp.einsum("...kj,jm->...km", x_th, self._fs, **kw)
        pr = jnp.einsum("...kj,jm->...km", x_ph, self._fc, **kw)
        pi = jnp.einsum("...kj,jm->...km", x_ph, self._fs, **kw)
        # S = [<F_θ, dP> - i m <F_φ, P/sinθ>] / (l(l+1))
        # T = [i m <F_θ, P/sinθ> + <F_φ, dP>] / (l(l+1))
        # (m is already folded into wq = m P̂ w / sinθ / (l(l+1)))
        s_r = (
            jnp.einsum("...km,mlk->...lm", tr, self.wdp, **kw)
            + jnp.einsum("...km,mlk->...lm", pi, self.wq, **kw)
        )
        s_i = (
            jnp.einsum("...km,mlk->...lm", ti, self.wdp, **kw)
            - jnp.einsum("...km,mlk->...lm", pr, self.wq, **kw)
        )
        t_r = (
            jnp.einsum("...km,mlk->...lm", pr, self.wdp, **kw)
            - jnp.einsum("...km,mlk->...lm", ti, self.wq, **kw)
        )
        t_i = (
            jnp.einsum("...km,mlk->...lm", pi, self.wdp, **kw)
            + jnp.einsum("...km,mlk->...lm", tr, self.wq, **kw)
        )
        out_r = jnp.stack([s_r, t_r], axis=-3)
        out_i = jnp.stack([s_i, t_i], axis=-3)
        return jax.lax.complex(out_r, out_i)


class InverseRealVectorSHT:
    """Inverse vector SHT: (..., 2, lmax, mmax) complex potentials
    (spheroidal, toroidal) -> (..., 2, nlat, nlon) float (θ, φ).
    """

    def __init__(self, nlat, nlon, lmax=None, mmax=None,
                 grid="legendre-gauss", csphase=True,
                 precision=jax.lax.Precision.HIGH):
        self.precision = precision
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        cost, _, default_lmax = quadrature_for_grid(grid, nlat)
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        tq = np.flip(np.arccos(cost))
        dp, q = precompute_dlegpoly(self.mmax, self.lmax, tq,
                                    csphase=csphase)
        self.dp = jnp.asarray(dp, jnp.float32)  # [m, l, k]
        self.q = jnp.asarray(q, jnp.float32)
        _, _, self._ic, self._is = map(
            jnp.asarray, _dft_matrices(nlon, self.mmax)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        prec = self.precision
        kw = dict(precision=prec, preferred_element_type=jnp.float32)
        s_r, t_r = jnp.real(x[..., 0, :, :]), jnp.real(x[..., 1, :, :])
        s_i, t_i = jnp.imag(x[..., 0, :, :]), jnp.imag(x[..., 1, :, :])
        # F_θ_m = S dP/dθ - i T (mP/sinθ); F_φ_m = i S (mP/sinθ) + T dP/dθ
        th_r = (
            jnp.einsum("...lm,mlk->...km", s_r, self.dp, **kw)
            + jnp.einsum("...lm,mlk->...km", t_i, self.q, **kw)
        )
        th_i = (
            jnp.einsum("...lm,mlk->...km", s_i, self.dp, **kw)
            - jnp.einsum("...lm,mlk->...km", t_r, self.q, **kw)
        )
        ph_r = (
            jnp.einsum("...lm,mlk->...km", t_r, self.dp, **kw)
            - jnp.einsum("...lm,mlk->...km", s_i, self.q, **kw)
        )
        ph_i = (
            jnp.einsum("...lm,mlk->...km", t_i, self.dp, **kw)
            + jnp.einsum("...lm,mlk->...km", s_r, self.q, **kw)
        )
        f_th = (
            jnp.einsum("...km,mj->...kj", th_r, self._ic, **kw)
            + jnp.einsum("...km,mj->...kj", th_i, self._is, **kw)
        )
        f_ph = (
            jnp.einsum("...km,mj->...kj", ph_r, self._ic, **kw)
            + jnp.einsum("...km,mj->...kj", ph_i, self._is, **kw)
        )
        return jnp.stack([f_th, f_ph], axis=-3)


def u_v_to_vort_div(u, v, grid="legendre-gauss",
                    precision=jax.lax.Precision.HIGHEST):
    """Relative vorticity and divergence of an (eastward, northward) wind
    field [..., nlat, nlon] on the unit sphere (reference:
    scripts/vort_div/winds.py:13-46; latitudes here run north->south,
    matching the ace_tpu grid convention).
    """
    u = jnp.asarray(u)
    nlat, nlon = u.shape[-2], u.shape[-1]
    vsht = RealVectorSHT(nlat, nlon, grid=grid, precision=precision)
    isht = InverseRealSHT(nlat, nlon, grid=grid, precision=precision)
    # θ̂ points south: F_θ = -v, F_φ = u
    f = jnp.stack([-jnp.asarray(v), u], axis=-3)
    st = vsht(f)
    ell = jnp.arange(vsht.lmax, dtype=jnp.float32)
    lap = (-ell * (ell + 1.0))[:, None]
    div = isht(st[..., 0, :, :] * lap)
    vort = isht(st[..., 1, :, :] * lap)
    return vort, div


def vort_div_to_u_v(vort, div, grid="legendre-gauss",
                    precision=jax.lax.Precision.HIGHEST):
    """Rotational + divergent wind from vorticity/divergence (inverse of
    u_v_to_vort_div up to the zonal-mean solid-body null space; reference
    winds.py:49-79)."""
    vort = jnp.asarray(vort)
    nlat, nlon = vort.shape[-2], vort.shape[-1]
    sht = RealSHT(nlat, nlon, grid=grid, precision=precision)
    ivsht = InverseRealVectorSHT(nlat, nlon, grid=grid,
                                 precision=precision)
    ell = jnp.arange(sht.lmax, dtype=jnp.float32)
    inv_lap = jnp.where(ell > 0, -1.0 / (ell * (ell + 1.0) + 1e-30), 0.0)[
        :, None
    ]
    chi = sht(jnp.asarray(div)) * inv_lap  # velocity potential
    psi = sht(vort) * inv_lap  # streamfunction
    f = ivsht(jnp.stack([chi, psi], axis=-3))
    u = f[..., 1, :, :]
    v = -f[..., 0, :, :]
    return u, v
