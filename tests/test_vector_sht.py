"""Vector SHT and vorticity/divergence winds (reference:
scripts/vort_div/winds.py + test_winds.py; torch_harmonics
RealVectorSHT semantics). Validation is against analytic physics
identities since torch_harmonics is not installed:

- solid-body rotation u = cos(lat) has vorticity 2 sin(lat), zero
  divergence;
- constant meridional flow is exactly curl-free;
- (vort, div) -> (u, v) -> (vort, div) is the identity for mean-free
  band-limited fields;
- the vector transform round-trips random spheroidal/toroidal
  potentials.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.ops.legendre import precompute_dlegpoly, precompute_legpoly
from ace_tpu.ops.sht import InverseRealSHT, quadrature_for_grid
from ace_tpu.ops.vector_sht import (
    InverseRealVectorSHT,
    RealVectorSHT,
    u_v_to_vort_div,
    vort_div_to_u_v,
)

NLAT, NLON = 24, 48


def _latitudes(grid="legendre-gauss"):
    cost, _, _ = quadrature_for_grid(grid, NLAT)
    # colatitude ascending (north first) -> latitude descending
    return 90.0 - np.rad2deg(np.flip(np.arccos(cost)))


def test_dlegpoly_matches_finite_difference():
    theta = np.linspace(0.15, np.pi - 0.15, 9)
    dp, q = precompute_dlegpoly(6, 8, theta)
    h = 1e-6
    fd = (
        precompute_legpoly(6, 8, theta + h)
        - precompute_legpoly(6, 8, theta - h)
    ) / (2 * h)
    np.testing.assert_allclose(dp, fd, atol=1e-7)
    p = precompute_legpoly(6, 8, theta)
    m = np.arange(6)[:, None, None]
    np.testing.assert_allclose(
        q, m * p / np.sin(theta)[None, None, :], atol=1e-12
    )
    # pole-safe: no NaN/inf at theta = 0, pi
    dp0, q0 = precompute_dlegpoly(6, 8, np.array([0.0, np.pi]))
    assert np.isfinite(dp0).all() and np.isfinite(q0).all()


def test_solid_body_rotation_vorticity():
    lat = np.deg2rad(_latitudes())
    u = np.cos(lat)[:, None] * np.ones((NLAT, NLON))
    v = np.zeros_like(u)
    vort, div = u_v_to_vort_div(u, v)
    expected_vort = 2.0 * np.sin(lat)[:, None] * np.ones((NLAT, NLON))
    np.testing.assert_allclose(np.asarray(vort), expected_vort, atol=1e-4)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-4)


def test_constant_u_hemispheric_vorticity_signs():
    """Reference test semantics (scripts/vort_div/test_winds.py:11-34):
    constant eastward wind is divergence-free with cyclonic (positive)
    curl in the northern hemisphere."""
    u = np.ones((NLAT, NLON))
    v = np.zeros_like(u)
    vort, div = u_v_to_vort_div(u, v)
    vort = np.asarray(vort)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-3)
    # constant u is not band-limited (vorticity cot(colat) diverges at the
    # poles), so truncation ringing can flip signs near the equator; the
    # hemispheric integrals are robust. North pole is index 0 here.
    _, w, _ = quadrature_for_grid("legendre-gauss", NLAT)
    w = np.flip(w)
    north = (vort[: NLAT // 2].mean(1) * w[: NLAT // 2]).sum()
    south = (vort[NLAT // 2:].mean(1) * w[NLAT // 2:]).sum()
    assert north > 0.5
    assert south < -0.5
    # pointwise signs hold away from the ringing band
    assert (vort[: NLAT // 3] > 0).all()
    assert (vort[-NLAT // 3:] < 0).all()


def test_constant_v_is_curl_free():
    u = np.zeros((NLAT, NLON))
    v = np.ones_like(u)
    vort, div = u_v_to_vort_div(u, v)
    np.testing.assert_allclose(np.asarray(vort), 0.0, atol=1e-4)
    assert np.abs(np.asarray(div)).max() > 0.1


def _random_band_limited(rng, lmax_keep):
    """Mean-free random field with modes only below lmax_keep."""
    isht = InverseRealSHT(NLAT, NLON)
    coeffs = np.zeros((isht.lmax, isht.mmax), np.complex64)
    block = rng.randn(lmax_keep, lmax_keep) + 1j * rng.randn(
        lmax_keep, lmax_keep
    )
    coeffs[:lmax_keep, :lmax_keep] = np.triu(block.T).T
    coeffs[:, 0] = coeffs[:, 0].real  # m=0 must be real
    coeffs[0, 0] = 0.0  # mean-free
    return np.asarray(isht(jnp.asarray(coeffs)))


def test_vort_div_roundtrip():
    rng = np.random.RandomState(0)
    vort0 = _random_band_limited(rng, 8)
    div0 = _random_band_limited(rng, 8)
    u, v = vort_div_to_u_v(vort0, div0)
    vort1, div1 = u_v_to_vort_div(u, v)
    scale = np.abs(vort0).max()
    np.testing.assert_allclose(
        np.asarray(vort1), vort0, atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(div1), div0, atol=2e-4 * np.abs(div0).max()
    )


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
def test_vector_sht_roundtrip(grid):
    """inverse -> forward recovers band-limited potentials exactly."""
    rng = np.random.RandomState(1)
    vsht = RealVectorSHT(NLAT, NLON, grid=grid)
    ivsht = InverseRealVectorSHT(NLAT, NLON, grid=grid)
    keep = 8
    st = np.zeros((2, vsht.lmax, vsht.mmax), np.complex64)
    block = rng.randn(2, keep, keep) + 1j * rng.randn(2, keep, keep)
    st[:, :keep, :keep] = np.where(
        np.arange(keep)[:, None] >= np.arange(keep)[None, :], block, 0
    )
    st[:, :, 0] = st[:, :, 0].real
    st[:, 0, :] = 0.0  # l = 0 carries no tangent field
    field = ivsht(jnp.asarray(st))
    st2 = np.asarray(vsht(field))
    # within the kept band the projection is quadrature-exact; above it,
    # Clenshaw-Curtiss (equiangular) aliases slightly at the top l just
    # like the scalar transform, so only Gauss is checked to the top
    scale = np.abs(st).max()
    np.testing.assert_allclose(
        st2[:, :keep], st[:, :keep], atol=3e-5 * scale
    )
    if grid == "legendre-gauss":
        np.testing.assert_allclose(
            st2[:, keep:], 0.0, atol=3e-5 * scale
        )


def test_vector_sht_batch_shapes():
    rng = np.random.RandomState(2)
    vsht = RealVectorSHT(NLAT, NLON)
    x = rng.randn(3, 2, NLAT, NLON).astype(np.float32)
    out = vsht(jnp.asarray(x))
    assert out.shape == (3, 2, vsht.lmax, vsht.mmax)
    ivsht = InverseRealVectorSHT(NLAT, NLON)
    back = ivsht(out)
    assert back.shape == (3, 2, NLAT, NLON)
