"""SHT correctness tests: quadrature exactness, analytic spherical
harmonics via scipy, roundtrip identity, and parity of the matmul-DFT with
numpy FFT semantics (reference test model: torch-harmonics conventions
consumed by fme/sht_fix.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from ace_tpu.ops.legendre import precompute_legpoly
from ace_tpu.ops.quadrature import (
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    lobatto_weights,
)
from ace_tpu.ops.sht import InverseRealSHT, RealSHT


@pytest.mark.parametrize(
    "fn,n,exact_degree",
    [
        (legendre_gauss_weights, 8, 15),
        (lobatto_weights, 8, 13),
        (clenshaw_curtiss_weights, 9, 8),
    ],
)
def test_quadrature_polynomial_exactness(fn, n, exact_degree):
    x, w = fn(n)
    for k in range(exact_degree + 1):
        est = np.sum(x**k * w)
        true = (1.0 - (-1.0) ** (k + 1)) / (k + 1)
        np.testing.assert_allclose(est, true, atol=1e-12, err_msg=f"degree {k}")


def test_legpoly_matches_scipy():
    theta = np.linspace(0.1, np.pi - 0.1, 7)
    lmax = mmax = 6
    pct = precompute_legpoly(mmax, lmax, theta, norm="ortho", csphase=True)
    for m in range(mmax):
        for l in range(m, lmax):
            # scipy sph_harm includes e^{im phi}; evaluate at phi=0 to get
            # the normalized ALP with Condon-Shortley phase.
            expected = scipy.special.sph_harm_y(l, m, theta, 0.0).real
            np.testing.assert_allclose(
                pct[m, l], expected, atol=1e-10, err_msg=f"l={l} m={m}"
            )


@pytest.mark.parametrize(
    "grid,atol", [("legendre-gauss", 1e-5), ("equiangular", 2e-3)]
)
def test_sht_analytic_harmonic(grid, atol):
    """SHT of Y_lm should give a single nonzero coefficient."""
    nlat, nlon = 24, 48
    sht = RealSHT(nlat, nlon, grid=grid)
    cost, _, _ = __import__(
        "ace_tpu.ops.sht", fromlist=["quadrature_for_grid"]
    ).quadrature_for_grid(grid, nlat)
    theta = np.flip(np.arccos(cost))  # ascending colatitude
    phi = 2 * np.pi * np.arange(nlon) / nlon
    l0, m0 = 3, 2
    ylm = scipy.special.sph_harm_y(l0, m0, theta[:, None], phi[None, :])
    # real field: Y + conj(Y) = 2 Re(Y)
    f = 2.0 * ylm.real
    coeffs = np.asarray(sht(jnp.asarray(f)))
    expected = np.zeros_like(coeffs)
    expected[l0, m0] = 1.0
    np.testing.assert_allclose(coeffs, expected, atol=atol)


@pytest.mark.parametrize(
    "grid,atol", [("legendre-gauss", 1e-4), ("equiangular", 5e-3)]
)
def test_sht_roundtrip(grid, atol):
    """inverse(forward(f)) == f for a band-limited field."""
    nlat, nlon = 16, 32
    rng = np.random.RandomState(0)
    sht = RealSHT(nlat, nlon, grid=grid)
    isht = InverseRealSHT(nlat, nlon, grid=grid)
    # synthesize a band-limited random field from random coefficients;
    # equiangular (Clenshaw-Curtis) quadrature is only exact to polynomial
    # degree nlat-1, so keep the band limit low enough for exactness there
    band = 10 if grid == "legendre-gauss" else 5
    coeffs = np.zeros((sht.lmax, sht.mmax), dtype=np.complex64)
    for l in range(min(sht.lmax, band)):
        for m in range(min(l + 1, sht.mmax)):
            c = rng.randn() + (1j * rng.randn() if m > 0 else 0.0)
            coeffs[l, m] = c
    f = np.asarray(isht(jnp.asarray(coeffs)))
    coeffs2 = np.asarray(sht(jnp.asarray(f)))
    # Clenshaw-Curtis (n nodes, exact to poly degree n-1) cannot resolve
    # orthogonality of P_l·P_l' once l+l' >= n, so spurious coefficients
    # appear at high l on the equiangular grid (true of any equiangular
    # SHT, incl. torch-harmonics). Compare only the exactly-resolved rows.
    cut = sht.lmax if grid == "legendre-gauss" else nlat - band
    np.testing.assert_allclose(coeffs2[:cut], coeffs[:cut], atol=atol)
    if grid == "legendre-gauss":
        # field-space roundtrip is only exact on the Gaussian grid
        f2 = np.asarray(isht(jnp.asarray(coeffs2)))
        np.testing.assert_allclose(f2, f, atol=atol)


def test_sht_batch_and_channels_last_agree():
    nlat, nlon = 12, 24
    rng = np.random.RandomState(1)
    x = rng.randn(2, nlat, nlon, 3).astype(np.float32)
    sht_cl = RealSHT(nlat, nlon, channels_last=True)
    sht = RealSHT(nlat, nlon)
    out_cl = np.asarray(sht_cl(jnp.asarray(x)))
    out = np.asarray(sht(jnp.asarray(np.moveaxis(x, -1, 1))))
    np.testing.assert_allclose(np.moveaxis(out_cl, -1, 1), out, atol=1e-5)

    isht_cl = InverseRealSHT(nlat, nlon, channels_last=True)
    isht = InverseRealSHT(nlat, nlon)
    back_cl = np.asarray(isht_cl(jnp.asarray(out_cl)))
    back = np.asarray(isht(jnp.asarray(out)))
    np.testing.assert_allclose(np.moveaxis(back_cl, -1, 1), back, atol=1e-5)


def test_forward_dft_matches_numpy_rfft():
    """The matmul DFT path must equal 2π * rfft(norm='forward')."""
    nlat, nlon = 8, 16
    rng = np.random.RandomState(2)
    x = rng.randn(nlat, nlon).astype(np.float32)
    sht = RealSHT(nlat, nlon)
    xm_ref = 2.0 * np.pi * np.fft.rfft(x, axis=-1) / nlon
    xm_ref = xm_ref[:, : sht.mmax]
    xr = np.asarray(
        jnp.einsum("...kj,jm->...km", jnp.asarray(x), sht._fc)
    )
    xi = np.asarray(
        jnp.einsum("...kj,jm->...km", jnp.asarray(x), sht._fs)
    )
    np.testing.assert_allclose(xr, xm_ref.real, atol=1e-4)
    np.testing.assert_allclose(xi, xm_ref.imag, atol=1e-4)


def test_truncation_pads_and_clips():
    nlat, nlon = 8, 16
    sht = RealSHT(nlat, nlon, lmax=6, mmax=5)
    isht = InverseRealSHT(nlat, nlon, lmax=6, mmax=5)
    x = np.random.RandomState(3).randn(nlat, nlon).astype(np.float32)
    c = sht(jnp.asarray(x))
    assert c.shape == (6, 5)
    y = isht(c)
    assert y.shape == (nlat, nlon)


@pytest.mark.medium_duration
def test_fft2_roundtrip_and_sfno_fft_transform():
    from ace_tpu.ops.fft2 import InverseRealFFT2, RealFFT2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 24, 3), jnp.float32)
    fwd = RealFFT2(12, 24)
    inv = InverseRealFFT2(12, 24)
    back = inv(fwd(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # truncated modes roundtrip the low-frequency content
    fwd_t = RealFFT2(12, 24, lmax=6, mmax=6)
    inv_t = InverseRealFFT2(12, 24, lmax=6, mmax=6)
    low = inv(
        jnp.pad(fwd(x)[..., :6, :6, :],
                ((0, 0), (0, 6), (0, 7), (0, 0)))
    )
    back_t = inv_t(fwd_t(x))
    np.testing.assert_allclose(
        np.asarray(back_t), np.asarray(low), atol=1e-5
    )

    import jax

    from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet

    net = SphericalFourierNeuralOperatorNet(
        img_shape=(12, 24), in_chans=2, out_chans=2, embed_dim=8,
        num_layers=2, operator_type="diagonal",
        spectral_transform="fft", data_grid="equiangular",
        scale_factor=1,
    )
    params = net.init(jax.random.PRNGKey(0), x[..., :2])
    out = net.apply(params, x[..., :2])
    assert out.shape == (2, 12, 24, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fused_pallas_sht_matches_einsum_path():
    """The fused DFT+Legendre Pallas kernel reproduces the einsum SHT
    (interpret mode on CPU; the TPU path compiles the same kernel)."""
    from ace_tpu.ops.sht import RealSHT

    nlat, nlon, C = 36, 72, 64
    sht = RealSHT(nlat, nlon, grid="legendre-gauss", channels_last=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, nlat, nlon, C), jnp.float32)
    ref = sht(x)
    fused = sht.forward_fused(
        x, l_tile=16, c_tile=32, k_tile=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-3
    )


@pytest.mark.parametrize(
    "nlat,nlon,lmax,mmax,grid,channels_last",
    [
        (16, 32, None, None, "legendre-gauss", False),
        (16, 32, None, None, "legendre-gauss", True),
        (9, 18, None, None, "equiangular", True),
        (9, 18, None, None, "lobatto", False),
        (12, 24, 7, 9, "legendre-gauss", True),
        (13, 24, 11, 10, "equiangular", False),
    ],
)
def test_parity_split_matches_dense(nlat, nlon, lmax, mmax, grid,
                                    channels_last):
    """The folded (equator-symmetric) Legendre contraction agrees with
    the dense einsum up to float reassociation on every grid family,
    odd/even nlat, truncation, and both layouts."""
    from ace_tpu.ops.sht import InverseRealSHT, RealSHT

    rng = np.random.RandomState(0)
    shape = (2, nlat, nlon, 3) if channels_last else (2, nlat, nlon)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    kw = dict(lmax=lmax, mmax=mmax, grid=grid, channels_last=channels_last)
    fwd_split = RealSHT(nlat, nlon, parity_split=True, **kw)
    fwd_dense = RealSHT(nlat, nlon, parity_split=False, **kw)
    assert fwd_split.parity_split
    c_split, c_dense = fwd_split(x), fwd_dense(x)
    scale = float(jnp.abs(c_dense).max())
    np.testing.assert_allclose(
        np.asarray(c_split), np.asarray(c_dense), atol=3e-6 * scale
    )
    inv_split = InverseRealSHT(nlat, nlon, parity_split=True, **kw)
    inv_dense = InverseRealSHT(nlat, nlon, parity_split=False, **kw)
    assert inv_split.parity_split
    y_split, y_dense = inv_split(c_dense), inv_dense(c_dense)
    scale = float(jnp.abs(y_dense).max())
    np.testing.assert_allclose(
        np.asarray(y_split), np.asarray(y_dense), atol=3e-6 * scale
    )
