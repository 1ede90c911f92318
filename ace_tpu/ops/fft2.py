"""2D real Fourier transforms with mode truncation/padding, as an
alternative spectral transform for FNO blocks
(reference: fme/fft.py RealFFT2/InverseRealFFT2 + the
spectral_transform="fft" SFNO path, makani/sfnonet.py:496).

Interface-compatible with RealSHT/InverseRealSHT (channels-last
[..., H, W, C] <-> complex [..., lmax, mmax, C]; lmax/mmax/nlat/nlon/grid
attributes) so FNO blocks can swap transforms. The latitude axis keeps
both positive and negative frequencies (lmax modes, centered layout is
NOT used — the first lmax rows of the full FFT, matching the reference's
truncation), the longitude axis is a real FFT (mmax modes).
"""

import jax
import jax.numpy as jnp


class RealFFT2:
    def __init__(self, nlat: int, nlon: int, lmax: int | None = None,
                 mmax: int | None = None, channels_last: bool = True,
                 precision=None):
        # precision accepted for interface parity with RealSHT; the XLA
        # FFT is exact in float32
        self.precision = precision
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or (nlon // 2 + 1)
        self.grid = "fft"
        if not channels_last:
            raise NotImplementedError("channels_last only")

    def __call__(self, x: jax.Array) -> jax.Array:
        # [..., H, W, C]: rfft over W (axis -2), full fft over H (axis -3)
        x = x.astype(jnp.float32)
        xm = jnp.fft.rfft(x, axis=-2, norm="ortho")
        xl = jnp.fft.fft(xm, axis=-3, norm="ortho")
        # truncate (or zero-pad) to (lmax, mmax)
        out = xl[..., : self.lmax, : self.mmax, :]
        pad = [(0, 0)] * out.ndim
        pad[-3] = (0, max(0, self.lmax - out.shape[-3]))
        pad[-2] = (0, max(0, self.mmax - out.shape[-2]))
        return jnp.pad(out, pad)


class InverseRealFFT2:
    def __init__(self, nlat: int, nlon: int, lmax: int | None = None,
                 mmax: int | None = None, channels_last: bool = True,
                 precision=None):
        self.precision = precision
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or (nlon // 2 + 1)
        self.grid = "fft"
        if not channels_last:
            raise NotImplementedError("channels_last only")

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        # pad modes back to the full grid sizes
        pad = [(0, 0)] * coeffs.ndim
        pad[-3] = (0, max(0, self.nlat - coeffs.shape[-3]))
        pad[-2] = (0, max(0, self.nlon // 2 + 1 - coeffs.shape[-2]))
        x = jnp.pad(coeffs, pad)
        x = jnp.fft.ifft(x, axis=-3, norm="ortho")
        # enforce Hermitian symmetry on the real-FFT axis endpoints after
        # the latitude inverse (reference: fft.py:89 irfft zeroes the
        # imaginary part of the m=0 and Nyquist columns)
        x = x.at[..., 0, :].set(jnp.real(x[..., 0, :]) + 0j)
        if self.nlon % 2 == 0 and x.shape[-2] > self.nlon // 2:
            x = x.at[..., self.nlon // 2, :].set(
                jnp.real(x[..., self.nlon // 2, :]) + 0j
            )
        return jnp.fft.irfft(
            x, n=self.nlon, axis=-2, norm="ortho"
        ).astype(jnp.float32)
