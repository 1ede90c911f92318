"""HEALPix (DLWP-style) padding and UNet
(reference: fme/ace/models/healpix/healpix_paddings.py:239 HEALPixPadding
— Karlbauer et al. 2024 scheme — and healpix UNet stack in
fme/ace/models/healpix/; face layout per the module docstring there:
faces 0-3 north, 4-7 equator, 8-11 south).

Data layout here is channels-last: [batch, 12, H, W, C]; rotations act in
the (H, W) plane (axes -3, -2). Tested leaf-for-leaf against the torch
reference padding as an oracle.
"""

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ROT_AXES = (-3, -2)


def _rot90(x, k):
    return jnp.rot90(x, k, axes=_ROT_AXES)


def _tl_corner(top, lft, p):
    """Synthetic top-left wedge for equatorial faces
    (reference: healpix_paddings.py:545 tl).
    """
    shape = (*top.shape[:-3], p, p, top.shape[-1])
    ret = jnp.zeros(shape, top.dtype)
    ret = ret.at[..., -1, -1, :].set(
        0.5 * top[..., -1, 0, :] + 0.5 * lft[..., 0, -1, :]
    )
    for i in range(1, p):
        ret = ret.at[..., -i - 1, -i:, :].set(top[..., -i - 1, :i, :])
        ret = ret.at[..., -i:, -i - 1, :].set(lft[..., :i, -i - 1, :])
        ret = ret.at[..., -i - 1, -i - 1, :].set(
            0.5 * top[..., -i - 1, 0, :] + 0.5 * lft[..., 0, -i - 1, :]
        )
    return ret


def _br_corner(b, r, p):
    """Synthetic bottom-right wedge (reference: healpix_paddings.py:582 br)."""
    shape = (*b.shape[:-3], p, p, b.shape[-1])
    ret = jnp.zeros(shape, b.dtype)
    ret = ret.at[..., 0, 0, :].set(
        0.5 * b[..., 0, -1, :] + 0.5 * r[..., -1, 0, :]
    )
    for i in range(1, p):
        ret = ret.at[..., :i, i, :].set(r[..., -i:, i, :])
        ret = ret.at[..., i, :i, :].set(b[..., i, -i:, :])
        ret = ret.at[..., i, i, :].set(
            0.5 * b[..., i, -1, :] + 0.5 * r[..., -1, i, :]
        )
    return ret


def _pn(c, t, tl, lft, bl, b, br, rgt, tr, p):
    """North-face padding (reference: healpix_paddings.py:379 pn)."""
    c = jnp.concatenate(
        [_rot90(t, 1)[..., -p:, :, :], c, b[..., :p, :, :]], axis=-3
    )
    left = jnp.concatenate([
        _rot90(tl, 2)[..., -p:, -p:, :],
        _rot90(lft, -1)[..., -p:, :],
        bl[..., :p, -p:, :],
    ], axis=-3)
    right = jnp.concatenate([
        tr[..., -p:, :p, :], rgt[..., :, :p, :], br[..., :p, :p, :]
    ], axis=-3)
    return jnp.concatenate([left, c, right], axis=-2)


def _pe(c, t, tl, lft, bl, b, br, rgt, tr, p):
    """Equatorial-face padding (reference: healpix_paddings.py:441 pe)."""
    c = jnp.concatenate([t[..., -p:, :, :], c, b[..., :p, :, :]], axis=-3)
    left = jnp.concatenate([
        tl, lft[..., -p:, :], bl[..., :p, -p:, :]
    ], axis=-3)
    right = jnp.concatenate([
        tr[..., -p:, :p, :], rgt[..., :, :p, :], br
    ], axis=-3)
    return jnp.concatenate([left, c, right], axis=-2)


def _ps(c, t, tl, lft, bl, b, br, rgt, tr, p):
    """South-face padding (reference: healpix_paddings.py:491 ps)."""
    c = jnp.concatenate(
        [t[..., -p:, :, :], c, _rot90(b, 1)[..., :p, :, :]], axis=-3
    )
    left = jnp.concatenate([
        tl[..., -p:, -p:, :], lft[..., -p:, :], bl[..., :p, -p:, :]
    ], axis=-3)
    right = jnp.concatenate([
        tr[..., -p:, :p, :],
        _rot90(rgt, -1)[..., :, :p, :],
        _rot90(br, 2)[..., :p, :p, :],
    ], axis=-3)
    return jnp.concatenate([left, c, right], axis=-2)


def healpix_pad(x: jax.Array, p: int) -> jax.Array:
    """Pad all 12 faces using neighbor values.

    x: [..., 12, H, W, C] -> [..., 12, H+2p, W+2p, C].
    """
    f = [jnp.take(x, i, axis=-4) for i in range(12)]
    padded = [
        _pn(f[0], f[1], f[2], f[3], f[3], f[4], f[8], f[5], f[1], p),
        _pn(f[1], f[2], f[3], f[0], f[0], f[5], f[9], f[6], f[2], p),
        _pn(f[2], f[3], f[0], f[1], f[1], f[6], f[10], f[7], f[3], p),
        _pn(f[3], f[0], f[1], f[2], f[2], f[7], f[11], f[4], f[0], p),
        _pe(f[4], f[0], _tl_corner(f[0], f[3], p), f[3], f[7], f[11],
            _br_corner(f[11], f[8], p), f[8], f[5], p),
        _pe(f[5], f[1], _tl_corner(f[1], f[0], p), f[0], f[4], f[8],
            _br_corner(f[8], f[9], p), f[9], f[6], p),
        _pe(f[6], f[2], _tl_corner(f[2], f[1], p), f[1], f[5], f[9],
            _br_corner(f[9], f[10], p), f[10], f[7], p),
        _pe(f[7], f[3], _tl_corner(f[3], f[2], p), f[2], f[6], f[10],
            _br_corner(f[10], f[11], p), f[11], f[4], p),
        _ps(f[8], f[5], f[0], f[4], f[11], f[11], f[10], f[9], f[9], p),
        _ps(f[9], f[6], f[1], f[5], f[8], f[8], f[11], f[10], f[10], p),
        _ps(f[10], f[7], f[2], f[6], f[9], f[9], f[8], f[11], f[11], p),
        _ps(f[11], f[4], f[3], f[7], f[10], f[10], f[9], f[8], f[8], p),
    ]
    return jnp.stack(padded, axis=-4)


class HEALPixConvBlock(nn.Module):
    """Conv block on HEALPix faces: neighbor-pad then VALID conv."""

    channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        h = healpix_pad(x, p) if p > 0 else x
        batch_dims = h.shape[:-3]
        flat = h.reshape(-1, *h.shape[-3:])
        out = nn.Conv(
            self.channels, (self.kernel_size, self.kernel_size),
            padding="VALID", dtype=self.dtype, name="conv",
        )(flat)
        out = nn.gelu(out, approximate=False)
        return out.reshape(*batch_dims, *out.shape[-3:])


class HEALPixUNet(nn.Module):
    """DLWP-style UNet over the 12 HEALPix faces
    (reference: fme/ace/models/healpix/ HEALPixUNet family; compact
    TPU-native encoder/decoder with neighbor-aware padding).

    Call: [batch, 12, H, W, C_in] -> [batch, 12, H, W, C_out].
    """

    out_channels: int
    hidden_channels: Sequence[int] = (64, 128, 256)
    n_layers_per_level: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        skips = []
        for level, ch in enumerate(self.hidden_channels):
            for j in range(self.n_layers_per_level):
                x = HEALPixConvBlock(
                    ch, dtype=self.dtype, name=f"down_{level}_{j}"
                )(x)
            if level < len(self.hidden_channels) - 1:
                skips.append(x)
                # 2x average pool per face
                b = x.shape[:-3]
                hh, ww, cc = x.shape[-3] // 2, x.shape[-2] // 2, x.shape[-1]
                x = x.reshape(*b, hh, 2, ww, 2, cc).mean(axis=(-4, -2))
        for level in reversed(range(len(self.hidden_channels) - 1)):
            ch = self.hidden_channels[level]
            # nearest-neighbor 2x upsample per face
            x = jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            for j in range(self.n_layers_per_level):
                x = HEALPixConvBlock(
                    ch, dtype=self.dtype, name=f"up_{level}_{j}"
                )(x)
        batch_dims = x.shape[:-3]
        flat = x.reshape(-1, *x.shape[-3:])
        out = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="head"
        )(flat)
        return out.reshape(*batch_dims, *out.shape[-3:]).astype(jnp.float32)
