"""HEALPix (DLWP-style) padding and UNet
(reference: fme/ace/models/healpix/healpix_paddings.py:239 HEALPixPadding
— Karlbauer et al. 2024 scheme — and healpix UNet stack in
fme/ace/models/healpix/; face layout per the module docstring there:
faces 0-3 north, 4-7 equator, 8-11 south).

Data layout here is channels-last: [batch, 12, H, W, C]; rotations act in
the (H, W) plane (axes -3, -2). Tested leaf-for-leaf against the torch
reference padding as an oracle.
"""

import dataclasses
from collections.abc import Sequence
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from ace_tpu.models.layers import exact_gelu
import numpy as np

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


def capped_gelu(x, cap: float = 10.0):
    """Exact-erf GELU clamped at ``cap``
    (reference: healpix_activations.py CappedGELU)."""
    return jnp.minimum(exact_gelu(x), cap)


def _apply_faces(x, fn):
    """Apply ``fn`` over [B*12, H, W, C] given x: [..., 12, H, W, C]."""
    batch_dims = x.shape[:-3]
    out = fn(x.reshape(-1, *x.shape[-3:]))
    return out.reshape(*batch_dims, *out.shape[-3:])


class _FaceConv(nn.Module):
    """HEALPixLayer(Conv2d): neighbor-pad by ((k-1)//2)*dilation, then a
    VALID conv per face (reference: healpix_layers.py:48 HEALPixLayer)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = ((self.kernel_size - 1) // 2) * self.dilation
        if p > 0:
            x = healpix_pad(x, p)
        conv = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            kernel_dilation=self.dilation, padding="VALID",
            dtype=self.dtype, name="conv",
        )
        return _apply_faces(x, conv)


class BasicConvBlock(nn.Module):
    """n stacked face convs, each followed by the optional activation
    (reference: healpix_blocks.py:868 BasicConvBlock)."""

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    n_layers: int = 1
    latent_channels: int | None = None
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        latent = self.latent_channels
        if latent is None:
            latent = max(x.shape[-1], self.out_channels)
        for n in range(self.n_layers):
            feats = (
                self.out_channels if n == self.n_layers - 1 else latent
            )
            x = _FaceConv(
                feats, self.kernel_size, self.dilation, self.dtype,
                name=f"conv_{n}",
            )(x)
            if self.cap_value is not None:
                x = capped_gelu(x, self.cap_value)
        return x


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block: k-conv up, k-conv, 1x1 down, plus a 1x1 skip
    (reference: healpix_blocks.py:932 ConvNeXtBlock)."""

    out_channels: int
    latent_channels: int = 1
    kernel_size: int = 3
    dilation: int = 1
    upscale_factor: int = 4
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    def _act(self, x):
        return x if self.cap_value is None else capped_gelu(x, self.cap_value)

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == self.out_channels:
            skip = x
        else:
            skip = _FaceConv(
                self.out_channels, 1, 1, self.dtype, name="skip"
            )(x)
        hidden = int(self.latent_channels * self.upscale_factor)
        h = self._act(_FaceConv(
            hidden, self.kernel_size, self.dilation, self.dtype,
            name="conv1",
        )(x))
        h = self._act(_FaceConv(
            hidden, self.kernel_size, self.dilation, self.dtype,
            name="conv2",
        )(h))
        h = _FaceConv(self.out_channels, 1, 1, self.dtype, name="conv3")(h)
        return skip + h


class SymmetricConvNeXtBlock(nn.Module):
    """Symmetric ConvNeXt: k-conv -> 1x1 up -> 1x1 down -> k-conv, with the
    reference's skip quirk (identity iff in_channels == latent_channels,
    else a 1x1 to out_channels)
    (reference: healpix_blocks.py:1214 SymmetricConvNeXtBlock)."""

    out_channels: int
    latent_channels: int = 1
    kernel_size: int = 3
    dilation: int = 1
    upscale_factor: int = 4
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    def _act(self, x):
        return x if self.cap_value is None else capped_gelu(x, self.cap_value)

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == int(self.latent_channels):
            skip = x
        else:
            skip = _FaceConv(
                self.out_channels, 1, 1, self.dtype, name="skip"
            )(x)
        latent = int(self.latent_channels)
        hidden = int(self.latent_channels * self.upscale_factor)
        h = self._act(_FaceConv(
            latent, self.kernel_size, self.dilation, self.dtype,
            name="conv1",
        )(x))
        h = self._act(_FaceConv(hidden, 1, self.dilation, self.dtype,
                                name="conv2")(h))
        h = self._act(_FaceConv(latent, 1, self.dilation, self.dtype,
                                name="conv3")(h))
        h = self._act(_FaceConv(
            self.out_channels, self.kernel_size, self.dilation,
            self.dtype, name="conv4",
        )(h))
        return skip + h


class MultiSymmetricConvNeXtBlock(nn.Module):
    """``n_layers`` stacked SymmetricConvNeXtBlocks
    (reference: healpix_blocks.py:1337)."""

    out_channels: int
    latent_channels: int = 1
    kernel_size: int = 3
    dilation: int = 1
    upscale_factor: int = 4
    n_layers: int = 1
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = SymmetricConvNeXtBlock(
                out_channels=self.out_channels,
                latent_channels=self.latent_channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                upscale_factor=self.upscale_factor,
                cap_value=self.cap_value,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        return x


def _pool_faces(x, pooling: int, reduce: str):
    """Per-face 2D pooling (kernel==stride; no HEALPix pad needed since
    HEALPixLayer computes zero padding for kernel 2)."""
    b = x.shape[:-3]
    hh, ww = x.shape[-3] // pooling, x.shape[-2] // pooling
    r = x.reshape(*b, hh, pooling, ww, pooling, x.shape[-1])
    return r.max(axis=(-4, -2)) if reduce == "max" else r.mean(
        axis=(-4, -2)
    )


class MaxPool(nn.Module):
    pooling: int = 2

    def __call__(self, x):
        return _pool_faces(x, self.pooling, "max")


class AvgPool(nn.Module):
    pooling: int = 2

    def __call__(self, x):
        return _pool_faces(x, self.pooling, "mean")


class DealiasedDownsample(nn.Module):
    """log2(stride) stages of fixed depthwise blur at stride 2 with
    HEALPix neighbor padding (reference: healpix_blocks.py:562)."""

    resample_filter: tuple = (1.0, 2.0, 1.0)
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = np.asarray(self.resample_filter, np.float32)
        f2d = f[:, None] * f[None, :]
        f2d = f2d / f2d.sum()
        m = f.shape[0]
        p = (m - 1) // 2
        n_stages = int(np.log2(self.stride))
        c = x.shape[-1]
        # depthwise kernel [kh, kw, 1, C] with feature_group_count=C
        kernel = jnp.asarray(
            np.tile(f2d[:, :, None, None], (1, 1, 1, c)), self.dtype
        )
        for _ in range(n_stages):
            if p > 0:
                x = healpix_pad(x, p)

            def blur(flat):
                return jax.lax.conv_general_dilated(
                    flat.astype(self.dtype), kernel,
                    window_strides=(2, 2), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                )

            x = _apply_faces(x, blur)
        return x


class TransposedConvUpsample(nn.Module):
    """kernel==stride transposed conv (disjoint output blocks), expressed
    as an einsum + reshape (reference: healpix_blocks.py:636)."""

    out_channels: int
    upsampling: int = 2
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.upsampling
        c_in = x.shape[-1]
        # torch ConvTranspose2d weight [in, out, kh, kw] -> here [kh, kw,
        # in, out] for a consistent convention with nn.Conv kernels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform", in_axis=(0, 1, 3),
            ),
            (r, r, c_in, self.out_channels), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,),
            jnp.float32,
        )
        out = jnp.einsum(
            "...hwc,ijco->...hiwjo", x.astype(self.dtype),
            kernel.astype(self.dtype),
        )
        out = out.reshape(
            *x.shape[:-3], x.shape[-3] * r, x.shape[-2] * r,
            self.out_channels,
        ) + bias.astype(self.dtype)
        if self.cap_value is not None:
            out = capped_gelu(out, self.cap_value)
        return out


class SmoothedInterpolateConv(nn.Module):
    """HEALPix-pad, interpolate, four-point smooth, trim, then face conv
    (reference: healpix_blocks.py:762 SmoothedInterpolateConv)."""

    out_channels: int
    kernel_size: int = 3
    scale_factor: int = 2
    mode: str = "nearest"
    cap_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # HEALPixLayer wraps SmoothedInterpolate with default kernel 3 ->
        # pad 1 with real neighbor data, trim 1 after smoothing
        x = healpix_pad(x, 1)
        c = x.shape[-1]

        def up(flat):
            hh, ww = flat.shape[-3], flat.shape[-2]
            r = self.scale_factor
            if self.mode == "nearest":
                y = jnp.repeat(jnp.repeat(flat, r, axis=-3), r, axis=-2)
            else:
                y = jax.image.resize(
                    flat, (*flat.shape[:-3], hh * r, ww * r, c),
                    method="bilinear",
                )
            # four-point cross smoother, depthwise, /4, VALID
            k = np.zeros((3, 3), np.float32)
            k[0, 1] = k[1, 0] = k[1, 2] = k[2, 1] = 1.0
            kernel = jnp.asarray(
                np.tile(k[:, :, None, None], (1, 1, 1, c)), y.dtype
            )
            y = jax.lax.conv_general_dilated(
                y, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            ) / 4.0
            return y[:, 1:-1, 1:-1]

        x = _apply_faces(x.astype(self.dtype), up)
        out = _FaceConv(
            self.out_channels, self.kernel_size, 1, self.dtype,
            name="conv",
        )(x)
        if self.cap_value is not None:
            out = capped_gelu(out, self.cap_value)
        return out


class InterpolateUpsample(nn.Module):
    """Plain per-face interpolation upsample (reference: Interpolate)."""

    stride: int = 2
    mode: str = "nearest"

    def __call__(self, x):
        r = self.stride
        if self.mode == "nearest":
            return jnp.repeat(jnp.repeat(x, r, axis=-3), r, axis=-2)
        return _apply_faces(
            x,
            lambda flat: jax.image.resize(
                flat,
                (flat.shape[0], flat.shape[1] * r, flat.shape[2] * r,
                 flat.shape[3]),
                method="bilinear",
            ),
        )


# --- config dataclasses ({block_type}-discriminated, matching the
# reference's YAML surface: fme/ace/models/healpix/healpix_blocks.py) ---


@dataclasses.dataclass
class CappedGELUConfig:
    cap_value: float = 10

    @property
    def cap(self):
        return float(self.cap_value)


@dataclasses.dataclass
class MaxPoolDownsamplingBlockConfig:
    block_type: Literal["MaxPool"] = "MaxPool"
    pooling: int = 2

    def build(self, in_channels=None, dtype=jnp.float32, name=None):
        return MaxPool(pooling=self.pooling, name=name)


@dataclasses.dataclass
class AvgPoolDownsamplingBlockConfig:
    block_type: Literal["AvgPool"] = "AvgPool"
    pooling: int = 2

    def build(self, in_channels=None, dtype=jnp.float32, name=None):
        return AvgPool(pooling=self.pooling, name=name)


@dataclasses.dataclass
class DealiasedDownsampleBlockConfig:
    block_type: Literal["DealiasedDownsample"] = "DealiasedDownsample"
    pooling: int = 2
    resample_filter: list[float] = dataclasses.field(
        default_factory=lambda: [1.0, 2.0, 1.0]
    )

    def build(self, in_channels=None, dtype=jnp.float32, name=None):
        return DealiasedDownsample(
            resample_filter=tuple(self.resample_filter),
            stride=self.pooling, dtype=dtype, name=name,
        )


DownsamplingBlockConfig = (
    MaxPoolDownsamplingBlockConfig
    | AvgPoolDownsamplingBlockConfig
    | DealiasedDownsampleBlockConfig
)


@dataclasses.dataclass
class TransposedConvUpsampleBlockConfig:
    block_type: Literal["TransposedConvUpsample"] = "TransposedConvUpsample"
    stride: int = 2
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, dtype=jnp.float32,
              name=None):
        return TransposedConvUpsample(
            out_channels=out_channels, upsampling=self.stride,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


@dataclasses.dataclass
class SmoothedInterpolateConvBlockConfig:
    block_type: Literal["SmoothedInterpolateConv"] = "SmoothedInterpolateConv"
    stride: int = 2
    kernel_size: int = 3
    dilation: int = 1
    upsample_mode: str = "nearest"
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, dtype=jnp.float32,
              name=None):
        if self.dilation > 1:
            raise ValueError(
                "dilation > 1 is not supported for HEALPix resize convs"
            )
        return SmoothedInterpolateConv(
            out_channels=out_channels, kernel_size=self.kernel_size,
            scale_factor=self.stride, mode=self.upsample_mode,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


@dataclasses.dataclass
class InterpolateUpsampleBlockConfig:
    block_type: Literal["Interpolate"] = "Interpolate"
    stride: int = 2
    upsample_mode: str = "nearest"
    align_corners: bool = False

    def build(self, in_channels, out_channels, dtype=jnp.float32,
              name=None):
        return InterpolateUpsample(
            stride=self.stride, mode=self.upsample_mode, name=name
        )


UpsamplingBlockConfig = (
    TransposedConvUpsampleBlockConfig
    | SmoothedInterpolateConvBlockConfig
    | InterpolateUpsampleBlockConfig
)


@dataclasses.dataclass
class BasicConvBlockConfig:
    block_type: Literal["BasicConvBlock"] = "BasicConvBlock"
    kernel_size: int = 3
    n_layers: int = 1
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, latent_channels=None,
              dilation=1, n_layers=None, dtype=jnp.float32, name=None):
        return BasicConvBlock(
            out_channels=out_channels, kernel_size=self.kernel_size,
            dilation=dilation,
            n_layers=self.n_layers if n_layers is None else n_layers,
            latent_channels=latent_channels,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


@dataclasses.dataclass
class ConvNeXtBlockConfig:
    block_type: Literal["ConvNeXtBlock"] = "ConvNeXtBlock"
    kernel_size: int = 3
    upscale_factor: int = 4
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, latent_channels=None,
              dilation=1, n_layers=None, dtype=jnp.float32, name=None):
        return ConvNeXtBlock(
            out_channels=out_channels,
            latent_channels=(
                1 if latent_channels is None else latent_channels
            ),
            kernel_size=self.kernel_size, dilation=dilation,
            upscale_factor=self.upscale_factor,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


@dataclasses.dataclass
class SymmetricConvNeXtBlockConfig:
    block_type: Literal["SymmetricConvNeXtBlock"] = "SymmetricConvNeXtBlock"
    kernel_size: int = 3
    upscale_factor: int = 4
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, latent_channels=None,
              dilation=1, n_layers=None, dtype=jnp.float32, name=None):
        return SymmetricConvNeXtBlock(
            out_channels=out_channels,
            latent_channels=(
                1 if latent_channels is None else latent_channels
            ),
            kernel_size=self.kernel_size, dilation=dilation,
            upscale_factor=self.upscale_factor,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


@dataclasses.dataclass
class MultiSymmetricConvNeXtBlockConfig:
    block_type: Literal["Multi_SymmetricConvNeXtBlock"] = (
        "Multi_SymmetricConvNeXtBlock"
    )
    kernel_size: int = 3
    n_layers: int = 1
    upscale_factor: int = 4
    activation: CappedGELUConfig | None = None

    def build(self, in_channels, out_channels, latent_channels=None,
              dilation=1, n_layers=None, dtype=jnp.float32, name=None):
        return MultiSymmetricConvNeXtBlock(
            out_channels=out_channels,
            latent_channels=(
                1 if latent_channels is None else latent_channels
            ),
            kernel_size=self.kernel_size, dilation=dilation,
            upscale_factor=self.upscale_factor,
            n_layers=self.n_layers if n_layers is None else n_layers,
            cap_value=self.activation.cap if self.activation else None,
            dtype=dtype, name=name,
        )


ConvBlockConfig = (
    BasicConvBlockConfig
    | ConvNeXtBlockConfig
    | SymmetricConvNeXtBlockConfig
    | MultiSymmetricConvNeXtBlockConfig
)


@dataclasses.dataclass
class UNetEncoderConfig:
    """(reference: healpix_encoder.py UNetEncoderConfig)."""

    conv_block: ConvBlockConfig
    down_sampling_block: DownsamplingBlockConfig
    n_channels: list[int] = dataclasses.field(
        default_factory=lambda: [136, 68, 34]
    )
    n_layers: list[int] = dataclasses.field(
        default_factory=lambda: [2, 2, 1]
    )
    dilations: list[int] | None = None


@dataclasses.dataclass
class UNetDecoderConfig:
    """(reference: healpix_decoder.py UNetDecoderConfig)."""

    conv_block: ConvBlockConfig
    up_sampling_block: UpsamplingBlockConfig
    output_layer: ConvBlockConfig
    n_channels: list[int] = dataclasses.field(
        default_factory=lambda: [34, 68, 136]
    )
    n_layers: list[int] = dataclasses.field(
        default_factory=lambda: [1, 2, 2]
    )
    dilations: list[int] | None = None


class HEALPixUNet(nn.Module):
    """Feed-forward UNet on the 12 HEALPix faces with the reference's
    encoder/decoder wiring (reference: healpix_unet.py HEALPixUNet,
    healpix_encoder.py UNetEncoder, healpix_decoder.py UNetDecoder).

    Call: [batch, 12, H, W, C_in] -> [batch, 12, H, W, C_out].
    Encoder level n: (downsample if n>0) then conv block; the decoder runs
    deepest-to-shallowest, upsampling and concatenating the encoder skip,
    with each level's conv block mapping to the NEXT level's width.
    """

    out_channels: int
    encoder: UNetEncoderConfig = dataclasses.field(
        default_factory=lambda: UNetEncoderConfig(
            conv_block=ConvNeXtBlockConfig(activation=CappedGELUConfig()),
            down_sampling_block=AvgPoolDownsamplingBlockConfig(),
        )
    )
    decoder: UNetDecoderConfig = dataclasses.field(
        default_factory=lambda: UNetDecoderConfig(
            conv_block=ConvNeXtBlockConfig(activation=CappedGELUConfig()),
            up_sampling_block=TransposedConvUpsampleBlockConfig(
                activation=CappedGELUConfig()
            ),
            output_layer=BasicConvBlockConfig(kernel_size=1, n_layers=1),
        )
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        enc, dec = self.encoder, self.decoder
        if len(enc.n_channels) != len(dec.n_channels):
            raise ValueError(
                "encoder and decoder must have the same number of levels"
            )
        x = x.astype(self.dtype)
        enc_dil = enc.dilations or [1] * len(enc.n_channels)
        dec_dil = dec.dilations or [1] * len(dec.n_channels)

        # encoder (reference: healpix_encoder.py UNetEncoderConfig._build)
        encodings = []
        for n, ch in enumerate(enc.n_channels):
            if n > 0:
                x = enc.down_sampling_block.build(
                    in_channels=x.shape[-1], dtype=self.dtype,
                    name=f"encoder_down_{n}",
                )(x)
            x = enc.conv_block.build(
                in_channels=x.shape[-1], out_channels=ch,
                latent_channels=ch, dilation=enc_dil[n],
                n_layers=enc.n_layers[n], dtype=self.dtype,
                name=f"encoder_conv_{n}",
            )(x)
            encodings.append(x)

        # decoder (reference: healpix_decoder.py UNetDecoderConfig._build)
        n_levels = len(dec.n_channels)
        x = encodings[-1]
        for n, ch in enumerate(dec.n_channels):
            if n > 0:
                up = dec.up_sampling_block.build(
                    in_channels=ch, out_channels=ch, dtype=self.dtype,
                    name=f"decoder_up_{n}",
                )(x)
                x = jnp.concatenate(
                    [up, encodings[n_levels - 1 - n]], axis=-1
                )
            next_ch = (
                dec.n_channels[n + 1] if n < n_levels - 1
                else dec.n_channels[-1]
            )
            x = dec.conv_block.build(
                in_channels=x.shape[-1], out_channels=next_ch,
                latent_channels=ch, dilation=dec_dil[n],
                n_layers=dec.n_layers[n], dtype=self.dtype,
                name=f"decoder_conv_{n}",
            )(x)
        out = dec.output_layer.build(
            in_channels=x.shape[-1], out_channels=self.out_channels,
            dilation=dec_dil[-1], dtype=self.dtype, name="output_layer",
        )(x)
        return out.astype(jnp.float32)
