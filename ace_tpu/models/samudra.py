"""Samudra ocean emulator: ConvNeXt-style U-Net with circular longitude
padding (reference: fme/ace/models/ocean/m2lines/samudra.py:18,
layers.py:65 ConvNeXtBlock, activations.py CappedGELU).

Channels-last layout; convs are NHWC (XLA's native TPU conv layout).
Padding semantics match the reference: circular along longitude,
zero (constant) along latitude.
"""

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ace_tpu.models.layers import exact_gelu


def capped_gelu(x, cap: float = 1.0):
    """GELU clamped at ``cap`` (reference: activations.py CappedGELU).

    The reference uses torch.nn.GELU's exact (erf) form, not the tanh
    approximation.
    """
    return jnp.minimum(exact_gelu(x), cap)


def pad_lon_circular_lat_zero(x, pad: int):
    """Pad [..., H, W, C]: circular along W (lon), zeros along H (lat)."""
    if pad == 0:
        return x
    x = jnp.concatenate(
        [x[..., :, -pad:, :], x, x[..., :, :pad, :]], axis=-2
    )
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (pad, pad)
    return jnp.pad(x, cfg)


class ConvNeXtBlock(nn.Module):
    """(reference: m2lines/layers.py:65)."""

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    upscale_factor: int = 4
    norm: str | None = "instance"
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x):
        if self.norm == "instance":
            mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
            var = jnp.var(x, axis=(-3, -2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm == "layer":
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm is None:
            return x
        raise NotImplementedError(f"norm {self.norm}")

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        hidden = int(in_channels * self.upscale_factor)
        pad = (
            self.kernel_size + (self.kernel_size - 1) * (self.dilation - 1)
            - 1
        ) // 2
        if in_channels == self.out_channels:
            skip = x
        else:
            skip = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                name="skip_conv",
            )(x)
        h = pad_lon_circular_lat_zero(x, pad)
        h = nn.Conv(
            hidden, (self.kernel_size, self.kernel_size),
            kernel_dilation=self.dilation, padding="VALID",
            dtype=self.dtype, name="conv1",
        )(h)
        h = capped_gelu(self._norm(h))
        h = pad_lon_circular_lat_zero(h, pad)
        h = nn.Conv(
            hidden, (self.kernel_size, self.kernel_size),
            kernel_dilation=self.dilation, padding="VALID",
            dtype=self.dtype, name="conv2",
        )(h)
        h = capped_gelu(self._norm(h))
        h = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="conv_out"
        )(h)
        return h + skip


def bilinear_upsample(x, factor: int = 2, zonally_periodic: bool = False):
    """[..., H, W, C] bilinear upsample (align_corners=False).

    With ``zonally_periodic`` the longitude seam is interpolated against
    its wrapped neighbor (reference: m2lines/layers.py:20
    ZonallyPeriodicBilinearUpsample), removing the lon=0 seam.
    """
    h, w = x.shape[-3], x.shape[-2]
    if not zonally_periodic:
        return jax.image.resize(
            x, (*x.shape[:-3], h * factor, w * factor, x.shape[-1]),
            method="bilinear",
        )
    padded = jnp.concatenate(
        [x[..., :, -1:, :], x, x[..., :, :1, :]], axis=-2
    )
    up = jax.image.resize(
        padded,
        (*x.shape[:-3], h * factor, (w + 2) * factor, x.shape[-1]),
        method="bilinear",
    )
    return up[..., :, factor : factor + w * factor, :]


class Samudra(nn.Module):
    """(reference: m2lines/samudra.py:18)."""

    out_channels: int
    ch_width: Sequence[int] = (200, 250, 300, 400)
    dilation: Sequence[int] = (1, 2, 4, 8)
    n_layers: Sequence[int] = (1, 1, 1, 1)
    norm: str | None = "instance"
    upscale_factor: int = 4
    zonally_periodic_upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        skips = []
        # encoder
        for i, width in enumerate(self.ch_width):
            x = ConvNeXtBlock(
                out_channels=width, dilation=self.dilation[i],
                upscale_factor=self.upscale_factor, norm=self.norm,
                dtype=self.dtype, name=f"down_{i}",
            )(x)
            skips.append(x)
            # avg pool 2x
            h2, w2 = x.shape[-3] // 2, x.shape[-2] // 2
            x = x[..., : h2 * 2, : w2 * 2, :]
            x = x.reshape(*x.shape[:-3], h2, 2, w2, 2, x.shape[-1]).mean(
                axis=(-4, -2)
            )
        # bottleneck
        x = ConvNeXtBlock(
            out_channels=self.ch_width[-1], dilation=self.dilation[-1],
            upscale_factor=self.upscale_factor, norm=self.norm,
            dtype=self.dtype, name="bottleneck",
        )(x)
        x = bilinear_upsample(x, zonally_periodic=self.zonally_periodic_upsample)
        # decoder
        widths_up = list(self.ch_width[::-1][1:]) + [self.ch_width[0]]
        dil_up = list(self.dilation[::-1])
        for i in range(len(self.ch_width)):
            skip = skips[len(self.ch_width) - 1 - i]
            # pad to the skip's spatial shape (circular lon, zero lat)
            dh = skip.shape[-3] - x.shape[-3]
            dw = skip.shape[-2] - x.shape[-2]
            if dw > 0:
                # circular pad split left/right as the reference does
                # (samudra.py:198 pads_lr with mode=self.pad)
                left, right = dw // 2, dw - dw // 2
                parts = []
                if left:
                    parts.append(x[..., :, -left:, :])
                parts.append(x)
                if right:
                    parts.append(x[..., :, :right, :])
                x = jnp.concatenate(parts, axis=-2)
            if dh > 0:
                cfg = [(0, 0)] * x.ndim
                cfg[-3] = (dh // 2, dh - dh // 2)
                x = jnp.pad(x, cfg)
            x = x + skip if x.shape[-1] == skip.shape[-1] else x
            # The reference's final decoder block reuses the previous loop's
            # index (samudra.py:151-163 uses dilation_reversed[i] where i is
            # left over from the pairwise loop), so its dilation is
            # dilation_reversed[len-2], not [len-1].
            dil_idx = min(i, max(len(self.ch_width) - 2, 0))
            x = ConvNeXtBlock(
                out_channels=widths_up[i] if i < len(widths_up) else
                self.ch_width[0],
                dilation=dil_up[dil_idx],
                upscale_factor=self.upscale_factor, norm=self.norm,
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            if i < len(self.ch_width) - 1:
                x = bilinear_upsample(
                    x, zonally_periodic=self.zonally_periodic_upsample
                )
        # final conv (circular lon, zero lat padding)
        x = pad_lon_circular_lat_zero(x, 1)
        out = nn.Conv(
            self.out_channels, (3, 3), padding="VALID",
            dtype=self.dtype, name="head",
        )(x)
        return out.astype(jnp.float32)
