"""SwinIR-style deterministic downscaling network
(reference: fme/downscaling/modules/swinir.py — shallow conv features,
residual Swin transformer blocks, pixel-shuffle upsampling;
Liang et al. 2021).

Channels-last; the upsampler is a conv to C*r^2 channels followed by a
reshape-based pixel shuffle (a pure layout op under XLA).
"""

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ace_tpu.models.swin import SwinBlock


def pixel_shuffle(x, factor: int):
    """[B, H, W, C*r^2] -> [B, H*r, W*r, C]."""
    b, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


class ResidualSwinBlockGroup(nn.Module):
    """RSTB: Swin blocks + conv with a residual connection
    (reference: swinir.py RSTB)."""

    dim: int
    depth: int
    num_heads: int
    window_size: tuple[int, int]
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for i in range(self.depth):
            h = SwinBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, deterministic=deterministic)
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="conv")(h)
        return x + h


class SwinIR(nn.Module):
    """(reference: swinir.py SwinIR). Input [B, h, w, C_in] at coarse
    resolution -> [B, h*factor, w*factor, C_out].
    """

    out_channels: int
    upscale_factor: int
    embed_dim: int = 96
    depths: Sequence[int] = (4, 4, 4)
    num_heads: int = 4
    window_size: tuple[int, int] = (4, 8)
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # shallow feature extraction
        shallow = nn.Conv(
            self.embed_dim, (3, 3), dtype=self.dtype, name="conv_first"
        )(x.astype(self.dtype))
        h = shallow
        for g, depth in enumerate(self.depths):
            h = ResidualSwinBlockGroup(
                dim=self.embed_dim,
                depth=depth,
                num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"group_{g}",
            )(h, deterministic=deterministic)
        h = nn.Conv(
            self.embed_dim, (3, 3), dtype=self.dtype, name="conv_body"
        )(h)
        h = shallow + h
        # pixel-shuffle upsampler
        r = self.upscale_factor
        h = nn.Conv(
            self.embed_dim * r * r, (3, 3), dtype=self.dtype,
            name="upsample_conv",
        )(h)
        h = pixel_shuffle(h, r)
        out = nn.Conv(
            self.out_channels, (3, 3), dtype=self.dtype, name="conv_last"
        )(h)
        return out.astype(jnp.float32)
