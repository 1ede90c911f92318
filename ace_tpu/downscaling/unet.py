"""Noise-conditional UNet for diffusion downscaling (channels-last)
(reference analog: fme/downscaling/modules/unet_diffusion.py +
physicsnemo SongUNet family; compact TPU-native design rather than a
SongUNet translation).

Conditioning: the (upsampled) coarse fields are concatenated to the noisy
fine-resolution input; the noise level enters via Fourier time embeddings
modulating every residual block (scale+shift).
"""

import math
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FourierTimeEmbedding(nn.Module):
    """Gaussian Fourier features of c_noise (reference analog: SongUNet
    positional embedding of noise levels).
    """

    dim: int = 128

    @nn.compact
    def __call__(self, t):
        freqs = self.param(
            "freqs",
            nn.initializers.normal(stddev=16.0),
            (self.dim // 2,),
            jnp.float32,
        )
        ang = 2 * jnp.pi * t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class ResBlock(nn.Module):
    channels: int
    emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=jnp.float32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        # scale-shift modulation from the noise embedding
        mod = nn.Dense(2 * self.channels, name="emb_proj")(nn.silu(emb))
        scale, shift = jnp.split(mod[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(
            num_groups=min(32, self.channels), dtype=jnp.float32
        )(h)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Conv(
            self.channels, (3, 3), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv2",
        )(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class SelfAttention2d(nn.Module):
    """Spatial self-attention over the flattened grid
    (reference: physicsnemo_unets_v2/unets.py attn_resolutions /
    bottleneck_attention blocks). Zero-init output projection so the
    block starts as identity.
    """

    channels: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(32, c), dtype=jnp.float32)(x)
        y = y.reshape(b, h * w, c)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            out_kernel_init=nn.initializers.zeros, name="attn",
        )(y, y)
        return x + y.reshape(b, h, w, c)


class DiffusionUNet(nn.Module):
    """Raw network F for EDM preconditioning.

    Call: (x_in [B,H,W,C_out], condition [B,H,W,C_cond], c_noise [B])
    -> [B,H,W,C_out].
    """

    out_channels: int
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 2)
    num_res_blocks: int = 2
    emb_dim: int = 256
    # levels (indices into channel_mults) whose residual blocks are
    # followed by self-attention; the bottleneck always attends when
    # bottleneck_attention is set (reference: unets.py attn_resolutions)
    attn_levels: Sequence[int] = ()
    bottleneck_attention: bool = True
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, condition, c_noise):
        emb = FourierTimeEmbedding(dim=self.emb_dim)(c_noise)
        emb = nn.Dense(self.emb_dim, name="emb_fc1")(emb)
        emb = nn.Dense(self.emb_dim, name="emb_fc2")(nn.silu(emb))

        h = jnp.concatenate(
            [x.astype(self.dtype), condition.astype(self.dtype)], axis=-1
        )
        h = nn.Conv(self.base_channels, (3, 3), dtype=self.dtype,
                    name="stem")(h)
        skips = [h]
        # encoder
        for level, mult in enumerate(self.channel_mults):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks):
                h = ResBlock(ch, self.emb_dim, dtype=self.dtype,
                             name=f"down_{level}_{j}")(h, emb)
                if level in self.attn_levels:
                    h = SelfAttention2d(
                        ch, num_heads=self.num_heads, dtype=self.dtype,
                        name=f"down_attn_{level}_{j}",
                    )(h)
                skips.append(h)
            if level < len(self.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype,
                            name=f"downsample_{level}")(h)
                skips.append(h)
        # middle
        h = ResBlock(h.shape[-1], self.emb_dim, dtype=self.dtype,
                     name="mid_0")(h, emb)
        if self.bottleneck_attention:
            h = SelfAttention2d(
                h.shape[-1], num_heads=self.num_heads, dtype=self.dtype,
                name="mid_attn",
            )(h)
        h = ResBlock(h.shape[-1], self.emb_dim, dtype=self.dtype,
                     name="mid_1")(h, emb)
        # decoder
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            ch = self.base_channels * mult
            for j in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(ch, self.emb_dim, dtype=self.dtype,
                             name=f"up_{level}_{j}")(h, emb)
                if level in self.attn_levels:
                    h = SelfAttention2d(
                        ch, num_heads=self.num_heads, dtype=self.dtype,
                        name=f"up_attn_{level}_{j}",
                    )(h)
            if level > 0:
                target_ch = self.base_channels * self.channel_mults[level - 1]
                new_h = h.shape[-3] * 2
                new_w = h.shape[-2] * 2
                h = jax.image.resize(
                    h, (*h.shape[:-3], new_h, new_w, h.shape[-1]),
                    method="nearest",
                )
                h = nn.Conv(target_ch, (3, 3), dtype=self.dtype,
                            name=f"upsample_{level}")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]),
                         dtype=jnp.float32)(h)
        out = nn.Conv(
            self.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="head",
        )(nn.silu(h))
        return out.astype(jnp.float32)
