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

import jax
import numpy as np

from ace_tpu.models.layers import MLP, trunc_normal_init
from ace_tpu.models.swin import window_partition, window_reverse


def pixel_shuffle(x, factor: int):
    """[B, H, W, C*r^2] -> [B, H*r, W*r, C]."""
    b, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


# SwinIR uses SwinV1-style pre-norm blocks with a relative-position
# bias table (reference: fme/downscaling/modules/swinir.py), unlike
# the ArchesWeather post-norm/CPB blocks in ace_tpu.models.swin.
class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference: swin_layers.py)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        n_win, n_tokens, c = x.shape
        wh, ww = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="qkv",
        )(x)
        qkv = qkv.reshape(n_win, n_tokens, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )
        attn = jnp.einsum(
            "whtd,whsd->whts", q * head_dim**-0.5, k,
            preferred_element_type=jnp.float32,
        )
        # relative position bias
        bias_table = self.param(
            "relative_position_bias",
            trunc_normal_init(std=0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
            jnp.float32,
        )
        coords = np.stack(np.meshgrid(
            np.arange(wh), np.arange(ww), indexing="ij"
        )).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += wh - 1
        rel[:, :, 1] += ww - 1
        rel[:, :, 0] *= 2 * ww - 1
        idx = jnp.asarray(rel.sum(-1))
        attn = attn + jnp.transpose(bias_table[idx], (2, 0, 1))[None]
        if mask is not None:
            n_masks = mask.shape[0]
            attn = attn.reshape(
                -1, n_masks, self.num_heads, n_tokens, n_tokens
            )
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n_tokens, n_tokens)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        out = jnp.einsum("whts,whsd->whtd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(n_win, n_tokens, c)
        return nn.Dense(
            self.dim, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="proj",
        )(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: tuple[int, int]
    shift: bool = False
    mlp_ratio: float = 4.0
    # >0: per-block conditional layer norms driven by a noise field
    # (reference: registry/swin_transformer.py:132
    # NoiseConditionedSwinTransformer)
    noise_embed_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name):
        if self.noise_embed_dim > 0:
            from ace_tpu.models.conditional_sfno import (
                ConditionalLayerNorm,
            )

            cln = ConditionalLayerNorm(
                n_channels=self.dim,
                embed_dim_noise=self.noise_embed_dim,
                name=name,
            )
            return cln
        norm = nn.LayerNorm(dtype=jnp.float32, name=name)
        return lambda x, noise=None: norm(x)

    @nn.compact
    def __call__(self, x, noise=None, deterministic: bool = True):
        b, h, w, c = x.shape
        wh, ww = self.window_size
        sh, sw = (wh // 2, ww // 2) if self.shift else (0, 0)

        shortcut = x
        x = self._norm("norm1")(x, noise)
        if self.shift:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
        windows = window_partition(x, wh, ww)

        mask = None
        if self.shift:
            # standard 9-region shifted-window mask over BOTH dims:
            # SwinIR runs on regional patches, so neither boundary is
            # periodic — wrapped rows AND columns must not attend across
            # the patch edge (reference swinir.py calculate_mask)
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, h - wh), slice(h - wh, h - sh),
                       slice(h - sh, h)):
                for ws in (slice(0, w - ww), slice(w - ww, w - sw),
                           slice(w - sw, w)):
                    img_mask[:, hs, ws] = cnt
                    cnt += 1
            # pure-numpy window partition: the mask must be a compile-time
            # constant (building it with traced ops breaks under jit)
            m = img_mask.reshape(1, h // wh, wh, w // ww, ww, 1)
            m = m.transpose(0, 1, 3, 2, 4, 5)
            m_windows = m.reshape(-1, wh * ww)
            diff = m_windows[:, None, :] - m_windows[:, :, None]
            mask = jnp.asarray(
                np.where(diff != 0, -100.0, 0.0), jnp.float32
            )

        attn_out = WindowAttention(
            dim=self.dim, window_size=self.window_size,
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
        )(windows, mask)
        x = window_reverse(attn_out, wh, ww, h, w)
        if self.shift:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
        x = shortcut + x
        x = x + MLP(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            dtype=self.dtype,
            name="mlp",
        )(self._norm("norm2")(x, noise), deterministic=deterministic)
        return x



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
        # reflect-pad to a window-size multiple, crop after the upsample
        # (reference swinir.py:1109 check_image_size)
        b, h_in, w_in, _ = x.shape
        wh, ww = self.window_size
        pad_h = (wh - h_in % wh) % wh
        pad_w = (ww - w_in % ww) % ww
        if pad_h or pad_w:
            x = jnp.pad(
                x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                mode="reflect",
            )
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
        out = out[:, : h_in * r, : w_in * r]
        return out.astype(jnp.float32)
