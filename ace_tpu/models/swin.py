"""Swin transformer for lat-lon grids, channels-last
(reference: fme/core/models/swin_transformer/swin_transformer.py:57
SwinTransformerNet + swin_layers.py; periodic-longitude handling via
boundary_padding.py).

TPU-native notes: window attention is expressed as batched matmuls over
[n_windows*B, tokens, C] with static window sizes; the cyclic shift for
SW-MSA is a jnp.roll (cost-free layout change after XLA fusion). Longitude
is periodic, so rolls wrap correctly by construction along W; latitude
boundaries use zero padding of the attention mask.
"""

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.layers import MLP, trunc_normal_init


def window_partition(x, wh, ww):
    """[B, H, W, C] -> [B*nWin, wh*ww, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows, wh, ww, h, w):
    b = windows.shape[0] // ((h // wh) * (w // ww))
    x = windows.reshape(b, h // wh, w // ww, wh, ww, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


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
            # cyclic shift: periodic along lon (W); along lat (H) the
            # wrapped rows are masked out of attention below
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
        windows = window_partition(x, wh, ww)

        mask = None
        if self.shift:
            # build attention mask for lat-wrapped windows (lon is truly
            # periodic so only the H roll needs masking)
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, h - wh), slice(h - wh, h - sh),
                       slice(h - sh, h)):
                img_mask[:, hs] = cnt
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


class SwinTransformerNet(nn.Module):
    """Columnar (no down/upsampling) Swin stack for gridded fields
    (reference: swin_transformer.py:57; per-stage depths/heads).
    Input [B, H, W, C_in] -> [B, H, W, C_out]; H, W must be divisible by
    the window size (pad upstream otherwise).
    """

    out_channels: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 6, 6, 2)
    num_heads: Sequence[int] = (3, 6, 6, 3)
    window_size: tuple[int, int] = (4, 8)
    mlp_ratio: float = 4.0
    # >0 turns this into the noise-conditioned (stochastic) Swin: a fresh
    # Gaussian field per call conditions every block's layer norms
    # (reference: registry/swin_transformer.py:132)
    noise_embed_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    def _make_noise(self, x):
        if self.noise_embed_dim == 0:
            return None
        b, hh, ww, _ = x.shape
        shape = (b, hh, ww, self.noise_embed_dim)
        if not self.has_rng("noise"):
            return jnp.zeros(shape, jnp.float32)
        return jax.random.normal(
            self.make_rng("noise"), shape, jnp.float32
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        noise = self._make_noise(x)
        h = nn.Dense(
            self.embed_dim, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="embed",
        )(x.astype(self.dtype))
        blk = 0
        for stage, depth in enumerate(self.depths):
            for i in range(depth):
                h = SwinBlock(
                    dim=self.embed_dim,
                    num_heads=self.num_heads[stage],
                    window_size=tuple(self.window_size),
                    shift=(i % 2 == 1),
                    mlp_ratio=self.mlp_ratio,
                    noise_embed_dim=self.noise_embed_dim,
                    dtype=self.dtype,
                    name=f"block_{blk}",
                )(h, noise, deterministic=deterministic)
                blk += 1
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(h)
        out = nn.Dense(
            self.out_channels, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="head",
        )(h)
        return out.astype(jnp.float32)
