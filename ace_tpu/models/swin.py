"""2D Swin U-Net (ArchesWeather-style) for lat-lon grids, channels-last
(reference: fme/core/models/swin_transformer/swin_transformer.py:57
SwinTransformerNet, swin_layers.py, boundary_padding.py).

Architecture: encoder conv3x3 -> ChannelMixer -> stage1 (full res) ->
PatchMerging -> stages 2,3 (half res) -> PatchExpanding -> optional skip
concat -> stage4 -> final linear -> decoder conv3x3. Blocks are
POST-norm (norm applied to the branch output), window attention is
SwinV2-style cosine attention with a continuous-position-bias MLP
(optionally cos-lat scaled so longitude offsets reflect arc length),
and a ColumnMixer linear is folded into each attention branch.

TPU-native notes: everything is channels-last with static shapes; window
partitions are reshapes/transposes XLA fuses away; shifted windows are
jnp.roll; the attention mask and (static-latitude) window means are
precomputed in numpy at trace time so they are compile-time constants.

Conditioning: ``adaln`` (DiT-style per-stage scale/shift/gate from scalar
or label embeddings) or ``cln`` (per-block ConditionalLayerNorm driven by
a per-pixel noise field, drawn from the flax "noise" PRNG collection —
the NoiseConditionedSwinTransformer of reference
fme/ace/registry/swin_transformer.py:132).
"""

import math
from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ace_tpu.models.layers import exact_gelu
import numpy as np



def window_partition(x, wh, ww):
    """[B, H, W, C] -> [B*nWin, wh*ww, C] (windows h-major per image)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows, wh, ww, h, w):
    b = windows.shape[0] // ((h // wh) * (w // ww))
    x = windows.reshape(b, h // wh, w // ww, wh, ww, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


def earth_pad(x, pad_lat, pad_lon):
    """Earth padding on [B, H, W, C]: poles via 180deg-rolled flip, lon
    circular (reference: boundary_padding.py _earth_padding)."""
    pn, ps = pad_lat
    pw, pe = pad_lon
    if pn > 0 or ps > 0:
        shift = x.shape[2] // 2
        xroll = jnp.roll(x, shift, axis=2)
        pieces = []
        if pn > 0:
            pieces.append(xroll[:, :pn][:, ::-1])
        pieces.append(x)
        if ps > 0:
            pieces.append(xroll[:, -ps:][:, ::-1])
        x = jnp.concatenate(pieces, axis=1)
    if pw > 0 or pe > 0:
        parts = []
        if pw > 0:
            parts.append(x[:, :, -pw:])
        parts.append(x)
        if pe > 0:
            parts.append(x[:, :, :pe])
        x = jnp.concatenate(parts, axis=2)
    return x


def mirror_pad(x, pad_lat, pad_lon):
    """Mirror padding: lon circular first, then lat reflect
    (reference: boundary_padding.py _mirror_padding)."""
    pn, ps = pad_lat
    pw, pe = pad_lon
    if pw > 0 or pe > 0:
        parts = []
        if pw > 0:
            parts.append(x[:, :, -pw:])
        parts.append(x)
        if pe > 0:
            parts.append(x[:, :, :pe])
        x = jnp.concatenate(parts, axis=2)
    if pn > 0 or ps > 0:
        cfg = [(0, 0), (pn, ps), (0, 0), (0, 0)]
        x = jnp.pad(x, cfg, mode="reflect")
    return x


def boundary_unpad(x, pad_lat, pad_lon):
    pn, ps = pad_lat
    pw, pe = pad_lon
    return x[
        :,
        pn : x.shape[1] - ps if ps > 0 else None,
        pw : x.shape[2] - pe if pe > 0 else None,
    ]


def _drop_path(module: nn.Module, x, rate: float, deterministic: bool):
    """Per-sample stochastic depth (reference: conditional_sfno DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(module.make_rng("dropout"), keep, shape)
    return x * mask.astype(x.dtype) / keep


class Mlp(nn.Module):
    """fc1 -> exact GELU -> fc2 (reference: swin_layers.py Mlp)."""

    hidden_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = exact_gelu(x)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """SwiGLU MLP (reference: swin_layers.py SwiGLU)."""

    hidden_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x12 = nn.Dense(
            2 * self.hidden_features, dtype=self.dtype, name="fc1"
        )(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = jax.nn.silu(x1) * x2
        return nn.Dense(c, dtype=self.dtype, name="fc2")(x)


class WindowAttention2D(nn.Module):
    """Cosine window attention with continuous position bias
    (reference: swin_layers.py:77 WindowAttention2D)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    cpb_hidden_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def _rel_coords(self):
        wh, ww = self.window_size
        coords = np.stack(
            np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
        ).reshape(2, -1)
        rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
        return rel.reshape(-1, 2).astype(np.float32)  # (N*N, 2)

    @nn.compact
    def __call__(self, x, mask=None, lat_mean=None):
        n_win, n_tokens, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n_win, n_tokens, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )
        # cosine attention with learned per-head temperature tau
        q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
        nq = jnp.linalg.norm(q32, axis=-1, keepdims=True)
        nk = jnp.linalg.norm(k32, axis=-1, keepdims=True)
        denom = jnp.maximum(nq * jnp.swapaxes(nk, -2, -1), 1e-6)
        attn = jnp.einsum(
            "whtd,whsd->whts", q32, k32,
            preferred_element_type=jnp.float32,
        ) / denom
        tau = self.param(
            "tau", nn.initializers.ones, (1, self.num_heads, 1, 1),
            jnp.float32,
        )
        attn = attn / jnp.maximum(tau, 0.01)

        # continuous position bias MLP (SwinV2): zero-init output layer
        def cpb(coords_log):
            h = nn.Dense(
                self.cpb_hidden_dim, dtype=jnp.float32, name="cpb_fc1"
            )(coords_log)
            h = jax.nn.relu(h)
            return nn.Dense(
                self.num_heads, dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="cpb_fc2",
            )(h)

        base = self._rel_coords()  # numpy (N*N, 2)
        if lat_mean is None:
            logc = np.sign(base) * np.log1p(np.abs(base))
            bias = 16.0 * jax.nn.sigmoid(cpb(jnp.asarray(logc)))
            bias = jnp.transpose(bias, (1, 0)).reshape(
                self.num_heads, n_tokens, n_tokens
            )
            attn = attn + bias[None]
        else:
            # lat_mean: per-window mean latitude (deg), numpy (nW,);
            # scale lon offsets by cos(lat) -> physical arc length
            lat_rad = np.asarray(lat_mean, np.float32) * (np.pi / 180.0)
            n_w = lat_rad.shape[0]
            h_off = np.broadcast_to(base[None, :, 0], (n_w, base.shape[0]))
            w_off = base[None, :, 1] * np.cos(lat_rad)[:, None]
            coords = np.stack([h_off, w_off], axis=-1)
            logc = np.sign(coords) * np.log1p(np.abs(coords))
            bias = 16.0 * jax.nn.sigmoid(cpb(jnp.asarray(logc)))
            bias = jnp.transpose(bias, (0, 2, 1)).reshape(
                n_w, self.num_heads, n_tokens, n_tokens
            )
            attn = attn.reshape(
                -1, n_w, self.num_heads, n_tokens, n_tokens
            ) + bias[None]
            attn = attn.reshape(-1, self.num_heads, n_tokens, n_tokens)

        if mask is not None:
            n_masks = mask.shape[0]
            attn = attn.reshape(
                -1, n_masks, self.num_heads, n_tokens, n_tokens
            ) + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n_tokens, n_tokens)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("whts,whsd->whtd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
            n_win, n_tokens, c
        )
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinTransformerBlock(nn.Module):
    """POST-norm Swin block with ColumnMixer and AdaLN/CLN conditioning
    (reference: swin_layers.py:330 SwinTransformerBlock)."""

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: tuple[int, int]
    shift_size: tuple[int, int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    mlp_layer: str = "mlp"
    conditioning: str = "adaln"
    noise_embed_dim: int = 0
    embed_dim_labels: int = 0
    cpb_hidden_dim: int = 64
    lat_coords: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    def _build_mask(self):
        sh, sw = self.shift_size
        if sh == 0 and sw == 0:
            return None
        h, w = self.input_resolution
        wh, ww = self.window_size
        img_mask = np.zeros((1, h, w, 1), np.float32)
        cnt = 0
        for hs in (slice(0, h - wh), slice(h - wh, h - sh),
                   slice(h - sh, None)):
            for ws in (slice(0, w - ww), slice(w - ww, w - sw),
                       slice(w - sw, None)):
                img_mask[:, hs, ws] = cnt
                cnt += 1
        m = img_mask.reshape(1, h // wh, wh, w // ww, ww, 1)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww)
        diff = m[:, None, :] - m[:, :, None]
        return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)

    def _lat_mean(self):
        if self.lat_coords is None:
            return None
        h, w = self.input_resolution
        wh, ww = self.window_size
        sh, _ = self.shift_size
        lat = np.asarray(self.lat_coords, np.float32)
        if sh != 0:
            lat = np.roll(lat, -sh)
        n_h, n_w = h // wh, w // ww
        lat_mean_h = lat[:h].reshape(n_h, wh).mean(1)
        return np.repeat(lat_mean_h, n_w)

    def _mlp(self):
        hidden = int(self.dim * self.mlp_ratio)
        if self.mlp_layer == "swiglu":
            return SwiGLU(hidden, dtype=self.dtype, name="mlp")
        return Mlp(hidden, dtype=self.dtype, name="mlp")

    @nn.compact
    def __call__(self, x, cond_params=None, noise=None, labels=None,
                 deterministic: bool = True):
        h_res, w_res = self.input_resolution
        wh, ww = self.window_size
        sh, sw = self.shift_size
        shortcut = x
        if sh > 0 or sw > 0:
            h = jnp.roll(x, (-sh, -sw), axis=(1, 2))
        else:
            h = x
        windows = window_partition(h, wh, ww)
        attn_out = WindowAttention2D(
            dim=self.dim, window_size=self.window_size,
            num_heads=self.num_heads, cpb_hidden_dim=self.cpb_hidden_dim,
            dtype=self.dtype, name="attn",
        )(windows, mask=self._build_mask(), lat_mean=self._lat_mean())
        h = window_reverse(attn_out, wh, ww, h_res, w_res)
        if sh > 0 or sw > 0:
            h = jnp.roll(h, (sh, sw), axis=(1, 2))
        # ColumnMixer folded into the attention branch (no own residual)
        h = h + nn.Dense(
            self.dim, dtype=self.dtype, name="column_mixer"
        )(h)

        mlp = self._mlp()
        if self.conditioning == "cln":
            from ace_tpu.models.conditional_sfno import ConditionalLayerNorm

            def cln(name):
                return ConditionalLayerNorm(
                    n_channels=self.dim,
                    embed_dim_noise=self.noise_embed_dim,
                    embed_dim_labels=self.embed_dim_labels,
                    name=name,
                )

            h_norm = cln("norm1")(h, noise=noise, labels=labels)
            x = shortcut + _drop_path(
                self, h_norm, self.drop_path, deterministic
            )
            y_norm = cln("norm2")(mlp(x), noise=noise, labels=labels)
            return x + _drop_path(
                self, y_norm, self.drop_path, deterministic
            )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        if cond_params is not None:
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = cond_params
            h_norm = norm1(h) * (1 + scale_msa) + shift_msa
            x = shortcut + gate_msa * _drop_path(
                self, h_norm, self.drop_path, deterministic
            )
            h_norm = norm2(mlp(x)) * (1 + scale_mlp) + shift_mlp
            return x + gate_mlp * _drop_path(
                self, h_norm, self.drop_path, deterministic
            )
        x = shortcut + _drop_path(
            self, norm1(h), self.drop_path, deterministic
        )
        return x + _drop_path(
            self, norm2(mlp(x)), self.drop_path, deterministic
        )


class PatchMerging(nn.Module):
    """2x downsample: concat 2x2 -> LN(4C) -> Linear(4C->2C, no bias)
    (reference: swin_layers.py PatchMerging)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype,
            name="reduction",
        )(x)


class PatchExpanding(nn.Module):
    """2x upsample: Linear(C->2C) -> pixel shuffle -> LN -> Linear
    (reference: swin_layers.py PatchExpanding)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out_dim = self.dim // 2
        x = nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype, name="expand"
        )(x)
        # pixel_shuffle(2) channels-last: k = c_out*4 + i*2 + j
        x = x.reshape(b, h, w, out_dim, 2, 2)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
        x = x.reshape(b, 2 * h, 2 * w, out_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(
            out_dim, use_bias=False, dtype=self.dtype, name="linear"
        )(x)


class BasicLayer(nn.Module):
    """Stack of Swin blocks with per-stage AdaLN projections
    (reference: swin_layers.py:530 BasicLayer)."""

    dim: int
    input_resolution: tuple[int, int]
    depth: int
    num_heads: int
    window_size: tuple[int, int]
    mlp_ratio: float
    drop_path: tuple
    embed_dim_scalar: int = 0
    embed_dim_labels: int = 0
    mlp_layer: str = "mlp"
    conditioning: str = "adaln"
    noise_embed_dim: int = 0
    cpb_hidden_dim: int = 64
    lat_coords: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_scalar=None, cond_labels=None, noise=None,
                 labels=None, deterministic: bool = True):
        wh, ww = self.window_size
        cond_params = None
        if self.conditioning == "adaln":
            raw = None
            if self.embed_dim_scalar > 0:
                if cond_scalar is None:
                    raise ValueError(
                        "cond_scalar required for scalar-conditioned layer"
                    )
                raw = nn.Dense(
                    6 * self.dim, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="adaln_scalar",
                )(jax.nn.silu(cond_scalar))
            if self.embed_dim_labels > 0 and cond_labels is not None:
                lab = nn.Dense(
                    6 * self.dim, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="adaln_labels",
                )(jax.nn.silu(cond_labels))
                raw = lab if raw is None else raw + lab
            if raw is not None:
                cond_params = tuple(
                    p[:, None, None, :] for p in jnp.split(raw, 6, axis=-1)
                )
        for i in range(self.depth):
            x = SwinTransformerBlock(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(
                    (0, 0) if i % 2 == 0 else (wh // 2, ww // 2)
                ),
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path[i],
                mlp_layer=self.mlp_layer,
                conditioning=self.conditioning,
                noise_embed_dim=(
                    self.noise_embed_dim if self.conditioning == "cln"
                    else 0
                ),
                embed_dim_labels=(
                    self.embed_dim_labels if self.conditioning == "cln"
                    else 0
                ),
                cpb_hidden_dim=self.cpb_hidden_dim,
                lat_coords=self.lat_coords,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(
                x, cond_params=cond_params, noise=noise, labels=labels,
                deterministic=deterministic,
            )
        return x


class SwinTransformerNet(nn.Module):
    """2D Swin U-Net (reference: swin_transformer.py:57).

    Input [B, H, W, C_in] -> [B, H, W, C_out] (channels-last). The input
    is optionally earth/mirror padded, then zero-padded to a multiple of
    2x the window size; the output is cropped back.

    ``conditioning="cln"`` with ``noise_embed_dim > 0`` makes this the
    NoiseConditionedSwinTransformer: a fresh Gaussian field drawn from
    the "noise" PRNG collection conditions every block's layer norms
    (zero noise when no rng is supplied).
    """

    out_channels: int
    img_shape: tuple[int, int]
    embed_dim: int = 96
    depth_multiplier: int = 1
    num_heads: Sequence[int] = (3, 6, 6, 3)
    window_size: tuple[int, int] = (4, 8)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    use_skip: bool = True
    mlp_layer: str = "mlp"
    conditioning: str = "adaln"
    embed_dim_scalar: int = 0
    n_labels: int = 0
    label_embed_dim: int = 0
    noise_embed_dim: int = 0
    cpb_hidden_dim: int = 64
    lat_coords: tuple | None = None
    padding_mode: str | None = None  # None, "earth", or "mirror"
    pad_lat: tuple[int, int] = (0, 0)
    pad_lon: tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    def _padded_geometry(self):
        h0, w0 = self.img_shape
        if self.padding_mode is not None:
            h0 += self.pad_lat[0] + self.pad_lat[1]
            w0 += self.pad_lon[0] + self.pad_lon[1]
        mh, mw = 2 * self.window_size[0], 2 * self.window_size[1]
        hp = math.ceil(h0 / mh) * mh
        wp = math.ceil(w0 / mw) * mw
        return h0, w0, hp, wp

    def _padded_lat(self, h0, hp):
        if self.lat_coords is None:
            return None, None
        lat = np.asarray(self.lat_coords, np.float32)
        if self.padding_mode is not None:
            pn, ps = self.pad_lat
            parts = []
            if pn > 0:
                parts.append(lat[:pn][::-1])
            parts.append(lat)
            if ps > 0:
                parts.append(lat[-ps:][::-1])
            lat = np.concatenate(parts)
        if hp > h0:
            lat = np.concatenate(
                [lat, np.full(hp - h0, lat[-1], np.float32)]
            )
        lat_half = (lat[::2] + lat[1::2]) / 2
        return tuple(lat.tolist()), tuple(lat_half.tolist())

    def _make_noise(self, x):
        if self.conditioning != "cln" or self.noise_embed_dim == 0:
            return None
        b, hh, ww_, _ = x.shape
        shape = (b, hh, ww_, self.noise_embed_dim)
        if not self.has_rng("noise"):
            return jnp.zeros(shape, jnp.float32)
        return jax.random.normal(
            self.make_rng("noise"), shape, jnp.float32
        )

    @nn.compact
    def __call__(self, x, labels=None, deterministic: bool = True):
        x = x.astype(self.dtype)
        noise = self._make_noise(x)
        if self.padding_mode == "earth":
            x = earth_pad(x, self.pad_lat, self.pad_lon)
            if noise is not None:
                noise = earth_pad(noise, self.pad_lat, self.pad_lon)
        elif self.padding_mode == "mirror":
            x = mirror_pad(x, self.pad_lat, self.pad_lon)
            if noise is not None:
                noise = mirror_pad(noise, self.pad_lat, self.pad_lon)
        h0, w0, hp, wp = self._padded_geometry()
        pad_h, pad_w = hp - h0, wp - w0
        if pad_h > 0 or pad_w > 0:
            cfg = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
            x = jnp.pad(x, cfg)
            if noise is not None:
                noise = jnp.pad(noise, cfg)
        noise_half = noise[:, ::2, ::2] if noise is not None else None

        lat_full, lat_half = self._padded_lat(h0, hp)

        # label embedding (reference: NoiseConditionedModel.label_embedding)
        lab = labels
        if self.n_labels > 0:
            if lab is None:
                lab = jnp.zeros((x.shape[0], self.n_labels), jnp.float32)
            lab = lab.astype(jnp.float32)
            if self.label_embed_dim > 0:
                lab = nn.Dense(
                    self.label_embed_dim, name="label_embedding"
                )(lab)
        effective_label_dim = (
            self.label_embed_dim if self.label_embed_dim > 0
            else self.n_labels
        )

        x = nn.Conv(
            self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="encoder",
        )(x)
        # ChannelMixer: pointwise linear + residual, no norm
        x = x + nn.Dense(
            self.embed_dim, dtype=self.dtype, name="channel_mixer"
        )(x)

        d = self.depth_multiplier
        dpr = np.linspace(0.0, self.drop_path_rate / d, 8 * d).tolist()
        dpr_shallow = tuple(dpr[: 2 * d])
        dpr_deep = tuple(dpr[2 * d : 8 * d])

        def stage(name, dim, res, depth, heads, rates, lat):
            return BasicLayer(
                dim=dim, input_resolution=res, depth=depth,
                num_heads=heads, window_size=tuple(self.window_size),
                mlp_ratio=self.mlp_ratio, drop_path=rates,
                embed_dim_scalar=self.embed_dim_scalar,
                embed_dim_labels=effective_label_dim,
                mlp_layer=self.mlp_layer, conditioning=self.conditioning,
                noise_embed_dim=self.noise_embed_dim,
                cpb_hidden_dim=self.cpb_hidden_dim, lat_coords=lat,
                dtype=self.dtype, name=name,
            )

        kw: dict[str, Any] = dict(deterministic=deterministic)
        if self.conditioning == "cln":
            kw["labels"] = lab if effective_label_dim > 0 else None
        else:
            kw["cond_labels"] = lab if effective_label_dim > 0 else None

        x = stage(
            "layer1", self.embed_dim, (hp, wp), 2 * d, self.num_heads[0],
            dpr_shallow, lat_full,
        )(x, noise=noise, **kw)
        skip = x
        x = PatchMerging(self.embed_dim, dtype=self.dtype,
                         name="downsample")(x)
        x = stage(
            "layer2", 2 * self.embed_dim, (hp // 2, wp // 2), 6 * d,
            self.num_heads[1], dpr_deep, lat_half,
        )(x, noise=noise_half, **kw)
        x = stage(
            "layer3", 2 * self.embed_dim, (hp // 2, wp // 2), 6 * d,
            self.num_heads[2], dpr_deep, lat_half,
        )(x, noise=noise_half, **kw)
        x = PatchExpanding(2 * self.embed_dim, dtype=self.dtype,
                           name="upsample")(x)
        if self.use_skip:
            x = jnp.concatenate([x, skip], axis=-1)
        decoder_dim = 2 * self.embed_dim if self.use_skip else self.embed_dim
        x = stage(
            "layer4", decoder_dim, (hp, wp), 2 * d, self.num_heads[3],
            dpr_shallow, lat_full,
        )(x, noise=noise, **kw)

        x = nn.Dense(
            self.embed_dim, use_bias=False, dtype=self.dtype,
            name="final_linear",
        )(x)
        out = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="decoder",
        )(x)
        out = out[:, :h0, :w0]
        if self.padding_mode is not None:
            out = boundary_unpad(out, self.pad_lat, self.pad_lon)
        return out.astype(jnp.float32)
