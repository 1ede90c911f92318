"""Noise-conditioned (stochastic) SFNO — the ACE2-ERA5 baseline
architecture (reference: fme/ace/registry/stochastic_sfno.py
NoiseConditionedModel, fme/core/models/conditional_sfno/sfnonet.py,
layers.py ConditionalLayerNorm :143, ChannelLayerNorm :95).

Noise fields (gaussian or SHT-synthesized isotropic) condition the layer
norms of every block: scale = 1 + W_s(noise), bias = W_b(noise), both
zero-initialized so the net starts as a deterministic SFNO. Ensemble
members for CRPS/EnergyScore training differ only through the "noise" PRNG
stream.

Channels-last layout throughout ([batch, lat, lon, channel]).
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.layers import MLP, trunc_normal_init
from ace_tpu.models.sfno import _ACTIVATIONS, SpectralConvS2
from ace_tpu.ops.sht import build_isht, build_sht


class ChannelLayerNorm(nn.Module):
    """Per-pixel layer norm over the channel axis
    (reference: conditional_sfno/layers.py:95).
    """

    eps: float = 1e-5
    elementwise_affine: bool = False

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        if orig_dtype == jnp.float32:
            # exact f32 path (parity oracles run here)
            x32 = x
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
            y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        else:
            # memory-lean mixed path for bf16 activations: statistics
            # accumulate in f32 (small outputs), but no full-size f32
            # tensor is ever materialized — on the flagship each such
            # tensor is 133 MB and the norms were costing as much HBM
            # time as the MLP (measured 1.28 ms/norm at 180x360x512)
            mean = jnp.mean(x, axis=-1, keepdims=True,
                            dtype=jnp.float32)
            xc = x - mean.astype(orig_dtype)
            var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True,
                           dtype=jnp.float32)
            y = xc * jax.lax.rsqrt(var + self.eps).astype(orig_dtype)
        if self.elementwise_affine:
            weight = self.param(
                "weight", nn.initializers.ones, (x.shape[-1],), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32
            )
            y = y * weight.astype(y.dtype) + bias.astype(y.dtype)
        return y.astype(orig_dtype)


class ConditionalLayerNorm(nn.Module):
    """Layer norm with scale/bias conditioned on per-pixel noise channels
    (reference: conditional_sfno/layers.py:143; AdaSpeech-style).
    """

    n_channels: int
    embed_dim_noise: int = 0
    embed_dim_labels: int = 0
    global_layer_norm: bool = False
    eps: float = 1e-5
    elementwise_affine: bool = False

    @nn.compact
    def __call__(self, x, noise=None, labels=None):
        if self.global_layer_norm:
            # normalize over (lat, lon, channel) jointly
            orig_dtype = x.dtype
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(-3, -2, -1), keepdims=True)
            var = jnp.mean(
                (x32 - mean) ** 2, axis=(-3, -2, -1), keepdims=True
            )
            y = ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(
                orig_dtype
            )
            if self.elementwise_affine:
                weight = self.param(
                    "weight", nn.initializers.ones, (self.n_channels,),
                    jnp.float32,
                )
                bias_p = self.param(
                    "bias", nn.initializers.zeros, (self.n_channels,),
                    jnp.float32,
                )
                y = y * weight + bias_p
        else:
            y = ChannelLayerNorm(
                eps=self.eps, elementwise_affine=self.elementwise_affine,
                name="norm",
            )(x)
        scale = jnp.ones((), dtype=y.dtype)
        bias = jnp.zeros((), dtype=y.dtype)
        if self.embed_dim_noise > 0:
            if noise is None:
                raise ValueError("noise conditioning requires noise input")
            # zero-init so conditioning starts as identity; dtype pinned
            # to the activation dtype so the full-grid scale/bias fields
            # are not promoted to f32 (132 MB each on the flagship)
            w_scale = nn.Dense(
                self.n_channels, use_bias=False, dtype=y.dtype,
                kernel_init=nn.initializers.zeros, name="w_scale_2d",
            )
            w_bias = nn.Dense(
                self.n_channels, use_bias=False, dtype=y.dtype,
                kernel_init=nn.initializers.zeros, name="w_bias_2d",
            )
            scale = scale + w_scale(noise.astype(y.dtype))
            bias = bias + w_bias(noise.astype(y.dtype))
        if self.embed_dim_labels > 0:
            if labels is None:
                raise ValueError("label conditioning requires labels input")
            # per-sample label terms, broadcast over space (reference:
            # layers.py W_scale_labels/W_bias_labels, zero-init weights)
            lab = labels.astype(y.dtype)
            s_lab = nn.Dense(
                self.n_channels, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="w_scale_labels",
            )(lab)
            b_lab = nn.Dense(
                self.n_channels, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="w_bias_labels",
            )(lab)
            scale = scale + s_lab[:, None, None, :]
            bias = bias + b_lab[:, None, None, :]
        return y * scale + bias


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (same names/shapes/inits —
    identical checkpoint tree and identical init draws) without running
    the dense, for the fused block-tail kernel path."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self):
        init = self.kernel_init or trunc_normal_init()
        k = self.param(
            "kernel", init, (self.in_features, self.features), jnp.float32
        )
        b = (
            self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return k, b


class _CLNParams(nn.Module):
    """ConditionalLayerNorm's param tree (norm/{weight,bias},
    w_scale_2d/kernel, w_bias_2d/kernel) for the fused path."""

    n_channels: int
    embed_dim_noise: int
    elementwise_affine: bool

    @nn.compact
    def __call__(self):
        if self.elementwise_affine:
            class _Affine(nn.Module):
                c: int

                @nn.compact
                def __call__(self):
                    return (
                        self.param("weight", nn.initializers.ones,
                                   (self.c,), jnp.float32),
                        self.param("bias", nn.initializers.zeros,
                                   (self.c,), jnp.float32),
                    )

            ln_w, ln_b = _Affine(self.n_channels, name="norm")()
        else:
            ln_w = jnp.ones((self.n_channels,), jnp.float32)
            ln_b = jnp.zeros((self.n_channels,), jnp.float32)
        ws, _ = _DenseParams(
            self.embed_dim_noise, self.n_channels, use_bias=False,
            kernel_init=nn.initializers.zeros, name="w_scale_2d",
        )()
        wb, _ = _DenseParams(
            self.embed_dim_noise, self.n_channels, use_bias=False,
            kernel_init=nn.initializers.zeros, name="w_bias_2d",
        )()
        return ln_w, ln_b, ws, wb


class _MLPParams(nn.Module):
    """MLP's fc1/fc2 param tree for the fused path."""

    features: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1_k, fc1_b = _DenseParams(
            self.features, self.hidden, name="fc1"
        )()
        fc2_k, fc2_b = _DenseParams(
            self.hidden, self.features, name="fc2"
        )()
        return fc1_k, fc1_b, fc2_k, fc2_b


class ConditionalFNOBlock(nn.Module):
    """FNO block with noise-conditioned norms
    (reference: conditional_sfno/sfnonet.py:388 block forward).
    """

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    embed_dim_noise: int
    operator_type: str = "dhconv"
    mlp_ratio: float = 2.0
    activation: str = "gelu"
    use_mlp: bool = True
    inner_skip: str = "linear"
    outer_skip: str = "identity"
    global_layer_norm: bool = False
    affine_norms: bool = False
    # "spectral" or "local" (DISCO) filter
    # (reference: conditional_sfno/sfnonet.py local_blocks)
    filter_type: str = "spectral"
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "morlet"
    data_grid: str = "legendre-gauss"
    spectral_ratio: float = 1.0
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation]
        x_norm = ConditionalLayerNorm(
            n_channels=self.embed_dim,
            embed_dim_noise=self.embed_dim_noise,
            global_layer_norm=self.global_layer_norm,
            elementwise_affine=self.affine_norms,
            name="norm0",
        )(x, noise)
        if self.filter_type == "local":
            from ace_tpu.models.localnet import DiscoFilterLayer

            x_f = DiscoFilterLayer(
                img_shape=(
                    self.forward_transform.nlat,
                    self.forward_transform.nlon,
                ),
                channels=self.embed_dim,
                kernel_shape=self.kernel_shape,
                basis_type=self.basis_type,
                data_grid=self.data_grid,
                dtype=self.dtype,
                name="filter",
            )(x_norm)
            residual = x_norm
        else:
            x_f, residual = SpectralConvS2(
                forward_transform=self.forward_transform,
                inverse_transform=self.inverse_transform,
                in_channels=self.embed_dim,
                out_channels=self.embed_dim,
                operator_type=self.operator_type,
                use_bias=True,
                spectral_ratio=self.spectral_ratio,
                lora_rank=self.lora_rank,
                name="filter",
            )(x_norm)
        # fused tail: inner-skip + gelu + CLN + MLP + outer skip in one
        # Pallas kernel — same math (f32 LN stats, tanh-gelu for bf16),
        # one HBM round trip instead of five (ops/pallas_block.py). The
        # parameter holders declare trees identical to the module path,
        # so checkpoints are interchangeable between both branches.
        hidden = int(self.embed_dim * self.mlp_ratio)
        from ace_tpu.ops.pallas_block import (
            fused_block_tail,
            pallas_block_mode,
            tail_shapes_supported,
        )

        kmode = (
            pallas_block_mode()
            if (
                x_f.dtype == jnp.bfloat16
                and self.inner_skip == "linear"
                and self.outer_skip == "identity"
                and self.use_mlp
                and not self.global_layer_norm
                and self.activation == "gelu"
                and self.embed_dim_noise > 0
                and noise is not None
                and tail_shapes_supported(self.embed_dim, hidden)
            )
            else "off"
        )
        if kmode != "off":
            skip_k, skip_b = _DenseParams(
                self.embed_dim, self.embed_dim, name="inner_skip"
            )()
            ln_w, ln_b, ws_k, wb_k = _CLNParams(
                self.embed_dim, self.embed_dim_noise,
                self.affine_norms, name="norm1",
            )()
            fc1_k, fc1_b, fc2_k, fc2_b = _MLPParams(
                self.embed_dim, hidden, name="mlp"
            )()
            return fused_block_tail(
                x_f, residual, noise,
                (skip_k, skip_b, ln_w, ln_b, ws_k, wb_k,
                 fc1_k, fc1_b, fc2_k, fc2_b),
                interpret=(kmode == "interpret"),
            )
        if self.inner_skip == "linear":
            x_f = x_f + nn.Dense(
                self.embed_dim, kernel_init=trunc_normal_init(),
                dtype=self.dtype, name="inner_skip",
            )(residual)
        elif self.inner_skip == "identity":
            x_f = x_f + residual
        x_f = act(x_f)
        x_f = ConditionalLayerNorm(
            n_channels=self.embed_dim,
            embed_dim_noise=self.embed_dim_noise,
            global_layer_norm=self.global_layer_norm,
            elementwise_affine=self.affine_norms,
            name="norm1",
        )(x_f, noise)
        if self.use_mlp:
            x_f = MLP(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                act=act,
                dtype=self.dtype,
                name="mlp",
            )(x_f, deterministic=deterministic)
        if self.outer_skip == "linear":
            x_f = x_f + nn.Dense(
                self.embed_dim, kernel_init=trunc_normal_init(),
                dtype=self.dtype, name="outer_skip",
            )(residual)
        elif self.outer_skip == "identity":
            x_f = x_f + residual
        return x_f


class NoiseConditionedSFNO(nn.Module):
    """Stochastic SFNO: noise-conditioned norms, per-call sampled noise
    (reference: stochastic_sfno.py:52 NoiseConditionedModel + the
    conditional SFNO net :508).

    Noise is drawn from the flax "noise" PRNG collection each call
    (``rngs={"noise": key}``); with no rng provided the model runs with
    zero noise (deterministic mean behavior at init).
    """

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    embed_dim: int = 256
    noise_embed_dim: int = 256
    noise_type: str = "gaussian"  # or "isotropic"
    num_layers: int = 12
    operator_type: str = "dhconv"
    hard_thresholding_fraction: float = 1.0
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    use_mlp: bool = True
    pos_embed: bool = True
    big_skip: bool = True
    normalize_big_skip: bool = False
    affine_norms: bool = False
    global_layer_norm: bool = False
    filter_residual: bool = False
    filter_output: bool = False
    residual_filter_factor: int = 1
    # block indices using local (DISCO) filters instead of spectral
    # (reference: conditional_sfno/sfnonet.py:75 local_blocks)
    local_blocks: tuple[int, ...] | None = None
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "morlet"
    spectral_ratio: float = 1.0
    lora_rank: int = 0
    # label conditioning (reference: conditional_sfno ContextConfig
    # labels): one-hot [B, n_labels] broadcast spatially and concatenated
    # with the noise conditioning; label_embed_dim > 0 projects through a
    # learned linear embedding first
    n_labels: int = 0
    label_embed_dim: int = 0
    data_grid: str = "legendre-gauss"
    # >= 1: per-block activation rematerialization (see __call__)
    checkpointing: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        nlat, nlon = self.img_shape
        modes_lat = int(nlat * self.hard_thresholding_fraction)
        modes_lon = int((nlon // 2 + 1) * self.hard_thresholding_fraction)
        # build_sht/build_isht dispatch to the explicit all-to-all
        # distributed SHT when a spatial mesh is active (reference: thd
        # swap at model_torch_distributed.py:454-465 covers this model)
        kw = dict(lmax=modes_lat, mmax=modes_lon, channels_last=True)
        self.trans_down = build_sht(nlat, nlon, grid=self.data_grid, **kw)
        self.itrans_up = build_isht(nlat, nlon, grid=self.data_grid, **kw)
        # internal blocks transform on the legendre-gauss grid; only the
        # first forward and last inverse touch the data grid (reference:
        # conditional_sfno/sfnonet.py:464-473)
        self.trans = build_sht(nlat, nlon, grid="legendre-gauss", **kw)
        self.itrans = build_isht(
            nlat, nlon, grid="legendre-gauss", **kw
        )
        self._lmax, self._mmax = modes_lat, modes_lon

    def _make_noise(self, batch: int):
        nlat, nlon = self.img_shape
        if not self.has_rng("noise"):
            return jnp.zeros(
                (batch, nlat, nlon, self.noise_embed_dim), jnp.float32
            )
        key = self.make_rng("noise")
        if self.noise_type == "gaussian":
            return jax.random.normal(
                key, (batch, nlat, nlon, self.noise_embed_dim), jnp.float32
            )
        # isotropic: white spherical-harmonic coefficients synthesized to
        # the grid with unit pointwise variance (reference:
        # stochastic_sfno.py:21 isotropic_noise)
        lmax, mmax = self._lmax, self._mmax
        kr, ki = jax.random.split(key)
        shape = (batch, lmax, mmax, self.noise_embed_dim)
        real = jax.random.normal(kr, shape, jnp.float32)
        imag = jax.random.normal(ki, shape, jnp.float32)
        imag = imag.at[:, :, 0].set(0.0)
        sqrt2 = math.sqrt(2.0)
        real = real.at[:, :, 1:].divide(sqrt2)
        imag = imag.at[:, :, 1:].divide(sqrt2)
        scale = math.sqrt(4.0 * math.pi) / lmax
        return self.itrans_up(jax.lax.complex(real, imag) * scale)

    def _conditioning(self, x, labels):
        """noise (+ broadcast label embedding) conditioning channels."""
        noise = self._make_noise(x.shape[0])
        if self.n_labels == 0:
            return noise, self.noise_embed_dim
        if labels is None:
            labels = jnp.zeros((x.shape[0], self.n_labels), jnp.float32)
        lab = labels.astype(jnp.float32)
        if self.label_embed_dim > 0:
            lab = nn.Dense(
                self.label_embed_dim, use_bias=False,
                kernel_init=trunc_normal_init(), name="label_embed",
            )(lab)
        nlat, nlon = self.img_shape
        lab2d = jnp.broadcast_to(
            lab[:, None, None, :], (x.shape[0], nlat, nlon, lab.shape[-1])
        )
        return (
            jnp.concatenate([noise, lab2d], axis=-1),
            self.noise_embed_dim + lab.shape[-1],
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True, labels=None):
        act = _ACTIVATIONS[self.activation_function]
        nlat, nlon = self.img_shape
        noise, cond_dim = self._conditioning(x, labels)

        if self.big_skip:
            residual = x
            if self.filter_residual or self.residual_filter_factor > 1:
                residual = self.itrans_up(
                    self.trans_down(residual.astype(jnp.float32))
                ).astype(x.dtype)
            if self.normalize_big_skip:
                residual = ConditionalLayerNorm(
                    n_channels=self.in_chans,
                    embed_dim_noise=cond_dim,
                    elementwise_affine=self.affine_norms,
                    name="norm_big_skip",
                )(residual, noise)

        h = x.astype(self.dtype)
        for i in range(self.encoder_layers):
            h = nn.Dense(
                self.embed_dim, kernel_init=trunc_normal_init(),
                dtype=self.dtype, name=f"encoder_{i}",
            )(h)
            h = act(h)
        h = nn.Dense(
            self.embed_dim, use_bias=False, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="encoder_out",
        )(h)

        if self.pos_embed:
            pe = self.param(
                "pos_embed", trunc_normal_init(std=0.02),
                (1, nlat, nlon, self.embed_dim), jnp.float32,
            )
            h = h + pe.astype(h.dtype)

        # checkpointing >= 1: rematerialize each block in the backward
        # pass (the reference's makani `checkpointing` levels,
        # makani/sfnonet.py `checkpointing` arg). Param paths are
        # unchanged, so checkpoints are interchangeable either way. On a
        # 16 GB v5e this is what lets the flagship (embed 512, 8 layers)
        # train step fit: the backward holds one block's activations at
        # a time instead of all eight.
        block_cls = ConditionalFNOBlock
        if self.checkpointing >= 1:
            block_cls = nn.remat(ConditionalFNOBlock, static_argnums=(3,))
        for i in range(self.num_layers):
            is_local = (
                self.local_blocks is not None and i in self.local_blocks
            )
            first, last = i == 0, i == self.num_layers - 1
            h = block_cls(
                forward_transform=self.trans_down if first else self.trans,
                inverse_transform=(
                    self.itrans_up if last else self.itrans
                ),
                embed_dim=self.embed_dim,
                embed_dim_noise=cond_dim,
                operator_type=self.operator_type,
                mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                use_mlp=self.use_mlp,
                global_layer_norm=self.global_layer_norm,
                affine_norms=self.affine_norms,
                filter_type="local" if is_local else "spectral",
                kernel_shape=self.kernel_shape,
                basis_type=self.basis_type,
                data_grid=self.data_grid,
                spectral_ratio=self.spectral_ratio,
                lora_rank=self.lora_rank,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, noise, deterministic)

        if self.big_skip:
            h = jnp.concatenate([h, residual.astype(h.dtype)], axis=-1)

        for i in range(self.encoder_layers):
            h = nn.Dense(
                self.embed_dim, kernel_init=trunc_normal_init(),
                dtype=self.dtype, name=f"decoder_{i}",
            )(h)
            h = act(h)
        out = nn.Dense(
            self.out_chans, use_bias=False, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="decoder_out",
        )(h)
        if self.filter_output:
            out = self.itrans_up(
                self.trans_down(out.astype(jnp.float32))
            )
        return out.astype(jnp.float32)
