"""LocalNet: local (DISCO + 1x1 conv) neural operator, noise-conditioned
(reference: fme/core/models/conditional_sfno/localnet.py LocalNet,
fme/ace/registry/local_net.py LocalNetBuilder).

TPU-native mapping: DISCO cross-correlations run as banded matmul-DFT
contractions (ops/disco.py) on the MXU; 1x1 convs are Dense layers over
the channels-last lane dimension; LoRA adapters are two extra small
matmuls fused by XLA.
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ace_tpu.models.conditional_sfno import ConditionalLayerNorm
from ace_tpu.models.layers import MLP, trunc_normal_init
from ace_tpu.models.sfno import _ACTIVATIONS
from ace_tpu.ops.distributed_disco import build_disco
from ace_tpu.ops.sht import build_isht


def compute_cutoff_radius(nlat: int, kernel_shape, basis_type: str) -> float:
    """(reference: conditional_sfno/sfnonet.py:150 _compute_cutoff_radius)."""
    factor = {
        "piecewise linear": 0.5,
        "morlet": 0.5,
        "isotropic morlet": 0.5,
        "zernike": math.sqrt(2.0),
    }[basis_type]
    return (kernel_shape[0] + 1) * factor * math.pi / float(nlat - 1)


class LoRADense(nn.Module):
    """Dense layer with optional low-rank adaptation
    (reference: conditional_sfno LoRAConv2d). With rank 0 this is a plain
    Dense; otherwise y = Wx + (alpha/rank) * B(Ax) with B zero-init so the
    adapter starts as identity.
    """

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=trunc_normal_init(), dtype=self.dtype, name="base",
        )(x)
        if self.lora_rank > 0:
            alpha = (
                self.lora_alpha if self.lora_alpha is not None
                else float(self.lora_rank)
            )
            a = nn.Dense(
                self.lora_rank, use_bias=False,
                kernel_init=trunc_normal_init(), dtype=self.dtype,
                name="lora_a",
            )(x)
            b = nn.Dense(
                self.features, use_bias=False,
                kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="lora_b",
            )(a)
            y = y + (alpha / self.lora_rank) * b
        return y


class DiscoFilterLayer(nn.Module):
    """Learned DISCO convolution: fixed-geometry banded contraction
    followed by a [K, C_in, C_out] weight contraction
    (reference: localnet.py:104 LocalFilterLayer disco branch; the
    underlying op is makani's DiscreteContinuousConvS2).
    """

    img_shape: tuple[int, int]
    channels: int
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "piecewise linear"
    data_grid: str = "equiangular"
    dtype: Any = jnp.float32

    def setup(self):
        theta_cutoff = 2 * compute_cutoff_radius(
            self.img_shape[0], self.kernel_shape, self.basis_type
        )
        self.conv = build_disco(
            in_shape=self.img_shape,
            out_shape=self.img_shape,
            kernel_shape=self.kernel_shape,
            grid_in=self.data_grid,
            grid_out=self.data_grid,
            theta_cutoff=theta_cutoff,
            basis_type=self.basis_type,
        )

    @nn.compact
    def __call__(self, x):
        k = self.conv.kernel_size
        scale = math.sqrt(1.0 / (k * self.channels))
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=scale),
            (k, self.channels, self.channels),
            jnp.float32,
        )
        y = self.conv(x.astype(jnp.float32))  # [..., lat, lon, K, C]
        out = jnp.einsum("...jkc,kco->...jo", y, w)
        return out.astype(x.dtype)


class LocalBlock(nn.Module):
    """norm -> local filter -> inner skip -> (act) -> norm -> MLP ->
    outer skip (reference: localnet.py:154 LocalBlock).
    """

    img_shape: tuple[int, int]
    embed_dim: int
    embed_dim_noise: int
    filter_type: str = "disco"  # "disco" | "conv1x1"
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "piecewise linear"
    data_grid: str = "equiangular"
    global_layer_norm: bool = False
    mlp_ratio: float = 2.0
    activation: str = "gelu"
    inner_skip: str = "linear"
    outer_skip: str = "identity"
    use_mlp: bool = True
    affine_norms: bool = True
    lora_rank: int = 0
    lora_alpha: float | None = None
    dtype: Any = jnp.float32

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
        residual = x_norm
        if self.filter_type == "disco":
            h = DiscoFilterLayer(
                img_shape=self.img_shape,
                channels=self.embed_dim,
                kernel_shape=self.kernel_shape,
                basis_type=self.basis_type,
                data_grid=self.data_grid,
                dtype=self.dtype,
                name="filter",
            )(x_norm)
        elif self.filter_type == "conv1x1":
            h = LoRADense(
                self.embed_dim, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype, name="filter",
            )(x_norm)
        else:
            raise ValueError(f"unknown filter type {self.filter_type!r}")
        if self.inner_skip == "linear":
            h = h + LoRADense(
                self.embed_dim, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype,
                name="inner_skip",
            )(residual)
        elif self.inner_skip == "identity":
            h = h + residual
        if self.filter_type == "conv1x1":
            h = act(h)
        h = ConditionalLayerNorm(
            n_channels=self.embed_dim,
            embed_dim_noise=self.embed_dim_noise,
            global_layer_norm=self.global_layer_norm,
            elementwise_affine=self.affine_norms,
            name="norm1",
        )(h, noise)
        if self.use_mlp:
            h = MLP(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                act=act,
                dtype=self.dtype,
                name="mlp",
            )(h, deterministic=deterministic)
        if self.outer_skip == "linear":
            h = h + LoRADense(
                self.embed_dim, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype,
                name="outer_skip",
            )(residual)
        elif self.outer_skip == "identity":
            h = h + residual
        return h


class LocalNet(nn.Module):
    """(reference: localnet.py:324 LocalNet). Channels-last [B, H, W, C].

    Noise conditioning mirrors NoiseConditionedSFNO: per-call noise from
    the flax "noise" PRNG collection; zero noise when absent.
    """

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    embed_dim: int = 256
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "piecewise linear"
    noise_embed_dim: int = 0
    noise_type: str = "gaussian"  # or "isotropic"
    block_types: Sequence[str] = (
        "disco", "disco", "disco", "disco",
        "conv1x1", "conv1x1", "conv1x1", "conv1x1",
    )
    global_layer_norm: bool = False
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: bool = True
    big_skip: bool = True
    normalize_big_skip: bool = True
    affine_norms: bool = True
    lora_rank: int = 0
    lora_alpha: float | None = None
    data_grid: str = "equiangular"
    dtype: Any = jnp.float32

    def setup(self):
        if self.noise_type == "isotropic":
            nlat, nlon = self.img_shape
            # dispatches to the all-to-all distributed iSHT under a
            # spatial mesh (see ops/sht.py build_isht)
            self._isht = build_isht(
                nlat, nlon, grid=self.data_grid, channels_last=True
            )

    def _make_noise(self, batch: int):
        nlat, nlon = self.img_shape
        if self.noise_embed_dim == 0:
            return None
        if not self.has_rng("noise"):
            return jnp.zeros(
                (batch, nlat, nlon, self.noise_embed_dim), jnp.float32
            )
        key = self.make_rng("noise")
        if self.noise_type == "gaussian":
            return jax.random.normal(
                key, (batch, nlat, nlon, self.noise_embed_dim), jnp.float32
            )
        lmax, mmax = self._isht.lmax, self._isht.mmax
        kr, ki = jax.random.split(key)
        shape = (batch, lmax, mmax, self.noise_embed_dim)
        real = jax.random.normal(kr, shape, jnp.float32)
        imag = jax.random.normal(ki, shape, jnp.float32)
        imag = imag.at[:, :, 0].set(0.0)
        sqrt2 = math.sqrt(2.0)
        real = real.at[:, :, 1:].divide(sqrt2)
        imag = imag.at[:, :, 1:].divide(sqrt2)
        scale = math.sqrt(4.0 * math.pi) / lmax
        return self._isht(jax.lax.complex(real, imag) * scale)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation_function]
        nlat, nlon = self.img_shape
        noise = self._make_noise(x.shape[0])

        if self.big_skip:
            residual = x
            if self.normalize_big_skip:
                residual = ConditionalLayerNorm(
                    n_channels=self.in_chans,
                    embed_dim_noise=self.noise_embed_dim,
                    global_layer_norm=self.global_layer_norm,
                    elementwise_affine=self.affine_norms,
                    name="norm_big_skip",
                )(residual, noise)

        h = x.astype(self.dtype)
        for i in range(self.encoder_layers):
            h = LoRADense(
                self.embed_dim, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype,
                name=f"encoder_{i}",
            )(h)
            h = act(h)
        h = LoRADense(
            self.embed_dim, use_bias=False, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, dtype=self.dtype, name="encoder_out",
        )(h)

        if self.pos_embed:
            pe = self.param(
                "pos_embed", trunc_normal_init(std=0.02),
                (1, nlat, nlon, self.embed_dim), jnp.float32,
            )
            h = h + pe.astype(h.dtype)

        for i, block_type in enumerate(self.block_types):
            h = LocalBlock(
                img_shape=self.img_shape,
                embed_dim=self.embed_dim,
                embed_dim_noise=self.noise_embed_dim,
                filter_type=block_type,
                kernel_shape=self.kernel_shape,
                basis_type=self.basis_type,
                data_grid=self.data_grid,
                global_layer_norm=self.global_layer_norm,
                mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                inner_skip="linear",
                outer_skip="identity",
                use_mlp=self.use_mlp,
                affine_norms=self.affine_norms,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, noise, deterministic=deterministic)

        if self.big_skip:
            h = jnp.concatenate([h, residual.astype(h.dtype)], axis=-1)

        for i in range(self.encoder_layers):
            h = LoRADense(
                self.embed_dim, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, dtype=self.dtype,
                name=f"decoder_{i}",
            )(h)
            h = act(h)
        out = LoRADense(
            self.out_chans, use_bias=False, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, dtype=self.dtype, name="decoder_out",
        )(h)
        return out.astype(jnp.float32)


class AnkurLocalNet(nn.Module):
    """3-hidden-layer local diagnostic net, optional DISCO first layer and
    positional embedding (reference: conditional_sfno/ankur.py:109
    AnkurLocalNet; arXiv:2602.16090).
    """

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    embed_dim: int = 256
    use_disco_encoder: bool = True
    disco_kernel_size: int = 3
    pos_embed: bool = False
    activation_function: str = "gelu"
    basis_type: str = "morlet"
    data_grid: str = "equiangular"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation_function]
        h = x.astype(self.dtype)
        for i in range(3):
            if i == 0 and self.use_disco_encoder:
                # encoder cutoff uses the single (not doubled) radius
                # (reference: ankur.py:49)
                h = GroupedDiscoFilterLayer(
                    img_shape=self.img_shape,
                    in_chans=self.in_chans,
                    out_chans=self.embed_dim,
                    kernel_shape=(
                        self.disco_kernel_size, self.disco_kernel_size
                    ),
                    basis_type=self.basis_type,
                    data_grid=self.data_grid,
                    dtype=self.dtype,
                    name="disco_encoder",
                )(h)
            else:
                h = nn.Dense(
                    self.embed_dim, kernel_init=trunc_normal_init(),
                    dtype=self.dtype, name=f"hidden_{i}",
                )(h)
            if i == 0 and self.pos_embed:
                pe = self.param(
                    "pos_embed", trunc_normal_init(std=0.02),
                    (1, *self.img_shape, self.embed_dim), jnp.float32,
                )
                h = h + pe.astype(h.dtype)
            h = act(h)
        out = nn.Dense(
            self.out_chans, use_bias=False,
            kernel_init=trunc_normal_init(), dtype=self.dtype, name="out",
        )(h)
        return out.astype(jnp.float32)


class GroupedDiscoFilterLayer(nn.Module):
    """DISCO conv with grouped in->out channel mixing
    (reference: ankur.py:43 GroupedDiscreteContinuousConvS2)."""

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "morlet"
    data_grid: str = "equiangular"
    dtype: Any = jnp.float32

    def setup(self):
        theta_cutoff = compute_cutoff_radius(
            self.img_shape[0], self.kernel_shape, self.basis_type
        )
        self.conv = build_disco(
            in_shape=self.img_shape,
            out_shape=self.img_shape,
            kernel_shape=self.kernel_shape,
            grid_in=self.data_grid,
            grid_out=self.data_grid,
            theta_cutoff=theta_cutoff,
            basis_type=self.basis_type,
        )

    @nn.compact
    def __call__(self, x):
        g = math.gcd(self.in_chans, self.out_chans)
        cin_g, cout_g = self.in_chans // g, self.out_chans // g
        k = self.conv.kernel_size
        scale = math.sqrt(1.0 / (k * cin_g))
        w = self.param(
            "weight", nn.initializers.normal(stddev=scale),
            (k, g, cin_g, cout_g), jnp.float32,
        )
        y = self.conv(x.astype(jnp.float32))  # [..., H, W, K, Cin]
        y = y.reshape(*y.shape[:-1], g, cin_g)
        out = jnp.einsum("...jkgc,kgco->...jgo", y, w)
        return out.reshape(*out.shape[:-2], self.out_chans).astype(x.dtype)
