"""Shared neural-net layers for the model zoo (flax.linen, channels-last).

TPU-native layout notes: all "1x1 conv" layers of the reference
(fme/ace/models/modulus/layers.py) are Dense contractions over the trailing
channel axis here, which the MXU executes directly without layout
transposes. Norms reduce over the leading spatial axes.
"""

from collections.abc import Callable

import flax.linen as nn
import functools

import jax
import jax.numpy as jnp


def exact_gelu(x):
    """erf-GELU matching torch.nn.GELU's default (reference:
    fme/ace/models/modulus/layers.py MLP's nn.GELU).

    In bfloat16 the tanh form is within 1 ulp of the erf form everywhere
    (max fp32 difference 5e-4 < bf16 resolution), while the erf form
    upcasts to fp32 on the TPU VPU and costs ~0.5 ms per 33M-element MLP
    activation at ACE2 scale — so use tanh for bf16 activations and erf
    for fp32, where the difference is observable.
    """
    approximate = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approximate)


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal initializer matching the reference's trunc_normal_
    (fme/ace/models/modulus/initialization.py): truncation at ±2 std.
    """
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class InstanceNorm(nn.Module):
    """Instance normalization over the spatial axes of a [..., H, W, C]
    tensor, with per-channel affine parameters (reference:
    nn.InstanceNorm2d(eps=1e-6, affine=True), fme/ace/models/modulus/sfnonet.py:594).
    """

    eps: float = 1e-6
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        if orig_dtype == jnp.float32:
            x32 = x
            mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
            var = jnp.mean((x32 - mean) ** 2, axis=(-3, -2), keepdims=True)
            out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        else:
            # bf16 activations: f32 statistics (small), no full-size f32
            # tensor materialized (see ChannelLayerNorm note)
            mean = jnp.mean(x, axis=(-3, -2), keepdims=True,
                            dtype=jnp.float32)
            xc = x - mean.astype(orig_dtype)
            var = jnp.mean(jnp.square(xc), axis=(-3, -2), keepdims=True,
                           dtype=jnp.float32)
            out = xc * jax.lax.rsqrt(var + self.eps).astype(orig_dtype)
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32
            )
            out = out * scale.astype(out.dtype) + bias.astype(out.dtype)
        return out.astype(orig_dtype)


class LayerNorm2d(nn.Module):
    """LayerNorm over the (H, W) spatial axes per channel (reference:
    nn.LayerNorm(normalized_shape=(H, W)), fme/ace/models/modulus/sfnonet.py:585).
    Parameters are per-(H, W) position.
    """

    spatial_shape: tuple[int, int]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.mean((x32 - mean) ** 2, axis=(-3, -2), keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param(
            "scale", nn.initializers.ones, (*self.spatial_shape, 1), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (*self.spatial_shape, 1), jnp.float32
        )
        return (out * scale + bias).astype(orig_dtype)


class MLP(nn.Module):
    """Per-point 2-layer MLP (reference: fme/ace/models/modulus/layers.py MLP,
    implemented there as 1x1 convs).
    """

    hidden_features: int
    out_features: int
    act: Callable = exact_gelu
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(
            self.hidden_features,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = self.act(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(
            self.out_features,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc2",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (reference: modulus layers.DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
