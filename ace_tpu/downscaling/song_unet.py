"""SongUNet v2: architecture-parity port of the reference's vendored
PhysicsNeMo diffusion backbone (reference:
fme/downscaling/modules/physicsnemo_unets_v2/unets.py:88 SongUNetv2,
layers.py Conv2d/Linear/PositionalEmbedding/FourierEmbedding/Attention/
UNetBlock, group_norm.py get_group_norm), so HiRO-ACE reference
checkpoints convert directly (see
ace_tpu/utils/torch_convert.py torch_songunet_v2_to_flax).

TPU-native design: channels-last [B, H, W, C] end to end (the reference
needs Apex GroupNorm to get NHWC; XLA fuses our float32-statistics
GroupNorm for free), resampling as depthwise convolutions on the MXU,
and attention via a single fused dot-product. Parameter names mirror
the torch module tree one-to-one (dots -> underscores) so conversion is
a rename + transpose.
"""

import dataclasses
import math
from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def groupnorm_groups(num_channels: int, num_groups: int = 32,
                     min_channels_per_group: int = 4) -> int:
    """(reference: group_norm.py:45 _compute_groupnorm_groups)."""
    groups = min(
        num_groups,
        (num_channels + min_channels_per_group - 1)
        // min_channels_per_group,
    )
    if num_channels % groups != 0:
        raise ValueError(
            "num_channels must be divisible by num_groups or "
            "min_channels_per_group"
        )
    return groups


class GroupNorm(nn.Module):
    """GroupNorm with float32 statistics and optional fused activation
    (reference: group_norm.py GroupNorm; biased variance, matching
    F.group_norm / Apex)."""

    channels: int
    eps: float = 1e-5
    act: str | None = None

    @nn.compact
    def __call__(self, x):
        groups = groupnorm_groups(self.channels)
        b, h, w, c = x.shape
        orig_dtype = x.dtype
        xg = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4),
                       keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = xg.reshape(b, h, w, c)
        weight = self.param("weight", nn.initializers.ones, (c,),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = (y * weight + bias).astype(orig_dtype)
        if self.act == "silu":
            y = nn.silu(y)
        elif self.act is not None:
            raise ValueError(f"unsupported fused activation {self.act!r}")
        return y


def _scaled_xavier_uniform(scale: float):
    base = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def _resample_filter_2d(resample_filter: Sequence[int]) -> np.ndarray:
    """[k] -> [k, k] normalized outer-product filter
    (reference: layers.py:221 ``f.ger(f) / f.sum().square()``)."""
    f = np.asarray(resample_filter, np.float32)
    return np.outer(f, f) / (f.sum() ** 2)


def _depthwise_down(x, filt2d):
    """Stride-2 depthwise filter (reference: conv2d(f tiled, groups=C,
    stride=2, padding=f_pad))."""
    c = x.shape[-1]
    k = filt2d.shape[0]
    pad = (k - 1) // 2
    kernel = jnp.asarray(filt2d, x.dtype)[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _depthwise_up(x, filt2d):
    """Stride-2 transposed depthwise filter x4 (reference:
    conv_transpose2d(f*4 tiled, groups=C, stride=2, padding=f_pad)).
    Expressed as an input-dilated convolution; the filters are symmetric
    (outer products), so no kernel flip is needed."""
    c = x.shape[-1]
    k = filt2d.shape[0]
    pad = (k - 1) // 2
    kernel = jnp.asarray(filt2d * 4.0, x.dtype)[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    # conv_transpose2d(stride=2, padding=p, kernel=k) == input-dilated
    # conv with symmetric padding (k-1-p); output (H-1)*2 - 2p + k
    lo = k - 1 - pad
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(lo, lo), (lo, lo)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class Conv2d(nn.Module):
    """Conv with optional depthwise up/down resampling
    (reference: layers.py:120 Conv2d; fused_resample unused by
    SongUNetv2's block_kwargs and not implemented)."""

    in_channels: int
    out_channels: int
    kernel: int
    bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Sequence[int] = (1, 1)
    init_weight: float = 1.0
    # computation dtype (params stay f32; bf16 here is the AMP analogue
    # of the reference's autocast UNet benchmarks)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.up:
            x = _depthwise_up(x, _resample_filter_2d(self.resample_filter))
        if self.down:
            x = _depthwise_down(
                x, _resample_filter_2d(self.resample_filter)
            )
        if self.kernel:
            pad = self.kernel // 2
            x = nn.Conv(
                self.out_channels, (self.kernel, self.kernel),
                padding=pad, use_bias=self.bias,
                kernel_init=_scaled_xavier_uniform(self.init_weight),
                dtype=self.dtype, name="conv",
            )(x)
        return x


class Linear(nn.Module):
    """(reference: layers.py:302 Linear)."""

    features: int
    use_bias: bool = True
    init_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=_scaled_xavier_uniform(self.init_weight),
            dtype=self.dtype, name="linear",
        )(x)


def positional_embedding(x, num_channels: int, max_positions: int = 10000,
                         endpoint: bool = True):
    """cos/sin noise-level embedding (reference: layers.py:411
    PositionalEmbedding, ``cos_sin`` variant)."""
    half = num_channels // 2
    freqs = jnp.arange(half, dtype=jnp.float32)
    freqs = freqs / (half - (1 if endpoint else 0))
    freqs = (1.0 / max_positions) ** freqs
    x = x[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


class FourierEmbedding(nn.Module):
    """(reference: layers.py:372 FourierEmbedding). The random
    frequencies are a torch buffer; stored here as a gradient-stopped
    parameter so checkpoint conversion lands it in the same tree."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs",
            lambda k, s: jax.random.normal(k, s, jnp.float32) * self.scale,
            (self.num_channels // 2,),
        )
        freqs = jax.lax.stop_gradient(freqs)
        x = x[:, None].astype(jnp.float32) * (2 * np.pi * freqs)[None, :]
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


class Attention(nn.Module):
    """Self-attention with GroupNorm and 1x1 qkv/proj convs
    (reference: layers.py:516 Attention)."""

    out_channels: int
    num_heads: int
    eps: float = 1e-5
    init_attn_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(channels=c, eps=self.eps, name="norm")(x)
        qkv = Conv2d(c, c * 3, kernel=1,
                     init_weight=self.init_attn_weight,
                     dtype=self.dtype, name="qkv")(y)
        # torch reshapes channels-first [B, heads, C/heads, 3, HW]; in
        # channels-last the channel axis carries the same
        # (heads, C/heads, 3) ordering
        dk = c // self.num_heads
        qkv = qkv.reshape(b, h * w, self.num_heads, dk, 3)
        q, k, v = (qkv[..., 0], qkv[..., 1], qkv[..., 2])
        # [B, HW, heads, dk] -> attention over HW
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(dk)
        # softmax in f32 regardless of computation dtype
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        # init_zero in SongUNetv2's block_kwargs is xavier * 1e-5
        out = Conv2d(c, c, kernel=1, init_weight=1e-5,
                     dtype=self.dtype, name="proj")(out)
        return x + out


class UNetBlock(nn.Module):
    """(reference: layers.py:636 UNetBlock with SongUNetv2's
    block_kwargs: skip_scale=1/sqrt(2), eps=1e-6, resample_proj=True,
    adaptive_scale=False, fused silu norms)."""

    in_channels: int
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: int = 1
    dropout: float = 0.0
    skip_scale: float = 1.0 / math.sqrt(2.0)
    eps: float = 1e-6
    resample_filter: Sequence[int] = (1, 1)
    init_attn_weight: float = math.sqrt(0.2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        orig = x
        x = GroupNorm(channels=self.in_channels, eps=self.eps, act="silu",
                      name="norm0")(x)
        x = Conv2d(self.in_channels, self.out_channels, kernel=3,
                   up=self.up, down=self.down,
                   resample_filter=self.resample_filter,
                   dtype=self.dtype, name="conv0")(x)
        params = Linear(self.out_channels, name="affine")(emb)
        x = GroupNorm(channels=self.out_channels, eps=self.eps, act="silu",
                      name="norm1")(x + params[:, None, None, :])
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Conv2d(self.out_channels, self.out_channels, kernel=3,
                   init_weight=1e-5, dtype=self.dtype, name="conv1")(x)
        if (self.out_channels != self.in_channels or self.up
                or self.down):
            skip = Conv2d(self.in_channels, self.out_channels, kernel=1,
                          up=self.up, down=self.down,
                          resample_filter=self.resample_filter,
                          dtype=self.dtype, name="skip")(orig)
        else:
            skip = orig
        x = (x + skip) * self.skip_scale
        if self.attention:
            x = Attention(
                out_channels=self.out_channels, num_heads=self.num_heads,
                eps=self.eps, init_attn_weight=self.init_attn_weight,
                dtype=self.dtype, name="attn",
            )(x)
            x = x * self.skip_scale
        return x


@dataclasses.dataclass(frozen=True)
class _BlockPlan:
    name: str
    kind: str  # conv | block | down | up | aux_down | aux_skip |
    #            aux_residual | aux_up | aux_norm | aux_conv | in0 | in1
    cin: int = 0
    cout: int = 0
    attn: bool = False


class SongUNetV2(nn.Module):
    """(reference: unets.py:88 SongUNetv2). Call signature matches the
    compact DiffusionUNet: (x [B,H,W,C_out latents], condition
    [B,H,W,C_cond], c_noise [B]) -> [B,H,W,C_out]; x and condition are
    concatenated internally, mirroring the reference's
    n_in_channels_conditioned = latents + conditioning
    (diffusion_registry.py:131)."""

    img_resolution: int
    in_channels: int  # conditioned total: latents + conditioning
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: Sequence[int] = (1, 1)
    additive_pos_embed: bool = False
    bottleneck_attention: bool = True
    # >= 1: rematerialize every UNet block in the backward pass (the
    # reference's checkpoint_level resolution thresholds collapse to a
    # single on/off here)
    checkpointing: int = 0
    dtype: jnp.dtype = jnp.float32

    def _plan(self):
        """Encoder/decoder block plans mirroring the reference's
        ModuleDict construction order (unets.py:441-539)."""
        enc: list[_BlockPlan] = []
        cout = self.in_channels
        caux = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cin = cout
                cout = self.model_channels
                enc.append(_BlockPlan(f"enc_{res}x{res}_conv", "conv",
                                      cin, cout))
            else:
                enc.append(_BlockPlan(f"enc_{res}x{res}_down", "down",
                                      cout, cout))
                if self.encoder_type == "skip":
                    enc.append(_BlockPlan(f"enc_{res}x{res}_aux_down",
                                          "aux_down", caux, caux))
                    enc.append(_BlockPlan(f"enc_{res}x{res}_aux_skip",
                                          "aux_skip", caux, cout))
                if self.encoder_type == "residual":
                    enc.append(_BlockPlan(f"enc_{res}x{res}_aux_residual",
                                          "aux_residual", caux, cout))
                    caux = cout
            for idx in range(self.num_blocks):
                cin = cout
                cout = self.model_channels * mult
                enc.append(_BlockPlan(
                    f"enc_{res}x{res}_block{idx}", "block", cin, cout,
                    attn=res in self.attn_resolutions,
                ))
        skips = [p.cout for p in enc if "aux" not in p.kind]

        dec: list[_BlockPlan] = []
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec.append(_BlockPlan(f"dec_{res}x{res}_in0", "in0",
                                      cout, cout,
                                      attn=self.bottleneck_attention))
                dec.append(_BlockPlan(f"dec_{res}x{res}_in1", "in1",
                                      cout, cout))
            else:
                dec.append(_BlockPlan(f"dec_{res}x{res}_up", "up",
                                      cout, cout))
            for idx in range(self.num_blocks + 1):
                cin = cout + skips.pop()
                cout = self.model_channels * mult
                dec.append(_BlockPlan(
                    f"dec_{res}x{res}_block{idx}", "block", cin, cout,
                    attn=(idx == self.num_blocks
                          and res in self.attn_resolutions),
                ))
            if self.decoder_type == "skip" or level == 0:
                if (self.decoder_type == "skip"
                        and level < len(self.channel_mult) - 1):
                    dec.append(_BlockPlan(f"dec_{res}x{res}_aux_up",
                                          "aux_up", self.out_channels,
                                          self.out_channels))
                dec.append(_BlockPlan(f"dec_{res}x{res}_aux_norm",
                                      "aux_norm", cout, cout))
                dec.append(_BlockPlan(f"dec_{res}x{res}_aux_conv",
                                      "aux_conv", cout,
                                      self.out_channels))
        return enc, dec

    def _unet_block(self, plan: _BlockPlan, up=False, down=False):
        cls = UNetBlock
        if self.checkpointing >= 1:
            cls = nn.remat(UNetBlock, static_argnums=(3,))
        return cls(
            in_channels=plan.cin, out_channels=plan.cout,
            emb_channels=self.model_channels * self.channel_mult_emb,
            up=up, down=down, attention=plan.attn, num_heads=1,
            dropout=self.dropout,
            resample_filter=tuple(self.resample_filter),
            dtype=jnp.dtype(self.dtype), name=plan.name,
        )

    @nn.compact
    def __call__(self, x, condition, c_noise, deterministic: bool = True,
                 class_labels=None, augment_labels=None):
        x = jnp.concatenate(
            [x.astype(self.dtype), condition.astype(self.dtype)], axis=-1
        )
        noise_channels = self.model_channels * self.channel_mult_noise
        emb_channels = self.model_channels * self.channel_mult_emb

        # Mapping (reference: unets.py:622-646)
        if self.embedding_type != "zero":
            if self.embedding_type == "positional":
                emb = positional_embedding(
                    c_noise, noise_channels, endpoint=True
                )
            elif self.embedding_type == "fourier":
                emb = FourierEmbedding(
                    num_channels=noise_channels, name="map_noise"
                )(c_noise)
            else:
                raise ValueError(
                    f"invalid embedding_type {self.embedding_type!r}"
                )
            b = emb.shape[0]
            emb = emb.reshape(b, 2, -1)[:, ::-1].reshape(b, -1)  # sin/cos
            if self.label_dim:
                lab = class_labels
                if lab is None:
                    raise ValueError("label_dim > 0 requires class_labels")
                if not deterministic and self.label_dropout:
                    keep = (
                        jax.random.uniform(
                            self.make_rng("dropout"), (b, 1)
                        ) >= self.label_dropout
                    )
                    lab = lab * keep.astype(lab.dtype)
                emb = emb + Linear(noise_channels, name="map_label")(
                    lab * np.sqrt(self.label_dim)
                )
            if self.augment_dim and augment_labels is not None:
                emb = emb + Linear(
                    noise_channels, use_bias=False, name="map_augment"
                )(augment_labels)
            emb = nn.silu(Linear(emb_channels, name="map_layer0")(emb))
            emb = nn.silu(Linear(emb_channels, name="map_layer1")(emb))
        else:
            emb = jnp.zeros((c_noise.shape[0], emb_channels), x.dtype)
        emb = emb.astype(self.dtype)

        enc_plan, dec_plan = self._plan()
        rfilt = _resample_filter_2d(self.resample_filter)

        # Encoder (reference: unets.py:650-688)
        skips = []
        aux = x
        for plan in enc_plan:
            if plan.kind == "conv":
                h = Conv2d(plan.cin, plan.cout, kernel=3,
                           dtype=jnp.dtype(self.dtype),
                           name=plan.name)(x)
                if self.additive_pos_embed:
                    pe = self.param(
                        "spatial_emb",
                        nn.initializers.truncated_normal(0.02),
                        (1, self.img_resolution, self.img_resolution,
                         self.model_channels), jnp.float32,
                    )
                    h = h + pe.astype(h.dtype)
                x = h
                skips.append(x)
            elif plan.kind == "down":
                x = self._unet_block(plan, down=True)(
                    x, emb, deterministic
                )
                skips.append(x)
            elif plan.kind == "aux_down":
                aux = _depthwise_down(aux, rfilt)
            elif plan.kind == "aux_skip":
                x = x + Conv2d(plan.cin, plan.cout, kernel=1,
                               dtype=jnp.dtype(self.dtype),
                               name=plan.name)(aux)
                skips[-1] = x
            elif plan.kind == "aux_residual":
                # reference fused_resample down order: 3x3 conv padded
                # (w_pad + f_pad) at FULL resolution, then an unpadded
                # stride-2 depthwise filter (layers.py:258-276)
                k_f = rfilt.shape[0]
                w_pad, f_pad = 1, (k_f - 1) // 2
                a = nn.Conv(
                    plan.cout, (3, 3), padding=w_pad + f_pad,
                    use_bias=False, kernel_init=_scaled_xavier_uniform(1.0),
                    name=f"{plan.name}_conv",
                )(aux)
                dk = jnp.tile(
                    jnp.asarray(rfilt, a.dtype)[:, :, None, None],
                    (1, 1, 1, plan.cout),
                )
                a = jax.lax.conv_general_dilated(
                    a, dk, window_strides=(2, 2), padding=[(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=plan.cout,
                )
                bias = self.param(
                    f"{plan.name}_bias", nn.initializers.zeros,
                    (plan.cout,), jnp.float32,
                )
                a = a + bias.astype(a.dtype)
                x = (x + a) / np.sqrt(2.0)
                aux = x
                skips[-1] = x
            else:  # block
                x = self._unet_block(plan)(x, emb, deterministic)
                skips.append(x)

        # Decoder (reference: unets.py:690-729)
        aux_out = None
        tmp = None
        for plan in dec_plan:
            if plan.kind == "aux_up":
                aux_out = _depthwise_up(aux_out, rfilt)
            elif plan.kind == "aux_norm":
                tmp = GroupNorm(channels=plan.cin, eps=1e-6,
                                name=plan.name)(x)
            elif plan.kind == "aux_conv":
                tmp = Conv2d(plan.cin, plan.cout, kernel=3,
                             init_weight=1e-5,
                             dtype=jnp.dtype(self.dtype),
                             name=plan.name)(nn.silu(tmp))
                aux_out = tmp if aux_out is None else tmp + aux_out
            elif plan.kind in ("in0", "in1"):
                x = self._unet_block(plan)(x, emb, deterministic)
            elif plan.kind == "up":
                x = self._unet_block(plan, up=True)(x, emb, deterministic)
            else:  # block
                if x.shape[-1] != plan.cin:
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = self._unet_block(plan)(x, emb, deterministic)
        return aux_out
