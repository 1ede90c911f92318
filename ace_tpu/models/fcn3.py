"""FourCastNet3: grouped spherical neural operator with DISCO
encoders/decoders and an SFNO/DISCO processor
(reference: fme/ace/models/makani_fcn3/models/networks/fourcastnet3.py:423
AtmoSphericNeuralOperatorNet).

TPU-native mapping (channels-last [B, H, W, C]):
- DISCO convolutions are banded matmul-DFT contractions (ops/disco.py);
  grouped channel mixing is an einsum over [K, G, Cin/G, Cout/G].
- The per-level atmosphere encoder/decoder shares weights across levels by
  folding the level (group) axis into the batch.
- Upsampling in the decoder is a precomputed bilinear sphere resample
  (ops/resample.py) or an SHT round-trip.
- Global blocks use the dhconv spectral filter; local blocks a DISCO
  filter. Every block re-appends the static auxiliary embedding.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ace_tpu.models.layers import MLP, trunc_normal_init
from ace_tpu.models.localnet import compute_cutoff_radius
from ace_tpu.models.sfno import _ACTIVATIONS, SpectralConvS2
from ace_tpu.ops.distributed_disco import build_disco
from ace_tpu.ops.resample import ResampleS2
from ace_tpu.ops.sht import build_isht, build_sht


class GroupedDiscoConv(nn.Module):
    """DISCO contraction + grouped [K, Cin, Cout] weight mixing
    (reference: fourcastnet3.py DiscreteContinuousConvS2 usage with
    channel groups).
    """

    in_shape: tuple[int, int]
    out_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    kernel_shape: tuple[int, int] = (3, 3)
    grid_in: str = "equiangular"
    grid_out: str = "legendre-gauss"
    groups: int = 1
    use_bias: bool = False
    theta_cutoff_factor: float = 1.0
    weight_gain: float = 1.0
    basis_type: str = "piecewise linear"
    dtype: Any = jnp.float32

    def setup(self):
        theta_cutoff = self.theta_cutoff_factor * compute_cutoff_radius(
            self.in_shape[0], self.kernel_shape, self.basis_type
        )
        # spatial-mesh dispatch (see localnet.py DiscoFilterLayer)
        self.conv = build_disco(
            in_shape=self.in_shape,
            out_shape=self.out_shape,
            kernel_shape=self.kernel_shape,
            grid_in=self.grid_in,
            grid_out=self.grid_out,
            theta_cutoff=theta_cutoff,
            basis_type=self.basis_type,
        )

    @nn.compact
    def __call__(self, x):
        g = self.groups
        cin_g, cout_g = self.in_chans // g, self.out_chans // g
        k = self.conv.kernel_size
        scale = self.weight_gain * math.sqrt(1.0 / (k * cin_g))
        w = self.param(
            "weight", nn.initializers.normal(stddev=scale),
            (k, g, cin_g, cout_g), jnp.float32,
        )
        y = self.conv(x.astype(jnp.float32))  # [..., H, W, K, Cin]
        y = y.reshape(*y.shape[:-1], g, cin_g)
        out = jnp.einsum("...jkgc,kgco->...jgo", y, w)
        out = out.reshape(*out.shape[:-2], self.out_chans)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.out_chans,),
                jnp.float32,
            )
            out = out + b
        return out.astype(x.dtype)


class DiscoEncoder(nn.Module):
    """(reference: fourcastnet3.py:67 DiscreteContinuousEncoder)."""

    inp_shape: tuple[int, int]
    out_shape: tuple[int, int]
    inp_chans: int
    out_chans: int
    grid_in: str
    grid_out: str
    kernel_shape: tuple[int, int] = (3, 3)
    groups: int = 1
    use_mlp: bool = False
    mlp_ratio: float = 2.0
    activation: str = "gelu"
    use_bias: bool = False
    basis_type: str = "piecewise linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        gain = math.sqrt(2.0) if self.use_mlp else 1.0
        h = GroupedDiscoConv(
            in_shape=self.inp_shape, out_shape=self.out_shape,
            in_chans=self.inp_chans, out_chans=self.out_chans,
            kernel_shape=self.kernel_shape,
            grid_in=self.grid_in, grid_out=self.grid_out,
            groups=self.groups, use_bias=self.use_bias,
            weight_gain=gain, basis_type=self.basis_type,
            dtype=self.dtype, name="conv",
        )(x)
        if self.use_mlp:
            act = _ACTIVATIONS[self.activation]
            h = act(h)
            h = MLP(
                hidden_features=int(self.mlp_ratio * self.out_chans),
                out_features=self.out_chans,
                act=act, dtype=self.dtype, name="mlp",
            )(h, deterministic=deterministic)
        return h


class DiscoDecoder(nn.Module):
    """(reference: fourcastnet3.py:148 DiscreteContinuousDecoder):
    optional MLP -> upsample (bilinear or SHT) -> DISCO conv at the
    output resolution.
    """

    inp_shape: tuple[int, int]
    out_shape: tuple[int, int]
    inp_chans: int
    out_chans: int
    grid_in: str
    grid_out: str
    kernel_shape: tuple[int, int] = (3, 3)
    groups: int = 1
    use_mlp: bool = False
    mlp_ratio: float = 2.0
    activation: str = "gelu"
    upsample_sht: bool = False
    basis_type: str = "piecewise linear"
    dtype: Any = jnp.float32

    def setup(self):
        if self.upsample_sht:
            # dispatches to the all-to-all distributed SHT under a
            # spatial mesh (reference: makani_fcn3/mpu/layers.py carries
            # its own distributed layers; here one factory covers all)
            self._sht = build_sht(
                *self.inp_shape, grid=self.grid_in, channels_last=True
            )
            self._isht = build_isht(
                *self.out_shape, lmax=self._sht.lmax, mmax=self._sht.mmax,
                grid=self.grid_out, channels_last=True,
            )
        else:
            self._resample = ResampleS2(
                *self.inp_shape, *self.out_shape,
                grid_in=self.grid_in, grid_out=self.grid_out,
            )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.use_mlp:
            act = _ACTIVATIONS[self.activation]
            x = act(x)
            x = MLP(
                hidden_features=int(self.mlp_ratio * self.inp_chans),
                out_features=self.inp_chans,
                act=act, dtype=self.dtype, name="mlp",
            )(x, deterministic=deterministic)
        x32 = x.astype(jnp.float32)
        if self.upsample_sht:
            up = self._isht(self._sht(x32))
        else:
            up = self._resample(x32)
        return GroupedDiscoConv(
            in_shape=self.out_shape, out_shape=self.out_shape,
            in_chans=self.inp_chans, out_chans=self.out_chans,
            kernel_shape=self.kernel_shape,
            grid_in=self.grid_out, grid_out=self.grid_out,
            groups=self.groups, basis_type=self.basis_type,
            dtype=self.dtype, name="conv",
        )(up.astype(x.dtype))


class FCN3Block(nn.Module):
    """(reference: fourcastnet3.py:270 NeuralOperatorBlock):
    conv (global dhconv / local DISCO) -> norm -> MLP -> layer-scaled
    residual add. Input may carry extra (aux) channels beyond out_chans.
    """

    forward_transform: Any
    inverse_transform: Any
    inp_chans: int
    out_chans: int
    conv_type: str = "local"  # "local" | "global"
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "piecewise linear"
    sht_grid: str = "legendre-gauss"
    mlp_ratio: float = 2.0
    activation: str = "gelu"
    normalization: str = "none"
    use_mlp: bool = True
    layer_scale: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shape = (
            self.forward_transform.nlat, self.forward_transform.nlon
        )
        if self.conv_type == "global":
            dx, _ = SpectralConvS2(
                forward_transform=self.forward_transform,
                inverse_transform=self.inverse_transform,
                in_channels=self.inp_chans,
                out_channels=self.inp_chans,
                operator_type="dhconv",
                use_bias=self.use_bias,
                name="global_conv",
            )(x)
        else:
            dx = GroupedDiscoConv(
                in_shape=shape, out_shape=shape,
                in_chans=self.inp_chans, out_chans=self.inp_chans,
                kernel_shape=self.kernel_shape,
                grid_in=self.sht_grid, grid_out=self.sht_grid,
                theta_cutoff_factor=2.0, basis_type=self.basis_type,
                dtype=self.dtype, name="local_conv",
            )(x)
        if self.normalization == "layer_norm":
            dx = nn.LayerNorm(dtype=jnp.float32, name="norm")(dx)
        if self.use_mlp:
            act = _ACTIVATIONS[self.activation]
            dx = MLP(
                hidden_features=int(self.inp_chans * self.mlp_ratio),
                out_features=self.out_chans,
                act=act, dtype=self.dtype, name="mlp",
            )(dx, deterministic=deterministic)
        else:
            dx = dx[..., : self.out_chans]
        if self.layer_scale:
            # per-channel scalar scale, init 0.1 (reference layer_scale
            # depthwise 1x1 conv)
            ls = self.param(
                "layer_scale",
                nn.initializers.constant(0.1),
                (self.out_chans,), jnp.float32,
            )
            dx = dx * ls.astype(dx.dtype)
        return x[..., : self.out_chans] + dx


class FourCastNet3(nn.Module):
    """(reference: fourcastnet3.py:423 AtmoSphericNeuralOperatorNet).

    forward(x_atmo [B,H,W,G*Ca_in], x_surf [B,H,W,Cs_in],
    x_aux [B,H,W,Caux]) -> (atmo_out [B,H,W,G*Ca], surf_out [B,H,W,Cs]).
    Atmosphere channels are level(group)-major, variables fastest.
    """

    img_shape: tuple[int, int]
    n_atmo_channels: int
    n_atmo_groups: int
    n_surf_channels: int
    n_aux_channels: int
    n_atmo_diagnostic_channels: int = 0
    n_surf_diagnostic_channels: int = 0
    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    kernel_shape: tuple[int, int] = (3, 3)
    filter_basis_type: str = "piecewise linear"
    scale_factor: int = 8
    encoder_mlp: bool = False
    upsample_sht: bool = False
    atmo_embed_dim: int = 8
    surf_embed_dim: int = 8
    aux_embed_dim: int = 8
    num_layers: int = 4
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    layer_scale: bool = True
    normalization_layer: str = "none"
    max_modes: int | None = None
    hard_thresholding_fraction: float = 1.0
    sfno_block_frequency: int = 2
    use_bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        nlat, nlon = self.img_shape
        self.h = int(nlat // self.scale_factor)
        self.w = int(nlon // self.scale_factor)
        if self.max_modes is not None:
            lmax = mmax = self.max_modes
        else:
            lmax = int(self.h * self.hard_thresholding_fraction)
            mmax = int(
                (self.w // 2 + 1) * self.hard_thresholding_fraction
            )
        self.sht = build_sht(
            self.h, self.w, lmax=lmax, mmax=mmax,
            grid=self.sht_grid_type, channels_last=True,
        )
        self.isht = build_isht(
            self.h, self.w, lmax=lmax, mmax=mmax,
            grid=self.sht_grid_type, channels_last=True,
        )

    @nn.compact
    def __call__(self, x_atmo, x_surf, x_aux, deterministic: bool = True):
        g = self.n_atmo_groups
        ca_in = self.n_atmo_channels - self.n_atmo_diagnostic_channels
        cs_in = self.n_surf_channels - self.n_surf_diagnostic_channels
        total_embed = g * self.atmo_embed_dim + self.surf_embed_dim
        has_aux = self.n_aux_channels > 0

        def fold_groups(x, chans):
            # [B,H,W,G*chans] -> [B*G,H,W,chans]
            b, hh, ww, _ = x.shape
            x = x.reshape(b, hh, ww, g, chans)
            x = jnp.moveaxis(x, -2, 1)  # [B,G,H,W,chans]
            return x.reshape(b * g, hh, ww, chans)

        def unfold_groups(x, chans):
            bg, hh, ww, _ = x.shape
            x = x.reshape(bg // g, g, hh, ww, chans)
            x = jnp.moveaxis(x, 1, -2)
            return x.reshape(bg // g, hh, ww, g * chans)

        # --- encode (atmosphere levels share one encoder) ---
        atmo_enc = DiscoEncoder(
            inp_shape=self.img_shape, out_shape=(self.h, self.w),
            inp_chans=ca_in, out_chans=self.atmo_embed_dim,
            grid_in=self.model_grid_type, grid_out=self.sht_grid_type,
            kernel_shape=self.kernel_shape,
            groups=math.gcd(ca_in, self.atmo_embed_dim),
            basis_type=self.filter_basis_type,
            use_mlp=self.encoder_mlp, mlp_ratio=self.mlp_ratio,
            activation=self.activation_function, use_bias=self.use_bias,
            dtype=self.dtype, name="atmo_encoder",
        )
        x = unfold_groups(
            atmo_enc(
                fold_groups(x_atmo, ca_in), deterministic=deterministic
            ),
            self.atmo_embed_dim,
        )
        if self.n_surf_channels > 0:
            x_s = DiscoEncoder(
                inp_shape=self.img_shape, out_shape=(self.h, self.w),
                inp_chans=cs_in, out_chans=self.surf_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=self.kernel_shape,
                groups=math.gcd(cs_in, self.surf_embed_dim),
                basis_type=self.filter_basis_type,
                use_mlp=self.encoder_mlp, mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                use_bias=self.use_bias,
                dtype=self.dtype, name="surf_encoder",
            )(x_surf, deterministic=deterministic)
            x = jnp.concatenate([x, x_s], axis=-1)

        aux = None
        if has_aux:
            aux = DiscoEncoder(
                inp_shape=self.img_shape, out_shape=(self.h, self.w),
                inp_chans=self.n_aux_channels,
                out_chans=self.aux_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=self.kernel_shape,
                groups=math.gcd(self.n_aux_channels, self.aux_embed_dim),
                basis_type=self.filter_basis_type,
                use_mlp=self.encoder_mlp, mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                use_bias=self.use_bias,
                dtype=self.dtype, name="aux_encoder",
            )(x_aux, deterministic=deterministic)

        # --- processor ---
        inp_chans = total_embed + (self.aux_embed_dim if has_aux else 0)
        for i in range(self.num_layers):
            conv_type = (
                "global" if i % self.sfno_block_frequency == 0 else "local"
            )
            if aux is not None:
                x = jnp.concatenate([x, aux.astype(x.dtype)], axis=-1)
            x = FCN3Block(
                forward_transform=self.sht,
                inverse_transform=self.isht,
                inp_chans=inp_chans,
                out_chans=total_embed,
                conv_type=conv_type,
                kernel_shape=self.kernel_shape,
                basis_type=self.filter_basis_type,
                sht_grid=self.sht_grid_type,
                mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                normalization=self.normalization_layer,
                use_mlp=self.use_mlp,
                layer_scale=self.layer_scale,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic)

        # --- decode ---
        x_a = x[..., : g * self.atmo_embed_dim]
        atmo_dec = DiscoDecoder(
            inp_shape=(self.h, self.w), out_shape=self.img_shape,
            inp_chans=self.atmo_embed_dim,
            out_chans=self.n_atmo_channels,
            grid_in=self.sht_grid_type, grid_out=self.model_grid_type,
            kernel_shape=self.kernel_shape,
            groups=math.gcd(self.n_atmo_channels, self.atmo_embed_dim),
            use_mlp=self.encoder_mlp, mlp_ratio=self.mlp_ratio,
            activation=self.activation_function,
            upsample_sht=self.upsample_sht,
            basis_type=self.filter_basis_type,
            dtype=self.dtype, name="atmo_decoder",
        )
        atmo_out = unfold_groups(
            atmo_dec(
                fold_groups(x_a, self.atmo_embed_dim),
                deterministic=deterministic,
            ),
            self.n_atmo_channels,
        )
        surf_out = None
        if self.n_surf_channels > 0:
            surf_out = DiscoDecoder(
                inp_shape=(self.h, self.w), out_shape=self.img_shape,
                inp_chans=self.surf_embed_dim,
                out_chans=self.n_surf_channels,
                grid_in=self.sht_grid_type,
                grid_out=self.model_grid_type,
                kernel_shape=self.kernel_shape,
                groups=math.gcd(
                    self.n_surf_channels, self.surf_embed_dim
                ),
                use_mlp=self.encoder_mlp, mlp_ratio=self.mlp_ratio,
                activation=self.activation_function,
                upsample_sht=self.upsample_sht,
                basis_type=self.filter_basis_type,
                dtype=self.dtype, name="surf_decoder",
            )(x[..., -self.surf_embed_dim:], deterministic=deterministic)
        return atmo_out, surf_out
