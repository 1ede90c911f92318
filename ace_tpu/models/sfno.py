"""Spherical Fourier Neural Operator, TPU-native (flax.linen, channels-last).

Re-design of the reference SFNO (fme/ace/models/modulus/sfnonet.py:255,
s2convolutions.py:47) for JAX/XLA on TPU:

- data layout is [batch, lat, lon, channel] so every pointwise layer is a
  lane-dim contraction on the MXU and no NCHW<->NHWC transposes exist;
- SHT/iSHT are matmul-based (ace_tpu/ops/sht.py) and always float32;
- the complex spectral filter is expressed as real einsums batched over l,
  which XLA maps to MXU matmuls (out[..,l,m,o] = sum_i x[..,l,m,i] w[i,o,l]);
- blocks run in a configurable compute dtype (bfloat16 by default via the
  Step layer) with the transforms pinned to float32, mirroring the
  reference's autocast behavior.

The architecture semantics (block wiring, skips, norms, scale_factor grids,
operator types "diagonal"/"dhconv") match the reference so that converted
checkpoints are weight-compatible.
"""

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.layers import (
    MLP,
    DropPath,
    InstanceNorm,
    LayerNorm2d,
    exact_gelu,
    trunc_normal_init,
)


_ACTIVATIONS = {
    # exact (erf) gelu to match torch.nn.GELU's default; bf16 activations
    # take the 1-ulp-equivalent tanh fast path (see layers.exact_gelu)
    "gelu": exact_gelu,
    "relu": nn.relu,
    "silu": nn.silu,
}



def _sht_input(transform, x):
    """SHT operand cast: distributed transforms cast to f32 internally
    AFTER their first (grid-space) all-to-all, so passing the native
    activation dtype halves that transfer's bytes; single-device
    transforms take f32 up front (identical values either way — the
    bf16->f32 cast commutes exactly with a transpose)."""
    if getattr(transform, "casts_input", False):
        return x
    return x.astype(jnp.float32)


class SpectralConvS2(nn.Module):
    """Driscoll-Healy spectral convolution on S2 (reference:
    fme/ace/models/modulus/s2convolutions.py:47 SpectralConvS2).

    forward_transform/inverse_transform are channels-last SHT objects.
    ``operator_type``: "diagonal" (w[i,o,l,m]) or "dhconv" (w[i,o,l]).
    Returns (filtered, residual) where residual is the (possibly re-gridded)
    input, as in the reference.
    """

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    operator_type: str = "diagonal"
    separable: bool = False
    use_bias: bool = False
    # bottleneck width of the spectral filter: SHT + per-mode weight act
    # on round(in_channels * spectral_ratio) channels via 1x1 projections
    # (reference: conditional_sfno/s2convolutions.py:211 spectral_ratio)
    spectral_ratio: float = 1.0
    # low-rank complex per-mode adapters on the dhconv weight, zero-init
    # B so the adapter starts inert (reference: s2convolutions.py LoRA)
    lora_rank: int = 0
    # CP tensor factorization of the spectral weight (the reference uses
    # tensorly-torch FactorizedTensor; rank is the parameter fraction):
    # weight[i,o,l] = sum_r a[i,r] b[o,r] c[l,r], complex factors
    factorization: str | None = None
    rank: float = 1.0
    # matmul precision of the complex filter einsums; None inherits the
    # forward transform's precision (HIGH = TF32-equivalent by default —
    # see ops/sht.py precision note)
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        modes_lat = self.inverse_transform.lmax
        modes_lon = self.inverse_transform.mmax
        if not 0.0 < self.spectral_ratio <= 1.0:
            raise ValueError("spectral_ratio must be in (0, 1]")
        spectral_channels = (
            round(self.in_channels * self.spectral_ratio)
            if self.spectral_ratio < 1.0
            else self.in_channels
        )
        use_proj = self.spectral_ratio < 1.0
        if use_proj and self.separable:
            raise ValueError("spectral_ratio requires non-separable filter")
        # the residual passthrough keeps the full channel width; only the
        # filter path is bottlenecked (reference: s2convolutions.py)
        full_x = x
        if use_proj:
            x = nn.Dense(
                spectral_channels, use_bias=False,
                kernel_init=trunc_normal_init(), name="pre_proj",
            )(x)
        scale_residual = (
            self.forward_transform.nlat != self.inverse_transform.nlat
            or self.forward_transform.nlon != self.inverse_transform.nlon
            or self.forward_transform.grid != self.inverse_transform.grid
        )

        # real-pair hot path: avoid complex64 at the SHT boundary so XLA
        # stays on pure f32 matmul fusions (neutral-to-slightly-positive
        # end-to-end; falls back to the complex API for transforms
        # without it, e.g. the distributed/FFT variants)
        use_pair = hasattr(self.forward_transform, "forward_pair") and hasattr(
            self.inverse_transform, "inverse_pair"
        )

        residual = full_x
        if use_pair:
            xr_full, xi_full = self.forward_transform.forward_pair(
                _sht_input(self.forward_transform, x)
            )
        else:
            coeffs = self.forward_transform(
                _sht_input(self.forward_transform, x)
            )
        if scale_residual:
            if use_pair:
                rr, ri = (
                    self.forward_transform.forward_pair(
                        _sht_input(self.forward_transform, full_x)
                    )
                    if use_proj
                    else (xr_full, xi_full)
                )
                residual = self.inverse_transform.inverse_pair(
                    rr, ri
                ).astype(in_dtype)
            else:
                residual = self.inverse_transform(
                    self.forward_transform(
                        _sht_input(self.forward_transform, full_x)
                    )
                    if use_proj else coeffs
                ).astype(in_dtype)

        c_in = spectral_channels if use_proj else self.in_channels
        c_out = spectral_channels if use_proj else self.out_channels
        if self.separable:
            weight_shape = [c_in]
        else:
            weight_shape = [c_in, c_out]
        if self.operator_type == "diagonal":
            weight_shape += [modes_lat, modes_lon]
        elif self.operator_type == "dhconv":
            weight_shape += [modes_lat]
        else:
            raise ValueError(f"Unsupported operator type {self.operator_type}")

        scale = 1.0 / (c_in * c_out)
        if self.factorization is not None:
            if self.factorization.lower() != "cp":
                raise NotImplementedError(
                    f"factorization {self.factorization!r}; only 'cp' is "
                    "implemented"
                )
            if self.separable:
                raise ValueError("factorization requires non-separable")
            dims = weight_shape  # [i, o, l] or [i, o, l, m]
            full = int(np.prod(dims))
            cp_rank = max(1, round(self.rank * full / sum(dims)))
            factors = [
                self.param(
                    f"cp_factor_{ax}",
                    nn.initializers.normal(
                        stddev=scale ** (1.0 / len(dims))
                    ),
                    (d, cp_rank, 2),
                    jnp.float32,
                )
                for ax, d in enumerate(dims)
            ]
            # contract complex CP factors into the dense weight once per
            # forward; XLA folds this into the surrounding einsums
            def cp_to_dense(parts):
                letters = "iolm"[: len(dims)]
                eq = ",".join(f"{c}r" for c in letters) + "->" + letters
                return jnp.einsum(eq, *parts)

            reals = [f[..., 0] for f in factors]
            imags = [f[..., 1] for f in factors]
            wr = jnp.zeros(dims, jnp.float32)
            wi = jnp.zeros(dims, jnp.float32)
            # expand product of complex factors: sum over subsets with an
            # even/odd number of imaginary terms
            import itertools

            for mask in itertools.product([0, 1], repeat=len(dims)):
                parts = [
                    imags[ax] if flag else reals[ax]
                    for ax, flag in enumerate(mask)
                ]
                n_imag = sum(mask)
                term = cp_to_dense(parts)
                sign = (-1) ** (n_imag // 2)
                if n_imag % 2 == 0:
                    wr = wr + sign * term
                else:
                    wi = wi + sign * term
        else:
            w = self.param(
                "weight",
                nn.initializers.normal(stddev=scale),
                (*weight_shape, 2),
                jnp.float32,
            )
            wr, wi = w[..., 0], w[..., 1]
        # distributed (spatially-parallel) transforms keep the spectral
        # tensor padded to mesh multiples and sharded over (h, w): skip
        # the mode slice (padded rows are exactly zero) and zero-pad the
        # filter weights to match instead (slicing would re-shard)
        is_dist = hasattr(self.forward_transform, "l_padded")
        if is_dist:
            xr, xi = xr_full, xi_full
            l_extra = self.forward_transform.l_padded - modes_lat
            m_extra = self.forward_transform.m_padded - modes_lon
        elif use_pair:
            xr = xr_full[..., : modes_lat, : modes_lon, :]
            xi = xi_full[..., : modes_lat, : modes_lon, :]
        else:
            xr = jnp.real(coeffs)[..., : modes_lat, : modes_lon, :]
            xi = jnp.imag(coeffs)[..., : modes_lat, : modes_lon, :]

        if is_dist and (l_extra or m_extra):
            # weight axes are (..., l) for dhconv, (..., l, m) for
            # diagonal — logical shapes stay checkpoint-stable; only the
            # in-graph operand is padded
            if self.operator_type == "dhconv":
                wpad = [(0, 0)] * (wr.ndim - 1) + [(0, l_extra)]
            else:
                wpad = [(0, 0)] * (wr.ndim - 2) + [
                    (0, l_extra), (0, m_extra)
                ]
            wr = jnp.pad(wr, wpad)
            wi = jnp.pad(wi, wpad)
        if self.operator_type == "dhconv":
            eq = "...lmi,iol->...lmo" if not self.separable else "...lmi,il->...lmi"
        else:
            eq = "...lmi,iolm->...lmo" if not self.separable else "...lmi,ilm->...lmi"
        # filter precision follows the AMP semantics of the reference:
        # its SHT/ISHT are pinned f32 (autocast disabled,
        # s2convolutions.py:168,189) but the _contract einsum runs in
        # the ambient autocast region (:177) — bf16 operands with f32
        # accumulation under AMP (optimization.py:122 autocast bf16),
        # full f32 otherwise. Here: bf16 activations (compute_dtype
        # bfloat16 = the AMP-mode analogue) contract in bf16 with f32
        # accumulation (measured 2.16 -> 1.52 ms/block at flagship
        # scale on v5e); f32 activations keep HIGH (3-pass bf16,
        # TF32-equivalent — the reference's non-AMP Docker default).
        # An explicit ``precision`` overrides both.
        amp_bf16 = (
            self.precision is None and in_dtype == jnp.bfloat16
        )
        prec = (
            self.precision
            if self.precision is not None
            else jax.lax.Precision.DEFAULT if amp_bf16
            else getattr(
                self.forward_transform, "precision",
                jax.lax.Precision.HIGH,
            )
        )

        def ein(a, b):
            if amp_bf16:
                a = a.astype(jnp.bfloat16)
                b = b.astype(jnp.bfloat16)
            return jnp.einsum(
                eq, a, b, precision=prec,
                preferred_element_type=jnp.float32,
            )
        # bf16 dhconv path: weight-stationary Pallas kernel — each l's
        # weight tiles are DMA'd to VMEM once and BOTH complex outputs
        # are computed from them (the einsum form streams each weight
        # tensor twice and materializes four partials). Measured 1.03 ->
        # 0.74 ms per flagship filter on v5e; bf16 outputs are the
        # reference's AMP semantics (_contract in the autocast region,
        # s2convolutions.py:177). See ops/pallas_filter.py.
        from ace_tpu.ops.pallas_filter import (
            dhconv_filter,
            pallas_filter_mode,
            shapes_supported,
        )

        kmode = (
            pallas_filter_mode()
            if (
                amp_bf16
                and self.operator_type == "dhconv"
                and not self.separable
                and not is_dist
                and shapes_supported(xr.shape[-2], c_in, c_out)
            )
            else "off"
        )
        if kmode != "off":
            # wr/wi are [i, o, l] -> kernel layout [l, i, o]; the
            # transpose+cast is loop-invariant in rollout scans and XLA
            # hoists it (measured: in-scan cast == pre-cast on v5e)
            w_l_r = jnp.transpose(wr, (2, 0, 1))
            w_l_i = jnp.transpose(wi, (2, 0, 1))
            outr, outi = dhconv_filter(
                xr, xi, w_l_r, w_l_i,
                interpret=(kmode == "interpret"),
            )
        else:
            # note: a 3-matmul Karatsuba complex multiply was measured
            # SLOWER here (2.56 vs 2.48 ms/block on v5e) — the filter is
            # HBM-bound, so the extra elementwise adds cost more than
            # the saved matmul flops; a single [2i, 2o] block-matmul
            # form won in isolation but lost ~7% end-to-end (concats
            # break XLA's fusion with the surrounding transforms); keep
            # 4 einsums
            outr = ein(xr, wr) - ein(xi, wi)
            outi = ein(xr, wi) + ein(xi, wr)
            if amp_bf16 and is_dist:
                # match the Pallas kernel's AMP output dtype (bf16 =
                # the reference's autocast _contract output) on the
                # distributed path the kernel cannot serve: the inverse
                # transform's first all-to-all then moves half the
                # bytes (its f32 cast happens after the transfer)
                outr = outr.astype(jnp.bfloat16)
                outi = outi.astype(jnp.bfloat16)

        if self.lora_rank > 0 and self.operator_type == "dhconv":
            r = self.lora_rank
            la = self.param(
                "lora_a", nn.initializers.normal(stddev=scale),
                (c_in, r, modes_lat, 2), jnp.float32,
            )
            lb = self.param(
                "lora_b", nn.initializers.zeros,
                (r, c_out, modes_lat, 2), jnp.float32,
            )
            if is_dist and l_extra:
                lpad = ((0, 0), (0, 0), (0, l_extra), (0, 0))
                la = jnp.pad(la, lpad)
                lb = jnp.pad(lb, lpad)
            eq_l = "...lmi,irl->...lmr"
            ein_a = functools.partial(
                jnp.einsum, eq_l, precision=prec,
                preferred_element_type=jnp.float32,
            )
            ar = ein_a(xr, la[..., 0]) - ein_a(xi, la[..., 1])
            ai = ein_a(xr, la[..., 1]) + ein_a(xi, la[..., 0])
            eq_b = "...lmr,rol->...lmo"
            ein_b = functools.partial(
                jnp.einsum, eq_b, precision=prec,
                preferred_element_type=jnp.float32,
            )
            outr = outr + ein_b(ar, lb[..., 0]) - ein_b(ai, lb[..., 1])
            outi = outi + ein_b(ar, lb[..., 1]) + ein_b(ai, lb[..., 0])

        # re-pad to the transform's full (lmax, mmax) if truncated
        lmax, mmax = self.forward_transform.lmax, self.forward_transform.mmax
        pad = [(0, 0)] * outr.ndim
        pad[-3] = (0, lmax - modes_lat)
        pad[-2] = (0, mmax - modes_lon)
        outr = jnp.pad(outr, pad)
        outi = jnp.pad(outi, pad)

        if use_pair:
            out = self.inverse_transform.inverse_pair(outr, outi)
        else:
            out = self.inverse_transform(jax.lax.complex(outr, outi))
        if use_proj:
            out = nn.Dense(
                self.out_channels, use_bias=False,
                kernel_init=trunc_normal_init(), name="post_proj",
            )(out)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
            )
            out = out + bias
        return out.astype(in_dtype), residual


class FourierNeuralOperatorBlock(nn.Module):
    """One SFNO block (reference: fme/ace/models/modulus/sfnonet.py:123)."""

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    operator_type: str = "diagonal"
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    drop_path: float = 0.0
    activation: str = "gelu"
    normalization: str = "instance_norm"  # or "layer_norm", "none"
    inner_skip: str = "linear"
    outer_skip: str = "identity"
    use_mlp: bool = True
    separable: bool = False
    factorization: str | None = None
    rank: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def _norm(self, spatial_shape, name):
        if self.normalization == "instance_norm":
            return InstanceNorm(name=name)
        elif self.normalization == "layer_norm":
            return LayerNorm2d(spatial_shape=spatial_shape, name=name)
        elif self.normalization == "none":
            return lambda x: x
        raise NotImplementedError(
            f"normalization {self.normalization} not implemented"
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation]
        in_shape = (self.forward_transform.nlat, self.forward_transform.nlon)
        out_shape = (self.inverse_transform.nlat, self.inverse_transform.nlon)

        x_norm = self._norm(in_shape, "norm0")(x)
        x, residual = SpectralConvS2(
            forward_transform=self.forward_transform,
            inverse_transform=self.inverse_transform,
            in_channels=self.embed_dim,
            out_channels=self.embed_dim,
            operator_type=self.operator_type,
            separable=self.separable,
            use_bias=True,
            factorization=self.factorization,
            rank=self.rank,
            name="filter",
        )(x_norm)

        if self.inner_skip == "linear":
            x = x + nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(),
                dtype=self.dtype,
                name="inner_skip",
            )(residual)
        elif self.inner_skip == "identity":
            x = x + residual

        x = act(x)

        x = self._norm(out_shape, "norm1")(x)

        if self.use_mlp:
            x = MLP(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                act=act,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                name="mlp",
            )(x, deterministic=deterministic)

        x = DropPath(self.drop_path)(x, deterministic=deterministic)

        if self.outer_skip == "linear":
            x = x + nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(),
                dtype=self.dtype,
                name="outer_skip",
            )(residual)
        elif self.outer_skip == "identity":
            x = x + residual
        return x


class SphericalFourierNeuralOperatorNet(nn.Module):
    """The SFNO backbone (reference: fme/ace/models/modulus/sfnonet.py:255).

    Input/output: [batch, nlat, nlon, channels] (channels-last).
    """

    img_shape: tuple[int, int]
    in_chans: int
    out_chans: int
    embed_dim: int = 256
    num_layers: int = 12
    # "sht" (spherical) or "fft" (plane 2D Fourier; reference:
    # makani/sfnonet.py:496 spectral_transform="fft" branch)
    spectral_transform: str = "sht"
    operator_type: str = "diagonal"
    scale_factor: int = 1
    residual_filter_factor: int = 1
    hard_thresholding_fraction: float = 1.0
    normalization_layer: str = "instance_norm"
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    # True/"direct": learned grid embedding; "frequency": learned spectral
    # coefficients synthesized via inverse SHT (reference:
    # fme/ace/models/makani/sfnonet.py:432); False/"none": disabled
    pos_embed: bool | str = True
    factorization: str | None = None
    rank: float = 1.0
    # "default" (1-pass bf16, fastest, ~2e-2 SHT err — measured 75 vs 49
    # steps/s on the ACE2 bench), "high" (TF32-equivalent, the default),
    # or "highest" (true fp32)
    spectral_precision: str = "high"
    # weight-shared repetition of the whole block stack (reference:
    # makani/sfnonet.py:526 _forward_features)
    repeat_layers: int = 1
    big_skip: bool = True
    separable: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    data_grid: str = "legendre-gauss"
    # >= 1: per-block activation rematerialization (see __call__)
    checkpointing: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        nlat, nlon = self.img_shape
        self.h = int(nlat // self.scale_factor)
        self.w = int(nlon // self.scale_factor)
        modes_lat = int(self.h * self.hard_thresholding_fraction)
        modes_lon = int((self.w // 2 + 1) * self.hard_thresholding_fraction)

        self._prec = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.spectral_precision]
        kw = dict(lmax=modes_lat, mmax=modes_lon, channels_last=True,
                  precision=self._prec)
        if self.spectral_transform == "fft":
            from ace_tpu.ops.fft2 import InverseRealFFT2, RealFFT2

            self.trans_down = RealFFT2(nlat, nlon, **kw)
            self.itrans_up = InverseRealFFT2(nlat, nlon, **kw)
            self.trans = RealFFT2(self.h, self.w, **kw)
            self.itrans = InverseRealFFT2(self.h, self.w, **kw)
        elif self.spectral_transform == "sht":
            # build_sht/build_isht dispatch to the explicit all-to-all
            # distributed SHT when a spatial mesh is active (reference:
            # thd swap at model_torch_distributed.py:454-465)
            from ace_tpu.ops.sht import build_isht, build_sht

            self.trans_down = build_sht(
                nlat, nlon, grid=self.data_grid, **kw
            )
            self.itrans_up = build_isht(
                nlat, nlon, grid=self.data_grid, **kw
            )
            self.trans = build_sht(
                self.h, self.w, grid="legendre-gauss", **kw
            )
            self.itrans = build_isht(
                self.h, self.w, grid="legendre-gauss", **kw
            )
        else:
            raise ValueError(
                f"unknown spectral_transform {self.spectral_transform!r}"
            )

        if self.residual_filter_factor > 1:
            from ace_tpu.ops.sht import build_isht, build_sht

            mlr = int(nlat // self.residual_filter_factor)
            mmr = int(nlon // self.residual_filter_factor // 2 + 1)
            self.residual_filter_down = build_sht(
                nlat, nlon, lmax=mlr, mmax=mmr, grid=self.data_grid,
                channels_last=True,
            )
            self.residual_filter_up = build_isht(
                nlat, nlon, lmax=mlr, mmax=mmr, grid=self.data_grid,
                channels_last=True,
            )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation_function]
        nlat, nlon = self.img_shape

        if self.big_skip:
            if self.residual_filter_factor > 1:
                residual = self.residual_filter_up(
                    self.residual_filter_down(x.astype(jnp.float32))
                ).astype(x.dtype)
            else:
                residual = x

        # encoder: 1x1 convs = Dense over channels
        h = x.astype(self.dtype)
        for i in range(self.encoder_layers):
            h = nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(),
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(h)
            h = act(h)
        h = nn.Dense(
            self.embed_dim,
            use_bias=False,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="encoder_out",
        )(h)

        pos_embed_type = (
            self.pos_embed if isinstance(self.pos_embed, str)
            else ("direct" if self.pos_embed else "none")
        )
        if pos_embed_type == "direct":
            pe = self.param(
                "pos_embed",
                trunc_normal_init(std=0.02),
                (1, nlat, nlon, self.embed_dim),
                jnp.float32,
            )
            h = h + pe.astype(h.dtype)
        elif pos_embed_type == "frequency":
            # learned lower-triangular spectral coefficients; the embedding
            # is their inverse SHT at output resolution (reference:
            # makani/sfnonet.py:432-448,557-567). m=0 imaginary parts are
            # structurally zero.
            lmax, mmax = self.itrans_up.lmax, self.itrans_up.mmax
            rc = self.param(
                "pos_embed_r", trunc_normal_init(std=0.02),
                (1, lmax, mmax, self.embed_dim), jnp.float32,
            )
            cc = self.param(
                "pos_embed_c", trunc_normal_init(std=0.02),
                (1, lmax, max(mmax - 1, 0), self.embed_dim), jnp.float32,
            )
            l_idx = jnp.arange(lmax)[:, None]
            m_idx = jnp.arange(mmax)[None, :]
            rmask = (m_idx <= l_idx)[None, :, :, None]
            cmask = (m_idx[:, : mmax - 1] + 1 <= l_idx)[None, :, :, None]
            imag = jnp.pad(
                cc * cmask, ((0, 0), (0, 0), (1, 0), (0, 0))
            )
            if hasattr(self.itrans_up, "l_padded"):
                # distributed inverse takes a (real, imag) pair
                pe = self.itrans_up(rc * rmask, imag)
            else:
                coeffs = (rc * rmask) + 1j * imag
                pe = self.itrans_up(coeffs)
            h = h + pe.astype(h.dtype)
        elif pos_embed_type != "none":
            raise ValueError(
                f"unknown pos_embed type {pos_embed_type!r}"
            )

        if self.drop_rate > 0.0:
            h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)

        dpr = np.linspace(0, self.drop_path_rate, self.num_layers)
        # checkpointing >= 1: per-block activation rematerialization
        # (reference: makani/sfnonet.py `checkpointing` levels). Param
        # paths are unchanged — a pure memory/speed trade.
        block_cls = FourierNeuralOperatorBlock
        if self.checkpointing >= 1:
            block_cls = nn.remat(
                FourierNeuralOperatorBlock, static_argnums=(2,)
            )
        # build blocks once so repeat_layers shares their weights
        # (reference: makani/sfnonet.py:526)
        blocks = []
        for i in range(self.num_layers):
            first, last = i == 0, i == self.num_layers - 1
            blocks.append(block_cls(
                forward_transform=self.trans_down if first else self.trans,
                inverse_transform=self.itrans_up if last else self.itrans,
                embed_dim=self.embed_dim,
                operator_type=self.operator_type,
                mlp_ratio=self.mlp_ratio,
                drop_rate=self.drop_rate,
                drop_path=float(dpr[i]),
                activation=self.activation_function,
                normalization=self.normalization_layer,
                inner_skip="linear",
                outer_skip="identity",
                use_mlp=self.use_mlp,
                separable=self.separable,
                factorization=self.factorization,
                rank=self.rank,
                dtype=self.dtype,
                name=f"block_{i}",
            ))
        for _ in range(self.repeat_layers):
            for blk in blocks:
                h = blk(h, deterministic)

        if self.big_skip:
            h = jnp.concatenate([h, residual.astype(h.dtype)], axis=-1)

        for i in range(self.encoder_layers):
            h = nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(),
                dtype=self.dtype,
                name=f"decoder_{i}",
            )(h)
            h = act(h)
        out = nn.Dense(
            self.out_chans,
            use_bias=False,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="decoder_out",
        )(h)
        return out.astype(jnp.float32)
