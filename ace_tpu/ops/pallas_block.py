"""Fused SFNO block tail: inner-skip dense + GELU + conditional layer
norm + MLP + outer skip in ONE row-tiled Pallas kernel.

Reference computation: fme/ace/models/conditional_sfno/sfnonet.py:388
block forward after the spectral filter —

    t   = x_filter + Dense_skip(residual)          # inner_skip "linear"
    t   = gelu(t)
    y   = CLN(t, noise)                            # per-pixel LN over C,
                                                   # noise scale/bias
    out = Dense2(gelu(Dense1(y))) + residual       # MLP + outer skip

Status: EXPERIMENTAL, default OFF — measured SLOWER than XLA on v5e.
At flagship scale (64800 rows, C=512, hidden=1024, bf16) the fused
kernel runs 2.42-2.55 ms against 2.10 ms for XLA's unfused schedule
(r_tile 256/512/1024 all within noise; ablations put the MLP matmuls at
1.63-1.65 ms in-kernel vs 1.57 ms under XLA, gelu ~0.14 ms, LN
~0.13 ms). The premise — that the tail is HBM-bound and fusing away the
intermediate round trips would pay — is FALSE at this size: the tail is
MXU-efficiency-bound (~44% of bf16 peak for the K=512/1024 dependent
matmul chain, which XLA already achieves), so removing HBM traffic buys
nothing and Mosaic's matmul schedule is slightly worse than XLA's.
Kept behind ACE_TPU_PALLAS_BLOCK=1 (or =interpret for CPU tests) as a
validated reference kernel; the measurement is the documentation.

Numerics match the unfused module path: bf16 activations with f32 LN
statistics (the ChannelLayerNorm mixed path, conditional_sfno.py:45-56)
and tanh-GELU for bf16 (layers.exact_gelu). The custom VJP recomputes
the unfused reference in the backward — identical cost to the per-block
rematerialization the train step already does.
"""

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _tail_math(a, r, nz, skip_k, skip_b, ln_w, ln_b, ws, wb,
               fc1_k, fc1_b, fc2_k, fc2_b, widen):
    """The block-tail computation on [R, C] tiles; shared between the
    Pallas kernel body and the unfused VJP reference so both paths run
    the SAME ops (bf16 activations, f32 LN stats)."""
    cdt = jnp.float32 if widen else jnp.bfloat16

    def mm(x, w):
        return jnp.dot(
            x.astype(cdt), w.astype(cdt),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t = a + (mm(r, skip_k) + skip_b)
    t = nn.gelu(t, approximate=True)
    # ChannelLayerNorm mixed path: f32 stats, no f32 materialization
    mean = jnp.mean(t, axis=-1, keepdims=True, dtype=jnp.float32)
    xc = t - mean.astype(t.dtype)
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True,
                   dtype=jnp.float32)
    y = xc * jax.lax.rsqrt(var + _EPS).astype(t.dtype)
    y = y * ln_w + ln_b
    scale = 1.0 + mm(nz, ws)
    bias2 = mm(nz, wb)
    y = y * scale + bias2
    h = nn.gelu(mm(y, fc1_k) + fc1_b, approximate=True)
    o = mm(h, fc2_k) + fc2_b
    return o + r


def _kernel(xf_ref, r_ref, nz_ref, skip_k, skip_b, ln_w, ln_b, ws, wb,
            fc1_k, fc1_b, fc2_k, fc2_b, out_ref, *, widen):
    out_ref[...] = _tail_math(
        xf_ref[...], r_ref[...], nz_ref[...],
        skip_k[...], skip_b[...], ln_w[...], ln_b[...],
        ws[...], wb[...], fc1_k[...], fc1_b[...],
        fc2_k[...], fc2_b[...], widen,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(xf, resid, noise, weights, interpret):
    (skip_k, skip_b, ln_w, ln_b, ws, wb,
     fc1_k, fc1_b, fc2_k, fc2_b) = weights
    lead = xf.shape[:-1]
    c = xf.shape[-1]
    hd = fc1_k.shape[-1]
    n = 1
    for d in lead:
        n *= d
    nc = noise.shape[-1]
    # pad noise channels to a full lane width; padded w rows are zero so
    # the products are unchanged
    nc_pad = max(128, ((nc + 127) // 128) * 128)
    r_tile = 1024
    n_pad = ((n + r_tile - 1) // r_tile) * r_tile

    def prep(x, width):
        x = x.reshape(n, x.shape[-1]).astype(jnp.bfloat16)
        return jnp.pad(
            x, ((0, n_pad - n), (0, width - x.shape[-1]))
        )

    xf2 = prep(xf, c)
    r2 = prep(resid, c)
    nz2 = prep(noise, nc_pad)
    ws_p = jnp.pad(ws.astype(jnp.bfloat16), ((0, nc_pad - nc), (0, 0)))
    wb_p = jnp.pad(wb.astype(jnp.bfloat16), ((0, nc_pad - nc), (0, 0)))

    def tile(width):
        return pl.BlockSpec((r_tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, _nd=nd: (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    bf = jnp.bfloat16
    consts = [
        skip_k.astype(bf), skip_b.astype(bf).reshape(1, c),
        ln_w.astype(bf).reshape(1, c), ln_b.astype(bf).reshape(1, c),
        ws_p, wb_p,
        fc1_k.astype(bf), fc1_b.astype(bf).reshape(1, hd),
        fc2_k.astype(bf), fc2_b.astype(bf).reshape(1, c),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, widen=interpret),
        grid=(n_pad // r_tile,),
        in_specs=[tile(c), tile(c), tile(nc_pad)]
        + [const(w.shape) for w in consts],
        out_specs=tile(c),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c * (c + 2 * nc_pad + 4 * hd),
            bytes_accessed=3 * n_pad * c * 2 + n_pad * nc_pad * 2,
            transcendentals=2 * n_pad * (c + hd),
        ),
        interpret=interpret,
    )(xf2, r2, nz2, *consts)
    return out[:n].reshape(lead + (c,))


def _reference_tail(xf, resid, noise, weights, widen=False):
    """Unfused jnp reference (same math as the module path); used for
    the backward pass and as the CPU fallback check in tests. ``widen``
    runs the contractions with f32 operands (CPU backends without bf16
    dot support); on TPU the bf16 dots match the unfused module path."""
    (skip_k, skip_b, ln_w, ln_b, ws, wb,
     fc1_k, fc1_b, fc2_k, fc2_b) = weights
    bf = jnp.bfloat16
    return _tail_math(
        xf.astype(bf), resid.astype(bf), noise.astype(bf),
        skip_k.astype(bf), skip_b.astype(bf),
        ln_w.astype(bf), ln_b.astype(bf),
        ws.astype(bf), wb.astype(bf),
        fc1_k.astype(bf), fc1_b.astype(bf),
        fc2_k.astype(bf), fc2_b.astype(bf),
        widen=widen,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_tail(xf, resid, noise, weights, interpret):
    return _forward(xf, resid, noise, weights, interpret)


def _tail_fwd(xf, resid, noise, weights, interpret):
    return _forward(xf, resid, noise, weights, interpret), (
        xf, resid, noise, weights,
    )


def _tail_bwd(interpret, res, g):
    xf, resid, noise, weights = res
    # backward = VJP of the unfused reference: recomputing the forward
    # here costs the same as the per-block remat the train step already
    # uses, and XLA's backward schedule for these activation-streaming
    # contractions is near its floor
    _, vjp = jax.vjp(
        lambda a, b, c, d: _reference_tail(a, b, c, d, widen=interpret),
        xf, resid, noise, weights,
    )
    dxf, dresid, dnoise, dweights = vjp(g.astype(jnp.bfloat16))
    return dxf, dresid, dnoise, dweights


_fused_tail.defvjp(_tail_fwd, _tail_bwd)


def pallas_block_mode() -> str:
    """Gate for the fused block tail — DEFAULT OFF (measured slower
    than XLA's unfused schedule on v5e; see module docstring).
    ACE_TPU_PALLAS_BLOCK: "1" enables the compiled kernel on TPU,
    "interpret" forces the interpreter (CPU tests), unset/0 off."""
    import os

    env = os.environ.get("ACE_TPU_PALLAS_BLOCK", "0")
    if env == "interpret":
        return "interpret"
    if env != "1":
        return "off"
    try:
        return "tpu" if jax.default_backend() == "tpu" else "off"
    except Exception:
        return "off"


def fused_block_tail(xf, resid, noise, weights, interpret=False):
    """Fused inner-skip + GELU + conditional LN + MLP + outer skip.

    Args:
      xf: spectral-filter output ``[..., C]`` (bf16).
      resid: the block residual (normalized input) ``[..., C]``.
      noise: conditioning channels ``[..., Nc]``.
      weights: tuple ``(skip_kernel, skip_bias, ln_weight, ln_bias,
        w_scale, w_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias)``.
      interpret: run the Pallas interpreter (CPU tests).
    """
    return _fused_tail(xf, resid, noise, weights, interpret)


def tail_shapes_supported(c: int, hidden: int) -> bool:
    return c % 128 == 0 and hidden % 128 == 0
