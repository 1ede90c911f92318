"""Weight-stationary Pallas kernel for the dhconv spectral filter.

The dhconv filter (reference computation:
fme/ace/models/modulus/s2convolutions.py:168-189 `_contract` with
operator_type="dhconv") is, per spherical-harmonic degree l, a complex
matmul ``out[l] = x[l] @ w[l]`` with x[l]: [M, I] and w[l]: [I, O].
Expressed as real einsums (the XLA path in models/sfno.py) it takes four
einsums — each weight tensor is streamed twice, and XLA materializes the
four partial products plus separate add/sub passes. At flagship scale
(L=91, M=181, I=O=512) the XLA schedule measures ~1.03 ms on a v5e even
with loop-invariant weight casts hoisted.

This kernel makes the weights stationary per grid step: for each l the
two bf16 weight tiles are DMA'd into VMEM ONCE and both the real and
imaginary outputs are computed from them in the same step — four MXU
dots whose complex combination never leaves VMEM. Measured 0.74 ms at
flagship scale (exact match vs the einsum path at identical operand
dtypes; see tests/test_pallas_filter.py). Variants measured and
rejected on the v5e (see git history / STATUS.md): multi-l blocks
(VMEM-limited, slower pipelining), packed [I, 2O] weights (in-kernel
concat copy), stacked [2M, I] operands (extra HBM copy for the stack),
and a manual double-buffered DMA pipeline (no better than Mosaic's
automatic pipelining — the residual ~4 us/step cost is intrinsic at
this block size).

Outputs are bf16 by default — exactly the reference's AMP semantics,
where `_contract` sits inside the ambient autocast region and hands a
bf16 tensor to the f32-pinned inverse SHT (s2convolutions.py:177 vs
:168,189). The f32-activation (non-AMP) path in models/sfno.py never
routes here, so torch parity oracles are unaffected.

The custom VJP runs the backward as bf16 einsums with f32 accumulation
(the same AMP contract as the forward); the four backward contractions
are activation-streaming, where XLA's schedule is already good.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref, *,
            widen=False):
    a_r = xr_ref[0, 0].astype(jnp.bfloat16)
    a_i = xi_ref[0, 0].astype(jnp.bfloat16)
    b_r = wr_ref[0]
    b_i = wi_ref[0]
    if widen:
        # interpreter backend (CPU tests) lacks bf16 dot thunks; widen
        # AFTER the bf16 rounding so operand values match the TPU path
        a_r, a_i = a_r.astype(jnp.float32), a_i.astype(jnp.float32)
        b_r, b_i = b_r.astype(jnp.float32), b_i.astype(jnp.float32)
    rr = jnp.dot(a_r, b_r, preferred_element_type=jnp.float32)
    ii = jnp.dot(a_i, b_i, preferred_element_type=jnp.float32)
    ri = jnp.dot(a_r, b_i, preferred_element_type=jnp.float32)
    ir = jnp.dot(a_i, b_r, preferred_element_type=jnp.float32)
    out_dtype = or_ref.dtype
    or_ref[0, 0] = (rr - ii).astype(out_dtype)
    oi_ref[0, 0] = (ri + ir).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret")
)
def _forward(xr, xi, wr, wi, out_dtype, interpret):
    """xr/xi: [B, L, M, I] float; wr/wi: [L, I, O] bf16 ->
    (outr, outi) [B, L, M, O] out_dtype."""
    b, l, m, i = xr.shape
    o = wr.shape[-1]
    x_spec = pl.BlockSpec((1, 1, m, i), lambda bb, ll: (bb, ll, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, i, o), lambda bb, ll: (ll, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, m, o), lambda bb, ll: (bb, ll, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, widen=interpret),
        grid=(b, l),
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, m, o), out_dtype),
            jax.ShapeDtypeStruct((b, l, m, o), out_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * l * m * i * o,
            bytes_accessed=(
                2 * b * l * m * i * xr.dtype.itemsize
                + 2 * l * i * o * 2
                + 2 * b * l * m * o * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, wr, wi)


def _ein(eq, a, b):
    """bf16 operands, f32 accumulation (the AMP contract)."""
    return jnp.einsum(
        eq, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _dhconv_filter(xr, xi, wr, wi, out_dtype, interpret):
    lead = xr.shape[:-3]
    l, m, i = xr.shape[-3:]
    xr4 = xr.reshape((-1, l, m, i))
    xi4 = xi.reshape((-1, l, m, i))
    outr, outi = _forward(
        xr4, xi4, wr.astype(jnp.bfloat16), wi.astype(jnp.bfloat16),
        jnp.dtype(out_dtype), interpret,
    )
    o = outr.shape[-1]
    return outr.reshape(lead + (l, m, o)), outi.reshape(lead + (l, m, o))


def _fwd(xr, xi, wr, wi, out_dtype, interpret):
    out = _dhconv_filter(xr, xi, wr, wi, out_dtype, interpret)
    return out, (xr, xi, wr, wi)


def _bwd(out_dtype, interpret, res, g):
    xr, xi, wr, wi = res
    gr, gi = g
    # out_r = xr wr - xi wi ; out_i = xr wi + xi wr  (per l)
    dxr = (_ein("...lmo,lio->...lmi", gr, wr)
           + _ein("...lmo,lio->...lmi", gi, wi)).astype(xr.dtype)
    dxi = (_ein("...lmo,lio->...lmi", gi, wr)
           - _ein("...lmo,lio->...lmi", gr, wi)).astype(xi.dtype)
    dwr = (_ein("...lmi,...lmo->lio", xr, gr)
           + _ein("...lmi,...lmo->lio", xi, gi)).astype(wr.dtype)
    dwi = (_ein("...lmi,...lmo->lio", xr, gi)
           - _ein("...lmi,...lmo->lio", xi, gr)).astype(wi.dtype)
    return dxr, dxi, dwr, dwi


_dhconv_filter.defvjp(_fwd, _bwd)


def dhconv_filter(xr, xi, wr, wi, out_dtype=jnp.bfloat16,
                  interpret=False):
    """Complex dhconv filter, weight-stationary on TPU.

    Args:
      xr, xi: real/imag spectral activations ``[..., L, M, I]`` (any
        float dtype; cast to bf16 inside the kernel).
      wr, wi: real/imag filter weights ``[L, I, O]`` (cast to bf16).
      out_dtype: output dtype (default bf16 — AMP semantics).
      interpret: run in the Pallas interpreter (CPU tests).

    Returns:
      (outr, outi) with shape ``[..., L, M, O]``.
    """
    return _dhconv_filter(xr, xi, wr, wi, out_dtype, interpret)


def pallas_filter_mode() -> str:
    """Kernel gate: "tpu" (compiled), "interpret" (forced, for CPU
    tests), or "off".

    ``ACE_TPU_PALLAS_FILTER``: "0" disables, "interpret" forces the
    interpreter path on any backend, unset/1 auto-selects the compiled
    kernel on TPU and the einsum path elsewhere.
    """
    env = os.environ.get("ACE_TPU_PALLAS_FILTER", "1")
    if env == "0":
        return "off"
    if env == "interpret":
        return "interpret"
    try:
        return "tpu" if jax.default_backend() == "tpu" else "off"
    except Exception:
        return "off"


def shapes_supported(m: int, i: int, o: int) -> bool:
    """The kernel pays off for MXU-sized operands; small test models
    fall back to the einsum path."""
    return i % 128 == 0 and o % 128 == 0 and m >= 8
