"""Fused SHT Pallas kernel: longitudinal DFT + Legendre contraction in
one pass (reference computation: ops/sht.py RealSHT forward — two einsums
with a [nlat, mmax, C] complex intermediate in HBM).

The fusion keeps the per-(k-tile, m-tile, c-tile) DFT result in VMEM and
immediately contracts it against the Legendre tensor, accumulating into
the [l, m, c] output across k grid steps — the intermediate never
round-trips through HBM. The k axis is the innermost (sequential) grid
dimension so output revisiting implements the reduction.

Status: EXPERIMENTAL, not used by default. Measured on TPU v5e at the
ACE2 problem size, the einsum path (0.76 ms) beats this kernel — Mosaic
block constraints force small l/k tiles and per-step reloads of the
Legendre block, so the HBM saved on the intermediate is repaid in
operand traffic. Kept as a validated reference kernel; RealSHT.__call__
always uses the einsum path.

A second attempt (round 3) with l-major output tiling — grid
(m_tiles, c_tiles, k_tiles), full-L output block, DFT computed once per
(m, c) so there is no per-l recompute — runs into the same wall, and
the arithmetic shows it is structural on this part: Mosaic requires the
last two block dims to be (8-mult, 128-mult-or-full). With channels on
the lane dim, c_tile >= 128 forces the [L, m_tile, c_tile] accumulator
to cap m_tile at ~40 for 16 MB VMEM, so the input x re-streams
m_tiles >= 5 times (>= 660 MB — more than the whole einsum path
moves). Flipping the layout so m rides the lanes caps c_tile at <= 32,
and then the Legendre tables re-stream c_tiles >= 16 times
(>= 448 MB). Every feasible tiling re-streams one operand by more than
the ~500 MB of intermediate traffic the fusion saves; the fused kernel
cannot beat the einsum pair on a 16 MB-VMEM part at this problem size.
A chip with >= 64 MB VMEM changes the arithmetic
(m_tile = 192 full + c_tile = 128 fits), so the kernel is kept for
future hardware.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, dftr_ref, dfti_ref, leg_ref, outr_ref, outi_ref,
            *, k_tile):
    # grid = (l_tiles, c_tiles, k_tiles); k INNERMOST so the revisited
    # output block's grid steps are consecutive — the accumulation
    # contract Pallas TPU guarantees. (A scratch-cached variant with l
    # innermost produced wrong results: non-consecutive output revisits
    # do not preserve the accumulator.) Mosaic's batched dot_general
    # wants the batch (m) dimension leading in BOTH operands.
    k = pl.program_id(2)

    x = x_ref[...]  # [kT, J, cT]
    xm_r = jax.lax.dot_general(
        x, dftr_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(2, 0, 1)  # [kT, cT, M] -> [M, kT, cT]
    xm_i = jax.lax.dot_general(
        x, dfti_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(2, 0, 1)

    # leg block is [lT, K, M]; slice the current k tile on the sublane
    # dim (8-aligned), then rotate m to the front for the batched dot
    leg = leg_ref[:, pl.dslice(k * k_tile, k_tile), :]  # [lT, kT, M]
    leg = leg.transpose(2, 0, 1)  # [M, lT, kT]
    dims = (((2,), (1,)), ((0,), (0,)))  # contract k, batch m
    acc_r = jax.lax.dot_general(
        leg, xm_r, dims, preferred_element_type=jnp.float32
    ).transpose(1, 0, 2)  # [M, lT, cT] -> [lT, M, cT]
    acc_i = jax.lax.dot_general(
        leg, xm_i, dims, preferred_element_type=jnp.float32
    ).transpose(1, 0, 2)

    @pl.when(k == 0)
    def _init():
        outr_ref[...] = acc_r
        outi_ref[...] = acc_i

    @pl.when(k > 0)
    def _acc():
        outr_ref[...] += acc_r
        outi_ref[...] += acc_i


@functools.partial(
    jax.jit, static_argnames=("l_tile", "c_tile", "k_tile", "interpret")
)
def fused_sht(x, dft_r, dft_i, leg, *, l_tile=8, c_tile=128,
              k_tile=8, interpret=False):
    """x [B, K, J, C] f32; dft [J, M]; leg [L, K, M] (note layout) ->
    (out_r, out_i) [B, L, M, C].

    M is kept as one full block (Mosaic wants the last block dim to be a
    multiple of 128 or the full array dim — callers pad M to a multiple
    of 8, e.g. 181 -> 192, only ~6% waste). Requires K % k_tile ==
    L % l_tile == C % c_tile == 0 (callers pad).
    """
    b, k_dim, j_dim, c_dim = x.shape
    m_dim = dft_r.shape[1]
    l_dim = leg.shape[0]
    assert k_dim % k_tile == 0 and l_dim % l_tile == 0
    assert c_dim % c_tile == 0 and m_dim % 8 == 0
    assert k_tile % 8 == 0 and l_tile % 8 == 0, (
        "Mosaic sublane constraint: k_tile and l_tile must be 8-multiples"
    )
    grid = (l_dim // l_tile, c_dim // c_tile, k_dim // k_tile)

    def run_one(x1):
        return pl.pallas_call(
            functools.partial(_kernel, k_tile=k_tile),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (k_tile, j_dim, c_tile),
                    lambda l, c, k: (k, 0, c),
                ),
                pl.BlockSpec((j_dim, m_dim), lambda l, c, k: (0, 0)),
                pl.BlockSpec((j_dim, m_dim), lambda l, c, k: (0, 0)),
                pl.BlockSpec(
                    (l_tile, k_dim, m_dim),
                    lambda l, c, k: (l, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (l_tile, m_dim, c_tile),
                    lambda l, c, k: (l, 0, c),
                ),
                pl.BlockSpec(
                    (l_tile, m_dim, c_tile),
                    lambda l, c, k: (l, 0, c),
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((l_dim, m_dim, c_dim), jnp.float32),
                jax.ShapeDtypeStruct((l_dim, m_dim, c_dim), jnp.float32),
            ],
            interpret=interpret,
        )(x1, dft_r, dft_i, leg)

    out_r, out_i = jax.vmap(run_one)(x)
    return out_r, out_i
