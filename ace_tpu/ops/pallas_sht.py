"""Fused SHT Pallas kernel: longitudinal DFT + Legendre contraction in
one pass (reference computation: ops/sht.py RealSHT forward — two einsums
with a [nlat, mmax, C] complex intermediate in HBM).

The fusion keeps the per-(k-tile, m-tile, c-tile) DFT result in VMEM and
immediately contracts it against the Legendre tensor, accumulating into
the [l, m, c] output across k grid steps — the intermediate never
round-trips through HBM. The k axis is the innermost (sequential) grid
dimension so output revisiting implements the reduction.

Used opportunistically by RealSHT on TPU (fallback: the einsum path,
which XLA compiles well everywhere and is the reference semantics).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, dftr_ref, dfti_ref, leg_ref, outr_ref, outi_ref,
            xm_r_ref, xm_i_ref):
    # grid = (c_tiles, k_tiles, l_tiles); l innermost so the DFT result
    # for the current (c, k) tile is computed once into VMEM scratch and
    # reused by every l tile
    k = pl.program_id(1)
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _dft():
        x = x_ref[...]  # [kT, J, cT]
        xm_r_ref[...] = jax.lax.dot_general(
            x, dftr_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).transpose(0, 2, 1)  # [kT, M, cT]
        xm_i_ref[...] = jax.lax.dot_general(
            x, dfti_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).transpose(0, 2, 1)

    leg = leg_ref[...]  # [lT, kT, M]
    acc_r = jnp.einsum(
        "lkm,kmc->lmc", leg, xm_r_ref[...],
        preferred_element_type=jnp.float32,
    )
    acc_i = jnp.einsum(
        "lkm,kmc->lmc", leg, xm_i_ref[...],
        preferred_element_type=jnp.float32,
    )

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
def fused_sht(x, dft_r, dft_i, leg, *, l_tile=12, c_tile=128,
              k_tile=16, interpret=False):
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
    assert k_tile % 8 == 0, "Mosaic: leg block's sublane dim is k_tile"
    grid = (c_dim // c_tile, k_dim // k_tile, l_dim // l_tile)

    def run_one(x1):
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (k_tile, j_dim, c_tile),
                    lambda c, k, l: (k, 0, c),
                ),
                pl.BlockSpec((j_dim, m_dim), lambda c, k, l: (0, 0)),
                pl.BlockSpec((j_dim, m_dim), lambda c, k, l: (0, 0)),
                pl.BlockSpec(
                    (l_tile, k_tile, m_dim),
                    lambda c, k, l: (l, k, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (l_tile, m_dim, c_tile),
                    lambda c, k, l: (l, 0, c),
                ),
                pl.BlockSpec(
                    (l_tile, m_dim, c_tile),
                    lambda c, k, l: (l, 0, c),
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((l_dim, m_dim, c_dim), jnp.float32),
                jax.ShapeDtypeStruct((l_dim, m_dim, c_dim), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((k_tile, m_dim, c_tile), jnp.float32),
                pltpu.VMEM((k_tile, m_dim, c_tile), jnp.float32),
            ],
            interpret=interpret,
        )(x1, dft_r, dft_i, leg)

    out_r, out_i = jax.vmap(run_one)(x)
    return out_r, out_i
