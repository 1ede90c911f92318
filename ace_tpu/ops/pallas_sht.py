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


def _kernel(x_ref, dftr_ref, dfti_ref, leg_ref, outr_ref, outi_ref,
            *, n_k_tiles):
    k = pl.program_id(2)
    x = x_ref[...]  # [kT, J, cT]
    dr = dftr_ref[...]  # [J, M]
    di = dfti_ref[...]
    leg = leg_ref[...]  # [lT, kT, M]
    # DFT stage, in VMEM: [kT, M, cT]
    xm_r = jax.lax.dot_general(
        x, dr, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(0, 2, 1)
    xm_i = jax.lax.dot_general(
        x, di, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(0, 2, 1)
    # Legendre stage: [lT, kT, M] x [kT, M, cT] -> [lT, M, cT]
    acc_r = jnp.einsum(
        "lkm,kmc->lmc", leg, xm_r, preferred_element_type=jnp.float32
    )
    acc_i = jnp.einsum(
        "lkm,kmc->lmc", leg, xm_i, preferred_element_type=jnp.float32
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
def fused_sht(x, dft_r, dft_i, leg, *, l_tile=36, c_tile=64,
              k_tile=36, interpret=False):
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
    grid = (l_dim // l_tile, c_dim // c_tile, k_dim // k_tile)

    def run_one(x1):
        return pl.pallas_call(
            functools.partial(_kernel, n_k_tiles=grid[2]),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (k_tile, j_dim, c_tile),
                    lambda l, c, k: (k, 0, c),
                ),
                pl.BlockSpec((j_dim, m_dim), lambda l, c, k: (0, 0)),
                pl.BlockSpec((j_dim, m_dim), lambda l, c, k: (0, 0)),
                pl.BlockSpec(
                    (l_tile, k_tile, m_dim),
                    lambda l, c, k: (l, k, 0),
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
