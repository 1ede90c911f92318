"""Compare spectral-conv implementation variants on the real chip.

Calibrates the per-iteration harness floor with a nop, then times:
  a) current SpectralConvS2 (complex SHT API)
  b) real-pair path: same math, no complex64 anywhere
  c) real-pair + stacked filter (2 einsums instead of 4)
  d) real-pair + parity-split Legendre (half FLOPs)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_variants.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.sfno import SpectralConvS2
from ace_tpu.ops.sht import InverseRealSHT, RealSHT

B, K, J, C = 1, 180, 360, 256
L, M = 180, 181
DT = jnp.bfloat16
INNER = 200
PREC = jax.lax.Precision.HIGH


def timeit(name, fn, *args, n=5):
    def repeated(*args):
        def body(acc, _):
            eps = acc * 1e-30

            def bump(a):
                if not hasattr(a, "dtype"):
                    return a
                if jnp.issubdtype(a.dtype, jnp.complexfloating):
                    return a + eps.astype(jnp.float32)
                return a + eps.astype(a.dtype)

            args_i = jax.tree_util.tree_map(bump, args)
            result = fn(*args_i)
            s = sum(
                jnp.sum(jnp.abs(leaf).astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(result)
            )
            return acc + s, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=INNER
        )
        return acc

    jit_rep = jax.jit(repeated)
    float(jit_rep(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jit_rep(*args))
        times.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name:44s} {min(times):8.3f} ms")
    return min(times)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K, J, C), DT)
    sht = RealSHT(K, J, channels_last=True)
    isht = InverseRealSHT(K, J, channels_last=True)
    w = jnp.asarray(
        rng.randn(C, C, L, 2) * (1.0 / (C * C)), jnp.float32
    )
    wr, wi = w[..., 0], w[..., 1]

    nop_in = jnp.zeros((8, 128), jnp.float32)
    floor = timeit("calibration nop", lambda a: a * 1.0, nop_in)

    # a) current conv
    conv = SpectralConvS2(
        forward_transform=sht, inverse_transform=isht,
        in_channels=C, out_channels=C, operator_type="dhconv",
        use_bias=False,
    )
    pc = conv.init(jax.random.PRNGKey(0), x)
    timeit("a) SpectralConvS2 (complex)", lambda p, x: conv.apply(p, x), pc, x)

    fc, fs = sht._fc, sht._fs
    pct = isht.pct
    legw = sht.weights
    ic_, is_ = isht._ic, isht._is

    ein = functools.partial(
        jnp.einsum, precision=PREC, preferred_element_type=jnp.float32
    )

    # b) real-pair path, 4-einsum filter
    def realpair(x, wr, wi):
        xf = x.astype(jnp.float32)
        xr = ein("bkjc,jm->bkmc", xf, fc)
        xi = ein("bkjc,jm->bkmc", xf, fs)
        cr = ein("bkmc,mlk->blmc", xr, legw)
        ci = ein("bkmc,mlk->blmc", xi, legw)
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        gr = ein("blmc,mlk->bkmc", outr, pct)
        gi = ein("blmc,mlk->bkmc", outi, pct)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("b) real-pair (4-einsum filter)", realpair, x, wr, wi)

    # c) real-pair, stacked filter: one einsum producing all 4 products
    def realpair_stacked(x, wr, wi):
        xf = x.astype(jnp.float32)
        xr = ein("bkjc,jm->bkmc", xf, fc)
        xi = ein("bkjc,jm->bkmc", xf, fs)
        cr = ein("bkmc,mlk->blmc", xr, legw)
        ci = ein("bkmc,mlk->blmc", xi, legw)
        cs = jnp.stack([cr, ci])  # [2, B, L, M, C]
        ws = jnp.stack([wr, wi])  # [2, C, C, L]
        prod = ein("sblmi,tiol->stblmo", cs, ws)
        outr = prod[0, 0] - prod[1, 1]
        outi = prod[0, 1] + prod[1, 0]
        gr = ein("blmc,mlk->bkmc", outr, pct)
        gi = ein("blmc,mlk->bkmc", outi, pct)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("c) real-pair (stacked filter)", realpair_stacked, x, wr, wi)

    # d) real-pair + parity-split Legendre
    #    P_l^m(-t) = (-1)^(l+m) P_l^m(t); Gauss lats are symmetric.
    Kh = K // 2
    legw_np = np.asarray(legw)  # [m, l, k]
    pct_np = np.asarray(pct)
    m_idx = np.arange(M)[:, None]
    l_idx = np.arange(L)[None, :]
    even = ((l_idx + m_idx) % 2 == 0)  # [M, L]
    # folded forward weights: use first K/2 latitudes
    wf_e = jnp.asarray(legw_np[:, :, :Kh] * even[:, :, None])
    wf_o = jnp.asarray(legw_np[:, :, :Kh] * (~even)[:, :, None])
    wi_e = jnp.asarray(pct_np[:, :, :Kh] * even[:, :, None])
    wi_o = jnp.asarray(pct_np[:, :, :Kh] * (~even)[:, :, None])

    def realpair_parity(x, wr, wi):
        xf = x.astype(jnp.float32)
        xr = ein("bkjc,jm->bkmc", xf, fc)
        xi = ein("bkjc,jm->bkmc", xf, fs)
        # fold latitudes: even/odd about the equator
        def fold(a):
            top = a[:, :Kh]
            bot = a[:, K - 1: Kh - 1: -1]
            return top + bot, top - bot
        xre, xro = fold(xr)
        xie, xio = fold(xi)
        cr = ein("bkmc,mlk->blmc", xre, wf_e) + ein("bkmc,mlk->blmc", xro, wf_o)
        ci = ein("bkmc,mlk->blmc", xie, wf_e) + ein("bkmc,mlk->blmc", xio, wf_o)
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        # inverse with parity: even part + odd part, un-fold
        gre = ein("blmc,mlk->bkmc", outr, wi_e)
        gro = ein("blmc,mlk->bkmc", outr, wi_o)
        gie = ein("blmc,mlk->bkmc", outi, wi_e)
        gio = ein("blmc,mlk->bkmc", outi, wi_o)
        gr = jnp.concatenate(
            [gre + gro, (gre - gro)[:, ::-1]], axis=1
        )
        gi = jnp.concatenate(
            [gie + gio, (gie - gio)[:, ::-1]], axis=1
        )
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("d) real-pair + parity Legendre", realpair_parity, x, wr, wi)

    # numerics check of variants vs (a)-equivalent math
    ref = np.asarray(realpair(x, wr, wi), np.float32)
    for name, fn in [("c", realpair_stacked), ("d", realpair_parity)]:
        got = np.asarray(fn(x, wr, wi), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
        print(f"variant {name} max rel err vs b: {err:.2e}")


if __name__ == "__main__":
    main()
