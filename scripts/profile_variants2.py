"""Round 2: stacked real-pair spectral path variants (no runtime concats).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_variants2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

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
            args_i = jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype) if hasattr(a, "dtype") else a,
                args,
            )
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

    fc, fs = sht._fc, sht._fs
    pct = isht.pct
    legw = sht.weights
    ic_, is_ = isht._ic, isht._is

    ein = functools.partial(
        jnp.einsum, precision=PREC, preferred_element_type=jnp.float32
    )

    nop_in = jnp.zeros((8, 128), jnp.float32)
    floor = timeit("calibration nop", lambda a: a * 1.0, nop_in)

    # b) baseline from round 1: real-pair, 4-einsum filter
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

    # e) fully stacked: s axis threaded through, filter is one [2C x 2C]
    f2 = jnp.stack([fc, fs], axis=1)          # [J, 2, M]
    inv2 = jnp.stack([ic_, is_], axis=0)      # [2, M, J]

    def stacked(x, wr, wi):
        xf = x.astype(jnp.float32)
        xs = ein("bkjc,jsm->sbkmc", xf, f2)          # [2,B,K,M,C]
        cs = ein("sbkmc,mlk->sblmc", xs, legw)       # [2,B,L,M,C]
        w2 = jnp.stack(
            [jnp.stack([wr, wi], axis=0),            # s=r -> (t=r, t=i)
             jnp.stack([-wi, wr], axis=0)], axis=0   # s=i
        )                                            # [s,t,i,o,l]
        g = ein("sblmi,stiol->tblmo", cs, w2)        # [2,B,L,M,C]
        gk = ein("tblmc,mlk->tbkmc", g, pct)         # [2,B,K,M,C]
        out = ein("tbkmc,tmj->bkjc", gk, inv2)
        return out.astype(x.dtype)

    timeit("e) stacked s-axis (5 einsums)", stacked, x, wr, wi)

    # f) stacked transforms, 4-einsum filter via slices
    def stacked_slice(x, wr, wi):
        xf = x.astype(jnp.float32)
        xs = ein("bkjc,jsm->sbkmc", xf, f2)
        cs = ein("sbkmc,mlk->sblmc", xs, legw)
        cr, ci = cs[0], cs[1]
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        gr = ein("blmc,mlk->bkmc", outr, pct)
        gi = ein("blmc,mlk->bkmc", outi, pct)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("f) stacked transforms, sliced filter", stacked_slice, x, wr, wi)

    # g) like e but filter kept as 4 einsums on slices, inverse stacked
    def stacked_g(x, wr, wi):
        xf = x.astype(jnp.float32)
        xs = ein("bkjc,jsm->sbkmc", xf, f2)
        cs = ein("sbkmc,mlk->sblmc", xs, legw)
        cr, ci = cs[0], cs[1]
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        g = jnp.stack([outr, outi])
        gk = ein("tblmc,mlk->tbkmc", g, pct)
        out = ein("tbkmc,tmj->bkjc", gk, inv2)
        return out.astype(x.dtype)

    timeit("g) stacked fwd+inv, 4-einsum filter", stacked_g, x, wr, wi)

    # numerics
    ref = np.asarray(realpair(x, wr, wi), np.float32)
    for name, fn in [("e", stacked), ("f", stacked_slice), ("g", stacked_g)]:
        got = np.asarray(fn(x, wr, wi), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
        print(f"variant {name} max rel err vs b: {err:.2e}")


if __name__ == "__main__":
    main()
