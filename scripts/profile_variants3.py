"""Round 3 spectral-path variants: parity-folded Legendre, triangular
m-chunking, 2-pass split-weight DFT.

Ideas (none previously measured):
 a) parity fold: P_l^m(-x) = (-1)^(l+m) P_l^m(x); folding the latitude
    axis into symmetric/antisymmetric halves halves the Legendre FLOPs
    and the weight tensor bytes.
 b) triangular chunking: w[m,l,k] = 0 for l < m; splitting the m range
    lets the high-m chunk contract onto a shorter l range.
 c) 2-pass split DFT: the SFNO feeds the SHT bf16-cast activations, so
    x is exactly representable in bf16 and x @ (w_hi + w_lo) in two
    DEFAULT-precision passes equals >=HIGH accuracy at 2/3 the cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_variants3.py

MEASURED (v5e, 2026-08-17, B1 K180 J360 C256, INNER=200, min of 5):
  b) baseline real-pair      1.579 ms   <- production path, fastest
  h) parity-folded Legendre  2.155 ms   (fold/unfold HBM traffic > FLOP win)
  i) 2-pass split fwd DFT    1.787 ms   (extra pass dominates; XLA can't fuse)
  j) split DFT + parity      2.167 ms
All variants match fp32 to ~2.6e-3 max rel err (HIGH-precision floor).
Conclusion: keep the 4-einsum real-pair path in ops/sht.py — the spectral
block is HBM-bound at these shapes, so FLOP-halving tricks that add
elementwise fold/unfold passes lose.
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
    print(f"{name:48s} {min(times):8.3f} ms", flush=True)
    return min(times)


def parity_fold_weights(w):
    """w[m, l, k] -> (w_sym[m, L/2, K/2], w_anti[m, L/2, K/2], perm info).

    Row l has parity (-1)^(l+m) about the equator. For each m, the
    symmetric rows are l = 2l' + (m%2)... wait: parity + rows are those
    with (l+m) even, i.e. l = m%2, m%2+2, ... Build per-m gather indices.
    """
    m_, l_, k_ = w.shape
    kh = k_ // 2
    lh = (l_ + 1) // 2
    w_np = np.asarray(w)
    w_sym = np.zeros((m_, lh, kh), np.float32)
    w_anti = np.zeros((m_, lh, kh), np.float32)
    # fold k: ws = (w[k] + w[K-1-k])/2 for parity+, wa = (w[k]-w[K-1-k])/2
    wk_s = 0.5 * (w_np[:, :, :kh] + w_np[:, :, ::-1][:, :, :kh])
    wk_a = 0.5 * (w_np[:, :, :kh] - w_np[:, :, ::-1][:, :, :kh])
    for m in range(m_):
        sym_ls = [l for l in range(l_) if (l + m) % 2 == 0]
        anti_ls = [l for l in range(l_) if (l + m) % 2 == 1]
        w_sym[m, : len(sym_ls)] = wk_s[m, sym_ls]
        w_anti[m, : len(anti_ls)] = wk_a[m, anti_ls]
    return jnp.asarray(w_sym), jnp.asarray(w_anti)


def parity_unfold(cs, ca, m_idx):
    """Interleave parity-split coeffs back to the l axis.

    cs/ca: [B, L/2, M, C] (per-m symmetric/antisymmetric rows in order).
    Even l rows come from cs where m even else ca; odd rows the converse.
    """
    even_m = (m_idx % 2 == 0)[None, None, :, None]
    even_rows = jnp.where(even_m, cs, ca)  # rows l = 0, 2, 4, ...
    odd_rows = jnp.where(even_m, ca, cs)  # rows l = 1, 3, 5, ...
    stacked = jnp.stack([even_rows, odd_rows], axis=2)  # [B, L/2, 2, M, C]
    b, lh, _, m_, c = stacked.shape
    return stacked.reshape(b, lh * 2, m_, c)


def parity_refold(x, m_idx):
    """Inverse of parity_unfold: [B, L, M, C] -> (cs, ca)."""
    b, l_, m_, c = x.shape
    stacked = x.reshape(b, l_ // 2, 2, m_, c)
    even_rows, odd_rows = stacked[:, :, 0], stacked[:, :, 1]
    even_m = (m_idx % 2 == 0)[None, None, :, None]
    cs = jnp.where(even_m, even_rows, odd_rows)
    ca = jnp.where(even_m, odd_rows, even_rows)
    return cs, ca


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
    m_idx = jnp.arange(M)

    ein = functools.partial(
        jnp.einsum, precision=PREC, preferred_element_type=jnp.float32
    )
    ein_d = functools.partial(
        jnp.einsum, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )

    # b) baseline: real-pair, 4-einsum filter (current production path)
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

    timeit("b) baseline real-pair", realpair, x, wr, wi)

    # h) parity-folded Legendre (fwd + inv)
    ws_f, wa_f = parity_fold_weights(legw)  # [M, L/2, K/2] (m,l,k order kept)
    # inverse pct is [m, l, k] too; fold k the same way but parity applies
    # to the OUTPUT k axis: grid[k] = sum_l pct[m,l,k] c[l];
    # pct[m,l,K-1-k] = (-1)^(l+m) pct[m,l,k]. Build half-k weights taking
    # the parity-consistent average, split by l-parity groups.
    pct_np = np.asarray(pct)
    kh = K // 2
    lh = (L + 1) // 2
    ps = np.zeros((M, lh, kh), np.float32)
    pa = np.zeros((M, lh, kh), np.float32)
    for m in range(M):
        sym_ls = [l for l in range(L) if (l + m) % 2 == 0]
        anti_ls = [l for l in range(L) if (l + m) % 2 == 1]
        ps[m, : len(sym_ls)] = 0.5 * (
            pct_np[m, sym_ls, :kh] + pct_np[m, sym_ls, ::-1][:, :kh]
        )
        pa[m, : len(anti_ls)] = 0.5 * (
            pct_np[m, anti_ls, :kh] - pct_np[m, anti_ls, ::-1][:, :kh]
        )
    ps, pa = jnp.asarray(ps), jnp.asarray(pa)

    def parity(x, wr, wi):
        xf = x.astype(jnp.float32)
        xr = ein("bkjc,jm->bkmc", xf, fc)
        xi = ein("bkjc,jm->bkmc", xf, fs)
        # fold latitude
        xr_n, xr_s = xr[:, :kh], xr[:, ::-1][:, :kh]
        xi_n, xi_s = xi[:, :kh], xi[:, ::-1][:, :kh]
        r_sym, r_anti = xr_n + xr_s, xr_n - xr_s
        i_sym, i_anti = xi_n + xi_s, xi_n - xi_s
        cr_s = ein("bkmc,mlk->blmc", r_sym, ws_f)
        cr_a = ein("bkmc,mlk->blmc", r_anti, wa_f)
        ci_s = ein("bkmc,mlk->blmc", i_sym, ws_f)
        ci_a = ein("bkmc,mlk->blmc", i_anti, wa_f)
        cr = parity_unfold(cr_s, cr_a, m_idx)
        ci = parity_unfold(ci_s, ci_a, m_idx)
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        # inverse: refold filter output by parity, two half contractions
        or_s, or_a = parity_refold(outr, m_idx)
        oi_s, oi_a = parity_refold(outi, m_idx)
        gr_n = ein("blmc,mlk->bkmc", or_s, ps) + ein("blmc,mlk->bkmc", or_a, pa)
        gr_srev = ein("blmc,mlk->bkmc", or_s, ps) - ein(
            "blmc,mlk->bkmc", or_a, pa
        )
        gi_n = ein("blmc,mlk->bkmc", oi_s, ps) + ein("blmc,mlk->bkmc", oi_a, pa)
        gi_srev = ein("blmc,mlk->bkmc", oi_s, ps) - ein(
            "blmc,mlk->bkmc", oi_a, pa
        )
        gr = jnp.concatenate([gr_n, gr_srev[:, ::-1]], axis=1)
        gi = jnp.concatenate([gi_n, gi_srev[:, ::-1]], axis=1)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("h) parity-folded Legendre", parity, x, wr, wi)

    # i) 2-pass split-weight DFT (input exactly bf16) + parity Legendre
    def split2(mat):
        hi = mat.astype(jnp.bfloat16)
        lo = (mat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    fc_hi, fc_lo = split2(fc)
    fs_hi, fs_lo = split2(fs)
    ic_hi, ic_lo = split2(ic_)
    is_hi, is_lo = split2(is_)

    def dft2pass(x, wr, wi):
        # x already bf16: two DEFAULT passes == 3-pass HIGH accuracy here
        xr = ein_d("bkjc,jm->bkmc", x, fc_hi) + ein_d("bkjc,jm->bkmc", x, fc_lo)
        xi = ein_d("bkjc,jm->bkmc", x, fs_hi) + ein_d("bkjc,jm->bkmc", x, fs_lo)
        cr = ein("bkmc,mlk->blmc", xr, legw)
        ci = ein("bkmc,mlk->blmc", xi, legw)
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        gr = ein("blmc,mlk->bkmc", outr, pct)
        gi = ein("blmc,mlk->bkmc", outi, pct)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("i) 2-pass split fwd DFT", dft2pass, x, wr, wi)

    # j) everything: split DFT fwd, parity Legendre both ways
    def combined(x, wr, wi):
        xr = ein_d("bkjc,jm->bkmc", x, fc_hi) + ein_d("bkjc,jm->bkmc", x, fc_lo)
        xi = ein_d("bkjc,jm->bkmc", x, fs_hi) + ein_d("bkjc,jm->bkmc", x, fs_lo)
        xr_n, xr_s = xr[:, :kh], xr[:, ::-1][:, :kh]
        xi_n, xi_s = xi[:, :kh], xi[:, ::-1][:, :kh]
        r_sym, r_anti = xr_n + xr_s, xr_n - xr_s
        i_sym, i_anti = xi_n + xi_s, xi_n - xi_s
        cr_s = ein("bkmc,mlk->blmc", r_sym, ws_f)
        cr_a = ein("bkmc,mlk->blmc", r_anti, wa_f)
        ci_s = ein("bkmc,mlk->blmc", i_sym, ws_f)
        ci_a = ein("bkmc,mlk->blmc", i_anti, wa_f)
        cr = parity_unfold(cr_s, cr_a, m_idx)
        ci = parity_unfold(ci_s, ci_a, m_idx)
        outr = ein("blmi,iol->blmo", cr, wr) - ein("blmi,iol->blmo", ci, wi)
        outi = ein("blmi,iol->blmo", cr, wi) + ein("blmi,iol->blmo", ci, wr)
        or_s, or_a = parity_refold(outr, m_idx)
        oi_s, oi_a = parity_refold(outi, m_idx)
        tr_s = ein("blmc,mlk->bkmc", or_s, ps)
        tr_a = ein("blmc,mlk->bkmc", or_a, pa)
        ti_s = ein("blmc,mlk->bkmc", oi_s, ps)
        ti_a = ein("blmc,mlk->bkmc", oi_a, pa)
        gr = jnp.concatenate([tr_s + tr_a, (tr_s - tr_a)[:, ::-1]], axis=1)
        gi = jnp.concatenate([ti_s + ti_a, (ti_s - ti_a)[:, ::-1]], axis=1)
        out = ein("bkmc,mj->bkjc", gr, ic_) + ein("bkmc,mj->bkjc", gi, is_)
        return out.astype(x.dtype)

    timeit("j) split DFT + parity Legendre", combined, x, wr, wi)

    # numerics vs HIGHEST-precision dense reference
    ein_h = functools.partial(
        jnp.einsum, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def exact(x, wr, wi):
        xf = x.astype(jnp.float32)
        xr = ein_h("bkjc,jm->bkmc", xf, fc)
        xi = ein_h("bkjc,jm->bkmc", xf, fs)
        cr = ein_h("bkmc,mlk->blmc", xr, legw)
        ci = ein_h("bkmc,mlk->blmc", xi, legw)
        outr = ein_h("blmi,iol->blmo", cr, wr) - ein_h("blmi,iol->blmo", ci, wi)
        outi = ein_h("blmi,iol->blmo", cr, wi) + ein_h("blmi,iol->blmo", ci, wr)
        gr = ein_h("blmc,mlk->bkmc", outr, pct)
        gi = ein_h("blmc,mlk->bkmc", outi, pct)
        out = ein_h("bkmc,mj->bkjc", gr, ic_) + ein_h("bkmc,mj->bkjc", gi, is_)
        return out

    ref = np.asarray(jax.jit(exact)(x, wr, wi), np.float32)
    scale = np.abs(ref).max() + 1e-30
    for name, fn in [
        ("b", realpair), ("h", parity), ("i", dft2pass), ("j", combined)
    ]:
        got = np.asarray(jax.jit(fn)(x, wr, wi), np.float32)
        err = np.abs(got - ref).max() / scale
        print(f"variant {name} max rel err vs fp32: {err:.2e}")


if __name__ == "__main__":
    main()
