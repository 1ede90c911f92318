"""Microbenchmark SFNO block components with scan-amortized timing
(same methodology as ace_tpu/benchmark: per-dispatch overhead amortized
over an in-jit lax.scan). Dev tool, not part of the package.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_block.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.models.layers import InstanceNorm, MLP, exact_gelu
from ace_tpu.models.sfno import FourierNeuralOperatorBlock, SpectralConvS2
from ace_tpu.ops.sht import InverseRealSHT, RealSHT

B, K, J, C = 1, 180, 360, 256
L, M = 180, 181
DT = jnp.bfloat16
INNER = 50


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
    float(jit_rep(*args))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jit_rep(*args))
        times.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name:34s} {min(times):8.3f} ms")
    return min(times)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K, J, C), DT)
    sht = RealSHT(K, J, channels_last=True)
    isht = InverseRealSHT(K, J, channels_last=True)

    blk = FourierNeuralOperatorBlock(
        forward_transform=sht, inverse_transform=isht, embed_dim=C,
        operator_type="dhconv", dtype=DT,
    )
    params = blk.init(jax.random.PRNGKey(0), x)
    timeit("full block", lambda p, x: blk.apply(p, x), params, x)

    timeit("forward SHT", lambda x: sht(x), x)
    coeffs = jax.jit(lambda x: sht(x))(x)
    timeit("inverse SHT", lambda c: isht(c), coeffs)

    w = jnp.asarray(rng.randn(C, C, L) * (1.0 / (C * C)), jnp.float32)
    xr = jnp.real(coeffs)
    xi = jnp.imag(coeffs)

    def filt(xr, xi, w):
        ein = functools.partial(
            jnp.einsum, "...lmi,iol->...lmo",
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        outr = ein(xr, w) - ein(xi, w)
        outi = ein(xr, w) + ein(xi, w)
        return outr, outi

    timeit("dhconv filter (4 einsums)", filt, xr, xi, w)

    conv = SpectralConvS2(
        forward_transform=sht, inverse_transform=isht,
        in_channels=C, out_channels=C, operator_type="dhconv",
        use_bias=True,
    )
    pc = conv.init(jax.random.PRNGKey(0), x)
    timeit("SpectralConvS2 total", lambda p, x: conv.apply(p, x), pc, x)

    mlp = MLP(hidden_features=2 * C, out_features=C, act=exact_gelu, dtype=DT)
    pm = mlp.init(jax.random.PRNGKey(0), x)
    timeit("MLP (ratio 2)", lambda p, x: mlp.apply(p, x), pm, x)

    norm = InstanceNorm()
    pn = norm.init(jax.random.PRNGKey(0), x)
    timeit("InstanceNorm", lambda p, x: norm.apply(p, x), pn, x)

    import flax.linen as nn

    dense = nn.Dense(C, dtype=DT)
    pd = dense.init(jax.random.PRNGKey(0), x)
    timeit("inner-skip Dense", lambda p, x: dense.apply(p, x), pd, x)


if __name__ == "__main__":
    main()
