"""Registered kernel benchmarks: sht, inverse_sht, sfno_block, rollout
(reference registrations: fme/sht_fix.py:232,280 sht/inverse_sht;
fme/core/models/conditional_sfno/benchmark.py csfno_block).

Standard problem size: ACE2 1-degree grid (180x360), embed_dim 256.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.benchmark.benchmark import BenchmarkABC, register_benchmark
from ace_tpu.models.sfno import FourierNeuralOperatorBlock
from ace_tpu.ops.sht import InverseRealSHT, RealSHT

NLAT, NLON, EMBED = 180, 360, 256


@register_benchmark("sht")
class SHTBenchmark(BenchmarkABC):
    def __init__(self):
        self.sht = RealSHT(NLAT, NLON, channels_last=True)
        self.x = jnp.asarray(
            np.random.RandomState(0).randn(1, NLAT, NLON, EMBED),
            jnp.float32,
        )

    @classmethod
    def new(cls):
        return cls()

    def get_fn(self):
        return self.sht, (self.x,)


@register_benchmark("inverse_sht")
class InverseSHTBenchmark(BenchmarkABC):
    def __init__(self):
        sht = RealSHT(NLAT, NLON, channels_last=True)
        self.isht = InverseRealSHT(NLAT, NLON, channels_last=True)
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, NLAT, NLON, EMBED),
            jnp.float32,
        )
        self.coeffs = jax.jit(sht)(x)

    @classmethod
    def new(cls):
        return cls()

    def get_fn(self):
        return self.isht, (self.coeffs,)


@register_benchmark("sfno_block")
class SFNOBlockBenchmark(BenchmarkABC):
    def __init__(self):
        sht = RealSHT(NLAT, NLON, channels_last=True)
        isht = InverseRealSHT(NLAT, NLON, channels_last=True)
        self.block = FourierNeuralOperatorBlock(
            forward_transform=sht,
            inverse_transform=isht,
            embed_dim=EMBED,
            operator_type="dhconv",
            dtype=jnp.bfloat16,
        )
        self.x = jnp.asarray(
            np.random.RandomState(0).randn(1, NLAT, NLON, EMBED),
            jnp.bfloat16,
        )
        self.params = self.block.init(jax.random.PRNGKey(0), self.x)

    @classmethod
    def new(cls):
        return cls()

    def get_fn(self):
        return (
            lambda p, x: self.block.apply(p, x),
            (self.params, self.x),
        )
