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


@register_benchmark("csfno_block")
class CSFNOBlockBenchmark(BenchmarkABC):
    """Conditional-SFNO block at the reference benchmark size
    (fme/core/models/conditional_sfno/benchmark.py: C=512, 180x360,
    noise embed 64)."""

    def __init__(self):
        from ace_tpu.models.conditional_sfno import ConditionalFNOBlock

        sht = RealSHT(NLAT, NLON, channels_last=True)
        isht = InverseRealSHT(NLAT, NLON, channels_last=True)
        embed = 512
        self.block = ConditionalFNOBlock(
            forward_transform=sht,
            inverse_transform=isht,
            embed_dim=embed,
            embed_dim_noise=64,
            operator_type="dhconv",
            dtype=jnp.bfloat16,
        )
        rng = np.random.RandomState(0)
        self.x = jnp.asarray(
            rng.randn(1, NLAT, NLON, embed), jnp.bfloat16
        )
        self.noise = jnp.asarray(
            rng.randn(1, NLAT, NLON, 64), jnp.bfloat16
        )
        self.params = self.block.init(
            jax.random.PRNGKey(0), self.x, self.noise
        )

    @classmethod
    def new(cls):
        return cls()

    def get_fn(self):
        return (
            lambda p, x, n: self.block.apply(p, x, n),
            (self.params, self.x, self.noise),
        )


class _DiffusionUNetBenchmark(BenchmarkABC):
    """Diffusion UNet denoiser at the reference songunetv2 benchmark
    scale (fme/downscaling/modules/physicsnemo_unets_v2/benchmark.py:
    512x512, model_channels 128, channel_mult [1,2,2,2], 6 in / 4 out).
    """

    dtype = jnp.float32

    def __init__(self):
        from ace_tpu.downscaling.unet import DiffusionUNet

        res, out_ch, cond_ch = 512, 4, 2
        self.net = DiffusionUNet(
            out_channels=out_ch,
            base_channels=128,
            channel_mults=(1, 2, 2, 2),
            dtype=self.dtype,
        )
        rng = np.random.RandomState(0)
        self.x = jnp.asarray(
            rng.randn(1, res, res, out_ch), self.dtype
        )
        self.cond = jnp.asarray(
            rng.randn(1, res, res, cond_ch), self.dtype
        )
        self.c_noise = jnp.asarray(rng.randn(1), jnp.float32)
        params = self.net.init(
            jax.random.PRNGKey(0), self.x, self.cond, self.c_noise
        )
        # the EDM-convention zero-init output conv would make the
        # regression fingerprint identically zero; deterministically
        # perturb every leaf so the fingerprint actually covers the net
        self.params = jax.tree_util.tree_map(
            lambda p: p + 0.01 * jnp.sin(
                jnp.arange(p.size, dtype=jnp.float32)
            ).reshape(p.shape),
            params,
        )

    @classmethod
    def new(cls):
        return cls()

    def get_fn(self):
        return (
            lambda p, x, c, n: self.net.apply(p, x, c, n),
            (self.params, self.x, self.cond, self.c_noise),
        )


@register_benchmark("diffusion_unet")
class DiffusionUNetBenchmark(_DiffusionUNetBenchmark):
    pass


@register_benchmark("diffusion_unet_bf16")
class DiffusionUNetBf16Benchmark(_DiffusionUNetBenchmark):
    dtype = jnp.bfloat16
