"""EDM diffusion core: preconditioning, training loss, stochastic sampler
(reference: fme/downscaling/models.py:145 DiffusionModelConfig,
samplers.py:32 stochastic_sampler, preconditioners in
fme/downscaling/modules/preconditioners.py; algorithms from Karras et al.
2022, arXiv:2206.00364).

The sampler is a lax.fori_loop over a static Heun schedule, so the whole
multi-step generation compiles to one XLA program.
"""

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

DenoiserFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
# signature: (x_noisy [B,H,W,C], condition [B,H,W,Cc], sigma [B]) -> denoised


def edm_precondition(raw_net, sigma_data: float = 0.5) -> DenoiserFn:
    """Wrap a raw network F into the EDM denoiser D
    (Karras et al. eq. 7; reference: modules/preconditioners.py EDMPrecond):

        D(x; sigma) = c_skip x + c_out F(c_in x, c_noise)
    """

    def denoiser(x, condition, sigma):
        sigma = jnp.reshape(sigma, (-1,) + (1,) * (x.ndim - 1))
        s2 = sigma_data**2
        c_skip = s2 / (sigma**2 + s2)
        c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + s2)
        c_in = 1.0 / jnp.sqrt(s2 + sigma**2)
        c_noise = jnp.log(sigma.reshape(-1)) / 4.0
        f = raw_net(c_in * x, condition, c_noise)
        return c_skip * x + c_out * f

    return denoiser


def validate_sigma_ranges(sigma_ranges) -> None:
    """(reference: fme/downscaling/predictors/serial_denoising.py:32)."""
    if not sigma_ranges:
        raise ValueError("sigma_ranges must contain at least one entry.")
    for s_min, s_max in sigma_ranges:
        if s_min >= s_max:
            raise ValueError(
                f"Each range needs sigma_min < sigma_max; got "
                f"[{s_min}, {s_max}]."
            )
    for i in range(len(sigma_ranges) - 1):
        if sigma_ranges[i][0] >= sigma_ranges[i + 1][0]:
            raise ValueError(
                "sigma_ranges must be sorted by sigma_min ascending."
            )
        if sigma_ranges[i][1] != sigma_ranges[i + 1][0]:
            raise ValueError(
                "Sigma ranges must be contiguous: "
                f"sigma_ranges[{i}] max ({sigma_ranges[i][1]}) must equal "
                f"sigma_ranges[{i + 1}] min ({sigma_ranges[i + 1][0]})."
            )


def make_moe_denoiser(sigma_ranges, denoisers) -> DenoiserFn:
    """Mixture-of-experts denoiser: each net call routes to the expert
    whose inclusive sigma range contains the current noise level
    (reference: serial_denoising.py:63 _SigmaDispatchModule). At a shared
    boundary the lower-noise expert wins; sigmas outside every range
    clamp to the nearest boundary expert.

    TPU-native: routing is a ``lax.switch`` on a scalar computed from the
    traced sigma, so the whole multi-step sampler still compiles to one
    XLA program (the reference breaks the sampler into per-step host
    dispatch via ``sigma.item()``).
    """
    validate_sigma_ranges(sigma_ranges)
    if len(sigma_ranges) != len(denoisers):
        raise ValueError(
            "sigma_ranges and denoisers must have the same length."
        )
    if len(denoisers) == 1:
        return denoisers[0]
    # expert index = number of upper bounds strictly below sigma; ties at
    # a boundary pick the lower-noise segment, and out-of-range sigmas
    # clamp to the first/last expert
    uppers = jnp.asarray([hi for _, hi in sigma_ranges[:-1]])
    branches = [
        (lambda x, c, s, d=d: d(x, c, s)) for d in denoisers
    ]

    def denoiser(x, condition, sigma):
        sigma = jnp.reshape(sigma, (-1,))
        # samplers pass a batch-constant sigma; route on the first entry
        idx = jnp.sum(sigma[0] > uppers).astype(jnp.int32)
        return jax.lax.switch(idx, branches, x, condition, sigma)

    return denoiser


@dataclasses.dataclass
class LogNormalNoiseDistribution:
    """sigma ~ exp(N(p_mean, p_std)) (reference: models.py noise dists)."""

    p_mean: float = -1.2
    p_std: float = 1.2

    def sample(self, rng, shape):
        return jnp.exp(
            self.p_mean + self.p_std * jax.random.normal(rng, shape)
        )


@dataclasses.dataclass
class LogUniformNoiseDistribution:
    sigma_min: float = 0.002
    sigma_max: float = 80.0

    def sample(self, rng, shape):
        lo, hi = jnp.log(self.sigma_min), jnp.log(self.sigma_max)
        return jnp.exp(jax.random.uniform(rng, shape, minval=lo, maxval=hi))


def edm_loss(denoiser: DenoiserFn, rng, target, condition,
             noise_distribution=None, sigma_data: float = 0.5,
             loss_weight_exponent: float = 1.0,
             channel_weights=None):
    """EDM denoising score-matching loss (Karras et al. eq. 8).

    loss_weight_exponent: exponent on the EDM noise-level weight
    (reference: fme/downscaling/noise.py:63; <1 de-emphasizes low-noise
    samples). channel_weights: optional [C] per-output-variable
    multiplicative weights (reference: models.py:81 LossWeightsConfig).
    """
    if noise_distribution is None:
        noise_distribution = LogNormalNoiseDistribution()
    k_sigma, k_noise = jax.random.split(rng)
    batch = target.shape[0]
    sigma = noise_distribution.sample(k_sigma, (batch,))
    sigma_b = jnp.reshape(sigma, (-1,) + (1,) * (target.ndim - 1))
    weight = (
        (sigma_b**2 + sigma_data**2) / (sigma_b * sigma_data) ** 2
    ) ** loss_weight_exponent
    noise = jax.random.normal(k_noise, target.shape) * sigma_b
    denoised = denoiser(target + noise, condition, sigma)
    err = weight * (denoised - target) ** 2
    if channel_weights is not None:
        err = err * jnp.asarray(channel_weights)
    return jnp.mean(err)


def stochastic_sampler(
    denoiser: DenoiserFn,
    latents: jax.Array,
    condition: jax.Array,
    rng: jax.Array,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
) -> jax.Array:
    """EDM Algorithm 2 (Heun, optional churn)
    (reference: fme/downscaling/samplers.py:32).

    latents: N(0,1) noise of the output shape [B, H, W, C].
    """
    i = jnp.arange(num_steps, dtype=jnp.float64
                   if jax.config.read("jax_enable_x64") else jnp.float32)
    t_steps = (
        sigma_max ** (1 / rho)
        + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    t_steps = jnp.concatenate([t_steps, jnp.zeros((1,), t_steps.dtype)])

    x = latents * t_steps[0]
    gamma_base = min(S_churn / num_steps, 2**0.5 - 1)

    def body(idx, carry):
        x, key = carry
        key, k_eps = jax.random.split(key)
        t_cur = t_steps[idx]
        t_next = t_steps[idx + 1]
        apply_churn = (t_cur >= S_min) & (t_cur <= S_max)
        gamma = jnp.where(apply_churn, gamma_base, 0.0)
        t_hat = t_cur * (1.0 + gamma)
        eps = jax.random.normal(k_eps, x.shape) * S_noise
        x_hat = x + jnp.sqrt(
            jnp.maximum(t_hat**2 - t_cur**2, 0.0)
        ) * eps
        batch = x.shape[0]
        sig_hat = jnp.full((batch,), t_hat)
        denoised = denoiser(x_hat, condition, sig_hat)
        d_cur = (x_hat - denoised) / t_hat
        x_next = x_hat + (t_next - t_hat) * d_cur

        # Heun 2nd-order correction (skipped on the final step to sigma=0)
        def heun(x_next):
            sig_next = jnp.full((batch,), t_next)
            denoised2 = denoiser(x_next, condition, sig_next)
            d_prime = (x_next - denoised2) / t_next
            return x_hat + (t_next - t_hat) * 0.5 * (d_cur + d_prime)

        x_next = jax.lax.cond(
            idx < num_steps - 1, heun, lambda x_n: x_n, x_next
        )
        return (x_next, key)

    x, _ = jax.lax.fori_loop(0, num_steps, body, (x, rng))
    return x
