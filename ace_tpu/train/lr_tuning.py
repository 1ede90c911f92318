"""Per-epoch learning-rate tuning trial
(reference: fme/core/generics/lr_tuning.py:28 LRTuningConfig,
run_lr_tuning_trial :58).

Before an epoch, the current params are trained for ``num_batches`` twice —
at the current LR (baseline) and at ``current_lr * lr_factor`` (candidate).
If the candidate's validation loss beats the baseline's by at least
``improvement_threshold`` (relative), the candidate LR is adopted. In JAX
"cloning the stepper" is free: params are immutable pytrees.
"""

import dataclasses
import logging

import jax
import optax


@dataclasses.dataclass
class LRTuningConfig:
    """(reference: fme/core/generics/lr_tuning.py:28)."""

    enabled: bool = False
    lr_factor: float = 0.5
    num_batches: int = 10
    improvement_threshold: float = 0.0

    def build_trial(self):
        return run_lr_tuning_trial


def run_lr_tuning_trial(
    config: LRTuningConfig,
    params,
    current_lr: float,
    loss_fn,
    train_batches,
    valid_batches,
    rng: jax.Array,
) -> float | None:
    """Returns the candidate LR if it wins, else None.

    loss_fn(params, batch, rng) -> (loss, aux); train/valid_batches are
    lists of batch dicts (the first batches of the epoch).
    """
    candidate_lr = current_lr * config.lr_factor

    def short_train(lr, params, key):
        tx = optax.adam(lr)
        opt_state = tx.init(params)
        grad_fn = jax.jit(jax.grad(lambda p, b, k: loss_fn(p, b, k)[0]))
        for batch in train_batches[: config.num_batches]:
            key, sub = jax.random.split(key)
            grads = grad_fn(params, batch, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params

    def validate(params, key):
        total, n = 0.0, 0
        val_fn = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
        for batch in valid_batches:
            key, sub = jax.random.split(key)
            total += float(val_fn(params, batch, sub))
            n += 1
        return total / max(n, 1)

    k_base, k_cand, k_val = jax.random.split(rng, 3)
    baseline_params = short_train(current_lr, params, k_base)
    candidate_params = short_train(candidate_lr, params, k_cand)
    baseline_loss = validate(baseline_params, k_val)
    candidate_loss = validate(candidate_params, k_val)
    logging.info(
        f"LR trial: baseline(lr={current_lr:.2e})={baseline_loss:.5f}, "
        f"candidate(lr={candidate_lr:.2e})={candidate_loss:.5f}"
    )
    if candidate_loss < baseline_loss * (1.0 - config.improvement_threshold):
        return candidate_lr
    return None
