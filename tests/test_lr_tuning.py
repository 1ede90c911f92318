"""LR tuning trial test (reference model: fme/core/generics/test_lr_tuning.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.train.lr_tuning import LRTuningConfig, run_lr_tuning_trial


def test_lr_trial_prefers_better_lr():
    """A quadratic bowl where the huge baseline LR diverges: the halved
    candidate LR must win.
    """
    target = jnp.asarray([1.0, -2.0, 3.0])

    def loss_fn(params, batch, rng):
        return jnp.sum((params - target) ** 2), {}

    params = jnp.zeros(3)
    batches = [{} for _ in range(10)]
    config = LRTuningConfig(lr_factor=0.01, num_batches=10)
    result = run_lr_tuning_trial(
        config, params, current_lr=50.0, loss_fn=loss_fn,
        train_batches=batches, valid_batches=batches[:2],
        rng=jax.random.PRNGKey(0),
    )
    assert result is not None
    np.testing.assert_allclose(result, 0.5)


def test_lr_trial_keeps_good_lr():
    target = jnp.asarray([1.0])

    def loss_fn(params, batch, rng):
        return jnp.sum((params - target) ** 2), {}

    params = jnp.zeros(1)
    batches = [{} for _ in range(10)]
    # current lr is healthy; tiny candidate learns slower -> keep current
    config = LRTuningConfig(lr_factor=1e-4, num_batches=10)
    result = run_lr_tuning_trial(
        config, params, current_lr=0.1, loss_fn=loss_fn,
        train_batches=batches, valid_batches=batches[:2],
        rng=jax.random.PRNGKey(0),
    )
    assert result is None
