"""Wildcard masks + parameter init/freezing/L2-SP tests
(reference models: fme/core/test_wildcard.py,
fme/ace/stepper/test_parameter_init.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ace_tpu.core.wildcard import (
    UnusedRuleError,
    build_mask,
    param_names,
    wildcard_match,
)
from ace_tpu.stepper.parameter_init import (
    FrozenParameterConfig,
    ParameterInitializationConfig,
    overwrite_weights,
)


def _params():
    return {
        "params": {
            "encoder": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)},
            "decoder": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)},
        }
    }


def test_wildcard_match():
    assert wildcard_match("params/*/kernel", "params/encoder/kernel")
    assert not wildcard_match("params/*/kernel", "params/encoder/bias")
    assert wildcard_match("*", "anything/at/all")


def test_build_mask_include():
    params = _params()
    mask = build_mask(params, include=["params/encoder/*"])
    assert mask["params"]["encoder"]["kernel"] is True
    assert mask["params"]["decoder"]["kernel"] is False


def test_unused_rule_raises():
    with pytest.raises(UnusedRuleError):
        build_mask(_params(), include=["params/bogus/*"])


def test_param_names():
    names = param_names(_params())
    assert "params/encoder/kernel" in names


def test_overwrite_weights_with_slice():
    params = _params()
    base = {
        "params": {
            "encoder": {
                "kernel": jnp.full((2, 4), 7.0),  # smaller first dim
                "bias": jnp.full((4,), 5.0),
            },
            "decoder": {"kernel": jnp.full((4, 2), 3.0), "bias": jnp.zeros(2)},
        }
    }
    out = overwrite_weights(params, base, exclude=["params/decoder/*"])
    k = np.asarray(out["params"]["encoder"]["kernel"])
    np.testing.assert_array_equal(k[:2], 7.0)  # transferred slice
    np.testing.assert_array_equal(k[2:], 1.0)  # original remainder
    np.testing.assert_array_equal(
        np.asarray(out["params"]["decoder"]["kernel"]), 1.0  # excluded
    )


def test_freeze_transform_zeroes_frozen_updates():
    params = _params()
    cfg = ParameterInitializationConfig(
        frozen_parameters=FrozenParameterConfig(
            include=["params/encoder/*"]
        )
    )
    tx = optax.chain(cfg.freeze_transform(params), optax.sgd(0.1))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(
        np.asarray(updates["params"]["encoder"]["kernel"]), 0.0
    )
    assert float(np.abs(
        np.asarray(updates["params"]["decoder"]["kernel"])
    ).max()) > 0


def test_l2sp_regularizer():
    params = _params()
    base = jax.tree_util.tree_map(lambda p: p * 0.0, params)
    cfg = ParameterInitializationConfig(alpha=2.0)
    penalty = float(cfg.regularizer_loss(params, base))
    # 0.5 * 2.0 * sum(ones) over all kernels = 12 + 8 = 20
    expected = sum(
        float(jnp.sum(leaf**2))
        for leaf in jax.tree_util.tree_leaves(params)
    )
    np.testing.assert_allclose(penalty, expected, rtol=1e-6)
    # beta-only penalty with no base
    cfg2 = ParameterInitializationConfig(beta=2.0)
    penalty2 = float(cfg2.regularizer_loss(params, None))
    np.testing.assert_allclose(penalty2, expected, rtol=1e-6)


def test_copy_weights_after_batch():
    from ace_tpu.stepper.parameter_init import CopyWeightsConfig

    base = _params()
    copier = CopyWeightsConfig(include=["params/encoder/*"]).build(base)
    trained = jax.tree_util.tree_map(lambda p: p + 5.0, base)
    out = copier.apply(trained)
    # encoder reset to base, decoder keeps training
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoder"]["kernel"]), 1.0
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["decoder"]["kernel"]), 6.0
    )
