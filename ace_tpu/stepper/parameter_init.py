"""Parameter initialization from base checkpoints: weight transfer,
freezing, and L2-SP regularization toward base weights
(reference: fme/ace/stepper/parameter_init.py:96
ParameterInitializationConfig).

JAX mapping: "frozen parameters" become an optax.masked zero-update on the
frozen subtree; the L2-SP regularizer is a pure penalty added to the loss;
weight overwrite (with slice-overwrite for shape-mismatched params,
reference: fme/core/weight_ops.py:135 overwrite semantics) is a pytree map.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ace_tpu.core.wildcard import build_mask


def overwrite_weights(params, base_params, exclude: list[str] | None = None):
    """Overwrite params with base weights; shape-mismatched leaves get
    their initial slice overwritten (supports fine-tuning to more
    channels/levels; reference: fme/core/weight_ops.py:135).
    """
    exclude_mask = (
        build_mask(params, exclude=exclude)
        if exclude
        else jax.tree_util.tree_map(lambda _: True, params)
    )

    def merge(p, b, keep):
        if not keep or b is None:
            return p
        p_arr, b_arr = np.asarray(p), np.asarray(b)
        if p_arr.shape == b_arr.shape:
            return jnp.asarray(b_arr)
        if len(p_arr.shape) != len(b_arr.shape):
            raise ValueError(
                f"cannot transfer weight with rank mismatch: "
                f"{p_arr.shape} vs {b_arr.shape}"
            )
        out = p_arr.copy()
        slices = tuple(
            slice(0, min(ps, bs)) for ps, bs in zip(p_arr.shape, b_arr.shape)
        )
        out[slices] = b_arr[slices]
        return jnp.asarray(out)

    # base may be a sub-structure; align by flattening paths
    flat_p = dict(_flatten(params))
    flat_b = dict(_flatten(base_params))
    flat_m = dict(_flatten(exclude_mask))
    merged = {
        k: merge(v, flat_b.get(k), flat_m[k]) for k, v in flat_p.items()
    }
    return _unflatten_like(params, merged)


def _flatten(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [
        ("/".join(str(k.key) for k in path), leaf) for path, leaf in flat
    ]


def _unflatten_like(template, flat_dict):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [
        flat_dict["/".join(str(k.key) for k in path)] for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@dataclasses.dataclass
class FrozenParameterConfig:
    """(reference: parameter_init.py FrozenParameterConfig) — exactly one
    of include/exclude; frozen params get no optimizer updates.
    """

    include: list[str] | None = None
    exclude: list[str] | None = None

    def __post_init__(self):
        if (self.include is None) == (self.exclude is None):
            raise ValueError(
                "provide exactly one of include or exclude for frozen params"
            )

    def frozen_mask(self, params):
        """True where the parameter is FROZEN."""
        return build_mask(params, include=self.include, exclude=self.exclude)


@dataclasses.dataclass
class ParameterClassification:
    """Per-rule exclude/frozen classification (reference:
    fme/ace/stepper/parameter_init.py:77 ParameterClassification)."""

    exclude: list[str] = dataclasses.field(default_factory=list)
    frozen: FrozenParameterConfig | None = None


@dataclasses.dataclass
class ParameterInitializationConfig:
    """(reference: fme/ace/stepper/parameter_init.py:96).

    alpha: L2-SP coefficient toward the base weights (initialized params).
    beta: L2 coefficient toward zero for uninitialized params.
    ``parameters`` is the reference's rule-list spelling; rules fold
    into exclude_parameters/frozen_parameters.
    """

    weights_path: str | None = None
    parameters: list[ParameterClassification] = dataclasses.field(
        default_factory=list
    )
    exclude_parameters: list[str] | None = None
    frozen_parameters: FrozenParameterConfig | None = None
    alpha: float = 0.0
    beta: float = 0.0

    def __post_init__(self):
        if self.parameters:
            if (
                self.exclude_parameters is not None
                or self.frozen_parameters is not None
            ):
                raise ValueError(
                    "provide either parameters rules or the deprecated "
                    "exclude_parameters/frozen_parameters, not both "
                    "(reference: parameter_init.py:129-136)"
                )
            excludes = [
                name for rule in self.parameters for name in rule.exclude
            ]
            if excludes:
                self.exclude_parameters = excludes
            frozen = [
                rule.frozen for rule in self.parameters
                if rule.frozen is not None
            ]
            if len(frozen) > 1:
                # merge include-style rules; mixed include/exclude
                # rules cannot be merged into one mask spec
                includes = [f.include for f in frozen]
                if any(i is None for i in includes):
                    raise ValueError(
                        "multiple frozen rules must all use include"
                    )
                self.frozen_parameters = FrozenParameterConfig(
                    include=[n for inc in includes for n in inc]
                )
            elif frozen:
                self.frozen_parameters = frozen[0]

    def apply_weights(self, params):
        """Load base checkpoint weights into params."""
        if self.weights_path is None:
            return params, None
        from ace_tpu.stepper.checkpoint import load_stepper

        base = load_stepper(self.weights_path).params
        new_params = overwrite_weights(
            params, base, exclude=self.exclude_parameters
        )
        return new_params, base

    def freeze_transform(self, params) -> optax.GradientTransformation:
        """optax transform zeroing updates for frozen params; identity when
        nothing is frozen.
        """
        if self.frozen_parameters is None:
            return optax.identity()
        frozen = self.frozen_parameters.frozen_mask(params)
        return optax.masked(optax.set_to_zero(), frozen)

    def regularizer_loss(self, params, base_params):
        """L2-SP penalty (reference: parameter_init.py L2-SP regularizer):
        alpha/2 * ||w - w_base||^2 on transferred params,
        beta/2 * ||w||^2 on the rest.
        """
        if self.alpha == 0.0 and self.beta == 0.0:
            return jnp.zeros(())
        flat_p = dict(_flatten(params))
        flat_b = dict(_flatten(base_params)) if base_params is not None else {}
        total = jnp.zeros(())
        for name, p in flat_p.items():
            b = flat_b.get(name)
            if b is not None and np.shape(b) == np.shape(p):
                total = total + 0.5 * self.alpha * jnp.sum(
                    (p - jax.lax.stop_gradient(jnp.asarray(b))) ** 2
                )
            else:
                total = total + 0.5 * self.beta * jnp.sum(p**2)
        return total


@dataclasses.dataclass
class CopyWeightsConfig:
    """Overwrite a wildcard-selected subset of weights from stored base
    values after each optimizer step — frozen-parameter training on a
    subset of weights (reference: fme/core/weight_ops.py:13
    CopyWeightsConfig).

    Exactly one of include/exclude selects the OVERWRITTEN (frozen) set.
    """

    include: list[str] | None = None
    exclude: list[str] | None = None

    def __post_init__(self):
        if (self.include is None) == (self.exclude is None):
            raise ValueError("provide exactly one of include or exclude")

    def build(self, base_params) -> "CopyWeights":
        return CopyWeights(self, base_params)


class CopyWeights:
    def __init__(self, config: CopyWeightsConfig, base_params):
        self._base = base_params
        self._mask = build_mask(
            base_params, include=config.include, exclude=config.exclude
        )

    def apply(self, params):
        """Return params with the selected subset reset to base values
        (slice-overwrite for shape-mismatched leaves, reference:
        weight_ops.py:135).
        """
        def merge(p, b, frozen):
            if not frozen:
                return p
            p_arr, b_arr = np.asarray(p), np.asarray(b)
            if p_arr.shape == b_arr.shape:
                return jnp.asarray(b_arr)
            out = p_arr.copy()
            slices = tuple(
                slice(0, min(ps, bs))
                for ps, bs in zip(p_arr.shape, b_arr.shape)
            )
            out[slices] = b_arr[slices]
            return jnp.asarray(out)

        return jax.tree_util.tree_map(merge, params, self._base, self._mask)
