"""Wildcard pattern application over parameter pytrees
(reference: fme/core/wildcard.py).

Parameter names are "/"-joined pytree paths (flax param dict keys), e.g.
"params/block_0/filter/weight". Unmatched rules raise, as in the
reference (:36 UnusedRuleError).
"""

import re

import jax


class UnusedRuleError(ValueError):
    pass


def wildcard_match(pattern: str, name: str) -> bool:
    regex = pattern.replace(".", r"\.").replace("*", ".*")
    return bool(re.match(f"^{regex}$", name))


def _first_match(patterns: list[str], name: str) -> str | None:
    for pattern in patterns:
        if wildcard_match(pattern, name):
            return pattern
    return None


def param_names(params) -> list[str]:
    """Flat "/"-joined names of every leaf in a parameter pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(k.key) for k in path) for path, _ in flat]


def build_mask(params, include: list[str] | None = None,
               exclude: list[str] | None = None):
    """Boolean mask pytree: True where a parameter is selected.

    With ``include``, only matching params are True; with ``exclude``, all
    but matching params are True. Raises UnusedRuleError for rules that
    match nothing (except the "*" catch-all).
    """
    if (include is None) == (exclude is None):
        raise ValueError("provide exactly one of include or exclude")
    rules = list(include if include is not None else exclude)
    remaining = set(rules) - {"*"}
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out_leaves = []
    for path, _ in flat:
        name = "/".join(str(k.key) for k in path)
        match = _first_match(rules, name)
        if match is not None:
            remaining.discard(match)
        selected = (match is not None) == (include is not None)
        out_leaves.append(selected)
    if remaining:
        raise UnusedRuleError(
            f"rules match no parameters: {sorted(remaining)}; parameters: "
            f"{param_names(params)}"
        )
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def apply_by_mask(params, other, mask, fn):
    """leafwise: fn(a, b) where mask else a."""
    return jax.tree_util.tree_map(
        lambda a, b, m: fn(a, b) if m else a, params, other, mask
    )
