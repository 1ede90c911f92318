"""Spatial masks and input-channel dropout
(reference: fme/core/spatial_mask_provider.py, spatial_masking.py,
var_masking.py).

Ocean-only models carry static valid-region masks per variable; masked
regions of inputs/outputs are filled with constants. Variable masking is
training-time input channel dropout with batch-consistent masks.
"""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.typing_ import TensorDict, TensorMapping


class NameAndPrefixMatcher:
    """Exact + 'prefix_' matching (reference:
    fme/core/name_and_prefix_matcher.py:4): 'so' matches 'so' and 'so_0'.
    """

    def __init__(self, names: list[str]):
        self._names = set(names)
        self._prefixes = [f"{n}_" for n in names]

    def matches(self, name: str) -> bool:
        if name in self._names:
            return True
        return any(
            name.startswith(p) and name[len(p):].isdigit()
            for p in self._prefixes
        )

    def match(self, name: str) -> str | None:
        if name in self._names:
            return name
        for prefix in self._prefixes:
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                return prefix[:-1]
        return None


@dataclasses.dataclass
class StaticSpatialMasking:
    """Fill masked regions with a constant (reference:
    fme/core/spatial_masking.py:45 StaticSpatialMasking).

    masks: per-variable {name or prefix: [H, W] float mask}, 1 = valid.
    """

    masks: dict[str, np.ndarray]
    fill_value: float = 0.0

    def __call__(self, data: TensorMapping) -> TensorDict:
        matcher = NameAndPrefixMatcher(list(self.masks))
        out = dict(data)
        for name, value in data.items():
            key = matcher.match(name)
            if key is None:
                continue
            mask = jnp.asarray(self.masks[key])
            out[name] = jnp.where(mask != 0, value, self.fill_value)
        return out


@dataclasses.dataclass
class SpatialMaskProvider:
    """Supplies per-variable static masks from dataset fields
    (reference: fme/core/spatial_mask_provider.py:70).

    mask_names: {variable name or prefix: dataset mask variable name}.
    """

    mask_names: dict[str, str] = dataclasses.field(default_factory=dict)
    fill_value: float = 0.0

    def build(self, mask_data: TensorMapping) -> StaticSpatialMasking:
        masks = {
            key: np.asarray(mask_data[mask_var])
            for key, mask_var in self.mask_names.items()
        }
        return StaticSpatialMasking(masks=masks, fill_value=self.fill_value)


@dataclasses.dataclass
class VariableMaskingConfig:
    """Training-time input channel dropout with batch-consistent masks
    (reference: fme/core/var_masking.py — Bernoulli/uniform group masking;
    tile-consistency is automatic here since masks are sampled once per
    step, not per spatial shard).

    mode "bernoulli": each listed name dropped independently with `rate`.
    mode "uniform": a uniformly-sampled number (0..max_masked_vars) of the
    listed names is dropped.
    """

    names: list[str]
    mode: str = "bernoulli"  # "bernoulli" | "uniform"
    rate: float = 0.5
    max_masked_vars: int = 1
    fill_value: float = 0.0

    def apply(self, data: TensorMapping, rng: jax.Array) -> TensorDict:
        """Zero (fill) dropped channels; pure function of rng."""
        out = dict(data)
        n = len(self.names)
        if self.mode == "bernoulli":
            drops = jax.random.bernoulli(rng, self.rate, (n,))
        elif self.mode == "uniform":
            k_count, k_perm = jax.random.split(rng)
            n_drop = jax.random.randint(
                k_count, (), 0, self.max_masked_vars + 1
            )
            order = jax.random.permutation(k_perm, n)
            ranks = jnp.argsort(order)
            drops = ranks < n_drop
        else:
            raise ValueError(f"unknown masking mode {self.mode!r}")
        for i, name in enumerate(self.names):
            out[name] = jnp.where(drops[i], self.fill_value, data[name])
        return out
