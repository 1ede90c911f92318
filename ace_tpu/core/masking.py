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
class StaticSpatialMaskingConfig:
    """Replace statically masked regions of step inputs with a fill
    value (reference: fme/core/spatial_masking.py:45
    StaticSpatialMaskingConfig; wired via StepperConfig.input_masking,
    fme/ace/stepper/single_module.py:536).

    mask_value: value of the mask variable IN masked regions (0 or 1).
    fill_value: constant fill, or "mean" for per-variable normalizer
        means.
    exclude_names_and_prefixes: variables to leave untouched.
    """

    mask_value: int = 0
    fill_value: float | str = 0.0
    exclude_names_and_prefixes: list[str] | None = None

    def __post_init__(self):
        if self.mask_value not in (0, 1):
            raise ValueError(
                f"mask_value must be 0 or 1, got {self.mask_value}"
            )
        if isinstance(self.fill_value, str) and self.fill_value != "mean":
            raise ValueError(
                'fill_value must be a float or "mean", got '
                f"{self.fill_value!r}"
            )

    def build(self, mask_provider: "MaskProvider | None", means=None):
        """Input-masking callable over a TensorMapping; identity when no
        masks exist in the dataset."""
        if mask_provider is None or not mask_provider.masks:
            return lambda data: dict(data)
        exclude = NameAndPrefixMatcher(
            self.exclude_names_and_prefixes or []
        )
        masks_j = {
            k: jnp.asarray(v) for k, v in mask_provider.masks.items()
        }
        use_mean = self.fill_value == "mean"
        if use_mean and means is None:
            raise ValueError('fill_value="mean" requires normalizer means')
        mv = self.mask_value
        fill = None if use_mean else float(self.fill_value)

        def apply(data: TensorMapping) -> TensorDict:
            out = dict(data)
            for name, value in data.items():
                if exclude.matches(name):
                    continue
                mask = mask_provider.get_mask_for(name)
                if mask is None:
                    continue
                key = next(
                    k for k, v in mask_provider.masks.items() if v is mask
                )
                fv = (means.get(name, 0.0) if use_mean else fill)
                # reference rounds the mask before comparing
                # (spatial_masking.py:25 replace_on_mask)
                rounded = jnp.round(masks_j[key]).astype(jnp.int32)
                out[name] = jnp.where(rounded == mv, fv, value)
            return out

        return apply


class MaskProvider:
    """Dataset-derived static masks keyed "mask_*"
    (reference: fme/core/spatial_mask_provider.py:70 SpatialMaskProvider).
    Priority for variable ``name``: mask_{name} > mask_{level-suffix} >
    mask_2d.
    """

    def __init__(self, masks: dict[str, np.ndarray] | None = None):
        masks = masks or {}
        for key in masks:
            if not key.startswith("mask_"):
                raise ValueError(f"mask name {key!r} must start with mask_")
        self.masks = {k: np.asarray(v) for k, v in masks.items()}

    def get_mask_for(self, name: str) -> np.ndarray | None:
        if f"mask_{name}" in self.masks:
            return self.masks[f"mask_{name}"]
        parts = name.rsplit("_", 1)
        if len(parts) == 2 and parts[1].isdigit():
            level_mask = f"mask_{parts[1]}"
            if level_mask in self.masks:
                return self.masks[level_mask]
        elif "mask_2d" in self.masks:
            return self.masks["mask_2d"]
        return None

    def build_output_masker(self, fill_value: float = float("nan")):
        """Callable filling masked regions of matching output fields with
        NaN (reference: fme/core/spatial_mask_provider.py:116 fills
        outputs with NaN; configs on masked data pair this with
        ``input_masking`` so the next step's network inputs are refilled
        with a constant). Returns identity when no masks exist.
        """
        if not self.masks:
            return lambda data: data
        masks_j = {k: jnp.asarray(v) for k, v in self.masks.items()}
        provider = self

        def apply(data: TensorMapping) -> TensorDict:
            out = dict(data)
            for name, value in data.items():
                mask = provider.get_mask_for(name)
                if mask is None:
                    continue
                key = next(
                    k for k, v in self.masks.items() if v is mask
                )
                out[name] = jnp.where(
                    masks_j[key] != 0, value, fill_value
                )
            return out

        return apply

    def get_state(self) -> dict:
        return {
            "masks": {k: v.tolist() for k, v in self.masks.items()}
        }

    @classmethod
    def from_state(cls, state: dict) -> "MaskProvider":
        return cls(
            {k: np.asarray(v) for k, v in state.get("masks", {}).items()}
        )

    def __eq__(self, other):
        if not isinstance(other, MaskProvider):
            return False
        if set(self.masks) != set(other.masks):
            return False
        return all(
            np.array_equal(self.masks[k], other.masks[k])
            for k in self.masks
        )


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
class BernoulliMaskingConfig:
    """All-or-nothing Bernoulli masking of a channel pool
    (reference: fme/core/var_masking.py BernoulliMaskingConfig): one draw
    per step drops the whole pool with probability ``rate``.
    """

    rate: float

    def __post_init__(self):
        if not 0.0 <= self.rate <= 1.0:
            raise ValueError(f"masking rate must be in [0, 1]: {self.rate}")

    def sample_drops(self, rng: jax.Array, n: int) -> jnp.ndarray:
        fired = jax.random.bernoulli(rng, self.rate)
        return jnp.broadcast_to(fired, (n,))


@dataclasses.dataclass
class UniformMaskingConfig:
    """Drop k random channels, k uniform in [0, min(max_masked_vars, n)]
    (reference: fme/core/var_masking.py UniformMaskingConfig).
    """

    max_masked_vars: int

    def __post_init__(self):
        if (
            not isinstance(self.max_masked_vars, int)
            or isinstance(self.max_masked_vars, bool)
            or self.max_masked_vars < 0
        ):
            raise ValueError(
                "max_masked_vars must be a non-negative int: "
                f"{self.max_masked_vars!r}"
            )

    def sample_drops(self, rng: jax.Array, n: int) -> jnp.ndarray:
        if n == 0:
            return jnp.zeros((0,), bool)
        k_count, k_perm = jax.random.split(rng)
        max_n = min(self.max_masked_vars, n)
        k = jax.random.randint(k_count, (), 0, max_n + 1)
        ranks = jnp.argsort(jax.random.permutation(k_perm, n))
        return ranks < k


MaskingConfig = BernoulliMaskingConfig | UniformMaskingConfig


@dataclasses.dataclass
class MaskingGroupConfig:
    """A named group of variables masked together by one scheme
    (reference: fme/core/var_masking.py MaskingGroupConfig).
    """

    variables: list[str]
    masking: MaskingConfig

    def __post_init__(self):
        if len(self.variables) == 0:
            raise ValueError("masking group variables must be non-empty")


@dataclasses.dataclass
class VariableMaskingConfig:
    """Synthetic training-time input variable masking
    (reference: fme/core/var_masking.py VariableMaskingConfig).

    Channels in an override group are governed solely by that group's
    scheme; remaining channels by ``default`` (which defaults to masking
    nothing). Pools are disjoint, so each group rate is exact. The mask is
    broadcast across the batch: every sample drops the same channels.
    """

    default: MaskingConfig = dataclasses.field(
        default_factory=lambda: UniformMaskingConfig(0)
    )
    override_groups: list[MaskingGroupConfig] = dataclasses.field(
        default_factory=list
    )

    def __post_init__(self):
        seen: set[str] = set()
        for group in self.override_groups:
            for name in group.variables:
                if name in seen:
                    raise ValueError(
                        f"variable {name!r} in more than one masking group"
                    )
                seen.add(name)

    def build(self, names: list[str]) -> "VariableMasking":
        """Build for the packed channel ``names``; raises on any grouped
        variable absent from ``names`` (typos fail loudly at build time).
        """
        valid = set(names)
        unknown = [
            name
            for group in self.override_groups
            for name in group.variables
            if name not in valid
        ]
        if unknown:
            raise ValueError(
                f"masking group variable(s) {unknown} not in packed "
                f"input channels {names}"
            )
        grouped = {
            name for group in self.override_groups for name in group.variables
        }
        ungrouped = [name for name in names if name not in grouped]
        pools: list[tuple[list[str], MaskingConfig]] = [
            (ungrouped, self.default)
        ]
        pools += [(g.variables, g.masking) for g in self.override_groups]
        return VariableMasking(names, pools)


class VariableMasking:
    """Runtime union of masking pools over a fixed channel list; pure
    function of the step rng (the JAX analogue of the reference's private
    CPU generator).
    """

    def __init__(self, names, pools):
        self._names = list(names)
        self._pools = pools

    @property
    def names(self) -> list[str]:
        return self._names

    def sample_presence(self, rng: jax.Array) -> jnp.ndarray:
        """Per-channel presence (True = keep), aligned with ``names``."""
        presence = jnp.ones((len(self._names),), bool)
        keys = jax.random.split(rng, len(self._pools))
        for key, (pool_names, scheme) in zip(keys, self._pools):
            if not pool_names:
                continue
            drops = scheme.sample_drops(key, len(pool_names))
            idx = jnp.asarray(
                [self._names.index(n) for n in pool_names], jnp.int32
            )
            presence = presence.at[idx].set(~drops)
        return presence
