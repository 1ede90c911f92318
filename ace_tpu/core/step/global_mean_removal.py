"""Global-mean removal transform for step inputs/outputs
(reference: fme/core/step/global_mean_removal.py — shared and per-channel
variants with optional extra input channels).

``forward_transform`` shifts each listed field's cellwise spatial mean to
its climatology mean (normalizer mean) before normalization, so the
network sees approximately zero-mean fields; ``inverse_transform``
restores the removed offsets on outputs. Optionally, the removed
(normalized) means are appended as uniform extra input channels so the
network still knows the global state.
"""

import dataclasses
from typing import Literal

import jax.numpy as jnp

from ace_tpu.core.normalizer import StandardNormalizer
from ace_tpu.core.typing_ import TensorDict, TensorMapping


_EXTRA_SUFFIX = "_global_mean"


def extra_channel_name(name: str) -> str:
    return f"{name}{_EXTRA_SUFFIX}"


def extra_channel_source_field(name: str) -> str | None:
    """Source field of a GMR extra sentinel channel, or None if ``name``
    is not a sentinel — sentinels share their source's data mask
    (reference: single_module.py _build_channel_mask_dict).
    """
    if name.endswith(_EXTRA_SUFFIX):
        return name[: -len(_EXTRA_SUFFIX)]
    return None


@dataclasses.dataclass
class GlobalMeanRemovalState:
    shifts: TensorDict
    extras: TensorDict


@dataclasses.dataclass
class GlobalMeanRemovalConfig:
    """(reference: global_mean_removal.py Shared/PerChannel configs).

    mode "per_channel": each listed field gets its own offset.
    mode "shared": a single offset from ``reference_field`` applies to all
    listed fields.
    """

    names: list[str]
    mode: Literal["per_channel", "shared"] = "per_channel"
    reference_field: str | None = None
    append_as_input: bool = False

    def __post_init__(self):
        if self.mode == "shared" and self.reference_field is None:
            raise ValueError("shared mode requires reference_field")

    def validate_names(self, in_names, out_names):
        for name in self.names:
            if name not in in_names and name not in out_names:
                raise ValueError(
                    f"global_mean_removal name {name!r} not in in/out names"
                )
        if (
            self.mode == "shared"
            and self.reference_field not in in_names
        ):
            raise ValueError("reference_field must be an input variable")

    def build(self, normalizer: StandardNormalizer) -> "GlobalMeanRemoval":
        return GlobalMeanRemoval(self, normalizer)


class GlobalMeanRemoval:
    def __init__(self, config: GlobalMeanRemovalConfig,
                 normalizer: StandardNormalizer):
        self.config = config
        self._normalizer = normalizer

    @property
    def extra_channel_names(self) -> list[str]:
        if not self.config.append_as_input:
            return []
        if self.config.mode == "shared":
            return [extra_channel_name(self.config.reference_field)]
        return [extra_channel_name(n) for n in self.config.names]

    def _spatial_mean(self, field):
        return jnp.mean(field, axis=tuple(range(1, field.ndim)))

    def forward_transform(
        self, input: TensorMapping
    ) -> tuple[TensorDict, GlobalMeanRemovalState]:
        cfg = self.config
        result = dict(input)
        shifts: TensorDict = {}
        extras: TensorDict = {}
        if cfg.mode == "shared":
            ref = input[cfg.reference_field]
            sample_mean = self._spatial_mean(ref)
            offset = self._normalizer.means[cfg.reference_field] - sample_mean
            spatial_shape = ref.shape[1:]
            if cfg.append_as_input:
                normalized_mean = (
                    -offset / self._normalizer.stds[cfg.reference_field]
                )
                extras[extra_channel_name(cfg.reference_field)] = (
                    jnp.broadcast_to(
                        normalized_mean.reshape(
                            -1, *(1,) * len(spatial_shape)
                        ),
                        (ref.shape[0], *spatial_shape),
                    )
                )
            for name in cfg.names:
                if name in result:
                    t = result[name]
                    b = offset.reshape(-1, *(1,) * (t.ndim - 1))
                    result[name] = t + b
                shifts[name] = offset
        else:
            for name in cfg.names:
                if name not in input:
                    continue
                t = input[name]
                sample_mean = self._spatial_mean(t)
                offset = self._normalizer.means[name] - sample_mean
                b = offset.reshape(-1, *(1,) * (t.ndim - 1))
                result[name] = t + b
                shifts[name] = offset
                if cfg.append_as_input:
                    normalized_mean = -offset / self._normalizer.stds[name]
                    extras[extra_channel_name(name)] = jnp.broadcast_to(
                        b * 0 + normalized_mean.reshape(
                            -1, *(1,) * (t.ndim - 1)
                        ),
                        t.shape,
                    )
        return result, GlobalMeanRemovalState(shifts=shifts, extras=extras)

    def inverse_transform(self, output: TensorDict,
                          state: GlobalMeanRemovalState) -> TensorDict:
        result = dict(output)
        for name, shift in state.shifts.items():
            if name not in result:
                continue
            t = result[name]
            b = shift.reshape(-1, *(1,) * (t.ndim - 1))
            result[name] = t - b
        return result
