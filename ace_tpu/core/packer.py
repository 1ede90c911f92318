"""Pack/unpack named variables to/from a channel-stacked array
(reference: fme/core/packer.py).

TPU-native difference: the canonical packed layout is channels-LAST
(``[batch, lat, lon, channel]``), so 1x1 convs, norms and MLPs contract
over the minor (lane) dimension on the MXU/VPU. ``axis=-1`` is therefore
the default here, where the reference stacks at axis 0/1 (channels-first).
"""

import jax.numpy as jnp

from ace_tpu.core.typing_ import TensorDict, TensorMapping


class DataShapesNotUniform(ValueError):
    """A set of tensors do not all have the same shape."""


class Packer:
    """Stacks named tensors along a new channel axis in a fixed order."""

    def __init__(self, names: list[str]):
        self.names = list(names)

    def pack(self, tensors: TensorMapping, axis: int = -1) -> jnp.ndarray:
        shape = next(iter(tensors.values())).shape
        for name in self.names:
            if tensors[name].shape != shape:
                raise DataShapesNotUniform(
                    f"Cannot pack tensors of different shapes. "
                    f"Expected {shape} got {tensors[name].shape} for {name!r}"
                )
        return jnp.stack([tensors[n] for n in self.names], axis=axis)

    def unpack(self, tensor: jnp.ndarray, axis: int = -1) -> TensorDict:
        parts = jnp.split(tensor, len(self.names), axis=axis)
        return {
            n: jnp.squeeze(p, axis=axis) for n, p in zip(self.names, parts)
        }

    def get_state(self) -> dict:
        return {"names": self.names}

    @classmethod
    def from_state(cls, state: dict) -> "Packer":
        return cls(state["names"])
