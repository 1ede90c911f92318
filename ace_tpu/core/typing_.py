"""Core typing aliases (reference: fme/core/typing_.py).

A ``TensorDict`` maps variable names (e.g. ``"air_temperature_0"``) to JAX
arrays of shape ``[batch, ...(time/ensemble)..., height, width]``. The dict
of named arrays is the universal data carrier across the framework; packing
to a single channel-stacked array happens only at the network boundary.
"""

import dataclasses
from collections.abc import Mapping
from typing import Union

import jax
import numpy as np

Array = Union[jax.Array, np.ndarray]
TensorDict = dict[str, jax.Array]
TensorMapping = Mapping[str, jax.Array]


@dataclasses.dataclass
class Slice:
    """Configuration of a python slice built from start, stop, and step
    (reference: fme/core/typing_.py Slice).
    """

    start: int | None = None
    stop: int | None = None
    step: int | None = None

    @property
    def slice(self) -> slice:
        return slice(self.start, self.stop, self.step)

    def contains(self, value: int) -> bool:
        start = self.start if self.start is not None else 0
        step = self.step if self.step is not None else 1
        if value < start:
            return False
        if self.stop is not None and value >= self.stop:
            return False
        return (value - start) % step == 0
