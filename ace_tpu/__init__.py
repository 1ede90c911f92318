"""ace_tpu: a TPU-native (JAX/XLA/Pallas) framework for training, running and
evaluating autoregressive ML emulators of weather/climate models.

This is a ground-up TPU-first rebuild of the capabilities of the `fme`
package (ai2cm/ace, reference mounted at /root/reference): SFNO-family
emulators stepped autoregressively on the sphere, physics-constraint
correctors, prescribed/slab ocean, multi-year inference with streaming
aggregation, and a YAML config-as-dataclass + registry user surface.

The compute path is pure JAX: models are pytrees of parameters, a step is a
pure function, rollouts are `lax.scan`, and scale-out is `jax.sharding.Mesh`
+ NamedSharding over a (data, h, w) mesh (reference: fme/core/distributed/).
"""

__version__ = "0.1.0"

from ace_tpu.core.metrics import (  # noqa: F401
    root_mean_squared_error,
    spherical_area_weights,
    weighted_mean,
    weighted_mean_bias,
    weighted_nanmean,
    weighted_std,
    weighted_sum,
)
from ace_tpu.core.normalizer import StandardNormalizer, get_normalizer  # noqa: F401
from ace_tpu.core.packer import Packer  # noqa: F401
