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

__version__ = "0.2.0"

import os as _os

if _os.environ.get("FME_FORCE_CPU") or _os.environ.get("ACE_TPU_FORCE_CPU"):
    # force the CPU backend (reference: fme/core/device.py:13 force_cpu and
    # the FME_FORCE_CPU env flag). Done via jax.config because this image
    # pre-imports jax at interpreter startup, making JAX_PLATFORMS too late.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

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

# Library API surface (reference analog: fme/ace/__init__.py exports) —
# lazy imports keep `import ace_tpu` light; heavy modules load on use.

_EXPORTS = {
    # configs / entry points
    "TrainConfig": "ace_tpu.train.trainer",
    "InferenceConfig": "ace_tpu.inference.inference",
    "EvaluatorConfig": "ace_tpu.inference.evaluator",
    "DataLoaderConfig": "ace_tpu.data.loading",
    "XarrayDataConfig": "ace_tpu.data.dataset",
    "ConcatDatasetConfig": "ace_tpu.data.dataset",
    "MergeDatasetConfig": "ace_tpu.data.dataset",
    "InferenceDataLoaderConfig": "ace_tpu.data.inference",
    "StepperConfig": "ace_tpu.stepper.stepper",
    "CheckpointStepperConfig": "ace_tpu.stepper.stepper",
    "StepperOverrideConfig": "ace_tpu.stepper.stepper",
    "Stepper": "ace_tpu.stepper.stepper",
    "PrognosticState": "ace_tpu.stepper.stepper",
    "TrainStepper": "ace_tpu.stepper.train",
    "StepperTrainConfig": "ace_tpu.stepper.train",
    "load_stepper": "ace_tpu.stepper.checkpoint",
    "OptimizationConfig": "ace_tpu.core.optimization",
    "EMAConfig": "ace_tpu.core.optimization",
    "SchedulerConfig": "ace_tpu.core.optimization",
    "Slice": "ace_tpu.core.typing_",
    "TimeSlice": "ace_tpu.data.time",
    "RepeatedInterval": "ace_tpu.data.time",
    "TimeLengthProbabilities": "ace_tpu.core.schedule",
    "TimeLengthSchedule": "ace_tpu.core.schedule",
    "ModuleSelector": "ace_tpu.models.registry",
    "StepSelector": "ace_tpu.core.step.base",
    "CorrectorSelector": "ace_tpu.core.corrector.registry",
    "AtmosphereCorrectorConfig": "ace_tpu.core.corrector.atmosphere",
    "OceanConfig": "ace_tpu.core.ocean",
    "DatasetInfo": "ace_tpu.core.dataset_info",
    "LatLonCoordinates": "ace_tpu.core.coordinates",
    "HEALPixCoordinates": "ace_tpu.core.coordinates",
    "HybridSigmaPressureCoordinate": "ace_tpu.core.coordinates",
    "DepthCoordinate": "ace_tpu.core.coordinates",
    "from_dict": "ace_tpu.core.config",
    "to_dict": "ace_tpu.core.config",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'ace_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
