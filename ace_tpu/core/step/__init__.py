"""Step layer: importing this package registers all step types
(reference: fme/core/step/__init__.py).
"""

from ace_tpu.core.step.base import (  # noqa: F401
    StepABC,
    StepArgs,
    StepConfigABC,
    StepOutput,
    StepSelector,
    StepperState,
)
from ace_tpu.core.step import (  # noqa: F401
    fcn3,
    multi_call,
    separate_radiation,
    single_module,
)
