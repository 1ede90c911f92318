"""Data requirements passed from stepper to loaders
(reference: fme/ace/requirements.py:8).
"""

import dataclasses


@dataclasses.dataclass
class DataRequirements:
    names: list[str]
    n_timesteps: int


@dataclasses.dataclass
class PrognosticStateDataRequirements:
    """Requirements for the prognostic state of the model
    (reference: fme/ace/requirements.py:24).
    """

    names: list[str]
    n_timesteps: int
