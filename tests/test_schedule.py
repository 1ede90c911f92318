"""IntSchedule / TimeLengthProbabilities tests (reference:
fme/core/dataset/test_schedule.py).
"""

import numpy as np
import pytest

from ace_tpu.core.schedule import (
    IntMilestone,
    IntSchedule,
    TimeLengthProbabilities,
    TimeLengthProbability,
)


def test_int_schedule_milestones():
    sched = IntSchedule(
        start_value=1,
        milestones=[IntMilestone(epoch=2, value=3), IntMilestone(epoch=5, value=8)],
    )
    assert [sched.get_value(e) for e in range(7)] == [1, 1, 3, 3, 3, 8, 8]
    assert sched.max_value == 8


def test_int_schedule_validation():
    with pytest.raises(ValueError):
        IntSchedule(start_value=0, milestones=[
            IntMilestone(epoch=5, value=1), IntMilestone(epoch=2, value=2),
        ])


def test_time_length_probabilities_sampling():
    tlp = TimeLengthProbabilities(outcomes=[
        TimeLengthProbability(steps=1, probability=0.5),
        TimeLengthProbability(steps=4, probability=0.5),
    ])
    tlp.seed_rng(0)
    samples = [tlp.sample() for _ in range(200)]
    assert set(samples) == {1, 4}
    assert tlp.max_n_forward_steps == 4
    frac = np.mean([s == 4 for s in samples])
    assert 0.3 < frac < 0.7
    # constant case
    const = TimeLengthProbabilities.from_constant(3)
    assert const.is_constant and const.sample() == 3
