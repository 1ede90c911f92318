"""Every ported baseline config validates against its entry point's
config class (reference analog: the configs/baselines tree +
fme/ace/validate_config.py)."""

import glob
import os

import pytest
import yaml

from ace_tpu.core.config import from_dict

BASE = os.path.join(os.path.dirname(__file__), "..", "configs", "baselines")


def _config_cls(path: str):
    name = os.path.basename(path)
    if "downscaling" in path:
        if "train" in name:
            from ace_tpu.downscaling.train import DownscalingTrainConfig
            return DownscalingTrainConfig
        from ace_tpu.downscaling.evaluator import (
            DownscalingEvaluatorConfig,
        )
        return DownscalingEvaluatorConfig
    if "cm4-piControl" in path and os.sep + "uncoupled" not in path:
        if "train" in name or "finetune" in name:
            from ace_tpu.coupled.train import CoupledTrainConfig
            return CoupledTrainConfig
        from ace_tpu.coupled.inference import CoupledInferenceConfig
        return CoupledInferenceConfig
    if "train" in name or "finetune" in name:
        from ace_tpu.train.trainer import TrainConfig
        return TrainConfig
    if "inference" in name:
        from ace_tpu.inference.inference import InferenceConfig
        return InferenceConfig
    from ace_tpu.inference.evaluator import EvaluatorConfig
    return EvaluatorConfig


CONFIGS = sorted(glob.glob(BASE + "/**/*.yaml", recursive=True))


def test_corpus_is_nonempty():
    assert len(CONFIGS) >= 23


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, BASE) for p in CONFIGS]
)
def test_baseline_config_validates(path):
    with open(path) as f:
        data = yaml.safe_load(f)
    from_dict(_config_cls(path), data)
