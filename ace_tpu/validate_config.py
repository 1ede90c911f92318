"""Config validation entry: ``python -m ace_tpu.validate_config <yaml>
--config_type train|inference|evaluator``
(reference: fme/ace/validate_config.py:18).
"""

import argparse

from ace_tpu.core.cli import prepare_config
from ace_tpu.core.config import from_dict


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("yaml_config", type=str)
    parser.add_argument(
        "--config_type", default="train",
        choices=[
            "train", "inference", "evaluator", "coupled_train",
            "coupled_inference", "downscaling_train",
            "downscaling_predict", "downscaling_evaluator",
        ],
    )
    parser.add_argument("--override", nargs="*", default=None)
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    if args.config_type == "train":
        from ace_tpu.train.trainer import TrainConfig as cls
    elif args.config_type == "inference":
        from ace_tpu.inference.inference import InferenceConfig as cls
    elif args.config_type == "evaluator":
        from ace_tpu.inference.evaluator import EvaluatorConfig as cls
    elif args.config_type == "coupled_train":
        from ace_tpu.coupled.train import CoupledTrainConfig as cls
    elif args.config_type == "coupled_inference":
        from ace_tpu.coupled.inference import (
            CoupledInferenceConfig as cls,
        )
    elif args.config_type == "downscaling_train":
        from ace_tpu.downscaling.train import (
            DownscalingTrainConfig as cls,
        )
    elif args.config_type == "downscaling_predict":
        from ace_tpu.downscaling.predict import DownscalerConfig as cls
    else:
        from ace_tpu.downscaling.evaluator import (
            DownscalingEvaluatorConfig as cls,
        )
    from_dict(cls, data)
    print(f"valid {args.config_type} config: {args.yaml_config}")


if __name__ == "__main__":
    main()
