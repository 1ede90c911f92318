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
        choices=["train", "inference", "evaluator"],
    )
    parser.add_argument("--override", nargs="*", default=None)
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    if args.config_type == "train":
        from ace_tpu.train.trainer import TrainConfig as cls
    elif args.config_type == "inference":
        from ace_tpu.inference.inference import InferenceConfig as cls
    else:
        from ace_tpu.inference.evaluator import EvaluatorConfig as cls
    from_dict(cls, data)
    print(f"valid {args.config_type} config: {args.yaml_config}")


if __name__ == "__main__":
    main()
