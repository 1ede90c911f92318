"""Coupled evaluator CLI: ``python -m ace_tpu.coupled.evaluator <yaml>``
(reference: fme/coupled/inference/evaluator.py:442 main).

Same configuration surface as coupled inference with paired aggregation
against the target data forced on (the reference ships evaluator as a
separate entry point; here it is the ``evaluate`` mode of the coupled
inference loop).
"""

import logging

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.coupled.inference import (
    CoupledInferenceConfig,
    run_coupled_inference,
)


def main(argv=None):
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    data["evaluate"] = True
    config = from_dict(CoupledInferenceConfig, data)
    prepare_directory(config.experiment_dir, data)
    config.logging.configure(config.experiment_dir)
    logging.info("Starting coupled evaluator")
    return run_coupled_inference(config)


if __name__ == "__main__":
    main()
