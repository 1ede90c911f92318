"""Training entry point: ``python -m ace_tpu.train <config.yaml>``
(reference: fme/ace/train/train.py:73,95).
"""

import logging

from ace_tpu.core.cli import get_parser, prepare_config, prepare_directory
from ace_tpu.core.config import from_dict
from ace_tpu.core.timing import GlobalTimer
from ace_tpu.train.trainer import TrainConfig


def run_train_from_config(config: TrainConfig):
    config.logging.configure(config.experiment_dir)
    trainer = config.build_trainer()
    trainer.train()
    GlobalTimer.get_instance().log_durations()
    return trainer


def main(argv=None):
    from ace_tpu.parallel import distributed as dist

    # connect to the coordination service when launched multi-process
    # (reference: Distributed.context() at every entry __main__,
    # fme/core/distributed/distributed.py:67)
    dist.initialize()
    parser = get_parser()
    args = parser.parse_args(argv)
    data = prepare_config(args.yaml_config, args.override)
    config = from_dict(TrainConfig, data)
    if dist.is_root():
        prepare_directory(config.experiment_dir, data)
    dist.barrier("prepare_directory")
    logging.info("Starting training")
    return run_train_from_config(config)


if __name__ == "__main__":
    main()
