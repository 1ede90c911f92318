"""Prepare a checkpoint for publication.

Reference: scripts/checkpoint_publication/process_ckpt.py (strips the
optimizer state and casts coordinate tensors to float32 before a
checkpoint is published). Here: strip optimizer/EMA/extra training
state from a training checkpoint, optionally promote the EMA weights
to the published parameters (the reference publishes EMA checkpoints),
and write a minimal self-describing stepper checkpoint.

CLI:
    python -m ace_tpu.data_process.process_checkpoint IN.msgpack \
        OUT.msgpack [--use-ema-weights]
"""

import argparse
import logging

from ace_tpu.stepper.checkpoint import load_msgpack, save_msgpack

logger = logging.getLogger(__name__)


def process_checkpoint(
    input_path: str,
    output_path: str,
    use_ema_weights: bool = False,
) -> dict:
    state = load_msgpack(input_path)
    if "stepper" not in state:
        raise ValueError(
            f"{input_path} is not an ace_tpu checkpoint (no 'stepper')"
        )
    stepper = dict(state["stepper"])
    if use_ema_weights:
        if "ema" not in state:
            raise ValueError(
                f"{input_path} carries no EMA state to promote"
            )
        stepper["params"] = state["ema"]
    stripped = sorted(set(state) - {"stepper"})
    if stripped:
        logger.info("stripping %s", stripped)
    payload = {"stepper": stepper}
    save_msgpack(output_path, payload)
    logger.info("wrote %s", output_path)
    return payload


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Strip training state from a checkpoint for "
        "publication."
    )
    parser.add_argument("input_path")
    parser.add_argument("output_path")
    parser.add_argument(
        "--use-ema-weights", action="store_true",
        help="Publish the EMA weights instead of the raw parameters",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    process_checkpoint(
        args.input_path, args.output_path,
        use_ema_weights=args.use_ema_weights,
    )


if __name__ == "__main__":
    main()
