"""Extract a standalone component checkpoint from a coupled experiment.

Reference: scripts/coupled/create_decoupled_checkpoint.py — pulls the
atmosphere or ocean Stepper state out of a CoupledStepper training
checkpoint so it can run with the single-component inference/evaluator
entries. Here coupled training already checkpoints each component as a
self-describing stepper file (ace_tpu/coupled/train.py), so this tool
validates the component checkpoint by rebuilding the stepper, strips
any training-only payload fields, and re-saves it standalone.

CLI:
    python -m ace_tpu.data_process.create_decoupled_checkpoint \
        --component atmosphere \
        --input_path <coupled experiment_dir | component .msgpack> \
        --output_path atmosphere.msgpack
"""

import argparse
import logging
import os

from ace_tpu.stepper.checkpoint import (
    build_stepper_from_state,
    load_msgpack,
    save_msgpack,
)

logger = logging.getLogger(__name__)

_COMPONENTS = ("atmosphere", "ocean")


def resolve_component_path(input_path: str, component: str) -> str:
    """Accept either a component checkpoint file or a coupled
    experiment directory containing training_checkpoints/."""
    if os.path.isdir(input_path):
        candidate = os.path.join(
            input_path, "training_checkpoints", f"{component}_ckpt.msgpack"
        )
        if not os.path.exists(candidate):
            raise FileNotFoundError(
                f"no {component} checkpoint at {candidate}"
            )
        return candidate
    return input_path


def create_decoupled_checkpoint(
    input_path: str, output_path: str, component: str
) -> str:
    if component not in _COMPONENTS:
        raise ValueError(
            f"unrecognized component {component!r}; options: {_COMPONENTS}"
        )
    path = resolve_component_path(input_path, component)
    payload = load_msgpack(path)
    if "stepper" not in payload:
        raise ValueError(f"{path} is not a stepper checkpoint")
    # validate: the embedded config must rebuild a working stepper
    build_stepper_from_state(payload["stepper"])
    save_msgpack(output_path, {"stepper": payload["stepper"]})
    logger.info("wrote decoupled %s checkpoint to %s", component, output_path)
    return output_path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Extract a component checkpoint from a coupled run."
    )
    parser.add_argument("--component", required=True, choices=_COMPONENTS)
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    create_decoupled_checkpoint(
        args.input_path, args.output_path, args.component
    )


if __name__ == "__main__":
    main()
