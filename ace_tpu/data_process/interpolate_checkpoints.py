"""Interpolate between two model checkpoints and analyze the result.

Reference: scripts/interpolate_models/run.py. The reference workflow
linearly interpolates two trained models' weights over a grid of
interpolants, evaluates each, and plots time-mean pattern RMSE vs the
interpolant against the ensemble noise floor. The beaker/wandb plumbing
is replaced by local files:

- ``interpolate``: load two ace_tpu stepper checkpoints, write one new
  self-describing checkpoint per interpolant weight (lambda * A +
  (1 - lambda) * B over the parameter pytree; configs must match).
- ``pattern_rmse_over_interpolant``: given per-interpolant time-mean
  bias maps [interp, Y, X], the area-weighted pattern RMSE of each
  interpolant relative to a target index (run.py:126-149).

CLI:
    python -m ace_tpu.data_process.interpolate_checkpoints \
        --checkpoint-a a.msgpack --checkpoint-b b.msgpack \
        --weights 0 0.25 0.5 0.75 1.0 --output-dir interp/
"""

import argparse
import logging
import os

import jax
import numpy as np

from ace_tpu.stepper.checkpoint import load_msgpack, save_msgpack

logger = logging.getLogger(__name__)


def interpolate_tree(tree_a, tree_b, weight: float):
    """weight * A + (1 - weight) * B, leaf-wise; non-float leaves (step
    counters etc.) are taken from A."""

    def lerp(a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.shape != b.shape:
            raise ValueError(
                f"parameter shape mismatch: {a.shape} vs {b.shape}"
            )
        if not np.issubdtype(a.dtype, np.floating):
            return a
        return (weight * a + (1.0 - weight) * b).astype(a.dtype)

    return jax.tree_util.tree_map(lerp, tree_a, tree_b)


def interpolate(
    checkpoint_a: str,
    checkpoint_b: str,
    weights,
    output_dir: str,
) -> list:
    """Write one checkpoint per interpolant weight; returns the paths."""
    state_a = load_msgpack(checkpoint_a)
    state_b = load_msgpack(checkpoint_b)
    os.makedirs(output_dir, exist_ok=True)

    def params_holder(state):
        # stepper checkpoints nest the pytree under "stepper"; training
        # checkpoints additionally carry optimizer/EMA state alongside
        return state["stepper"] if "stepper" in state else state

    written = []
    for w in weights:
        state = dict(state_a)
        holder_a = params_holder(state_a)
        holder_b = params_holder(state_b)
        new_holder = dict(holder_a)
        new_holder["params"] = interpolate_tree(
            holder_a["params"], holder_b["params"], float(w)
        )
        if "stepper" in state:
            state["stepper"] = new_holder
        else:
            state = new_holder
        path = os.path.join(output_dir, f"interp_{float(w):.4f}.msgpack")
        save_msgpack(path, state)
        written.append(path)
        logger.info("wrote %s", path)
    return written


def pattern_rmse(bias_map: np.ndarray, area: np.ndarray) -> float:
    """Area-weighted RMS of a bias map (reference run.py:126-135)."""
    w = area / area.sum()
    return float(np.sqrt((np.square(bias_map) * w).sum()))


def pattern_rmse_over_interpolant(
    maps: np.ndarray, area: np.ndarray, target_index: int
) -> list:
    """Pattern RMSE of each interpolant's time-mean map relative to the
    target interpolant (reference run.py:138-149)."""
    return [
        pattern_rmse(maps[i] - maps[target_index], area)
        for i in range(maps.shape[0])
    ]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Linearly interpolate two stepper checkpoints."
    )
    parser.add_argument("--checkpoint-a", required=True)
    parser.add_argument("--checkpoint-b", required=True)
    parser.add_argument(
        "--weights", type=float, nargs="+",
        default=[0.0, 0.25, 0.5, 0.75, 1.0],
        help="Interpolant weights on checkpoint A",
    )
    parser.add_argument("--output-dir", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    for path in interpolate(
        args.checkpoint_a, args.checkpoint_b, args.weights,
        args.output_dir,
    ):
        print(path)


if __name__ == "__main__":
    main()
