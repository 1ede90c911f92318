"""Self-describing checkpoint serialization
(reference: fme/ace/stepper/single_module.py:1337 get_state / :1909
load_stepper; fme/core/generics/trainer.py:668 atomic save).

A checkpoint is a single msgpack file (flax.serialization) embedding the
full stepper config + dataset info + parameter pytree (+ optimizer/EMA
state for training checkpoints), so it can be rebuilt with no external
config. Writes are atomic (tmp + os.replace), matching the reference's
preemption-safe behavior.
"""

import json
import os
import uuid
from typing import Any

import jax
import numpy as np
from flax import serialization

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.step.base import StepSelector
from ace_tpu.stepper.stepper import Stepper, StepperConfig


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_msgpack(path: str, payload: dict):
    """Atomic msgpack write (tmp file + rename)."""
    blob = serialization.msgpack_serialize(payload)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_msgpack(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def get_stepper_state(stepper: Stepper, config: StepperConfig) -> dict:
    """Serializable stepper state: config + dataset_info + params +
    training-job provenance (reference: single_module.py:1337 get_state)."""
    return {
        "config": json.dumps(config.get_state()),
        "dataset_info": json.dumps(stepper.step.dataset_info.get_state()),
        "params": _to_numpy_tree(stepper.params),
        "training_history": json.dumps(stepper.training_history.get_state()),
    }


def save_stepper(path: str, stepper: Stepper, config: StepperConfig):
    save_msgpack(path, {"stepper": get_stepper_state(stepper, config)})


def build_stepper_from_state(state: dict) -> tuple[Stepper, StepperConfig]:
    config = StepperConfig.from_state(json.loads(state["config"]))
    dataset_info = DatasetInfo.from_state(json.loads(state["dataset_info"]))
    stepper = config.get_stepper(dataset_info)
    # restore params with correct pytree structure via an abstract template
    # init (eval_shape runs no device computation — a real init here would
    # execute the full model forward just to throw the values away)
    template = jax.eval_shape(
        stepper.step.init_params, jax.random.PRNGKey(0)
    )
    stepper.params = serialization.from_state_dict(template, state["params"])
    if "training_history" in state:
        from ace_tpu.core.training_history import TrainingHistory

        stepper.training_history = TrainingHistory.from_state(
            json.loads(state["training_history"])
        )
    return stepper, config


def load_stepper(path: str, override=None) -> Stepper:
    """Rebuild a stepper from a checkpoint file
    (reference: fme/ace/stepper/single_module.py:1909), optionally
    applying a StepperOverrideConfig (:1848) to the stored step config.
    """
    payload = load_msgpack(path)
    state = payload["stepper"]
    if override is not None:
        state = dict(state)
        config = json.loads(state["config"])
        config = override.apply(config)
        state["config"] = json.dumps(config)
    stepper, _ = build_stepper_from_state(state)
    return stepper


def save_train_checkpoint(
    path: str,
    stepper: Stepper,
    config: StepperConfig,
    opt_state: Any = None,
    ema_params: Any = None,
    extra: dict | None = None,
):
    """Full training checkpoint (reference: trainer.py:680-692 layout)."""
    payload: dict = {"stepper": get_stepper_state(stepper, config)}
    if opt_state is not None:
        payload["optimizer"] = _to_numpy_tree(
            serialization.to_state_dict(opt_state)
        )
    if ema_params is not None:
        payload["ema"] = _to_numpy_tree(ema_params)
    if extra:
        payload["extra"] = json.dumps(extra)
    save_msgpack(path, payload)


def load_train_checkpoint(path: str) -> dict:
    payload = load_msgpack(path)
    stepper, config = build_stepper_from_state(payload["stepper"])
    out: dict = {"stepper": stepper, "config": config}
    if "optimizer" in payload:
        out["optimizer_state_dict"] = payload["optimizer"]
    if "ema" in payload:
        template = stepper.params
        out["ema_params"] = serialization.from_state_dict(
            template, payload["ema"]
        )
    if "extra" in payload:
        out["extra"] = json.loads(payload["extra"])
    return out
