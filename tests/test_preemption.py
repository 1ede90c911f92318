"""Preemption handling and public API surface (reference test strategy
items: fme/core/distributed/test_shutdown.py signal tests and
fme/fme/test_symbols.py public-export checks, SURVEY.md section 4)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def test_all_lazy_exports_resolve():
    """Every name in the lazy export table must import (the reference's
    test_symbols.py checks the same for `import fme`)."""
    import ace_tpu

    table = ace_tpu._EXPORTS
    assert len(table) > 10
    assert set(table) <= set(dir(ace_tpu))
    for name in table:
        obj = getattr(ace_tpu, name)
        assert obj is not None, name
    # unknown names raise AttributeError, not KeyError
    try:
        ace_tpu.no_such_symbol
    except AttributeError:
        pass
    else:
        raise AssertionError("expected AttributeError")


@pytest.mark.slow
def test_sigterm_saves_restart_checkpoint(tmp_path):
    """SIGTERM mid-training must save a resumable checkpoint and exit
    with 128+15 (the reference handles preemption the same way via its
    shutdown module)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ace_tpu.testing import SyntheticData

    data = SyntheticData(tmp_path / "data", ["a", "b"], n_time=10)
    cfg = {
        "experiment_dir": str(tmp_path / "out"),
        "max_epochs": 500,  # far more than can finish; signal interrupts
        "save_checkpoint": True,
        "seed": 0,
        "logging": {"log_to_screen": True, "log_to_file": False},
        "train_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2, "num_data_workers": 1,
        },
        "validation_loader": {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": 2, "num_data_workers": 1,
        },
        "optimization": {"lr": 1e-3},
        "stepper_training": {"n_forward_steps": 1, "loss": {"type": "MSE"}},
        "stepper": {"step": {"type": "single_module", "config": {
            "builder": {"type": "MLP", "config": {"hidden_channels": 4}},
            "in_names": ["a", "b"], "out_names": ["a", "b"],
            "normalization": {"network": {
                "means": {"a": 0.0, "b": 0.0},
                "stds": {"a": 1.0, "b": 1.0},
            }},
        }}},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ACE_TPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "ace_tpu.train", str(cfg_path)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    ckpt = tmp_path / "out" / "training_checkpoints" / "ckpt.msgpack"
    # wait until at least one epoch has been written, then preempt
    deadline = time.time() + 240
    while time.time() < deadline and not ckpt.exists():
        if proc.poll() is not None:
            raise AssertionError(
                f"training exited early:\n{proc.stdout.read()[-2000:]}"
            )
        time.sleep(1)
    assert ckpt.exists(), "no checkpoint appeared within the deadline"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 128 + signal.SIGTERM, out[-2000:]
    assert "saving restart checkpoint" in out

    # the checkpoint is loadable and carries everything resume needs:
    # optimizer state, EMA/optimization trackers, and the mid-epoch
    # batch counter (so resume does not replay trained batches)
    import json

    from ace_tpu.stepper.checkpoint import load_msgpack

    state = load_msgpack(str(ckpt))
    assert "stepper" in state
    assert "optimizer" in state
    extra = json.loads(state["extra"]) if isinstance(
        state.get("extra"), (str, bytes)
    ) else state.get("extra", {})
    for key in ("epoch", "num_batches_seen", "epoch_batches_seen",
                "best_validation_loss", "best_inference_error",
                "optimization"):
        assert key in extra, key
    assert "lr_scale" in extra["optimization"]
