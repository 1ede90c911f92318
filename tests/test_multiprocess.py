"""Multi-process (multi-host analog) training regression test.

Two real processes, each with 2 virtual CPU devices, run the full
training entry over a (data=4, h=1, w=1) mesh with per-process data
loading and root-only checkpointing — and must reproduce the
single-process (4-device) run's checkpoints and metrics.

This is the TPU-native equivalent of the reference's torchrun-on-CPU
parallel matrix plus its regression-vs-serial spatial-parallel tests
(/root/reference/Makefile:63-91,
fme/core/distributed/parallel_tests/test_regression.py).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from ace_tpu.testing import SyntheticData

from test_train_integration import ALL_NAMES, _config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiprocess_worker.py")


pytestmark = pytest.mark.medium_duration  # every test here is >3 s

def _run_workers(config_path, num_processes, devices_per_process, port):
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_", "ACE_TPU_"))
    }
    env["PYTHONPATH"] = REPO + os.pathsep + os.path.dirname(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(config_path), str(pid),
             str(num_processes), str(devices_per_process), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(num_processes)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, (
            f"worker exited with {p.returncode}:\n{out[-4000:]}"
        )
    return outputs


def _load_params(ckpt_path):
    from ace_tpu.stepper.checkpoint import load_train_checkpoint

    out = load_train_checkpoint(ckpt_path)
    import jax

    leaves, _ = jax.tree_util.tree_flatten(out["stepper"].params)
    return [np.asarray(x) for x in leaves]


def _read_metrics(experiment_dir):
    path = os.path.join(experiment_dir, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


@pytest.mark.slow
def test_multiprocess_training_matches_single_process(tmp_path):
    data = SyntheticData(tmp_path / "data", ALL_NAMES, n_time=12)

    def make_cfg(out_dir):
        cfg = _config(tmp_path, data, max_epochs=2)
        cfg["experiment_dir"] = str(tmp_path / out_dir)
        cfg["train_loader"]["batch_size"] = 4
        cfg["validation_loader"]["batch_size"] = 4
        cfg["mesh"] = {"data_parallel": 4, "h": 1, "w": 1}
        return cfg

    cfg_single = make_cfg("single")
    single_yaml = tmp_path / "single.yaml"
    yaml.safe_dump(cfg_single, open(single_yaml, "w"))
    _run_workers(single_yaml, num_processes=1, devices_per_process=4,
                 port=29517)

    cfg_multi = make_cfg("multi")
    multi_yaml = tmp_path / "multi.yaml"
    yaml.safe_dump(cfg_multi, open(multi_yaml, "w"))
    _run_workers(multi_yaml, num_processes=2, devices_per_process=2,
                 port=29518)

    # only the root process writes checkpoints and metrics
    single_dir = cfg_single["experiment_dir"]
    multi_dir = cfg_multi["experiment_dir"]
    for name in ("ckpt.msgpack", "best_ckpt.msgpack", "ema_ckpt.msgpack"):
        assert os.path.exists(
            os.path.join(multi_dir, "training_checkpoints", name)
        )

    # metrics trajectories match (loss per epoch)
    m_single = _read_metrics(single_dir)
    m_multi = _read_metrics(multi_dir)
    assert len(m_single) == len(m_multi) == 2
    for ms, mm in zip(m_single, m_multi):
        np.testing.assert_allclose(
            ms["train/loss"], mm["train/loss"], rtol=1e-4,
        )
        np.testing.assert_allclose(
            ms["val/loss"], mm["val/loss"], rtol=1e-4,
        )

    # final parameters match
    p_single = _load_params(
        os.path.join(single_dir, "training_checkpoints", "ckpt.msgpack")
    )
    p_multi = _load_params(
        os.path.join(multi_dir, "training_checkpoints", "ckpt.msgpack")
    )
    assert len(p_single) == len(p_multi)
    for a, b in zip(p_single, p_multi):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
