"""Worker process for tests/test_multiprocess.py.

Runs the REAL training entry (`ace_tpu.train.train.main`) as one process
of a multi-process CPU launch (the TPU-native analog of the reference's
`make test_parallel` torchrun-on-CPU matrix, /root/reference/Makefile:63-69).

Usage:
    python multiprocess_worker.py <config.yaml> <process_id> \
        <num_processes> <devices_per_process> <port>
"""

import os
import sys


def main():
    config_path, pid, nproc, ndev, port = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    if int(nproc) > 1:
        os.environ["ACE_TPU_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        os.environ["ACE_TPU_NUM_PROCESSES"] = nproc
        os.environ["ACE_TPU_PROCESS_ID"] = pid

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ace_tpu.train.train import main as train_main

    train_main([config_path])


if __name__ == "__main__":
    main()
