"""Test harness config (modeled on the reference's conftest:
/root/reference/conftest.py — speed tiers, timeouts, virtual multi-device).

Runs all tests on a virtual 8-device CPU backend so sharding/mesh tests can
run without TPU hardware. Must set XLA flags before jax is imported.
"""

import os

# This image pre-imports jax at interpreter startup (axon sitecustomize),
# so env vars alone are too late; switch the platform via jax.config, and
# set XLA_FLAGS before the (lazy) CPU client is created.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import signal  # noqa: E402

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--fast", action="store_true", default=False,
        help="skip tests marked slow",
    )
    parser.addoption(
        "--very-fast", action="store_true", default=False,
        help="run only very fast tests (skips slow + medium_duration)",
    )


def pytest_collection_modifyitems(config, items):
    very_fast = config.getoption("--very-fast")
    if not (very_fast or config.getoption("--fast")):
        return
    skip_slow = pytest.mark.skip(reason="skipping slow test")
    skip_medium = pytest.mark.skip(
        reason="--very-fast: skipping medium_duration test"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
        elif very_fast and "medium_duration" in item.keywords:
            item.add_marker(skip_medium)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow test (skipped with --fast)")
    config.addinivalue_line(
        "markers",
        "medium_duration: >~3 s test, deselected under --very-fast "
        "(reference: conftest.py:63)",
    )


@pytest.fixture(autouse=True)
def per_test_timeout(request):
    """SIGALRM watchdog per test (reference: conftest.py:156-172)."""
    seconds = 300 if "slow" in request.keywords else 120

    def handler(signum, frame):
        raise TimeoutError(
            f"test exceeded {seconds}s timeout: {request.node.nodeid}"
        )

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    yield
    signal.alarm(0)
    signal.signal(signal.SIGALRM, old)


@pytest.fixture(autouse=True)
def reset_singletons():
    """Reset global singletons between tests
    (reference: conftest.py:183-199 reset_* fixtures).
    """
    yield
    from ace_tpu.core.timing import GlobalTimer
    from ace_tpu.core.wandb import WandB

    GlobalTimer.reset()
    WandB.reset()
