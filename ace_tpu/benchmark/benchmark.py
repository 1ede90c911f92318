"""Kernel benchmark harness (reference: fme/core/benchmark/benchmark.py:272
BenchmarkABC + register_benchmark; timer.py CUDATimer; run.py CLI).

Each registered benchmark builds a jitted function + inputs, is timed with
device synchronization, and produces a numeric fingerprint compared
against committed regression values (testdata/*.json) so kernel rewrites
are checked for both speed and numerics.
"""

import abc
import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import numpy as np

TESTDATA_DIR = os.path.join(os.path.dirname(__file__), "testdata")

_BENCHMARK_REGISTRY: dict[str, type["BenchmarkABC"]] = {}


def register_benchmark(name: str):
    def decorator(cls):
        if name in _BENCHMARK_REGISTRY:
            raise ValueError(f"benchmark {name!r} already registered")
        cls.benchmark_name = name
        _BENCHMARK_REGISTRY[name] = cls
        return cls

    return decorator


def get_benchmarks() -> dict[str, type["BenchmarkABC"]]:
    return dict(_BENCHMARK_REGISTRY)


@dataclasses.dataclass
class BenchmarkResult:
    name: str
    mean_ms: float
    min_ms: float
    compile_ms: float
    fingerprint: float
    device: str
    regression_ok: bool | None = None
    # device-memory footprint after the run, when the backend reports it
    # (reference analog: fme/core/benchmark/memory.py CUDA tracker)
    peak_bytes_in_use: int | None = None

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _device_peak_bytes() -> int | None:
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))


class BenchmarkABC(abc.ABC):
    benchmark_name: str = ""

    @classmethod
    @abc.abstractmethod
    def new(cls) -> "BenchmarkABC":
        """Construct the benchmark with its standard problem size."""

    @abc.abstractmethod
    def get_fn(self) -> tuple[Callable, tuple[Any, ...]]:
        """Return (jittable fn, args)."""

    def fingerprint(self, output) -> float:
        """Numeric fingerprint of the output for regression checking.

        Reductions run on device (complex device->host transfers are not
        supported by every backend); only a real scalar crosses to host.
        """
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves(output)
        total = 0.0
        for leaf in leaves:
            total += float(
                jnp.mean(jnp.abs(leaf).astype(jnp.float32))
            )
        return total

    def run(self, n_repeats: int = 10, check_regression: bool = True,
            inner_iters: int = 100) -> BenchmarkResult:
        """Time the kernel with an in-jit scan of ``inner_iters``
        applications so per-dispatch overhead is amortized out of the
        per-iteration number. Remote-TPU tunnels add ~25 ms of round-trip
        latency per call, so inner_iters must be large for sub-ms kernels
        (100 iters -> 0.25 ms of residual overhead).
        """
        import jax.numpy as jnp

        fn, args = self.get_fn()
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jitted(*args))
        compile_ms = (time.perf_counter() - t0) * 1e3

        def repeated(*args):
            def body(acc, _):
                # thread acc into the inputs so XLA cannot hoist the
                # loop-invariant computation out of the scan
                eps = acc * 1e-30
                args_i = jax.tree_util.tree_map(
                    lambda a: a + eps.astype(a.dtype)
                    if hasattr(a, "dtype") else a,
                    args,
                )
                result = fn(*args_i)
                s = sum(
                    jnp.sum(jnp.abs(leaf).astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(result)
                )
                return acc + s, None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=inner_iters
            )
            return acc

        jit_rep = jax.jit(repeated)
        # force a scalar host transfer per repeat: block_until_ready does
        # not reliably block over remote-TPU tunnels, so only reading the
        # value guarantees the computation finished
        float(jit_rep(*args))  # compile
        times = []
        for _ in range(n_repeats):
            t0 = time.perf_counter()
            float(jit_rep(*args))
            times.append(
                (time.perf_counter() - t0) * 1e3 / inner_iters
            )
        fp = self.fingerprint(out)
        regression_ok = None
        if check_regression:
            regression_ok = self._check_regression(fp)
        return BenchmarkResult(
            name=self.benchmark_name,
            mean_ms=float(np.mean(times)),
            min_ms=float(np.min(times)),
            compile_ms=compile_ms,
            fingerprint=fp,
            device=str(jax.devices()[0].platform),
            regression_ok=regression_ok,
            peak_bytes_in_use=_device_peak_bytes(),
        )

    def _regression_path(self) -> str:
        return os.path.join(
            TESTDATA_DIR, f"{self.benchmark_name}-regression.json"
        )

    def _check_regression(self, fingerprint: float) -> bool | None:
        path = self._regression_path()
        if not os.path.exists(path):
            return None
        with open(path) as f:
            expected = json.load(f)["fingerprint"]
        if expected == 0:
            return abs(fingerprint) < 1e-6
        return abs(fingerprint - expected) / abs(expected) < 2e-2

    def write_regression(self):
        """Commit the current fingerprint as the regression baseline."""
        os.makedirs(TESTDATA_DIR, exist_ok=True)
        fn, args = self.get_fn()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        with open(self._regression_path(), "w") as f:
            json.dump({"fingerprint": self.fingerprint(out)}, f)
