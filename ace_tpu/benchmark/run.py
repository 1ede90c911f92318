"""Benchmark runner CLI: ``python -m ace_tpu.benchmark.run [names...]``
(reference: fme/core/benchmark/run.py:66 — per-device JSON output).

``--write-regression`` commits current fingerprints as baselines.
"""

import argparse
import json

import ace_tpu.benchmark.benchmarks  # noqa: F401 — registers benchmarks
from ace_tpu.benchmark.benchmark import get_benchmarks


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("names", nargs="*", help="benchmarks to run (all)")
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--write-regression", action="store_true")
    args = parser.parse_args(argv)
    registry = get_benchmarks()
    names = args.names or sorted(registry)
    results = []
    for name in names:
        bench = registry[name].new()
        if args.write_regression:
            bench.write_regression()
        result = bench.run(n_repeats=args.repeats)
        results.append(result.to_dict())
        print(json.dumps(result.to_dict()))
    return results


if __name__ == "__main__":
    main()
