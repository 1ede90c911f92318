"""Benchmark runner CLI: ``python -m ace_tpu.benchmark.run [names...]``
(reference: fme/core/benchmark/run.py:66 — per-device JSON + PNG output,
optional wandb logging).

``--write-regression`` commits current fingerprints as baselines.
``--output-dir`` writes ``bench_<device>_<commit>.{json,png}`` there.
``--wandb-project entity/project`` logs the per-benchmark timings.
"""

import argparse
import json
import logging
import os
import subprocess

import ace_tpu.benchmark.benchmarks  # noqa: F401 — registers benchmarks
from ace_tpu.benchmark.benchmark import get_benchmarks

logger = logging.getLogger(__name__)


def get_git_commit() -> str:
    """Short sha, ``-dirty`` suffixed (reference run.py:25-55)."""
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        commit = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=root,
            stderr=subprocess.DEVNULL,
        ).decode().strip()
        dirty = subprocess.check_output(
            ["git", "status", "--porcelain"], cwd=root,
            stderr=subprocess.DEVNULL,
        ).decode().strip()
        return f"{commit}-dirty" if dirty else commit
    except Exception:
        return "unknown"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("names", nargs="*", help="benchmarks to run (all)")
    parser.add_argument("--repeats", type=int, default=10)
    parser.add_argument("--write-regression", action="store_true")
    parser.add_argument(
        "--output-dir", default=None,
        help="write <dir>/bench_<device>_<commit>.{json,png}",
    )
    parser.add_argument(
        "--wandb-project", default=None,
        help="entity/project to log benchmark timings to",
    )
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

    if args.output_dir is not None and results:
        os.makedirs(args.output_dir, exist_ok=True)
        import jax

        device = jax.devices()[0]
        safe_device = (
            getattr(device, "device_kind", str(device.platform))
            .replace(" ", "_").replace("/", "_").lower()
        )
        commit = get_git_commit()
        stem = os.path.join(
            args.output_dir, f"bench_{safe_device}_{commit}"
        )
        with open(stem + ".json", "w") as f:
            json.dump(results, f, indent=2)
        from ace_tpu.benchmark.plot import save_plot

        save_plot(results, stem + ".png",
                  label=f"{safe_device} @ {commit}")
        logger.info("wrote %s.{json,png}", stem)

    if args.wandb_project is not None and results:
        from ace_tpu.core.wandb import WandB

        entity, project = args.wandb_project.split("/")
        wandb = WandB.get_instance()
        wandb.configure(log_to_wandb=True)
        wandb.init(project=project, entity=entity,
                   name=f"bench-{get_git_commit()}")
        logs = {}
        for r in results:
            logs[f"{r['name']}/mean_ms"] = r["mean_ms"]
            logs[f"{r['name']}/min_ms"] = r["min_ms"]
            logs[f"{r['name']}/compile_ms"] = r["compile_ms"]
        wandb.log(logs, step=0)
    return results


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
