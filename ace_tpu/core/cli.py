"""CLI plumbing: YAML + --override dotlists, experiment-dir preparation
(reference: fme/core/cli.py:82 prepare_config, :90 prepare_directory,
:111 get_parser).
"""

import argparse
import os
from typing import Any

import yaml

from ace_tpu.core.config import update_dict_with_dotlist


def apply_platform_env():
    """Honor ``ACE_TPU_PLATFORM`` for CLI runs.

    Some images pre-import jax from a sitecustomize that pins the
    platform via jax.config before user code runs, which silently
    overrides a user-set ``JAX_PLATFORMS`` (e.g. ``JAX_PLATFORMS=cpu``
    for a wiring check). ``ACE_TPU_PLATFORM`` is this framework's own
    explicit override — it has no baked-in value, so setting it always
    reflects user intent (unlike JAX_PLATFORMS, which such images
    export globally and which in-process callers may have deliberately
    overridden via jax.config).
    """
    platforms = os.environ.get("ACE_TPU_PLATFORM")
    if not platforms:
        return
    import jax

    try:
        if jax.config.jax_platforms != platforms:
            jax.config.update("jax_platforms", platforms)
    except Exception as e:
        import logging

        logging.warning(
            "ACE_TPU_PLATFORM=%s could not be applied (%s); "
            "continuing on the already-selected platform", platforms, e,
        )


def enable_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache.

    Every entry point pays full XLA compilation otherwise — each test
    session, each segment of segmented inference, each resumed training
    job.  The reference relies on torch's eager mode and has no such
    cost; for us a warm cache turns a ~90 s flagship train-step compile
    into a sub-second deserialization.  ``ACE_TPU_COMPILATION_CACHE``
    overrides the location; ``ACE_TPU_COMPILATION_CACHE=0`` disables.
    """
    loc = os.environ.get("ACE_TPU_COMPILATION_CACHE")
    if loc == "0":
        return
    import jax

    if not loc:
        # default-on only off-CPU: XLA:CPU's AOT deserializer re-checks
        # the host feature string on every load and emits multi-KB error
        # lines even for same-machine entries — enough to fill a pipe
        # buffer and stall a subprocess under test. TPU/GPU entries load
        # silently and are the ones worth caching (90 s+ compiles).
        # default_backend() (not jax_platforms, which is None under
        # auto-detection) is the actual backend the cache would serve.
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "ace_tpu", "jax_cache"
        )

    try:
        if jax.config.jax_compilation_cache_dir != loc:
            jax.config.update("jax_compilation_cache_dir", loc)
            # the cache object is created lazily on first use and then
            # pinned; without a reset a dir change after any prior
            # compilation would be silently ignored
            from jax._src import compilation_cache

            compilation_cache.reset_cache()
        # cache every compilation (default threshold is 1 s, which skips
        # the many small jits in the aggregator/inference paths that
        # still add up across segments)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        import logging

        logging.warning("compilation cache could not be enabled (%s)", e)


def prepare_config(path: str, override: list[str] | None = None) -> dict[str, Any]:
    apply_platform_env()
    enable_compilation_cache()
    with open(path) as f:
        data = yaml.safe_load(f)
    return update_dict_with_dotlist(data, override)


def prepare_directory(experiment_dir: str, config_data: dict[str, Any]):
    """Create the experiment dir and snapshot the resolved config into it."""
    os.makedirs(experiment_dir, exist_ok=True)
    with open(os.path.join(experiment_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config_data, f)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("yaml_config", type=str, help="path to YAML config")
    parser.add_argument(
        "--override",
        nargs="*",
        default=None,
        help="dotlist overrides, e.g. a.b=1 c=hello",
    )
    return parser
