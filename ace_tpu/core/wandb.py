"""Metric logging: wandb singleton (no-op when wandb is unavailable or
disabled) + JSON-lines disk metric logger
(reference: fme/core/wandb.py:96 WandB singleton,
fme/core/disk_metric_logger.py:10 DiskMetricLogger).
"""

import json
import logging
import os
from typing import Any, Mapping


class WandB:
    """Singleton wrapper; strictly-increasing step enforcement like the
    reference. Falls back to a no-op when wandb is not installed.
    """

    _instance: "WandB | None" = None

    def __init__(self):
        self._enabled = False
        self._run = None
        self._last_step = -1

    @classmethod
    def get_instance(cls) -> "WandB":
        if cls._instance is None:
            cls._instance = WandB()
        return cls._instance

    @classmethod
    def reset(cls):
        cls._instance = None

    def configure(self, log_to_wandb: bool):
        self._enabled = log_to_wandb

    def init(self, **kwargs):
        if not self._enabled:
            return
        try:
            import wandb  # noqa: F401

            self._run = wandb.init(**kwargs)
        except ImportError:
            logging.warning("wandb not installed; disabling wandb logging")
            self._enabled = False

    def log(self, data: Mapping[str, Any], step: int | None = None):
        if step is not None:
            if step < self._last_step:
                raise ValueError(
                    f"step {step} < last logged step {self._last_step}"
                )
            self._last_step = step
        if self._enabled and self._run is not None:
            self._run.log(dict(data), step=step)

    @property
    def enabled(self) -> bool:
        return self._enabled

    def get_id(self) -> str | None:
        """wandb run id of the current job (reference:
        training_history.py:get_job_id)."""
        return self._run.id if self._run is not None else None


class DiskMetricLogger:
    """Append metrics as JSON lines
    (reference: fme/core/disk_metric_logger.py:10).
    """

    def __init__(self, path: str):
        self._path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, data: Mapping[str, Any], step: int | None = None):
        record = {k: _to_scalar(v) for k, v in data.items()}
        if step is not None:
            record["step"] = step
        with open(self._path, "a") as f:
            f.write(json.dumps(record) + "\n")


def _to_scalar(value):
    try:
        return float(value)
    except (TypeError, ValueError):
        return str(value)
