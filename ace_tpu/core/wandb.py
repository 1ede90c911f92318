"""Metric logging: wandb singleton (no-op when wandb is unavailable or
disabled) + JSON-lines disk metric logger
(reference: fme/core/wandb.py:96 WandB singleton,
fme/core/disk_metric_logger.py:10 DiskMetricLogger).
"""

import json
import logging
import os
from typing import Any, Mapping, Sequence


class _Media:
    """Base for lazily-converted wandb media values (reference:
    fme/core/wandb.py:96 exposes wandb.Image/Video/Table/Histogram).

    Instances are cheap containers (a path or numpy array); the real
    wandb object is only built inside WandB.log when a run is active,
    so aggregators can emit media unconditionally."""

    def to_wandb(self):  # pragma: no cover - overridden
        raise NotImplementedError


class Image(_Media):
    """A figure, [H, W(, C)] array, or image-file path."""

    def __init__(self, data_or_path, caption: str | None = None):
        self.data = data_or_path
        self.caption = caption

    def to_wandb(self):
        import wandb

        return wandb.Image(self.data, caption=self.caption)


class Video(_Media):
    """A video-file path (e.g. the GIFs rendered by
    aggregator/plotting.py) or a [T, C, H, W] uint8 array."""

    def __init__(self, data_or_path, caption: str | None = None,
                 fps: int = 8):
        self.data = data_or_path
        self.caption = caption
        self.fps = fps

    def to_wandb(self):
        import wandb

        if isinstance(self.data, str):
            fmt = self.data.rsplit(".", 1)[-1]
            return wandb.Video(self.data, caption=self.caption, format=fmt)
        return wandb.Video(self.data, caption=self.caption, fps=self.fps)


class Table(_Media):
    """Columns + rows (reference uses tables for per-variable metrics)."""

    def __init__(self, columns: Sequence[str], data: Sequence[Sequence]):
        self.columns = list(columns)
        self.rows = [list(r) for r in data]

    def to_wandb(self):
        import wandb

        return wandb.Table(columns=self.columns, data=self.rows)


class Histogram(_Media):
    """A sequence of samples or a precomputed (counts, bin_edges) pair."""

    def __init__(self, sequence=None, np_histogram=None, num_bins: int = 64):
        self.sequence = sequence
        self.np_histogram = np_histogram
        self.num_bins = num_bins

    def to_wandb(self):
        import wandb

        return wandb.Histogram(
            sequence=self.sequence, np_histogram=self.np_histogram,
            num_bins=self.num_bins,
        )


WANDB_RUN_ID_FILE = "wandb_run_id"


class WandB:
    """Singleton wrapper; strictly-increasing step enforcement like the
    reference. Falls back to a no-op when wandb is not installed.
    """

    _instance: "WandB | None" = None

    def __init__(self):
        self._enabled = False
        self._run = None
        self._last_step = -1
        self._watch_freq: int | None = None

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

    def init(
        self,
        resumable: bool = False,
        experiment_dir: str | None = None,
        wandb_init=None,
        **kwargs,
    ):
        """Start (or resume) a wandb run.

        With ``resumable=True`` the run id is persisted to
        ``<experiment_dir>/wandb_run_id`` on first init; a later init in
        the same experiment dir (e.g. after preemption) resumes THAT
        run instead of starting a fresh one (reference:
        fme/core/wandb.py:237 init_wandb_with_resumption — the id file
        is kept separate from wandb's own media tmpdir on purpose).

        ``wandb_init`` injects the init callable for tests.
        """
        if not self._enabled:
            return
        if wandb_init is None:
            try:
                import wandb
            except ImportError:
                logging.warning(
                    "wandb not installed; disabling wandb logging"
                )
                self._enabled = False
                return
            wandb_init = wandb.init
        if resumable:
            if experiment_dir is None:
                raise ValueError(
                    "must provide `experiment_dir` when `resumable` is True"
                )
            id_path = os.path.join(experiment_dir, WANDB_RUN_ID_FILE)
            if os.path.exists(id_path):
                with open(id_path) as f:
                    run_id = f.read().strip()
                kwargs.update({"resume": "must", "id": run_id})
                self._run = wandb_init(**kwargs)
                logging.info("Resuming wandb run with id: %s", run_id)
            else:
                kwargs.update({"resume": "never"})
                self._run = wandb_init(**kwargs)
                os.makedirs(experiment_dir, exist_ok=True)
                with open(id_path, "w") as f:
                    f.write(self._run.id)
                logging.info(
                    "New resumable wandb run with id: %s", self._run.id
                )
        else:
            self._run = wandb_init(**kwargs)

    def watch(self, log_freq: int = 100):
        """Enable periodic parameter/gradient histogram logging.

        The reference calls ``wandb.watch(modules)``
        (fme/core/wandb.py:171), which hooks torch module backward
        passes. JAX has no module objects to hook, so the trainer calls
        :meth:`log_watched` with the param/grad pytrees each step and
        this gate decides when histograms are actually built + logged.
        """
        if log_freq <= 0:
            raise ValueError(
                f"watch log_freq must be positive, got {log_freq}"
            )
        self._watch_freq = log_freq

    def log_watched(self, step: int, params, grads=None):
        """Log per-leaf parameter (and gradient) histograms when a watch
        is active and ``step`` falls on the watch frequency."""
        if (
            not self._enabled
            or self._run is None
            or self._watch_freq is None
            or step % self._watch_freq != 0
        ):
            return
        import jax
        import numpy as np

        payload: dict[str, Any] = {}

        def add(prefix, tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            for path, leaf in flat:
                name = "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path
                )
                arr = np.asarray(leaf).ravel()
                if arr.size and np.issubdtype(arr.dtype, np.floating):
                    payload[f"{prefix}/{name}"] = Histogram(
                        sequence=arr.astype(np.float32)
                    )

        add("parameters", params)
        if grads is not None:
            add("gradients", grads)
        if payload:
            self.log(payload, step=step)

    def log(self, data: Mapping[str, Any], step: int | None = None):
        if step is not None:
            if step < self._last_step:
                raise ValueError(
                    f"step {step} < last logged step {self._last_step}"
                )
            self._last_step = step
        if self._enabled and self._run is not None:
            payload = {
                k: (v.to_wandb() if isinstance(v, _Media) else v)
                for k, v in data.items()
            }
            self._run.log(payload, step=step)

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
        record = {k: _to_scalar(v) for k, v in data.items()
                  if not isinstance(v, _Media)}
        if step is not None:
            record["step"] = step
        with open(self._path, "a") as f:
            f.write(json.dumps(record) + "\n")


def _to_scalar(value):
    try:
        return float(value)
    except (TypeError, ValueError):
        return str(value)
