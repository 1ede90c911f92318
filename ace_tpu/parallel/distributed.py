"""Multi-process (multi-host) execution wiring.

Reference mapping (fme/core/distributed/torch_distributed.py:47-83 and
SURVEY §5.8): torchrun env:// / SLURM srun init_process_group becomes one
``jax.distributed.initialize()``; DDP gradient all-reduce and the spatial
all-to-alls come from the XLA SPMD partitioner over the global
(data, h, w) mesh; per-rank data loading becomes per-process batch rows
assembled into global arrays with ``jax.make_array_from_process_local_data``;
root-rank-only logging/checkpointing maps to ``is_root()`` gates.

Launch modes (mirroring torchrun env:// and srun, torch_distributed.py:47-83):

- explicit env: ``ACE_TPU_COORDINATOR_ADDRESS`` (host:port),
  ``ACE_TPU_NUM_PROCESSES``, ``ACE_TPU_PROCESS_ID``
- SLURM: srun sets SLURM_NTASKS/SLURM_PROCID/SLURM_STEP_NODELIST; JAX's
  cluster auto-detection handles this when initialize() is called with no
  arguments on a multi-task launch
- TPU pods: ``jax.distributed.initialize()`` with no arguments
  auto-detects the pod runtime
- single process (the default): everything is a no-op
"""

import dataclasses
import logging
import os

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


@dataclasses.dataclass
class DistributedConfig:
    """Explicit multi-process wiring; fields default from env vars."""

    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None

    @classmethod
    def from_env(cls) -> "DistributedConfig":
        def _int(name):
            v = os.environ.get(name)
            return int(v) if v is not None else None

        return cls(
            coordinator_address=os.environ.get(
                "ACE_TPU_COORDINATOR_ADDRESS"
            ),
            num_processes=_int("ACE_TPU_NUM_PROCESSES"),
            process_id=_int("ACE_TPU_PROCESS_ID"),
        )

    @property
    def explicit(self) -> bool:
        return self.coordinator_address is not None

    @property
    def slurm_multi_task(self) -> bool:
        return int(os.environ.get("SLURM_NTASKS", "1")) > 1


def initialize(config: DistributedConfig | None = None) -> None:
    """Idempotent process-group init (reference: Distributed.context(),
    fme/core/distributed/distributed.py:67-104).

    Called at every entry point. A plain single-process launch is a
    no-op; explicit ACE_TPU_* env vars or a multi-task SLURM job connect
    the process to the coordination service, after which
    ``jax.devices()`` is the global device set.
    """
    global _initialized
    if _initialized:
        return
    if config is None:
        config = DistributedConfig.from_env()
    if config.explicit:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )
        _initialized = True
    elif config.slurm_multi_task:
        jax.distributed.initialize()  # JAX SLURM cluster auto-detection
        _initialized = True
    if _initialized:
        logger.info(
            "distributed initialized: process %d/%d, %d local of %d "
            "global devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()),
        )


def shutdown() -> None:
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_root() -> bool:
    """True on the process that owns logging/checkpoint/writer I/O
    (reference: root-rank gates throughout fme/core/generics/trainer.py)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (reference:
    Distributed.barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_allgather(x):
    """Gather host-local values from every process (reference:
    gather_object; used for host-side diagnostics)."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(np.asarray(x))


class BatchPlacement:
    """Places host-side numpy batches onto a (data, h, w) mesh.

    Single-process: a plain ``jax.device_put`` with the NamedSharding.
    Multi-process: each process loads only its own rows of the global
    batch (``local_rows``) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the JAX equivalent of
    the reference's DistributedSampler shard + scatter_spatial
    (fme/core/distributed/distributed.py:218, gridded_data.py:76-80).

    Spatial (lat/lon) dims stay full-extent on the host: when the h/w
    mesh axes span processes each device picks out its own tile, exactly
    like the reference's scatter_spatial from a full-grid host tensor.
    """

    def __init__(self, mesh):
        from ace_tpu.parallel.mesh import DATA_AXIS

        self.mesh = mesh
        axis = mesh.axis_names.index(DATA_AXIS)
        devs = np.moveaxis(mesh.devices, axis, 0)
        self.n_data = devs.shape[0]
        pidx = jax.process_index()
        self._local_data_coords = [
            d for d in range(self.n_data)
            if any(dev.process_index == pidx
                   for dev in devs[d].flat)
        ]

    @property
    def multiprocess(self) -> bool:
        return jax.process_count() > 1

    def local_rows(self, global_batch: int) -> np.ndarray:
        """Global batch-row indices this process must load."""
        if global_batch % self.n_data != 0:
            raise ValueError(
                f"global batch {global_batch} not divisible by the data "
                f"mesh axis ({self.n_data})"
            )
        per = global_batch // self.n_data
        return np.concatenate([
            np.arange(d * per, (d + 1) * per)
            for d in self._local_data_coords
        ])

    def global_batch_of(self, local_batch: int) -> int:
        n_local = len(self._local_data_coords)
        return local_batch * self.n_data // n_local

    def put(self, v, spec=None):
        """Host array (local rows × full spatial) -> global jax.Array."""
        from jax.sharding import NamedSharding

        from ace_tpu.parallel.mesh import batch_spec

        if spec is None:
            spec = batch_spec(v.ndim)
        sharding = NamedSharding(self.mesh, spec)
        if not self.multiprocess:
            return jax.device_put(v, sharding)
        v = np.asarray(v)
        global_shape = (self.global_batch_of(v.shape[0]),) + v.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, v, global_shape
        )

    def put_replicated(self, v):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P())
        if not self.multiprocess:
            return jax.device_put(v, sharding)
        v = np.asarray(v)
        return jax.make_array_from_process_local_data(
            sharding, v, v.shape
        )

    def put_global(self, v, spec=None):
        """Host array holding the FULL global batch -> global jax.Array.

        Unlike ``put`` (which expects each process to hold only its own
        rows), this takes the complete batch on every process — the
        inference forcing path, where every process reads the same
        forcing windows (reference: each rank's InferenceDataset reads
        full windows, fme/ace/data_loading/inference.py:203) — and
        slices the local rows here.
        """
        if not self.multiprocess:
            from jax.sharding import NamedSharding

            from ace_tpu.parallel.mesh import batch_spec

            if spec is None:
                spec = batch_spec(np.asarray(v).ndim)
            return jax.device_put(v, NamedSharding(self.mesh, spec))
        v = np.asarray(v)
        return self.put(v[self.local_rows(v.shape[0])], spec=spec)

    def fetch(self, tree):
        """Global jax.Array pytree -> host numpy pytree (full global
        arrays on every process). Single-process this is a plain
        device_get; multi-process it all-gathers across hosts (the
        reference's gather for writers/aggregators,
        fme/core/distributed/distributed.py gather_global)."""
        if not self.multiprocess:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
