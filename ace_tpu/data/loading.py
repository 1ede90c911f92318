"""Batch carriers and data loading
(reference: fme/ace/data_loading/batch_data.py, dataloader.py,
gridded_data.py).

TPU-native notes: there are no torch DataLoader worker processes; windows
are read by a thread pool (HDF5/zarr reads release the GIL) and assembled
into pinned host numpy, then ``jax.device_put`` with a NamedSharding moves
each batch to the mesh (the reference's to_device + scatter_spatial,
gridded_data.py:76-80). Prefetching overlaps read/transfer with compute.
"""

import concurrent.futures
import dataclasses
import queue
import threading
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.data.augmentation import AugmentationConfig
from ace_tpu.data.dataset import (
    ConcatDatasetConfig,
    MergeDatasetConfig,
    XarrayDataConfig,
    XarrayDataset,
)
from ace_tpu.data.requirements import DataRequirements
from ace_tpu.data.time import TimeCoord
from ace_tpu.core.typing_ import TensorDict


@dataclasses.dataclass
class BatchData:
    """A batch: dict of [batch, time, lat, lon] arrays + times
    (reference: fme/ace/data_loading/batch_data.py:193).
    """

    data: TensorDict
    time: TimeCoord  # values shaped [batch, time]
    # one-hot dataset labels [batch, n_labels] (reference:
    # fme/core/labels.py BatchLabels); None when no labels configured
    labels: Any = None
    # per-variable [batch] presence masks for variables some samples are
    # missing (NaN-filled placeholders in ``data``); None = all present
    # (reference: batch_data.py:81 _collate_with_masking)
    data_mask: TensorDict | None = None

    @property
    def n_timesteps(self) -> int:
        return self.time.values.shape[1]

    def to_device(self, sharding=None) -> "BatchData":
        from ace_tpu.parallel.distributed import BatchPlacement

        if sharding is None:
            data = {k: jax.device_put(v) for k, v in self.data.items()}
        elif isinstance(sharding, BatchPlacement):
            # mesh placement: shards over (data, h, w); multi-process
            # aware (each process holds only its rows of the batch)
            data = {k: sharding.put(v) for k, v in self.data.items()}
        else:
            data = {k: jax.device_put(v, sharding) for k, v in self.data.items()}
        mask = self.data_mask
        if mask is not None:
            mask = {k: jax.device_put(v) for k, v in mask.items()}
        return BatchData(
            data=data, time=self.time, labels=self.labels, data_mask=mask
        )

    def get_start(self, prognostic_names, n_ic_timesteps: int):
        from ace_tpu.stepper.stepper import PrognosticState

        return PrognosticState(
            data={
                k: self.data[k][:, :n_ic_timesteps] for k in prognostic_names
            }
        )

    def get_end(self, prognostic_names, n_ic_timesteps: int):
        from ace_tpu.stepper.stepper import PrognosticState

        return PrognosticState(
            data={
                k: self.data[k][:, -n_ic_timesteps:] for k in prognostic_names
            }
        )


@dataclasses.dataclass
class PairedData:
    """Prediction and reference data at matching times
    (reference: batch_data.py:994).
    """

    prediction: TensorDict
    reference: TensorDict
    time: TimeCoord


class WindowDataset:
    """Maps sample index -> contiguous time window
    (reference: XarrayDataset sample semantics, xarray.py:534).

    Samples are ``(data, time, missing)`` where ``missing`` is a
    frozenset of requested variables absent from the dataset; with
    ``requirements.allow_missing_variables`` those arrive NaN-filled
    (reference: batch_data.py:88 NaN-filled placeholders), otherwise a
    missing variable raises at read time.
    """

    def __init__(self, dataset: XarrayDataset, requirements: DataRequirements):
        self.dataset = dataset
        self.names = requirements.names
        self.n_timesteps = requirements.n_timesteps
        self.allow_missing = requirements.allow_missing_variables
        if self.allow_missing:
            available = set(dataset.names)
            self._present = [n for n in self.names if n in available]
            self._missing = frozenset(
                n for n in self.names if n not in available
            )
        else:
            self._present = list(self.names)
            self._missing = frozenset()

    def __len__(self) -> int:
        if hasattr(self.dataset, "n_windows"):
            return self.dataset.n_windows(self.n_timesteps)
        return max(0, self.dataset.n_times - self.n_timesteps + 1)

    def _fill_missing(self, data: dict) -> dict:
        if self._missing:
            if data:
                shape = next(iter(data.values())).shape
            else:
                shape = (
                    self.n_timesteps,
                    *self.dataset.dataset_info.img_shape,
                )
            for name in self._missing:
                data[name] = np.full(shape, np.nan, np.float32)
        return data

    def __getitem__(self, idx: int) -> tuple[dict, TimeCoord, frozenset]:
        if hasattr(self.dataset, "window_start"):
            # concat datasets enumerate valid (non-boundary-spanning)
            # windows per segment
            idx = self.dataset.window_start(idx, self.n_timesteps)
        data, time = self.dataset.get_window(
            idx, self.n_timesteps, self._present
        )
        return self._fill_missing(dict(data)), time, self._missing

    @property
    def dataset_info(self) -> DatasetInfo:
        return self.dataset.dataset_info


class StridedWindowDataset(WindowDataset):
    """Window dataset with a start-index stride, for time-buffered loading
    (reference: fme/ace/data_loading/dataloader.py window semantics:
    consecutive windows advance by time_buffer + 1 so no sub-window is
    skipped; a trailing partial window is dropped).
    """

    def __init__(self, dataset: XarrayDataset,
                 requirements: DataRequirements, stride: int):
        super().__init__(dataset, requirements)
        self.stride = stride

    def __len__(self) -> int:
        n = self.dataset.n_times - self.n_timesteps + 1
        return max(0, (n + self.stride - 1) // self.stride)

    def __getitem__(self, idx: int) -> tuple[dict, TimeCoord, frozenset]:
        data, time = self.dataset.get_window(
            idx * self.stride, self.n_timesteps, self._present
        )
        return self._fill_missing(dict(data)), time, self._missing


def _collate(samples: list[tuple]) -> BatchData:
    names = samples[0][0].keys()
    data = {
        k: np.stack([s[0][k] for s in samples], axis=0) for k in names
    }
    time = TimeCoord(
        np.stack([s[1].values for s in samples], axis=0),
        samples[0][1].calendar,
    )
    # per-variable [batch] presence masks, only for variables missing in
    # at least one sample (reference: batch_data.py:109)
    data_mask = None
    missing_sets = [s[2] if len(s) > 2 else frozenset() for s in samples]
    if any(missing_sets):
        ever_missing = frozenset().union(*missing_sets)
        data_mask = {
            name: np.asarray(
                [name not in m for m in missing_sets], np.float32
            )
            for name in ever_missing
        }
    return BatchData(data=data, time=time, data_mask=data_mask)


def _dataset_labels(dataset) -> list:
    """Union of configured dataset labels, following concat/merge
    wrappers (the reference unions labels per sample through
    DatasetItem)."""
    cfg = getattr(dataset, "config", None)
    if cfg is not None:
        return list(getattr(cfg, "labels", None) or [])
    children = getattr(dataset, "_datasets", None)
    if children:
        out: list = []
        for child in children:
            for name in _dataset_labels(child):
                if name not in out:
                    out.append(name)
        return out
    return []


class DataLoader:
    """Threaded, prefetching batch loader with epoch-seeded shuffling
    (reference: fme/ace/data_loading/dataloader.py + DistributedSampler
    semantics in fme/core/distributed).
    """

    def __init__(
        self,
        dataset: WindowDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
        sharding=None,
        sample_with_replacement: int | None = None,
        modifier=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.sample_with_replacement = sample_with_replacement
        self.modifier = modifier
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = (
            self.sample_with_replacement
            if self.sample_with_replacement is not None
            else len(self.dataset)
        )
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self, start_batch: int = 0) -> list[np.ndarray]:
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.sample_with_replacement is not None:
            indices = rng.randint(
                0, len(self.dataset), self.sample_with_replacement
            )
        else:
            indices = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(indices)
        n_batches = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        return batches[start_batch:]

    def __iter__(self) -> Iterator[BatchData]:
        return self.iter_batches()

    def _attach_labels(self, batch: BatchData) -> BatchData:
        from jax.sharding import PartitionSpec as P

        from ace_tpu.parallel.distributed import BatchPlacement
        from ace_tpu.parallel.mesh import DATA_AXIS

        label_names = _dataset_labels(self.dataset.dataset)
        if not label_names:
            return batch
        encoding = sorted(label_names)
        n = next(iter(batch.data.values())).shape[0]
        onehot = np.zeros((n, len(encoding)), np.float32)
        for name in label_names:
            onehot[:, encoding.index(name)] = 1.0
        if isinstance(self.sharding, BatchPlacement):
            # n is the GLOBAL batch (data is already on device); put()
            # wants this process's local rows, which are identical
            # one-hot rows here
            placement = self.sharding
            n_local = (
                len(placement.local_rows(n))
                if placement.multiprocess else n
            )
            labels = placement.put(
                onehot[:n_local], spec=P(DATA_AXIS, None)
            )
        else:
            labels = jnp.asarray(onehot)
        return BatchData(data=batch.data, time=batch.time, labels=labels,
                         data_mask=batch.data_mask)

    def iter_batches(self, start_batch: int = 0) -> Iterator[BatchData]:
        from ace_tpu.parallel.distributed import BatchPlacement

        batches = self._index_batches(start_batch)
        if not batches:
            return
        if (
            isinstance(self.sharding, BatchPlacement)
            and self.sharding.multiprocess
        ):
            # per-process shard of the global batch: this process reads
            # only its own rows (the reference's DistributedSampler,
            # fme/core/distributed/distributed.py:218)
            placement = self.sharding
            batches = [
                idx[placement.local_rows(len(idx))] for idx in batches
            ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded-queue put that gives up when the consumer is gone,
            # so an early consumer exit never wedges the producer thread
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with concurrent.futures.ThreadPoolExecutor(
                    self.num_workers
                ) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, batch_idx)
                        )
                        batch = _collate(samples)
                        if self.modifier is not None:
                            batch = BatchData(
                                data=self.modifier(dict(batch.data)),
                                time=batch.time,
                                labels=batch.labels,
                                data_mask=batch.data_mask,
                            )
                        if not put(batch):
                            return
            except BaseException as e:  # surface read errors, don't hang
                put(e)
                return
            put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield self._attach_labels(item.to_device(self.sharding))
        finally:
            stop.set()


class SlidingWindowLoader:
    """Wraps a loader of long windows, emitting ``time_buffer + 1``
    sub-window batches per input batch, interleaved across a pool of
    ``pool_size`` in-memory windows to decorrelate consecutive outputs
    (reference: fme/ace/data_loading/dataloader.py:148
    SlidingWindowDataLoader + PooledSequence).
    """

    def __init__(self, loader: DataLoader, output_n_timesteps: int,
                 time_buffer: int, shuffle: bool, pool_size: int = 1,
                 seed: int = 0):
        if pool_size < 1:
            raise ValueError("pool_size must be >= 1")
        self._loader = loader
        self._n_out = output_n_timesteps
        self._time_buffer = time_buffer
        self._shuffle = shuffle
        self._pool_size = pool_size
        self._seed = seed
        self._epoch = 0

    @property
    def batch_size(self) -> int:
        return self._loader.batch_size

    @property
    def dataset(self):
        return self._loader.dataset

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        self._loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self._loader) * (self._time_buffer + 1)

    def _subselect(self, batch: BatchData, offset: int) -> BatchData:
        sl = slice(offset, offset + self._n_out)
        return BatchData(
            data={k: v[:, sl] for k, v in batch.data.items()},
            time=TimeCoord(batch.time.values[:, sl], batch.time.calendar),
            labels=batch.labels,
            data_mask=batch.data_mask,
        )

    def __iter__(self) -> Iterator[BatchData]:
        rng = np.random.RandomState(self._seed + self._epoch + 17)
        source = iter(self._loader)
        # each pool slot: (window batch, remaining offsets)
        pool: list[tuple[BatchData, list[int]]] = []

        def refill():
            while len(pool) < self._pool_size:
                try:
                    batch = next(source)
                except StopIteration:
                    return
                offsets = list(range(self._time_buffer + 1))
                if self._shuffle:
                    rng.shuffle(offsets)
                pool.append((batch, offsets))

        refill()
        while pool:
            slot = int(rng.randint(len(pool))) if self._shuffle else 0
            batch, offsets = pool[slot]
            yield self._subselect(batch, offsets.pop(0))
            if not offsets:
                pool.pop(slot)
                refill()


@dataclasses.dataclass
class DataLoaderConfig:
    """Training data loader config (reference:
    fme/ace/data_loading/config.py:15; time_buffer semantics :31).
    """

    dataset: ConcatDatasetConfig | MergeDatasetConfig | XarrayDataConfig
    batch_size: int = 1
    num_data_workers: int = 4
    prefetch_factor: int = 2
    time_buffer: int = 0
    time_buffer_pool_size: int = 1
    # training-batch augmentation (reference:
    # fme/ace/data_loading/config.py:63 augmentation)
    augmentation: AugmentationConfig = dataclasses.field(
        default_factory=AugmentationConfig
    )
    # draw this many samples per epoch with replacement instead of
    # iterating each sample once (reference: config.py:29
    # sample_with_replacement)
    sample_with_replacement: int | None = None

    def __post_init__(self):
        if self.time_buffer_pool_size > 1 and self.time_buffer == 0:
            raise ValueError(
                "time_buffer_pool_size requires time_buffer > 0"
            )

    def build(self, requirements: DataRequirements, train: bool = True,
              sharding=None, seed: int = 0) -> "GriddedData":
        xr_dataset = self.dataset.build()
        if self.time_buffer > 0:
            buffered = DataRequirements(
                names=requirements.names,
                n_timesteps=requirements.n_timesteps + self.time_buffer,
            )
            window: WindowDataset = StridedWindowDataset(
                xr_dataset, buffered, stride=self.time_buffer + 1
            )
        else:
            window = WindowDataset(xr_dataset, requirements)
        modifier = (
            self.augmentation.build_modifier(seed=seed) if train else None
        )
        loader = DataLoader(
            window,
            batch_size=self.batch_size,
            shuffle=train,
            num_workers=self.num_data_workers,
            prefetch=self.prefetch_factor,
            seed=seed,
            sharding=sharding,
            sample_with_replacement=self.sample_with_replacement,
            modifier=modifier,
        )
        if len(loader) == 0:
            raise ValueError(
                f"no batches in dataloader: {len(window)} samples of "
                f"{requirements.n_timesteps} timesteps with batch size "
                f"{self.batch_size}"
            )
        if self.time_buffer > 0:
            loader = SlidingWindowLoader(
                loader,
                output_n_timesteps=requirements.n_timesteps,
                time_buffer=self.time_buffer,
                shuffle=train,
                pool_size=self.time_buffer_pool_size,
                seed=seed,
            )
        return GriddedData(loader=loader, dataset=xr_dataset)


class GriddedData:
    """Loader + dataset metadata bundle
    (reference: fme/ace/data_loading/gridded_data.py:24).
    """

    def __init__(self, loader: DataLoader, dataset: XarrayDataset):
        self.loader = loader
        self.dataset = dataset

    @property
    def dataset_info(self) -> DatasetInfo:
        return self.dataset.dataset_info

    @property
    def n_batches(self) -> int:
        return len(self.loader)

    @property
    def n_samples(self) -> int:
        return len(self.loader.dataset)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __iter__(self):
        return iter(self.loader)
