"""Data-loading throughput benchmark
(reference baseline: SURVEY.md perf targets — loader samples/sec; the
reference measures its torch DataLoader pipeline similarly).

Writes a synthetic multi-file HDF5 dataset to a temp dir, then times the
threaded prefetching loader end-to-end (read -> collate -> host->device
transfer), with and without time-buffered sliding windows.
"""

import json
import shutil
import tempfile
import time


def run_data_loading_benchmark(
    n_time: int = 200,
    nlat: int = 180,
    nlon: int = 360,
    n_vars: int = 8,
    batch_size: int = 4,
    n_timesteps: int = 3,
    time_buffer: int = 0,
    num_workers: int = 4,
) -> dict:
    import pathlib

    from ace_tpu.core.config import from_dict
    from ace_tpu.data.loading import DataLoaderConfig
    from ace_tpu.data.requirements import DataRequirements
    from ace_tpu.testing import SyntheticData

    tmp = tempfile.mkdtemp(prefix="ace_tpu_bench_")
    try:
        names = [f"var_{i}" for i in range(n_vars)]
        data = SyntheticData(
            pathlib.Path(tmp), names, n_time=n_time, nlat=nlat,
            nlon=nlon, n_files=4,
        )
        cfg = from_dict(DataLoaderConfig, {
            "dataset": {"data_path": str(data.data_dir)},
            "batch_size": batch_size,
            "num_data_workers": num_workers,
            "time_buffer": time_buffer,
        })
        req = DataRequirements(names=names, n_timesteps=n_timesteps)
        gridded = cfg.build(req, train=True, seed=0)
        # warm epoch (opens files, fills caches)
        for _ in gridded.loader:
            break
        start = time.perf_counter()
        n_batches = 0
        n_samples = 0
        for batch in gridded.loader:
            n_batches += 1
            n_samples += next(iter(batch.data.values())).shape[0]
        elapsed = time.perf_counter() - start
        bytes_per_sample = n_vars * n_timesteps * nlat * nlon * 4
        return {
            "name": (
                "data_loading_buffered" if time_buffer else "data_loading"
            ),
            "samples_per_sec": n_samples / elapsed,
            "batches_per_sec": n_batches / elapsed,
            "mb_per_sec": n_samples * bytes_per_sample / elapsed / 1e6,
            "n_batches": n_batches,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    print(json.dumps(run_data_loading_benchmark()))
    print(json.dumps(run_data_loading_benchmark(time_buffer=4)))
