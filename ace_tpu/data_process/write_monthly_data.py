"""Write monthly means of a dataset to netCDF.

Reference: scripts/monthly_data/write_monthly_data.py (streams a
dataset through the MonthlyDataWriter). Here: the dataset is read via
the ace_tpu data layer and streamed through the same MonthlyMeanWriter
the inference entry uses, producing monthly_mean_data.nc under
``experiment_dir``.

CLI:
    python -m ace_tpu.data_process.write_monthly_data cfg.yaml
with YAML fields: experiment_dir, data_loader {dataset: {...}},
variable_names [..], optional forward_steps_in_memory.
"""

import argparse
import dataclasses
import logging
import os
from typing import List

from ace_tpu.core.config import from_dict
from ace_tpu.data.loading import DataLoaderConfig
from ace_tpu.inference.data_writer import MonthlyMeanWriter

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Config:
    """(reference write_monthly_data.py:107-129)"""

    experiment_dir: str
    data_loader: DataLoaderConfig
    variable_names: List[str]
    forward_steps_in_memory: int = 73

    @classmethod
    def from_file(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        data.pop("logging", None)  # reference wandb/screen knobs: unused
        return from_dict(cls, data)


def run(config: Config) -> str:
    dataset = config.data_loader.dataset.build()
    os.makedirs(config.experiment_dir, exist_ok=True)
    out_path = os.path.join(config.experiment_dir, "monthly_mean_data.nc")
    writer = MonthlyMeanWriter(
        out_path, dataset.dataset_info, names=config.variable_names
    )
    n = dataset.n_times
    step = config.forward_steps_in_memory
    for start in range(0, n, step):
        stop = min(n, start + step)
        window, time = dataset.get_window(
            start, stop - start, config.variable_names
        )
        batch = {k: v[None] for k, v in window.items()}  # [1, T, Y, X]
        writer.append_batch(batch, time[None])
        logger.info("aggregated steps [%d, %d) of %d", start, stop, n)
    writer.close()
    logger.info("wrote %s", out_path)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Write monthly means of a dataset to netCDF."
    )
    parser.add_argument("config")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return run(Config.from_file(args.config))


if __name__ == "__main__":
    main()
