"""Create coupled initial-condition netCDF files.

Reference: scripts/data_process/create_coupled_ic.py. Selects one or
more timestamps (or a range) from the coupled ocean/atmosphere stores
produced by ace_tpu.data_process.coupled_datasets, merged over the
original input stores (coupled variables override the originals), and
writes {prefix}_ocean_ic.nc and {prefix}_atmosphere_ic.nc.

CLI:
    python -m ace_tpu.data_process.create_coupled_ic --yaml ic.yaml
"""

import argparse
import dataclasses
import logging
import os
from typing import List, Optional, Union

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import parse_datetime_string
from ace_tpu.data_process.coupled_datasets import (
    CreateCoupledDatasetsConfig,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TimeSelectionConfig:
    """A single timestamp, a list, or a start/end range (reference
    create_coupled_ic.py:19-38)."""

    timestamp: Union[str, List[str], None] = None
    start_time: Optional[str] = None
    end_time: Optional[str] = None

    def __post_init__(self):
        if self.timestamp is not None:
            if self.start_time or self.end_time:
                raise ValueError(
                    "use either 'timestamp' or 'start_time'/'end_time'"
                )
        elif self.start_time is None or self.end_time is None:
            raise ValueError(
                "provide 'timestamp' or both 'start_time' and 'end_time'"
            )

    def indices(self, time) -> np.ndarray:
        if self.timestamp is not None:
            stamps = ([self.timestamp] if isinstance(self.timestamp, str)
                      else list(self.timestamp))
            wanted = np.asarray([
                parse_datetime_string(t, time.calendar) for t in stamps
            ])
            idx = np.searchsorted(time.values, wanted)
            ok = (idx < len(time)) & (
                time.values[np.clip(idx, 0, len(time) - 1)] == wanted
            )
            if not ok.all():
                missing = [s for s, o in zip(stamps, ok) if not o]
                raise ValueError(f"timestamps not in dataset: {missing}")
            return idx
        lo = parse_datetime_string(self.start_time, time.calendar)
        hi = parse_datetime_string(self.end_time, time.calendar)
        sel = np.nonzero((time.values >= lo) & (time.values <= hi))[0]
        if len(sel) == 0:
            raise ValueError("no timestamps in the requested range")
        return sel


@dataclasses.dataclass
class CreateCoupledICConfig:
    """(reference create_coupled_ic.py:40-75)"""

    coupled_config_path: str
    time: TimeSelectionConfig
    coupled_ocean_zarr: Optional[str] = None
    coupled_atmosphere_zarr: Optional[str] = None
    original_ocean_zarr: Optional[str] = None
    original_atmosphere_zarr: Optional[str] = None
    output_directory: str = "."
    output_prefix: str = "ic"
    use_coupled: bool = True

    def resolve_paths(self) -> None:
        coupled = CreateCoupledDatasetsConfig.from_file(
            self.coupled_config_path
        )
        inputs = coupled.input_datasets
        if self.original_atmosphere_zarr is None:
            self.original_atmosphere_zarr = inputs.atmosphere.zarr_path
        if self.original_ocean_zarr is None:
            if inputs.ocean is None:
                raise ValueError(
                    "original_ocean_zarr not set and the coupled config "
                    "has no ocean input"
                )
            self.original_ocean_zarr = inputs.ocean.zarr_path
        if self.use_coupled:
            if self.coupled_ocean_zarr is None:
                self.coupled_ocean_zarr = coupled.ocean_output_store
            if self.coupled_atmosphere_zarr is None:
                self.coupled_atmosphere_zarr = (
                    coupled.atmosphere_output_store
                )


def _load_selected(path: str, time_config: TimeSelectionConfig):
    """Read all variables at the selected times; static pass through."""
    ds = open_file_dataset(path)
    time = ds.read_time()
    idx = time_config.indices(time)
    data, dims = {}, {}
    for v in ds.keys():
        var = ds[v]
        if v == "time" or (var.dims and var.dims == (v,)):
            continue  # coordinates handled separately
        if var.dims and var.dims[0] == "time":
            data[v] = np.stack(
                [var.read((slice(int(i), int(i) + 1),))[0] for i in idx]
            )
            dims[v] = var.dims
        else:
            data[v] = var.read(())
            dims[v] = var.dims
    coords = {
        v: ds[v].read(()) for v in ds.keys()
        if v != "time" and ds[v].dims == (v,)
    }
    sel_time = time[idx]
    ds.close()
    return data, dims, coords, sel_time


def create_coupled_ic(config: CreateCoupledICConfig) -> dict:
    config.resolve_paths()
    os.makedirs(config.output_directory, exist_ok=True)
    written = {}
    for label, coupled_path, original_path in [
        ("ocean", config.coupled_ocean_zarr, config.original_ocean_zarr),
        ("atmosphere", config.coupled_atmosphere_zarr,
         config.original_atmosphere_zarr),
    ]:
        data, dims, coords, sel_time = _load_selected(
            original_path, config.time
        )
        if config.use_coupled and coupled_path:
            cdata, cdims, ccoords, _ = _load_selected(
                coupled_path, config.time
            )
            data.update(cdata)  # coupled variables override originals
            dims.update(cdims)
            coords = {**coords, **ccoords}
        out_path = os.path.join(
            config.output_directory,
            f"{config.output_prefix}_{label}_ic.nc",
        )
        write_h5(out_path, data, dims, coords=coords, time=sel_time)
        written[label] = out_path
        logger.info(
            "wrote %s (%d variables, %d times)",
            out_path, len(data), len(sel_time),
        )
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Create coupled initial-condition netCDF files."
    )
    parser.add_argument("--yaml", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import yaml

    with open(args.yaml) as f:
        config = from_dict(CreateCoupledICConfig, yaml.safe_load(f))
    create_coupled_ic(config)


if __name__ == "__main__":
    main()
