"""Extract publishable sample forcing + initial-condition files from a
training dataset.

Reference: scripts/checkpoint_publication/get_sample_era5_data.py —
the files shipped next to a published checkpoint so users can run
inference out of the box: per-year forcing netCDFs (forcing variables
over a time range) and per-year initial-condition netCDFs (prognostic
snapshots at the first-of-month timestamps).

CLI:
    python -m ace_tpu.data_process.sample_data --yaml cfg.yaml [--debug]

Config::

    input_path: /data/era5.zarr
    output_dir: /data/sample        # must not exist yet
    forcing_names: [DSWRFtoa, HGTsfc, land_fraction, ...]
    prognostic_names: [PRESsfc, surface_temperature, ...]
    forcing_start_time: "1940-01-01T00:00:00"
    forcing_end_time: "1941-01-01T00:00:00"
    ic_years: [1940, 2020]
"""

import argparse
import dataclasses
import logging
import os
from typing import Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_h5
from ace_tpu.data.time import TimeCoord, parse_datetime_string

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SampleDataConfig:
    input_path: str
    output_dir: str
    forcing_names: Sequence[str]
    prognostic_names: Sequence[str]
    forcing_start_time: str
    forcing_end_time: str
    ic_years: Sequence[int] = dataclasses.field(default_factory=list)
    time_dim: str = "time"

    @classmethod
    def from_file(cls, path: str) -> "SampleDataConfig":
        import yaml

        with open(path) as f:
            return from_dict(cls, yaml.safe_load(f))


def _years(time: TimeCoord) -> np.ndarray:
    return np.asarray(time.components()["year"])


def run(config: SampleDataConfig, debug: bool = False) -> None:
    ds = open_file_dataset(config.input_path)
    time = ds.read_time(config.time_dim)
    cal = time.calendar
    start = parse_datetime_string(config.forcing_start_time, cal)
    end = parse_datetime_string(config.forcing_end_time, cal)
    sel = np.nonzero((time.values >= start) & (time.values <= end))[0]
    if sel.size == 0:
        raise ValueError("no forcing times in range")
    years = _years(time)
    missing = [n for n in list(config.forcing_names)
               + list(config.prognostic_names) if n not in ds.keys()]
    if missing:
        raise ValueError(f"variables not in the dataset: {missing}")
    coords = {
        n: ds[n].read(()) for n in ds.keys()
        if ds[n].dims == (n,) and n != config.time_dim
    }
    if debug:
        logger.info("forcing: %d steps, years %s..%s; IC years %s",
                    sel.size, years[sel[0]], years[sel[-1]],
                    list(config.ic_years))
        ds.close()
        return
    os.makedirs(config.output_dir)

    forcing_dir = os.path.join(config.output_dir, "forcing_data")
    os.makedirs(forcing_dir)
    for year in np.unique(years[sel]):
        ysel = sel[years[sel] == year]
        arrays, dims = {}, {}
        for name in config.forcing_names:
            var = ds[name]
            if var.dims and var.dims[0] == config.time_dim:
                arrays[name] = var.read((ysel,)).astype(np.float32)
            else:
                # static/scalar fields (ak_N/bk_N, HGTsfc) ship in every
                # file so each year is self-contained
                arrays[name] = np.asarray(
                    var.read(()), np.float32
                )
            dims[name] = var.dims
        path = os.path.join(forcing_dir, f"forcing_{year}.nc")
        write_h5(path, arrays, dims, coords=coords,
                 time=TimeCoord(time.values[ysel], cal))
        logger.info("wrote %s (%d steps)", path, len(ysel))

    if config.ic_years:
        ic_dir = os.path.join(config.output_dir, "initial_conditions")
        os.makedirs(ic_dir)
        comp = time.components()
        for year in config.ic_years:
            # first-of-month snapshots: the earliest timestamp on day 1
            # of each month of the year (reference takes 0Z, falling
            # back when the dataset starts later)
            picks = []
            for month in range(1, 13):
                idx = np.nonzero(
                    (comp["year"] == year) & (comp["month"] == month)
                    & (comp["day"] == 1)
                )[0]
                if idx.size:
                    picks.append(int(idx[0]))
            if not picks:
                logger.warning("no IC timestamps found for %d", year)
                continue
            picks = np.asarray(picks)
            arrays = {
                n: ds[n].read((picks,)).astype(np.float32)
                for n in config.prognostic_names
            }
            dims = {n: ds[n].dims for n in config.prognostic_names}
            path = os.path.join(ic_dir, f"ic_{year}.nc")
            write_h5(path, arrays, dims, coords=coords,
                     time=TimeCoord(time.values[picks], cal))
            logger.info("wrote %s (%d snapshots)", path, len(picks))
    ds.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Extract sample forcing/IC files for publication."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run(SampleDataConfig.from_file(args.yaml), debug=args.debug)


if __name__ == "__main__":
    main()
