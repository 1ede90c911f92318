"""Compute relative vorticity and divergence from u/v winds.

Reference: scripts/vort_div/winds.py (u_v_to_vort_div via the vector
SHT; the reference keeps it as a library + test, here it is also a CLI
so wind datasets can be post-processed without writing code). The
spherical-harmonic kernels live in ace_tpu/ops/vector_sht.py and run on
the TPU-native matmul SHT.

CLI:
    python -m ace_tpu.data_process.vort_div --yaml cfg.yaml [--debug]

Config::

    input_path: /data/winds.zarr      # zarr or netCDF dir
    output_path: /data/vortdiv.zarr
    u_name: eastward_wind_{level}     # template or plain variable name
    v_name: northward_wind_{level}
    vort_name: vorticity_{level}      # output names (same placeholder)
    div_name: divergence_{level}
    levels: [0, 1, 2]                 # optional; inferred from u_name
    grid: legendre-gauss              # or equiangular
    time_chunk_size: 8
    include_inputs: false             # copy u/v into the output too
"""

import argparse
import dataclasses
import logging
import os
import re
from typing import Optional, Sequence

import numpy as np

from ace_tpu.core.config import from_dict
from ace_tpu.data.store import open_file_dataset, write_zarr

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class VortDivConfig:
    input_path: str
    output_path: str
    u_name: str = "eastward_wind_{level}"
    v_name: str = "northward_wind_{level}"
    vort_name: str = "vorticity_{level}"
    div_name: str = "divergence_{level}"
    levels: Optional[Sequence[int]] = None
    grid: str = "legendre-gauss"
    time_dim: str = "time"
    time_chunk_size: int = 8
    include_inputs: bool = False

    @classmethod
    def from_file(cls, path: str) -> "VortDivConfig":
        import yaml

        with open(path) as f:
            return from_dict(cls, yaml.safe_load(f))

    def pairs(self, available) -> list[tuple[str, str, str, str]]:
        """(u, v, vort, div) variable-name tuples to process."""
        if "{level}" not in self.u_name:
            return [(self.u_name, self.v_name,
                     self.vort_name, self.div_name)]
        levels = self.levels
        if levels is None:
            pat = re.compile(
                "^" + re.escape(self.u_name).replace(
                    re.escape("{level}"), r"(\d+)"
                ) + "$"
            )
            levels = sorted(
                int(m.group(1))
                for m in (pat.match(n) for n in available) if m
            )
            if not levels:
                raise ValueError(
                    f"no variables matching {self.u_name!r} in the input"
                )
        return [
            (self.u_name.format(level=k), self.v_name.format(level=k),
             self.vort_name.format(level=k), self.div_name.format(level=k))
            for k in levels
        ]


def run(config: VortDivConfig, debug: bool = False) -> None:
    import jax

    ds = open_file_dataset(config.input_path)
    pairs = config.pairs(list(ds.keys()))
    for u_name, v_name, _, _ in pairs:
        for n in (u_name, v_name):
            if n not in ds.keys():
                raise ValueError(f"variable {n!r} not in the input dataset")
    time = ds.read_time(config.time_dim)
    n_time = len(time)
    u0 = ds[pairs[0][0]]
    dims = u0.dims
    if debug:
        for u_name, v_name, vort_name, div_name in pairs:
            logger.info("%s/%s -> %s/%s %s", u_name, v_name,
                        vort_name, div_name, u0.shape)
        ds.close()
        return

    from ace_tpu.ops.vector_sht import u_v_to_vort_div

    compute = jax.jit(
        lambda u, v: u_v_to_vort_div(u, v, grid=config.grid)
    )
    arrays: dict[str, np.ndarray] = {}
    out_dims: dict[str, tuple] = {}
    for u_name, v_name, vort_name, div_name in pairs:
        u_var, v_var = ds[u_name], ds[v_name]
        vort = np.zeros(u_var.shape, np.float32)
        div = np.zeros(u_var.shape, np.float32)
        for start in range(0, n_time, config.time_chunk_size):
            sel = np.arange(
                start, min(start + config.time_chunk_size, n_time)
            )
            vo, dv = compute(u_var.read((sel,)), v_var.read((sel,)))
            vort[sel], div[sel] = np.asarray(vo), np.asarray(dv)
        arrays[vort_name], out_dims[vort_name] = vort, dims
        arrays[div_name], out_dims[div_name] = div, dims
        if config.include_inputs:
            arrays[u_name], out_dims[u_name] = u_var.read(()), dims
            arrays[v_name], out_dims[v_name] = v_var.read(()), dims
        logger.info("%s/%s done (%d times)", vort_name, div_name, n_time)
    # carry over 1-d coordinate variables (lat/lon/levels)
    coords = {
        n: ds[n].read(()) for n in ds.keys()
        if ds[n].dims == (n,) and n != config.time_dim
    }
    os.makedirs(
        os.path.dirname(config.output_path) or ".", exist_ok=True
    )
    write_zarr(
        config.output_path, arrays, out_dims, coords=coords, time=time,
    )
    ds.close()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute vorticity/divergence from u/v winds."
    )
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run(VortDivConfig.from_file(args.yaml), debug=args.debug)


if __name__ == "__main__":
    main()
