"""Streaming prediction writers (reference: fme/ace/inference/data_writer/
— raw netCDF per-rank (raw.py:96), zarr (zarr.py:109), restart snapshots).

HDF5 writer uses resizable (unlimited-time) datasets; zarr writer appends
along time via tensorstore resize. Restart files carry the final
prognostic state + time for segmented runs.
"""

import dataclasses
import json
import os
from typing import Any

import numpy as np

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.data.store import encode_cf_time
from ace_tpu.data.time import TimeCoord
from ace_tpu.core.typing_ import TensorMapping


class H5DataWriter:
    """Appends [batch, time, lat, lon] batches along an unlimited time dim
    (reference: data_writer/raw.py).
    """

    def __init__(self, path: str, dataset_info: DatasetInfo,
                 names: list[str] | None = None):
        import h5py

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = h5py.File(path, "w")
        self._names = names
        self._info = dataset_info
        self._n_time = 0
        self._time_units = "seconds since 1970-01-01T00:00:00"
        coords = dataset_info.horizontal_coordinates
        self._f.create_dataset("lat", data=np.asarray(coords.lat))
        self._f.create_dataset("lon", data=np.asarray(coords.lon))

    def append_batch(self, data: TensorMapping, time: TimeCoord):
        names = self._names or list(data.keys())
        n_new = time.values.shape[-1]
        first = self._n_time == 0
        if first:
            vals, units, calendar = encode_cf_time(time)
            sample_shape = np.asarray(data[names[0]]).shape
            b = sample_shape[0]
            self._f.create_dataset(
                "time", shape=(b, 0), maxshape=(b, None), dtype="f8"
            )
            self._f["time"].attrs["units"] = units
            self._f["time"].attrs["calendar"] = calendar
            for name in names:
                arr = np.asarray(data[name])
                self._f.create_dataset(
                    name,
                    shape=(arr.shape[0], 0, *arr.shape[2:]),
                    maxshape=(arr.shape[0], None, *arr.shape[2:]),
                    dtype="f4",
                    chunks=(arr.shape[0], 1, *arr.shape[2:]),
                )
                meta = self._info.variable_metadata.get(name)
                if meta is not None:
                    self._f[name].attrs["units"] = meta.units
                    self._f[name].attrs["long_name"] = meta.long_name
        t0 = self._n_time
        vals, _, _ = encode_cf_time(time, self._time_units)
        self._f["time"].resize(t0 + n_new, axis=1)
        self._f["time"][:, t0:] = np.atleast_2d(vals)
        for name in names:
            if name not in data:
                continue
            arr = np.asarray(data[name])
            self._f[name].resize(t0 + n_new, axis=1)
            self._f[name][:, t0:] = arr
        self._n_time = t0 + n_new

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class ZarrDataWriter:
    """Appends batches along time into a zarr v2 group via tensorstore
    (reference: data_writer/zarr.py:109).
    """

    def __init__(self, path: str, dataset_info: DatasetInfo,
                 names: list[str] | None = None):
        self._path = path
        self._names = names
        self._info = dataset_info
        self._n_time = 0
        self._stores: dict[str, Any] = {}
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)

    def _create(self, name: str, arr: np.ndarray, attrs: dict):
        import tensorstore as ts

        arr_dir = os.path.join(self._path, name)
        store = ts.open({
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": arr_dir},
            "metadata": {
                "shape": [arr.shape[0], 0, *arr.shape[2:]],
                "chunks": [arr.shape[0], 1, *arr.shape[2:]],
                "dtype": "<f4",
            },
            "create": True, "delete_existing": True,
        }).result()
        with open(os.path.join(arr_dir, ".zattrs"), "w") as f:
            json.dump(attrs, f)
        self._stores[name] = store

    def append_batch(self, data: TensorMapping, time: TimeCoord):
        import tensorstore as ts  # noqa: F401

        names = self._names or list(data.keys())
        n_new = time.values.shape[-1]
        dims = ["sample", "time", "lat", "lon"]
        if self._n_time == 0:
            for name in names:
                arr = np.asarray(data[name])
                meta = self._info.variable_metadata.get(name)
                attrs = {"_ARRAY_DIMENSIONS": dims[: arr.ndim]}
                if meta is not None:
                    attrs.update(
                        {"units": meta.units, "long_name": meta.long_name}
                    )
                self._create(name, arr, attrs)
            vals, units, calendar = encode_cf_time(time)
            self._create(
                "time", np.atleast_2d(vals).astype(np.float32),
                {"_ARRAY_DIMENSIONS": ["sample", "time"],
                 "units": units, "calendar": calendar},
            )
        t0, t1 = self._n_time, self._n_time + n_new
        for name in names:
            if name not in data:
                continue
            arr = np.asarray(data[name], dtype=np.float32)
            store = self._stores[name]
            store = store.resize(
                exclusive_max=[arr.shape[0], t1, *arr.shape[2:]]
            ).result()
            self._stores[name] = store
            store[:, t0:t1].write(arr).result()
        vals, _, _ = encode_cf_time(time)
        tstore = self._stores["time"]
        tstore = tstore.resize(
            exclusive_max=[vals.shape[0] if vals.ndim > 1 else 1, t1]
        ).result()
        self._stores["time"] = tstore
        tstore[:, t0:t1].write(
            np.atleast_2d(vals).astype(np.float32)
        ).result()
        self._n_time = t1

    def flush(self):
        pass

    def close(self):
        pass


class NullDataWriter:
    """(reference: fme/core/generics/writer.py NullDataWriter)."""

    def append_batch(self, data, time):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def save_restart(path: str, prognostic_data: TensorMapping, time: TimeCoord,
                 dataset_info: DatasetInfo):
    """Write a restart file with the final prognostic state
    (reference: data_writer restart.nc behavior).
    """
    from ace_tpu.data.store import write_h5

    data = {k: np.asarray(v) for k, v in prognostic_data.items()}
    dims = {k: ("sample", "time", "lat", "lon")[: v.ndim]
            for k, v in data.items()}
    coords = {
        "lat": np.asarray(dataset_info.horizontal_coordinates.lat),
        "lon": np.asarray(dataset_info.horizontal_coordinates.lon),
    }
    vals, units, calendar = encode_cf_time(time)
    data["time"] = np.atleast_2d(vals)
    dims["time"] = ("sample", "time")
    write_h5(path, data, dims, coords=coords,
             attrs={"time": {"units": units, "calendar": calendar}})


@dataclasses.dataclass
class DataWriterConfig:
    """(reference: fme/ace/inference/data_writer/main.py:37)."""

    save_prediction_files: bool = True
    output_format: str = "netcdf"  # "netcdf" | "zarr"
    names: list[str] | None = None

    def build(self, experiment_dir: str, dataset_info: DatasetInfo):
        if not self.save_prediction_files:
            return NullDataWriter()
        if self.output_format == "zarr":
            return ZarrDataWriter(
                os.path.join(experiment_dir, "autoregressive_predictions.zarr"),
                dataset_info, self.names,
            )
        return H5DataWriter(
            os.path.join(experiment_dir, "autoregressive_predictions.nc"),
            dataset_info, self.names,
        )
