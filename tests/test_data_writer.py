"""Data writer tests: monthly means and time coarsening
(reference models: data_writer/test_monthly.py, test_time_coarsen.py).
"""

import os

import numpy as np

from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.data.store import open_file_dataset
from ace_tpu.data.time import TimeCoord
from ace_tpu.inference.data_writer import (
    DataWriterConfig,
    H5DataWriter,
    MonthlyMeanWriter,
    TimeCoarsenWriter,
)

NLAT, NLON = 4, 8


def _info():
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(NLAT),
            lon=np.linspace(0, 360, NLON, endpoint=False),
        )
    )


def test_monthly_mean_writer(tmp_path):
    path = str(tmp_path / "monthly.nc")
    writer = MonthlyMeanWriter(path, _info())
    # 10-day steps spanning Jan..Feb 2000
    t = TimeCoord.from_range("2000-01-05", 6, 10 * 86400)
    t = TimeCoord(t.values[None, :], t.calendar)
    data = {"x": np.ones((1, 6, NLAT, NLON), np.float32)}
    data["x"][:, 3:] = 3.0  # later steps (Feb +) are 3
    writer.append_batch({"x": data["x"][:, :3]}, TimeCoord(t.values[:, :3]))
    writer.append_batch({"x": data["x"][:, 3:]}, TimeCoord(t.values[:, 3:]))
    writer.close()
    ds = open_file_dataset(path)
    months = ds["counts"].read(())
    # Jan 5,15,25 -> Jan; Feb 4,14,24 -> Feb
    assert list(months) == [3, 3]
    vals = ds["x"].read(())
    np.testing.assert_allclose(vals[0, 0], 1.0)
    np.testing.assert_allclose(vals[0, 1], 3.0)


def test_time_coarsen_writer(tmp_path):
    path = str(tmp_path / "coarse.nc")
    inner = H5DataWriter(path, _info())
    writer = TimeCoarsenWriter(inner, coarsen_factor=2)
    t = TimeCoord.from_range("2000-01-01", 4, 21600)
    t = TimeCoord(t.values[None, :], t.calendar)
    arr = np.arange(4, dtype=np.float32)[None, :, None, None] * np.ones(
        (1, 4, NLAT, NLON), np.float32
    )
    # deliver in two irregular chunks crossing the coarsen boundary
    writer.append_batch({"x": arr[:, :1]}, TimeCoord(t.values[:, :1]))
    writer.append_batch({"x": arr[:, 1:]}, TimeCoord(t.values[:, 1:]))
    writer.close()
    ds = open_file_dataset(path)
    vals = ds["x"].read(())
    assert vals.shape == (1, 2, NLAT, NLON)
    np.testing.assert_allclose(vals[0, 0], 0.5)   # mean(0, 1)
    np.testing.assert_allclose(vals[0, 1], 2.5)   # mean(2, 3)


def test_writer_config_composition(tmp_path):
    cfg = DataWriterConfig(
        save_prediction_files=True, save_monthly_files=True,
        time_coarsen_factor=2,
    )
    writer = cfg.build(str(tmp_path), _info())
    t = TimeCoord.from_range("2000-01-01", 4, 21600)
    t = TimeCoord(t.values[None, :], t.calendar)
    writer.append_batch(
        {"x": np.ones((1, 4, NLAT, NLON), np.float32)}, t
    )
    writer.close()
    assert os.path.exists(
        os.path.join(str(tmp_path), "autoregressive_predictions.nc")
    )
    assert os.path.exists(
        os.path.join(str(tmp_path), "monthly_mean_predictions.nc")
    )
