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
    # Jan 5,15,25 -> Jan; Feb 4,14,24 -> Feb; counts are per sample now
    assert months.shape == (1, 2)
    assert list(months[0]) == [3, 3]
    vals = ds["x"].read(())
    np.testing.assert_allclose(vals[0, 0], 1.0)
    np.testing.assert_allclose(vals[0, 1], 3.0)
    # CF-decodable per-sample month-start coordinate
    vt = ds["valid_time"]
    assert vt.dims == ("sample", "month")
    assert "units" in vt.attrs and "calendar" in vt.attrs


def test_monthly_mean_writer_bins_samples_independently(tmp_path):
    """Samples with different initial times must bin by their own
    calendars (reference monthly.py:169-190)."""
    path = str(tmp_path / "monthly2.nc")
    writer = MonthlyMeanWriter(path, _info())
    t0 = TimeCoord.from_range("2000-01-05", 4, 10 * 86400)
    t1 = TimeCoord.from_range("2000-03-05", 4, 10 * 86400)
    tt = TimeCoord(
        np.stack([t0.values, t1.values]), t0.calendar
    )
    data = {"x": np.ones((2, 4, NLAT, NLON), np.float32)}
    data["x"][1] = 5.0
    writer.append_batch(data, tt)
    writer.close()
    ds = open_file_dataset(path)
    counts = ds["counts"].read(())
    # sample 0: Jan 5,15,25 + Feb 4 -> [3, 1]; sample 1: Mar + Apr
    np.testing.assert_array_equal(counts, [[3, 1], [3, 1]])
    vals = ds["x"].read(())
    np.testing.assert_allclose(vals[0], 1.0)
    np.testing.assert_allclose(vals[1], 5.0)
    # valid_time differs per sample (Jan/Feb vs Mar/Apr starts)
    vt = ds["valid_time"].read(())
    assert vt.shape == (2, 2)
    assert (vt[1] > vt[0]).all()


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


def test_writer_names_are_an_allowlist(tmp_path):
    """Configured names absent from the outputs are skipped, not a
    KeyError (reference raw.py:158-161)."""
    path = str(tmp_path / "raw.nc")
    writer = H5DataWriter(path, _info(), names=["x", "not_an_output"])
    t = TimeCoord.from_range("2000-01-01", 2, 21600)
    t = TimeCoord(t.values[None, :], t.calendar)
    writer.append_batch(
        {"x": np.ones((1, 2, NLAT, NLON), np.float32)}, t
    )
    writer.close()
    ds = open_file_dataset(path)
    assert "x" in ds and "not_an_output" not in ds


def test_zarr_writer_time_precision_and_coords(tmp_path):
    """The zarr writer stores float64 times (float32 quantizes modern
    epochs to ~2 minutes) and the spatial coordinate arrays."""
    from ace_tpu.inference.data_writer import ZarrDataWriter

    path = str(tmp_path / "out.zarr")
    writer = ZarrDataWriter(path, _info())
    t = TimeCoord.from_range("2020-06-01T13:00", 3, 21600)
    t = TimeCoord(t.values[None, :], t.calendar)
    writer.append_batch(
        {"x": np.ones((1, 3, NLAT, NLON), np.float32)}, t
    )
    writer.close()
    ds = open_file_dataset(path)
    np.testing.assert_array_equal(
        ds["lat"].read(()), np.asarray(_info().horizontal_coordinates.lat)
    )
    # decoded times match the written ones exactly
    back = ds.read_time()
    # (stored [sample, time]; read_time reads the raw variable)
    raw = ds["time"].read(())
    assert raw.dtype == np.float64
    del back


def test_time_coarsen_divisibility_validated():
    from ace_tpu.inference.data_writer import DataWriterConfig

    cfg = DataWriterConfig(time_coarsen_factor=10)
    cfg.validate_time_coarsen(40, 10)  # ok
    try:
        cfg.validate_time_coarsen(25, 10)
    except ValueError:
        pass
    else:
        raise AssertionError("expected divisibility error")


def test_time_coarsen_mean_time_labels(tmp_path):
    """Coarse time labels are the mean of the window's labels
    (reference time_coarsen.py:183)."""
    path = str(tmp_path / "coarse2.nc")
    inner = H5DataWriter(path, _info())
    writer = TimeCoarsenWriter(inner, coarsen_factor=2)
    t = TimeCoord.from_range("2000-01-01", 4, 21600)
    t = TimeCoord(t.values[None, :], t.calendar)
    arr = np.ones((1, 4, NLAT, NLON), np.float32)
    writer.append_batch({"x": arr}, t)
    writer.close()
    ds = open_file_dataset(path)
    vals = ds["time"].read(())
    units = ds["time"].attrs["units"]
    assert units.startswith("seconds since")
    # first coarse label = mean(t0, t1) = t0 + 3h
    expected0 = (t.values[0, 0] + t.values[0, 1]) / 2 / 1e6
    epoch_offset = vals[0, 0] - expected0
    np.testing.assert_allclose(
        vals[0, 1] - vals[0, 0], 12 * 3600, rtol=1e-9
    )
