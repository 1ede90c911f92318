"""Insolation + calendar tests. Parity is checked against the reference's
committed regression tensor (reference:
fme/ace/stepper/insolation/testdata/solar-constant-as-value.pt, produced
by fme/ace/stepper/insolation/test_insolation.py::test_insolation_compute).
"""

import datetime
import os

import numpy as np
import pytest

from ace_tpu.core.coordinates import LatLonCoordinates
from ace_tpu.core.gridded_ops import LatLonOperations
from ace_tpu.core.metrics import spherical_area_weights
from ace_tpu.data.time import TimeCoord, decode_time, encode_time
from ace_tpu.stepper.insolation import DerivedForcingsConfig, InsolationConfig

REFERENCE_PT = (
    "/root/reference/fme/ace/stepper/insolation/testdata/"
    "solar-constant-as-value.pt"
)


def test_calendar_roundtrip_all_calendars():
    for calendar in ["proleptic_gregorian", "noleap", "julian"]:
        enc = encode_time(np.asarray([2001]), 7, 15, 12, calendar=calendar)
        dec = decode_time(enc, calendar=calendar)
        assert int(dec["year"][0]) == 2001
        assert int(dec["month"][0]) == 7
        assert int(dec["day"][0]) == 15
        assert int(dec["hour"][0]) == 12


def test_insolation_physical_properties():
    """Global mean ~ S0/4, non-negative, zero at night."""
    nlat, nlon = 16, 32
    coords = LatLonCoordinates(
        lat=np.linspace(-90, 90, nlat),
        lon=np.linspace(0, 360 - 360 / nlon, nlon),
    )
    tc = TimeCoord.from_range("2000-03-20T00:00", 4, 21600)
    deriver = InsolationConfig(
        insolation_name="DSWRFtoa", solar_constant_value=1360.0
    ).build(datetime.timedelta(hours=6), coords)
    out = deriver.compute(tc, {})["DSWRFtoa"]
    assert out.shape == (4, nlat, nlon)
    assert out.min() >= 0.0
    assert out.max() > 1000.0
    ops = LatLonOperations(spherical_area_weights(coords.lat, nlon))
    # daily mean over 4 x 6h steps ~ S0/4 within 10%
    mean = float(np.asarray(ops.area_weighted_mean(out)).mean())
    assert abs(mean - 1360.0 / 4) / (1360.0 / 4) < 0.1


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_PT), reason="reference testdata not present"
)
def test_insolation_matches_reference_regression():
    import torch

    expected = torch.load(REFERENCE_PT, weights_only=False).numpy()
    coords = LatLonCoordinates(
        lat=np.linspace(-90.0, 90.0, 8),
        lon=np.linspace(0.0, 360.0 - 360.0 / 16, 16),
    )
    tc = TimeCoord.from_range("2000-01-01T00:00", 2, 21600, calendar="standard")
    deriver = InsolationConfig(
        insolation_name="DSWRFtoa", solar_constant_value=1360.0
    ).build(datetime.timedelta(hours=6), coords)
    mine = deriver.compute(tc, {})["DSWRFtoa"]
    mine = np.stack([mine] * expected.shape[0])
    # reference computes in float32; we compute in float64 — small rounding
    np.testing.assert_allclose(mine, expected, atol=0.25)


def test_forcing_deriver_overwrites_stored_insolation():
    coords = LatLonCoordinates(
        lat=np.linspace(-90, 90, 4), lon=np.linspace(0, 270, 4)
    )
    from ace_tpu.core.dataset_info import DatasetInfo

    info = DatasetInfo(
        horizontal_coordinates=coords,
        timestep=datetime.timedelta(hours=6),
    )
    deriver = DerivedForcingsConfig(
        insolation=InsolationConfig(insolation_name="DSWRFtoa")
    ).build(info)
    tc = TimeCoord.from_range("2000-01-01", 2, 21600)
    existing = np.full((2, 4, 4), -999.0, np.float32)
    # the deriver always overwrites: the configured orbital parameters
    # define the forcing even when the dataset stores an insolation
    # variable (reference removes the name from the data requirements
    # and computes it unconditionally)
    out = deriver(tc, {"DSWRFtoa": existing})
    assert not np.allclose(np.asarray(out["DSWRFtoa"]), existing)
    out2 = deriver(tc, {})
    assert "DSWRFtoa" in out2 and out2["DSWRFtoa"].shape == (2, 4, 4)
    np.testing.assert_allclose(
        np.asarray(out["DSWRFtoa"]), np.asarray(out2["DSWRFtoa"])
    )
    assert deriver.provided_names == ["DSWRFtoa"]
