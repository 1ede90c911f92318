"""ENSO/IPO index tests (reference model: fme/ace/aggregator/inference/enso tests)."""

import numpy as np

from ace_tpu.aggregator.enso import EnsoIndexAggregator, IpoIndexAggregator
from ace_tpu.core.coordinates import LatLonCoordinates


def _coords(nlat=19, nlon=36):
    return LatLonCoordinates(
        lat=np.linspace(-90, 90, nlat),
        lon=np.linspace(0, 350, nlon),
    )


def test_enso_index_tracks_nino34_warming():
    coords = _coords()
    agg = EnsoIndexAggregator(coords)
    nlat, nlon = coords.shape
    lat2d = np.broadcast_to(np.asarray(coords.lat)[:, None], (nlat, nlon))
    lon2d = np.broadcast_to(np.asarray(coords.lon)[None, :], (nlat, nlon))
    in_region = (
        (lat2d >= -5) & (lat2d <= 5) & (lon2d >= 190) & (lon2d <= 240)
    )
    # two batches: neutral then warm only inside Nino3.4
    base = np.full((1, 2, nlat, nlon), 300.0, np.float32)
    warm = base.copy()
    warm[:, :, in_region] += 2.0
    agg.record_batch({"surface_temperature": base},
                     {"surface_temperature": base})
    agg.record_batch({"surface_temperature": warm},
                     {"surface_temperature": warm})
    diags = agg.get_diagnostics()
    idx = diags["gen_index"][0]
    assert idx[:2].mean() < 0 < idx[2:].mean()
    # perfect-match correlation == 1
    logs = agg.get_logs()
    assert abs(logs["enso/index_correlation"] - 1.0) < 1e-6


def test_ipo_index_runs():
    coords = _coords()
    agg = IpoIndexAggregator(coords)
    agg.record_batch({
        "surface_temperature": np.random.RandomState(0).randn(
            1, 4, *coords.shape
        ).astype(np.float32)
    })
    out = agg.get_diagnostics()
    assert out["ipo_index"].shape == (1, 4)
