"""Image/video rendering of aggregator diagnostics
(reference: fme/ace/aggregator/plotting.py, test_plotting.py)."""

import numpy as np
import pytest

from ace_tpu.aggregator import plotting


def test_get_cmap_limits():
    data = np.array([-1.0, 3.0])
    assert plotting.get_cmap_limits(data) == (-1.0, 3.0)
    assert plotting.get_cmap_limits(data, diverging=True) == (-3.0, 3.0)


def test_fold_healpix_data_layout():
    data = np.stack([np.full((4, 4), i, float) for i in range(12)])
    folded = plotting.fold_healpix_data(data, fill_value=-1.0)
    assert folded.shape == (24, 16)
    # face 3 occupies the top-right panel, face 11 the bottom-left
    assert (folded[0:4, 12:16] == 3).all()
    assert (folded[20:24, 0:4] == 11).all()
    # blank corner filled
    assert (folded[0:4, 0:4] == -1.0).all()


def test_fold_healpix_rejects_non_healpix():
    with pytest.raises(ValueError):
        plotting.fold_healpix_data(np.zeros((4, 4)), 0.0)


def test_plot_imshow_latlon_and_healpix():
    fig = plotting.plot_imshow(np.random.RandomState(0).randn(8, 16))
    assert fig.get_axes()
    fig = plotting.plot_imshow(
        np.random.RandomState(0).randn(12, 4, 4)
    )
    assert fig.get_axes()


def test_plot_paneled_data():
    rs = np.random.RandomState(0)
    fig = plotting.plot_paneled_data(
        [[rs.randn(8, 16), rs.randn(8, 16)], [rs.randn(8, 16), rs.randn(8, 16)]],
        diverging=True,
    )
    assert fig.get_axes()


def test_save_video_gif(tmp_path):
    frames = np.random.RandomState(0).randn(5, 8, 16)
    path = tmp_path / "v.gif"
    plotting.save_video_gif(str(path), frames)
    assert path.exists() and path.stat().st_size > 0
    # healpix frames
    hpx = np.random.RandomState(0).randn(3, 12, 4, 4)
    path2 = tmp_path / "v2.gif"
    plotting.save_video_gif(str(path2), hpx, diverging=True)
    assert path2.exists()


@pytest.mark.medium_duration
def test_flush_images_from_aggregator(tmp_path):
    """End-to-end: evaluator aggregator renders maps + videos to files."""
    from datetime import timedelta

    import jax.numpy as jnp

    from ace_tpu.aggregator.inference import (
        InferenceAggregatorConfig,
        InferenceEvaluatorAggregator,
    )
    from ace_tpu.core.coordinates import (
        HybridSigmaPressureCoordinate,
        LatLonCoordinates,
        gaussian_latitudes,
    )
    from ace_tpu.core.dataset_info import DatasetInfo

    nlat, nlon = 8, 16
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(nlat),
            lon=np.linspace(0, 360, nlon, endpoint=False),
        ),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.array([0.0, 0.0]), bk=np.array([0.0, 1.0])
        ),
        timestep=timedelta(hours=6),
    )
    agg = InferenceEvaluatorAggregator(
        info,
        InferenceAggregatorConfig(log_video=True),
        n_timesteps=4,
    )
    rs = np.random.RandomState(0)
    gen = {"t2m": jnp.asarray(rs.randn(1, 4, nlat, nlon), jnp.float32)}
    tgt = {"t2m": jnp.asarray(rs.randn(1, 4, nlat, nlon), jnp.float32)}
    agg.record_batch(gen, tgt)
    out = tmp_path / "plots"
    agg.flush_images(str(out))
    pngs = list(out.glob("*.png"))
    gifs = list(out.glob("*.gif"))
    assert any("gen_map" in p.name for p in pngs)
    assert any("bias_map" in p.name for p in pngs)
    assert gifs
