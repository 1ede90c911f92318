"""Samudra model tests (reference model: m2lines/test_samudra.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.models.registry import ModuleSelector
from ace_tpu.models.samudra import Samudra, pad_lon_circular_lat_zero
import pytest


def test_pad_semantics():
    x = jnp.arange(12.0).reshape(1, 3, 4, 1)
    out = pad_lon_circular_lat_zero(x, 1)
    assert out.shape == (1, 5, 6, 1)
    # circular along lon
    np.testing.assert_array_equal(
        np.asarray(out[0, 1, 0, 0]), np.asarray(x[0, 0, -1, 0])
    )
    # zero along lat
    np.testing.assert_array_equal(np.asarray(out[0, 0]), 0.0)


@pytest.mark.medium_duration
def test_samudra_shapes_via_registry():
    info = DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(16),
            lon=np.linspace(0, 360, 32, endpoint=False),
        )
    )
    sel = ModuleSelector(type="Samudra", config={
        "ch_width": [8, 12], "dilation": [1, 2], "n_layers": [1, 1],
    })
    model = sel.build(5, 3, info)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 32, 5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 16, 32, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.medium_duration
def test_samudra_longitude_periodicity():
    """Rolling the input along longitude rolls the output (periodic net
    with zonally-periodic upsampling enabled).
    """
    model = Samudra(out_channels=2, ch_width=(8,), dilation=(1,),
                    n_layers=(1,), zonally_periodic_upsample=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    shift = 4
    y_shifted = model.apply(params, jnp.roll(x, shift, axis=-2))
    np.testing.assert_allclose(
        np.asarray(jnp.roll(y, shift, axis=-2)), np.asarray(y_shifted),
        atol=1e-4,
    )
