"""Augmentation/perturbation tests (reference models:
fme/ace/data_loading/test_augmentation.py, test_perturbation.py).
"""

import numpy as np

from ace_tpu.data.augmentation import (
    AugmentationConfig,
    GreensFunctionConfig,
    PerturbationSelector,
    RotateModifier,
    SSTPerturbation,
)


def test_rotation_flips_and_signs():
    mod = RotateModifier(1.0, [], seed=0)
    rng = np.random.RandomState(0)
    data = {
        "air_temperature_0": rng.randn(3, 4, 6).astype(np.float32),
        "eastward_wind_0": rng.randn(3, 4, 6).astype(np.float32),
        "UGRD10m": rng.randn(3, 4, 6).astype(np.float32),
    }
    out = mod(data)
    np.testing.assert_array_equal(
        out["air_temperature_0"],
        np.flip(data["air_temperature_0"], axis=(-2, -1)),
    )
    np.testing.assert_array_equal(
        out["eastward_wind_0"],
        -np.flip(data["eastward_wind_0"], axis=(-2, -1)),
    )
    np.testing.assert_array_equal(
        out["UGRD10m"], -np.flip(data["UGRD10m"], axis=(-2, -1))
    )


def test_rotation_probability_zero_is_identity():
    mod = AugmentationConfig(rotate_probability=0.0).build_modifier()
    data = {"x": np.ones((2, 3, 4), np.float32)}
    assert mod(data)["x"] is data["x"]


def test_constant_sst_perturbation_masks_land():
    lat = np.linspace(-80, 80, 8)
    lon = np.linspace(0, 315, 8)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing="ij")
    pert = SSTPerturbation(
        sst=[PerturbationSelector(
            type="constant", config={"amplitude": 2.0}
        )]
    )
    sst = np.zeros((1, 8, 8), np.float32)
    ocean_fraction = np.zeros((1, 8, 8), np.float32)
    ocean_fraction[:, :, :4] = 1.0
    out = pert.apply(
        {"surface_temperature": sst, "ocean_fraction": ocean_fraction},
        lat2d, lon2d,
    )
    np.testing.assert_array_equal(
        out["surface_temperature"][:, :, :4], 2.0
    )
    np.testing.assert_array_equal(
        out["surface_temperature"][:, :, 4:], 0.0
    )


def test_greens_function_peak_at_center():
    lat = np.linspace(-80, 80, 17)
    lon = np.linspace(0, 352.5, 32)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing="ij")
    cfg = GreensFunctionConfig(
        amplitude=3.0, lat_center=0.0, lon_center=180.0,
        lat_width=40.0, lon_width=90.0,
    )
    data = np.zeros((17, 32), np.float32)
    out = cfg.apply_perturbation(
        data, lat2d, lon2d, np.ones_like(data)
    )
    peak = out[8, np.argmin(np.abs(lon - 180.0))]
    assert abs(peak - 3.0) < 0.1
    # zero outside the patch
    assert out[0, 0] == 0.0
