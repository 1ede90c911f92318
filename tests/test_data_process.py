"""Dataset ETL (ace_tpu.data_process.compute_dataset): derived variables,
vertical coarsening, tendencies, conservation checks, and slab-streamed
zarr output must match a full-array numpy computation (reference
semantics: scripts/data_process/compute_dataset.py)."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process.compute_dataset import (
    GRAVITY,
    LATENT_HEAT_OF_VAPORIZATION,
    DatasetConfig,
    run,
)

NT, NZ, NY, NX = 7, 4, 6, 12


def _make_run(tmp_path, conserving=True):
    """Synthetic FV3GFS-style run directory: one zarr store of state
    variables plus an ak/bk vertical-coordinate netCDF."""
    rng = np.random.RandomState(0)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    time = TimeCoord.from_range("2000-01-01T00:00", NT, 21600)
    lat = np.linspace(-75.0, 75.0, NY)
    lon = np.linspace(0.0, 360.0, NX, endpoint=False)

    # interfaces: ak in Pa (top to bottom), bk unitless
    ak = np.array([100.0, 5000.0, 10000.0, 5000.0, 0.0])
    bk = np.array([0.0, 0.05, 0.2, 0.6, 1.0])
    dak = np.diff(ak)[None, :, None, None]
    dbk = np.diff(bk)[None, :, None, None]

    sphum = np.abs(rng.rand(NT, NZ, NY, NX)) * 1e-2
    cloud = np.abs(rng.rand(NT, NZ, NY, NX)) * 1e-4
    temp = (rng.randn(NT, NZ, NY, NX) * 10 + 260).astype(np.float32)
    u = rng.randn(NT, NZ, NY, NX).astype(np.float32)
    v = rng.randn(NT, NZ, NY, NX).astype(np.float32)

    # construct PRESsfc so global dry-air mass is exactly conserved:
    # column dry air = ps*(1 - sum_z q*dbk) - sum_z q*dak, so pick
    # ps = (C + B + delta)/(1 - A) with area-mean(delta) = 0
    q = sphum + cloud
    area_w = np.cos(np.deg2rad(lat))[None, :, None]

    def area_mean(x):
        return (x * area_w).sum(axis=(-2, -1), keepdims=True) / (
            area_w.sum() * NX
        )

    a_coef = (q * dbk).sum(axis=1)
    b_coef = (q * dak).sum(axis=1)
    delta = rng.randn(NT, NY, NX) * 50.0
    delta = delta - area_mean(delta)
    ps = (1.0e5 + b_coef + delta) / (1.0 - a_coef)

    dp = dak + dbk * ps[:, None]
    twp = (q * dp).sum(axis=1) / GRAVITY

    evap = np.abs(rng.rand(NT, NY, NX)) * 1e-5
    if conserving:
        # choose precip so the global moisture budget closes exactly:
        # d<twp>/dt = <E> - <P>  =>  P = E - d(twp)/dt (per column)
        dt = 21600.0
        precip = np.empty_like(evap)
        precip[1:] = evap[1:] - np.diff(twp, axis=0) / dt
        precip[0] = evap[0]
    else:
        precip = np.abs(rng.rand(NT, NY, NX)) * 1e-5

    land_frac = np.clip(rng.rand(NY, NX), 0, 1).astype(np.float32)
    land_frac = np.broadcast_to(land_frac, (NT, NY, NX)).copy()
    sea_ice = (rng.rand(NT, NY, NX) * 0.8).astype(np.float32)
    sea_ice[0, 0, 0] = np.nan  # NaN handling path
    snow = np.abs(rng.rand(NT, NY, NX)).astype(np.float32) * 1e-6
    ice = np.abs(rng.rand(NT, NY, NX)).astype(np.float32) * 1e-6
    graupel = np.abs(rng.rand(NT, NY, NX)).astype(np.float32) * 1e-6
    dswrf = np.abs(rng.rand(NT, NY, NX)).astype(np.float32) * 300

    dims3 = ("time", "pfull", "grid_yt", "grid_xt")
    dims2 = ("time", "grid_yt", "grid_xt")
    arrays = {
        "specific_humidity": sphum, "cloud_water_mixing_ratio": cloud,
        "air_temperature": temp, "northward_wind": v, "eastward_wind": u,
        "PRESsfc": ps, "surface_evaporation_rate": evap,
        "PRATEsfc": precip, "land_fraction": land_frac,
        "sea_ice_fraction": sea_ice, "SNOWsfc": snow, "ICEsfc": ice,
        "GRAUPELsfc": graupel, "DSWRFtoa": dswrf,
        "grid_yt": lat, "grid_xt": lon,
        "pfull": np.arange(NZ, dtype=np.float64),
    }
    dims = {k: dims3 if arrays[k].ndim == 4 else dims2 for k in arrays}
    dims.update({"grid_yt": ("grid_yt",), "grid_xt": ("grid_xt",),
                 "pfull": ("pfull",)})
    write_zarr(str(run_dir / "full_state.zarr"), arrays, dims, time=time)

    vcoord_path = tmp_path / "vcoord.nc"
    write_h5(
        str(vcoord_path),
        {"ak": ak[None], "bk": bk[None]},
        {"ak": ("Time", "xaxis_1"), "bk": ("Time", "xaxis_1")},
    )

    cfg = {
        "dataset_computation": {
            "reference_vertical_coordinate_file": str(vcoord_path),
            "vertical_coarsening_indices": [[0, 2], [2, 4]],
            "variable_sources": {
                "full_state.zarr": [k for k in arrays
                                    if k not in ("grid_yt", "grid_xt",
                                                 "pfull")]
                + ["grid_yt", "grid_xt"],
            },
            "n_split": 3,
            "standard_names": {
                "graupel_mixing_ratio": "none",
                "rain_mixing_ratio": "none",
                "snow_mixing_ratio": "none",
                "cloud_ice_mixing_ratio": "none",
                "total_frozen_precip_rate": "none",
                "precipitable_water_path": "none",
            },
            "chunking": {"time_dim": 2},
            "renaming": {"grid_yt": "lat", "grid_xt": "lon"},
        },
    }
    cfg_path = tmp_path / "etl.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return run_dir, cfg_path, arrays, ak, bk, dp, q, twp


def test_compute_dataset_end_to_end(tmp_path):
    run_dir, cfg_path, arrays, ak, bk, dp, q, twp = _make_run(tmp_path)
    out = tmp_path / "out.zarr"
    config = DatasetConfig.from_file(str(cfg_path)).dataset_computation
    run(config, str(run_dir), str(out), check_conservation=True)

    ds = open_file_dataset(str(out))
    # raw 3-D variables and water species are dropped
    for dropped in ["specific_humidity", "air_temperature",
                    "eastward_wind", "surface_evaporation_rate"]:
        assert dropped not in ds
    # coarsened fields: mass-weighted means over the index ranges
    for i, (s, e) in enumerate([(0, 2), (2, 4)]):
        expected = (
            (arrays["air_temperature"][:, s:e] * dp[:, s:e]).sum(1)
            / dp[:, s:e].sum(1)
        )
        np.testing.assert_allclose(
            ds[f"air_temperature_{i}"].read(()), expected, rtol=1e-6
        )
        expected_q = ((q[:, s:e] * dp[:, s:e]).sum(1) / dp[:, s:e].sum(1))
        np.testing.assert_allclose(
            ds[f"specific_total_water_{i}"].read(()), expected_q, rtol=1e-6
        )
    # column integral
    np.testing.assert_allclose(
        ds["total_water_path"].read(()), twp, rtol=1e-6
    )
    # tendencies: NaN at t=0, backward difference after (slab-boundary
    # steps must be exact because of the one-step lookback)
    tend = ds["tendency_of_total_water_path"].read(())
    assert np.isnan(tend[0]).all()
    np.testing.assert_allclose(
        tend[1:], np.diff(twp, axis=0) / 21600.0, rtol=1e-5
    )
    # latent heat flux derived from evaporation
    np.testing.assert_allclose(
        ds["LHTFLsfc"].read(()),
        arrays["surface_evaporation_rate"] * LATENT_HEAT_OF_VAPORIZATION,
        rtol=1e-6,
    )
    # ocean fraction: 1 - land - sea_ice (NaN sea ice treated as 0),
    # negatives folded into sea ice
    of = ds["ocean_fraction"].read(())
    sif = ds["sea_ice_fraction"].read(())
    lf = ds["land_fraction"].read(())
    assert not np.isnan(of).any()
    assert (of >= 0).all()
    np.testing.assert_allclose(of + sif + lf, 1.0, rtol=1e-5)
    # frozen precip sums the species
    np.testing.assert_allclose(
        ds["total_frozen_precipitation_rate"].read(()),
        arrays["SNOWsfc"] + arrays["ICEsfc"] + arrays["GRAUPELsfc"],
        rtol=1e-6,
    )
    # renamed dims + coarse interface coefficients
    assert ds["PRESsfc"].dims == ("time", "lat", "lon")
    np.testing.assert_allclose(ds["lat"].read(()), arrays["grid_yt"])
    for i, idx in enumerate([0, 2, 4]):
        np.testing.assert_allclose(ds[f"ak_{i}"].read(()), ak[idx])
        np.testing.assert_allclose(ds[f"bk_{i}"].read(()), bk[idx])
    # time coordinate survives CF round trip
    t = ds.read_time()
    assert len(t) == NT


def test_conservation_check_fails_on_nonconserving_data(tmp_path):
    run_dir, cfg_path, *_ = _make_run(tmp_path, conserving=False)
    config = DatasetConfig.from_file(str(cfg_path)).dataset_computation
    out = tmp_path / "out.zarr"
    try:
        run(config, str(run_dir), str(out), check_conservation=True)
    except AssertionError:
        return
    raise AssertionError("expected moisture conservation check to fail")


def test_compute_dataset_output_loads_in_training_loader(tmp_path):
    """The ETL output must be a valid training dataset for the data layer."""
    run_dir, cfg_path, *_ = _make_run(tmp_path)
    out = tmp_path / "out.zarr"
    config = DatasetConfig.from_file(str(cfg_path)).dataset_computation
    run(config, str(run_dir), str(out))

    from ace_tpu.data.dataset import XarrayDataConfig
    from ace_tpu.data.loading import WindowDataset
    from ace_tpu.data.requirements import DataRequirements

    ds = XarrayDataConfig(data_path=str(out)).build()
    window = WindowDataset(
        ds,
        DataRequirements(
            names=["PRESsfc", "air_temperature_0", "total_water_path"],
            n_timesteps=2,
        ),
    )
    sample, time, _ = window[0]
    assert sample["PRESsfc"].shape == (2, NY, NX)
    assert not np.isnan(sample["air_temperature_0"]).any()


def test_roundtrip_filter_removes_high_modes():
    from ace_tpu.data_process.compute_dataset import roundtrip_filter
    from ace_tpu.ops.sht import RealSHT

    rng = np.random.RandomState(1)
    nlat, nlon = 16, 32
    x = rng.randn(2, nlat, nlon).astype(np.float32)
    out = roundtrip_filter({"x": x.copy()}, 0.5)["x"]
    assert out.shape == x.shape
    # high-l modes are gone: transform of the output has (near-)zero
    # coefficients beyond the kept band
    sht = RealSHT(nlat, nlon, grid="legendre-gauss")
    coeffs = np.asarray(sht(out))
    kept_l = round(0.5 * nlat)
    power_high = np.abs(coeffs[:, kept_l:, :]).max()
    power_low = np.abs(coeffs[:, :kept_l, :]).max()
    assert power_high < 1e-4 * power_low
    # and the filtered field differs from the input (modes were removed)
    assert np.abs(out - x).max() > 1e-3
