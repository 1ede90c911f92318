"""ERA5 ingestion: physics transforms + the end-to-end CLI on synthetic
ARCO-format zarrs (reference: scripts/era5/pipeline/xr-beam-pipeline.py;
the native pipeline replaces beam/xesmf with in-process chunks on the
conservative regridder)."""

import numpy as np
import pytest
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process import era5_ingest as e5

NY, NX = 10, 16  # source grid
NL = 4  # model levels (test-sized; the real pipeline uses 137)


def test_specific_humidity_from_dewpoint():
    # metview formula: q = eps*e/(p - (1-eps)e), e = a1*exp(a3(t-a2)/(t-a4))
    t, p = 283.0, 1.0e5
    e = 611.21 * np.exp(17.502 * (283.0 - 273.16) / (283.0 - 32.19))
    expected = 0.621981 * e / (p - (1 - 0.621981) * e)
    got = e5.specific_humidity_from_dewpoint(
        np.asarray(t), np.asarray(p)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_merged_sst_and_skin_temperature():
    sst = np.asarray([[300.0, np.nan, 301.0]])
    skin = np.asarray([[280.0, 281.0, 282.0]])
    ocean = np.asarray([[0.9, 0.9, 0.2]])
    out = e5.merged_sea_surface_and_skin_temperature(sst, skin, ocean)
    # ocean & valid -> SST; ocean & NaN SST -> skin; land -> skin
    np.testing.assert_array_equal(out, [[300.0, 281.0, 282.0]])


def test_snow_conversions():
    depth = np.asarray(0.05)  # m of liquid water equivalent
    density = np.asarray(250.0)
    amount = e5.surface_snow_amount(depth)
    assert amount == 50.0  # kg/m^2
    frac = e5.surface_snow_area_fraction(depth, density)
    np.testing.assert_allclose(frac, 1.0)  # 0.2/0.1 capped at 1
    thick = e5.surface_snow_thickness(amount, density, frac)
    np.testing.assert_allclose(thick, 0.2)
    # zero snow: thickness falls back to 0, not NaN
    z = e5.surface_snow_thickness(
        np.asarray(0.0), density, np.asarray(0.0)
    )
    assert z == 0.0


def test_soil_type_fractions_one_hot():
    soil = np.asarray([[0.0, 2.0001, 7.0]])
    fr = e5.soil_type_fractions(soil)
    assert fr["undefined_soil_type_fraction"].tolist() == [[1, 0, 0]]
    assert fr["medium_soil_type_fraction"].tolist() == [[0, 1, 0]]
    assert fr["tropical_organic_soil_type_fraction"].tolist() == [[0, 0, 1]]


def test_vertical_coarsen_pressure_weighting():
    ak = e5.fix_top_interface(np.asarray([0.0, 100.0, 200.0, 0.0, 0.0]))
    bk = np.asarray([0.0, 0.0, 0.1, 0.5, 1.0])
    ps = np.full((2, 3), 1.0e5)
    dp = e5.layer_thicknesses(ak, bk, ps)
    assert dp.shape == (4, 2, 3)
    # total thickness telescopes to ak[-1]+bk[-1]*ps - (ak[0]+bk[0]*ps)
    np.testing.assert_allclose(
        dp.sum(axis=0), (0.0 + 1.0 * ps) - ak[0], rtol=1e-12
    )
    # a constant field coarsens to itself
    var = np.full((4, 2, 3), 7.0)
    out = e5.vertical_coarsen(var, dp, [0, 2, 4])
    assert len(out) == 2
    np.testing.assert_allclose(out[0], 7.0, rtol=1e-6)
    # pressure weighting: layers valued by index, coarse value is the
    # dp-weighted mean
    var = np.arange(4.0)[:, None, None] * np.ones((1, 2, 3))
    out = e5.vertical_coarsen(var, dp, [0, 4])
    expected = (var * dp).sum(axis=0) / dp.sum(axis=0)
    np.testing.assert_allclose(out[0], expected, rtol=1e-6)


def test_mean_flux_derivations():
    names = e5.MEAN_FLUX_VARS
    rng = np.random.RandomState(0)
    block = {n: rng.rand(6, NY, NX) for n in names}
    regrid = lambda x, **kw: x  # identity: checks the algebra only
    out = e5.process_mean_flux_window(block, regrid)
    mean = {n: b.mean(axis=0) for n, b in block.items()}
    np.testing.assert_allclose(
        out["USWRFtoa"],
        mean["mean_top_downward_short_wave_radiation_flux"]
        - mean["mean_top_net_short_wave_radiation_flux"],
    )
    np.testing.assert_allclose(
        out["ULWRFtoa"], -mean["mean_top_net_long_wave_radiation_flux"]
    )
    np.testing.assert_allclose(
        out["SHTFLsfc"], -mean["mean_surface_sensible_heat_flux"]
    )
    np.testing.assert_allclose(
        out["eastward_surface_stress"],
        mean["mean_eastward_gravity_wave_surface_stress"]
        + mean["mean_eastward_turbulent_surface_stress"],
    )


def test_check_data_validity():
    good = np.ones((2, 3, 3))
    e5.check_data_validity("temperature", good)
    bad = good.copy()
    bad[1, 0, 0] = np.nan
    with pytest.raises(ValueError, match="temperature"):
        e5.check_data_validity("temperature", bad)
    # masked variables only fail when a whole slice is missing
    e5.check_data_validity("sea_surface_temperature", bad)
    with pytest.raises(ValueError):
        e5.check_data_validity(
            "sea_surface_temperature", np.full((1, 2, 2), np.nan)
        )


def _write_sources(tmp_path):
    rng = np.random.RandomState(0)
    lat = np.linspace(87.5, -87.5, NY)  # descending like ARCO-ERA5
    lon = np.linspace(0, 360, NX, endpoint=False)
    n_hourly = 13  # hours 0..12 -> output steps at hours 6 and 12
    time = TimeCoord.from_range("2001-01-01T00:00", n_hourly, 3600)

    arrays = {"latitude": lat, "longitude": lon,
              "level": np.asarray(e5.OUTPUT_PRESSURE_LEVELS_GEOPOTENTIAL,
                                  np.float64)}
    dims = {"latitude": ("latitude",), "longitude": ("longitude",),
            "level": ("level",)}

    def surf(seed, positive=False, n_t=n_hourly):
        a = rng.randn(n_t, NY, NX).astype(np.float32)
        return np.abs(a) if positive else a

    for n in e5.MEAN_FLUX_VARS:
        arrays[n] = surf(0)
        dims[n] = ("time", "latitude", "longitude")
    for n in e5.SURFACE_ANALYSIS_VARS:
        a = surf(0, positive=True) + 0.5
        if n == "sea_surface_temperature":
            a = a + 280.0
            a[:, :2] = np.nan  # land-masked rows
        if n == "sea_ice_cover":
            a = np.clip(a - 0.5, 0, 1)
        if n == "snow_density":
            a = a * 100 + 100
        arrays[n] = a
        dims[n] = ("time", "latitude", "longitude")
    for n in e5.MODEL_LEVEL_SURFACE_VARS:
        a = surf(0, positive=True)
        if n == "surface_pressure":
            a = a * 1e3 + 1.0e5
        if n in ("2m_temperature", "skin_temperature",
                 "2m_dewpoint_temperature"):
            a = a + 280.0
        arrays[n] = a
        dims[n] = ("time", "latitude", "longitude")
    for n in e5.PRESSURE_LEVEL_VARS:
        arrays[n] = rng.randn(
            n_hourly, len(arrays["level"]), NY, NX
        ).astype(np.float32) + (300.0 if n == "temperature" else 0.0)
        dims[n] = ("time", "level", "latitude", "longitude")
    arrays["land_sea_mask"] = np.clip(
        rng.rand(NY, NX), 0, 1
    ).astype(np.float32)
    arrays["geopotential_at_surface"] = (
        rng.rand(NY, NX).astype(np.float32) * 1e4
    )
    arrays["soil_type"] = rng.randint(0, 8, (NY, NX)).astype(np.float32)
    for n in e5.INVARIANT_VARS:
        dims[n] = ("latitude", "longitude")
    full37 = str(tmp_path / "full37.zarr")
    write_zarr(full37, arrays, dims, time=time)

    ml_arrays = {"latitude": lat, "longitude": lon}
    ml_dims = {"latitude": ("latitude",), "longitude": ("longitude",)}
    for n in e5.MODEL_LEVEL_3D_VARS:
        a = np.abs(rng.randn(n_hourly, NL, NY, NX)).astype(np.float32)
        if n == "temperature":
            a = a + 250.0
        ml_arrays[n] = a * (1e-3 if "specific" in n else 1.0)
        ml_dims[n] = ("time", "hybrid", "latitude", "longitude")
    ml = str(tmp_path / "ml.zarr")
    write_zarr(ml, ml_arrays, ml_dims, time=time)

    co2_time = TimeCoord.from_range("2000-01-01T00:00", 3,
                                    365 * 86400)
    co2 = str(tmp_path / "co2.zarr")
    write_zarr(co2, {"carbon_dioxide":
                     np.asarray([370.0, 372.0, 374.0], np.float32)},
               {"carbon_dioxide": ("time",)}, time=co2_time)
    return full37, ml, co2


@pytest.mark.medium_duration
def test_era5_ingest_end_to_end(tmp_path):
    full37, ml, co2 = _write_sources(tmp_path)
    ak = [0.0, 50.0, 100.0, 50.0, 0.0]
    bk = [0.0, 0.0, 0.1, 0.5, 1.0]
    cfg = {
        "full_37_path": full37,
        "model_level_path": ml,
        "co2_path": co2,
        "output_path": str(tmp_path / "out.zarr"),
        "start_time": "2001-01-01T06:00:00",
        "end_time": "2001-01-01T12:00:00",
        "output_grid": "F22.5",
        "output_layer_indices": [0, 2, 4],
        "ak": ak, "bk": bk, "n_input_layers": NL,
        "check_data_validity": False,
    }
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    e5.main(["--yaml", str(tmp_path / "cfg.yaml"), "--debug"])
    e5.main(["--yaml", str(tmp_path / "cfg.yaml")])

    out = open_file_dataset(str(tmp_path / "out.zarr"))
    t = out.read_time()
    assert len(t) == 2  # hours 6 and 12
    ny, nx = 45, 90  # F22.5
    # every stream landed
    for name in ("DSWRFtoa", "USWRFtoa", "PRATEsfc",  # mean flux
                 "ocean_fraction", "sea_ice_fraction",
                 "merged_sea_surface_and_skin_temperature",
                 "surface_snow_amount",                # surface analysis
                 "Q850", "TMP500", "h500", "UGRD1000",  # pressure level
                 "air_temperature_0", "specific_total_water_1",
                 "PRESsfc", "Q2m", "surface_temperature",  # model level
                 "HGTsfc", "land_fraction",
                 "medium_soil_type_fraction"):          # invariant
        assert name in out.keys(), name
        arr = out[name].read(())
        expected = (2, ny, nx) if out[name].dims[0] == "time" \
            else (ny, nx)
        assert arr.shape == expected, (name, arr.shape)
        assert np.isfinite(arr).all(), name
    # vertical coordinate scalars
    assert float(out["ak_0"].read(())) == pytest.approx(25.0)  # midpointed
    assert float(out["bk_2"].read(())) == 1.0
    # co2 interpolated onto the output times
    co2_vals = out["carbon_dioxide"].read(())
    assert co2_vals.shape == (2,)
    assert 370.0 < co2_vals[0] < 374.0
    # ocean + land + ice == 1 after the negative-ocean correction
    land = out["land_fraction"].read(())
    ocean = out["ocean_fraction"].read(())
    ice = out["sea_ice_fraction"].read(())
    np.testing.assert_allclose(ocean + ice + land[None], 1.0, atol=1e-5)
    assert (ocean >= 0).all()
