"""HEALPix dataset ETL (reference: scripts/data_process/
compute_hpx_dataset.py): pixel-center coordinates, bilinear regridding,
neighbor NaN fill, and the end-to-end CLI."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_h5, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process.compute_hpx_dataset import (
    BilinearRegridder,
    fill_nans_with_neighbors,
    healpix_latlon_xy,
)


def test_healpix_latlon_xy_geometry():
    nside = 8
    lat, lon = healpix_latlon_xy(nside)
    assert lat.shape == (12, nside, nside)
    assert np.all(np.abs(lat) < 90.0)
    assert np.all((lon >= 0.0) & (lon < 360.0))
    # equal-area pixels: the spherical mean of any smooth f equals the
    # plain pixel mean; test with f = sin^2(lat) whose mean is 1/3
    f = np.sin(np.deg2rad(lat)) ** 2
    np.testing.assert_allclose(f.mean(), 1.0 / 3.0, atol=2e-3)
    # northern four faces (0-3) are centered in the northern hemisphere
    assert lat[:4].mean() > 20
    assert lat[8:].mean() < -20


def test_bilinear_regridder_exact_on_smooth_field():
    nside = 16
    hlat, hlon = healpix_latlon_xy(nside)
    src_lat = np.linspace(-89.5, 89.5, 180)
    src_lon = np.linspace(0, 360, 360, endpoint=False)

    def f(lat_deg, lon_deg):
        lat_r, lon_r = np.deg2rad(lat_deg), np.deg2rad(lon_deg)
        return np.sin(lat_r) + 0.5 * np.cos(lat_r) * np.cos(lon_r)

    field = f(src_lat[:, None], src_lon[None, :])
    regrid = BilinearRegridder(src_lat, src_lon, hlat, hlon)
    out = regrid(field).reshape(12, nside, nside)
    expected = f(hlat, hlon)
    # pixels poleward of +-89.5 are NaN; everything else is bilinear
    valid = ~np.isnan(out)
    assert valid.mean() > 0.99
    np.testing.assert_allclose(out[valid], expected[valid], atol=3e-4)
    # descending-latitude sources give identical results
    regrid_desc = BilinearRegridder(
        src_lat[::-1], src_lon, hlat, hlon
    )
    out2 = regrid_desc(field[::-1]).reshape(12, nside, nside)
    np.testing.assert_array_equal(
        np.nan_to_num(out2, nan=-999), np.nan_to_num(out, nan=-999)
    )


def test_fill_nans_with_neighbors():
    arr = np.arange(2 * 12 * 4 * 4, dtype=np.float64).reshape(2, 12, 4, 4)
    arr[0, 3, 1, 1] = np.nan
    arr[1, 4, 0, 0] = np.nan
    filled = fill_nans_with_neighbors(arr)
    assert not np.isnan(filled).any()
    base = np.arange(2 * 12 * 4 * 4, dtype=np.float64).reshape(
        2, 12, 4, 4
    )
    np.testing.assert_allclose(
        filled[0, 3, 1, 1],
        np.mean([base[0, 3, 0, 1], base[0, 3, 2, 1],
                 base[0, 3, 1, 0], base[0, 3, 1, 2]]),
    )
    # corner pixel has only two in-face neighbors
    np.testing.assert_allclose(
        filled[1, 4, 0, 0],
        np.mean([base[1, 4, 1, 0], base[1, 4, 0, 1]]),
    )
    # untouched values pass through
    mask = ~np.isnan(arr)
    np.testing.assert_array_equal(filled[mask], base[mask])


def test_compute_hpx_dataset_end_to_end(tmp_path):
    from ace_tpu.data_process.compute_dataset import DatasetConfig
    from ace_tpu.data_process.compute_hpx_dataset import run

    n_time, ny, nx = 5, 24, 48
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    lat = np.linspace(-87.5, 87.5, ny)
    lon = np.linspace(0, 360, nx, endpoint=False)

    def f(lat_deg, lon_deg):
        lat_r, lon_r = np.deg2rad(lat_deg), np.deg2rad(lon_deg)
        return np.sin(lat_r) + 0.5 * np.cos(lat_r) * np.sin(lon_r)

    smooth = f(lat[:, None], lon[None, :])
    a = (np.arange(n_time)[:, None, None] + smooth[None]).astype(
        np.float32
    )
    static = smooth.astype(np.float32)
    # 4-D [T, Z, Y, X]: per-level offsets must survive the regrid with
    # the level axis intact (regression: level axis must not be folded
    # into the time axis of the output store)
    nz = 3
    b = (
        a[:, None] + 100.0 * np.arange(nz)[None, :, None, None]
    ).astype(np.float32)
    write_zarr(
        str(run_dir / "state.zarr"),
        {"a": a, "b": b, "static": static,
         "grid_yt": lat, "grid_xt": lon,
         "pfull": np.arange(nz, dtype=float)},
        {"a": ("time", "grid_yt", "grid_xt"),
         "b": ("time", "pfull", "grid_yt", "grid_xt"),
         "static": ("grid_yt", "grid_xt"),
         "grid_yt": ("grid_yt",), "grid_xt": ("grid_xt",),
         "pfull": ("pfull",)},
        time=time,
    )
    # the config schema requires the vertical coordinate file even though
    # the HEALPix path does not use it (same as the reference)
    write_h5(str(tmp_path / "vc.nc"),
             {"ak": np.zeros(3)[None], "bk": np.linspace(0, 1, 3)[None]},
             {"ak": ("Time", "xaxis_1"), "bk": ("Time", "xaxis_1")})
    cfg = {
        "dataset_computation": {
            "reference_vertical_coordinate_file": str(tmp_path / "vc.nc"),
            "vertical_coarsening_indices": [[0, 2]],
            "variable_sources": {"state.zarr": ["a", "b", "static"]},
            "n_split": 2,
            "standard_names": {
                "graupel_mixing_ratio": "none", "rain_mixing_ratio": "none",
                "snow_mixing_ratio": "none", "cloud_ice_mixing_ratio": "none",
                "cloud_water_mixing_ratio": "none",
                "specific_humidity": "none",
                "total_frozen_precip_rate": "none",
                "precipitable_water_path": "none",
                "surface_snow_rate": "none", "surface_ice_rate": "none",
                "surface_graupel_rate": "none",
            },
            "renaming": {"a": "a_hpx"},
            "chunking": {"time_dim": 2},
        },
    }
    cfg_path = tmp_path / "hpx.yaml"
    with open(cfg_path, "w") as fcfg:
        yaml.safe_dump(cfg, fcfg)
    config = DatasetConfig.from_file(str(cfg_path)).dataset_computation
    out = tmp_path / "out.zarr"
    run(config, str(run_dir), str(out), level=3)

    ds = open_file_dataset(str(out))
    nside = 8
    hlat = ds["lat"].read(())
    hlon = ds["lon"].read(())
    assert hlat.shape == (12, nside, nside)
    a_h = ds["a_hpx"].read(())
    assert a_h.shape == (n_time, 12, nside, nside)
    assert not np.isnan(a_h).any()
    expected = f(hlat, hlon)
    # the time-dependent field is offset + smooth pattern
    for t in range(n_time):
        np.testing.assert_allclose(
            a_h[t] - t, expected, atol=2e-2
        )
    np.testing.assert_allclose(
        ds["static"].read(()), expected, atol=2e-2
    )
    b_h = ds["b"].read(())
    assert b_h.shape == (n_time, 3, 12, nside, nside)
    assert ds["b"].dims == ("time", "pfull", "face", "height", "width")
    for t in range(n_time):
        for z in range(3):
            np.testing.assert_allclose(
                b_h[t, z] - t - 100.0 * z, expected, atol=2e-2
            )
    assert len(ds.read_time()) == n_time


def test_compute_dlwp_dataset(tmp_path):
    """DLWP restructuring of an hpx zarr (reference:
    scripts/data_process/compute_dlwp_dataset.py): channel stacking with
    name coordinates, constants split, inputs == targets."""
    rng = np.random.RandomState(9)
    n_time, nside = 6, 4
    time = TimeCoord.from_range("2000-01-01T00:00", n_time, 21600)
    hlat, hlon = healpix_latlon_xy(nside)
    a = rng.randn(n_time, 12, nside, nside).astype(np.float32)
    b = rng.randn(n_time, 12, nside, nside).astype(np.float32)
    land = rng.rand(12, nside, nside).astype(np.float32)
    dims4 = ("time", "face", "height", "width")
    write_zarr(
        str(tmp_path / "hpx.zarr"),
        {"a": a, "b": b, "land": land, "lat": hlat, "lon": hlon,
         "face": np.arange(12), "height": np.arange(nside),
         "width": np.arange(nside)},
        {"a": dims4, "b": dims4, "land": dims4[1:],
         "lat": dims4[1:], "lon": dims4[1:],
         "face": ("face",), "height": ("height",), "width": ("width",)},
        time=time,
    )

    from ace_tpu.data_process.compute_dlwp_dataset import main

    main([str(tmp_path / "hpx.zarr"), str(tmp_path / "dlwp.zarr"),
          "--time-chunk", "2"])
    ds = open_file_dataset(str(tmp_path / "dlwp.zarr"))
    inputs = ds["inputs"].read(())
    assert inputs.shape == (n_time, 2, 12, nside, nside)
    ch = ds["inputs"].attrs["channel_in"]
    stacked = {name: inputs[:, i] for i, name in enumerate(ch)}
    np.testing.assert_array_equal(stacked["a"], a)
    np.testing.assert_array_equal(stacked["b"], b)
    np.testing.assert_array_equal(
        ds["targets"].read(()), inputs
    )
    const = ds["constants"].read(())
    assert const.shape == (1, 12, nside, nside)
    np.testing.assert_array_equal(const[0], land)
    assert ds["constants"].attrs["channel_c"] == ["land"]
    assert ds.attrs["channel_out"] == ["a", "b"]
    np.testing.assert_array_equal(ds["lat"].read(()), hlat)
