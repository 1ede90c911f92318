"""UFS-replay ingestion: ocean coarsening/mask/NN-fill math + the
end-to-end CLI on synthetic UFS-format zarrs (reference:
scripts/ufs-replay/pipeline/ufs-replay-pipeline.py)."""

import numpy as np
import pytest
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process import ufs_replay as ur

NY, NX, NL = 10, 16, 6
PAIRS = [[0, 2], [2, 4], [4, 6]]


def test_ocean_weighted_mean_masks_nan():
    var = np.asarray([[1.0], [3.0], [np.nan]])[:, :, None]
    ho = np.asarray([[1.0], [3.0], [5.0]])[:, :, None]
    out = ur.ocean_weighted_mean(var, ho, axis=0)
    # NaN level contributes nothing: (1*1 + 3*3) / (1+3)
    np.testing.assert_allclose(out, [[2.5]])
    all_nan = np.full((2, 1, 1), np.nan)
    out = ur.ocean_weighted_mean(all_nan, ho[:2], axis=0)
    assert np.isnan(out).all()


def test_build_masks_per_level():
    ref = np.ones((4, 2, 2))
    ref[0, 0, 0] = np.nan  # land at surface
    ref[2:, :, :] = np.nan  # below sea floor everywhere
    ref[2, 1, 1] = 1.0  # except one deep cell
    masks, mask2d = ur.build_masks(ref, [[0, 2], [2, 4]])
    np.testing.assert_array_equal(mask2d, [[0, 1], [1, 1]])
    np.testing.assert_array_equal(masks["mask_0"], [[1, 1], [1, 1]])
    np.testing.assert_array_equal(masks["mask_1"], [[0, 0], [0, 1]])


def test_nn_fill_roundtrip():
    field = np.asarray([
        [1.0, 2.0, np.nan],
        [3.0, 4.0, 5.0],
    ])
    ocean = np.ones_like(field)
    fill = ur.compute_nn_fill_indices(field, ocean)
    assert fill is not None
    filled = ur.apply_nn_fill(field.copy()[None], fill)[0]
    assert np.isfinite(filled).all()
    # the NaN took its nearest valid neighbour's value
    assert filled[0, 2] in (2.0, 5.0)
    # nothing to fill -> None
    assert ur.compute_nn_fill_indices(
        np.ones((2, 2)), np.ones((2, 2))
    ) is None


def _write_sources(tmp_path):
    rng = np.random.RandomState(0)
    lat = np.linspace(-87.5, 87.5, NY)
    lon = np.linspace(0, 360, NX, endpoint=False)
    n_ocean = 3
    otime = TimeCoord.from_range("2000-01-01T06:00", n_ocean, 21600)
    land = np.zeros((NY, NX), bool)
    land[:2, :4] = True  # a land patch

    def field2d(n_t):
        a = rng.randn(n_t, NY, NX).astype(np.float32)
        a[:, land] = np.nan
        return a

    arrays = {"lat": lat, "lon": lon,
              "z_l": np.asarray([1.0, 3.0, 7.0, 15.0, 30.0, 60.0])}
    dims = {"lat": ("lat",), "lon": ("lon",), "z_l": ("z_l",)}
    for name in ("temp", "so", "uo", "vo", "ho"):
        a = np.abs(rng.randn(n_ocean, NL, NY, NX)).astype(np.float32)
        if name == "temp":
            a = a + 10.0
        if name == "ho":
            a = a + 1.0
        a[:, :, land] = np.nan
        a[:, 4:, NY // 2:, :] = np.nan  # shallow region: no deep levels
        if name == "ho":
            a = np.nan_to_num(a, nan=0.0)
        arrays[name] = a
        dims[name] = ("time", "z_l", "lat", "lon")
    for name in ("SSH", "taux", "tauy") + tuple(ur.WFO_COMPONENTS) + \
            tuple(ur.HFDS_COMPONENTS):
        arrays[name] = field2d(n_ocean)
        dims[name] = ("time", "lat", "lon")
    arrays["deptho"] = np.where(land, np.nan, 50.0).astype(np.float32)
    dims["deptho"] = ("lat", "lon")
    opath = str(tmp_path / "mom6.zarr")
    write_zarr(opath, arrays, dims, time=otime)

    # atmosphere: 3-hourly covering the ocean window
    n_atmo = 7
    at = TimeCoord.from_range("2000-01-01T03:00", n_atmo, 10800)
    a_arrays = {"lat": lat, "lon": lon}
    a_dims = {"lat": ("lat",), "lon": ("lon",)}
    for name in list(ur.ATMO_FORCING_VARS) + \
            list(ur.FROZEN_PRECIP_ACCUM_VARS) + list(ur.ICE_VARS):
        a = np.abs(rng.randn(n_atmo, NY, NX)).astype(np.float32)
        if name in ur.ICE_VARS:
            a[:, land] = np.nan
            if name == "icec":
                a = np.clip(a - 0.5, 0, 1)
        a_arrays[name] = a
        a_dims[name] = ("time", "lat", "lon")
    apath = str(tmp_path / "fv3.zarr")
    write_zarr(apath, a_arrays, a_dims, time=at)
    return opath, apath


@pytest.mark.medium_duration
def test_ufs_replay_end_to_end(tmp_path):
    opath, apath = _write_sources(tmp_path)
    cfg = {
        "ocean_path": opath,
        "atmo_path": apath,
        "output_path": str(tmp_path / "out.zarr"),
        "start_time": "2000-01-01T06:00:00",
        "end_time": "2000-01-01T18:00:00",
        "output_grid": "F22.5",
        "vertical_coarsening_indices": PAIRS,
    }
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    ur.main(["--yaml", str(tmp_path / "cfg.yaml"), "--debug"])
    ur.main(["--yaml", str(tmp_path / "cfg.yaml")])

    out = open_file_dataset(str(tmp_path / "out.zarr"))
    t = out.read_time()
    assert len(t) == 3
    ny, nx = 45, 90
    for name in ("thetao_0", "so_2", "uo_1", "sst", "ssu", "ssv",
                 "zos", "tauuo", "tauvo", "wfo", "hfds",
                 "hfds_total_area",
                 "DLWRFsfc", "PRATEsfc",
                 "total_frozen_precipitation_rate",
                 "ocean_sea_ice_fraction", "HI", "sea_ice_volume"):
        assert name in out.keys(), name
        assert out[name].shape == (3, ny, nx), name
    # DepthCoordinate invariants
    assert float(out["idepth_0"].read(())) == 0.0
    assert float(out["idepth_3"].read(())) == 60.0
    for name in ("mask_0", "mask_1", "mask_2", "mask_2d",
                 "land_fraction", "sea_surface_fraction", "deptho"):
        assert out[name].shape == (ny, nx), name
    # fractions complement
    land = out["land_fraction"].read(())
    sea = out["sea_surface_fraction"].read(())
    np.testing.assert_allclose(land + sea, 1.0, atol=1e-6)
    # sst = thetao_0 + 273.15 where defined
    sst = out["sst"].read(())
    th0 = out["thetao_0"].read(())
    valid = np.isfinite(th0)
    np.testing.assert_allclose(sst[valid], th0[valid] + 273.15,
                               rtol=1e-6)
    # ocean-only masking: land cells NaN in masked fields, but the
    # atmosphere forcings are defined everywhere
    mask2d = out["mask_2d"].read(())
    assert np.isnan(out["zos"].read(())[:, mask2d == 0]).all()
    assert np.isfinite(out["DLWRFsfc"].read(())).all()
    # raw flux components were consumed into wfo/hfds
    assert "evap" not in out.keys() and "SW" not in out.keys()
