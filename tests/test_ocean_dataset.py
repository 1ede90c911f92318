"""Ocean dataset ETL (reference:
scripts/data_process/compute_ocean_dataset.py post-regrid pipeline):
vector rotation, level splitting + masks, sea-ice cleanup and volume,
sst, land-surface NaNs, supplemental coarsening, and the CLI."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process.compute_ocean_dataset import rotate_vectors

NT, NZ, NY, NX = 4, 3, 5, 8


def _make_run(tmp_path):
    rng = np.random.RandomState(0)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    time = TimeCoord.from_range("0201-01-03T00:00", NT, 5 * 86400,
                                calendar="noleap")
    lat = np.linspace(-70, 70, NY)
    lon = np.linspace(0, 360, NX, endpoint=False)

    wet = (rng.rand(NZ, NY, NX) > 0.3).astype(np.float64)
    wet[1:] = np.minimum(wet[1:], wet[:-1])  # columns close downward
    angle = rng.rand(NY, NX) * 0.3

    def ocean_var():
        return rng.randn(NT, NZ, NY, NX)

    uo, vo = ocean_var(), ocean_var()
    thetao, so = ocean_var() + 10.0, ocean_var() + 35.0
    tos = thetao[:, 0].copy()
    tauuo = rng.randn(NT, NY, NX)
    tauvo = rng.randn(NT, NY, NX)
    area = np.abs(rng.rand(NY, NX)) * 1e10

    dims4 = ("time", "lev", "y", "x")
    dims3 = ("time", "y", "x")
    ocean = {
        "uo": uo, "vo": vo, "thetao": thetao, "so": so, "tos": tos,
        "tauuo": tauuo, "tauvo": tauvo, "wetmask": wet, "angle": angle,
        "areacello": area,
        "y": lat, "x": lon, "lev": np.arange(NZ, dtype=float),
    }
    odims = {k: dims4 if ocean[k].ndim == 4 else dims3 for k in ocean}
    odims.update({"wetmask": ("lev", "y", "x"), "angle": ("y", "x"),
                  "areacello": ("y", "x"), "y": ("y",), "x": ("x",),
                  "lev": ("lev",)})
    write_zarr(str(run_dir / "ocean.zarr"), ocean, odims, time=time)

    ext = (rng.rand(NT, NY, NX) > 0.5).astype(np.float64)
    sif = np.clip(rng.rand(NT, NY, NX), 0, 1) * ext
    hi = np.abs(rng.rand(NT, NY, NX)) * 2
    ui, vi = rng.randn(NT, NY, NX), rng.randn(NT, NY, NX)
    ice = {"EXT": ext, "sea_ice_fraction": sif, "HI": hi, "UI": ui,
           "VI": vi, "y": lat, "x": lon}
    idims = {k: dims3 for k in ice}
    idims.update({"y": ("y",), "x": ("x",)})
    write_zarr(str(run_dir / "ice.zarr"), ice, idims, time=time)

    cfg = {
        "dataset_computation": {
            "ocean_zarr": "ocean.zarr",
            "ice_zarr": "ice.zarr",
            "interface_depths": [0.0, 10.0, 50.0, 200.0],
            "shift_timestamps_to_avg_interval_midpoint": True,
        },
    }
    cfg_path = tmp_path / "ocean.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return run_dir, cfg_path, ocean, ice, wet, angle, time


def test_compute_ocean_dataset_end_to_end(tmp_path):
    run_dir, cfg_path, ocean, ice, wet, angle, time = _make_run(tmp_path)
    out_path = tmp_path / "out.zarr"

    from ace_tpu.data_process.compute_ocean_dataset import main

    main(["--config", str(cfg_path), "--run-directory", str(run_dir),
          "--output-store", str(out_path)])
    ds = open_file_dataset(str(out_path))

    mask0 = ds["mask_0"].read(())
    np.testing.assert_array_equal(mask0, wet[0])
    surf = mask0 > 0

    # 3-D variables split by level, rotated by the grid angle, and
    # NaN-filled on land
    u_rot, v_rot = rotate_vectors(ocean["uo"], ocean["vo"], angle)
    for i in range(NZ):
        got = ds[f"uo_{i}"].read(())
        np.testing.assert_allclose(
            got[:, surf], u_rot[:, i][:, surf], rtol=1e-6
        )
        assert np.isnan(got[:, ~surf]).all()
        np.testing.assert_array_equal(ds[f"mask_{i}"].read(()), wet[i])
    assert "uo" not in ds and "wetmask" not in ds

    # sst in Kelvin over water
    sst = ds["sst"].read(())
    np.testing.assert_allclose(
        sst[:, surf], ocean["tos"][:, surf] + 273.15, rtol=1e-6
    )

    # ice velocities are rotated like the ocean currents, then NaN
    # where EXT == 0 (over water)
    ui = ds["UI"].read(())
    ui_rot, _ = rotate_vectors(ice["UI"], ice["VI"], angle)
    no_ice = (ice["EXT"] == 0) & surf[None]
    assert np.isnan(ui[no_ice]).all()
    has_ice = (ice["EXT"] > 0) & surf[None]
    np.testing.assert_allclose(ui[has_ice], ui_rot[has_ice], rtol=1e-6)

    # thickness zeroed where no ice; volume = H * area * sif / km^3
    hi = ds["HI"].read(())
    sif = ds["sea_ice_fraction"].read(())
    zero_ice = (np.nan_to_num(sif) == 0) & surf[None]
    np.testing.assert_array_equal(hi[zero_ice], 0.0)
    vol = ds["sea_ice_volume"].read(())
    expect_vol = hi * ocean["areacello"] * sif / 1e9
    both = np.isfinite(vol) & np.isfinite(expect_vol)
    np.testing.assert_allclose(vol[both], expect_vol[both], rtol=1e-6)

    # interface depths as scalars
    for i, d in enumerate([0.0, 10.0, 50.0, 200.0]):
        np.testing.assert_allclose(ds[f"idepth_{i}"].read(()), d)

    # midpoint timestamp shift: back by half the 5-day step
    t = ds.read_time()
    assert t.calendar == "noleap"
    assert time.values[0] - t.values[0] == 5 * 86400 * 10**6 // 2


def test_coarsen_merge_and_regrid(tmp_path):
    run_dir, cfg_path, ocean, ice, wet, angle, time = _make_run(tmp_path)
    # supplemental dataset at 4x frequency -> coarsen to the ocean step
    rng = np.random.RandomState(5)
    lat = ocean["y"]
    lon = ocean["x"]
    sup_time = TimeCoord.from_range(
        "0201-01-03T00:00", NT * 4, 5 * 86400 // 4, calendar="noleap"
    )
    flux = rng.randn(NT * 4, NY, NX)
    write_zarr(
        str(run_dir / "sup.zarr"),
        {"hfds_raw": flux, "y": lat, "x": lon},
        {"hfds_raw": ("time", "y", "x"), "y": ("y",), "x": ("x",)},
        time=sup_time,
    )
    cfg = yaml.safe_load(open(cfg_path))
    cfg["dataset_computation"]["coarsen"] = {
        "zarr": "sup.zarr", "n_coarsen": 4,
        "renaming": {"hfds_raw": "hfds"},
    }
    cfg["dataset_computation"][
        "shift_timestamps_to_avg_interval_midpoint"
    ] = False
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.data_process.compute_ocean_dataset import (
        OceanDatasetConfig, run,
    )

    config = OceanDatasetConfig.from_file(str(cfg_path))
    run(config.dataset_computation, str(run_dir), str(tmp_path / "o.zarr"))
    ds = open_file_dataset(str(tmp_path / "o.zarr"))
    hfds = ds["hfds"].read(())
    surf = wet[0] > 0
    expected = flux.reshape(NT, 4, NY, NX).mean(axis=1)
    np.testing.assert_allclose(
        hfds[:, surf], expected[:, surf], rtol=1e-6
    )


def test_compute_sea_ice_dataset(tmp_path):
    """Sea-ice ETL post-processing (reference:
    scripts/data_process/compute_sea_ice_dataset.py)."""
    rng = np.random.RandomState(7)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    n_time = 4
    time = TimeCoord.from_range("0201-01-01T00:00", n_time, 21600,
                                calendar="noleap")
    lat = np.linspace(-70, 70, NY)
    lon = np.linspace(0, 360, NX, endpoint=False)
    angle = rng.rand(NY, NX) * 0.2
    fa_x = rng.randn(n_time, NY, NX)
    fa_y = rng.randn(n_time, NY, NX)
    sif = np.clip(rng.rand(n_time, NY, NX), 0, 1)
    sif[0, 0, 0] = np.nan
    write_zarr(
        str(run_dir / "ice.zarr"),
        {"FA_X": fa_x, "FA_Y": fa_y, "sea_ice_fraction": sif,
         "angle": angle, "y": lat, "x": lon},
        {"FA_X": ("time", "y", "x"), "FA_Y": ("time", "y", "x"),
         "sea_ice_fraction": ("time", "y", "x"), "angle": ("y", "x"),
         "y": ("y",), "x": ("x",)},
        time=time,
    )
    wet = (rng.rand(NY, NX) > 0.3).astype(np.float64)
    write_zarr(
        str(run_dir / "static.zarr"),
        {"wet": wet, "y": lat, "x": lon},
        {"wet": ("y", "x"), "y": ("y",), "x": ("x",)},
    )
    cfg = {"dataset_computation": {
        "ice_zarr": "ice.zarr",
        "ocean_static": {"zarr": "static.zarr", "names": ["wet"]},
        # upstream keys from the reference's YAMLs are tolerated
        "nc_mosaic_path": "/gcs/unused.nc",
        "nc_target_grid_path": "/gcs/unused.nc",
    }}
    cfg_path = tmp_path / "si.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.data_process.compute_sea_ice_dataset import main

    main(["--config", str(cfg_path), "--run-directory", str(run_dir),
          "--output-store", str(tmp_path / "out.zarr")])
    ds = open_file_dataset(str(tmp_path / "out.zarr"))
    surf = wet > 0
    fa_x_rot, _ = rotate_vectors(fa_x, fa_y, angle)
    got = ds["FA_X"].read(())
    np.testing.assert_allclose(
        got[:, surf], fa_x_rot[:, surf].astype(np.float32), rtol=1e-5
    )
    assert np.isnan(got[:, ~surf]).all()
    # sea-ice fraction NaN-filled to 0 over water
    sif_out = ds["sea_ice_fraction"].read(())
    assert not np.isnan(sif_out[:, surf]).any()
    np.testing.assert_array_equal(
        ds["sea_surface_fraction"].read(()), wet.astype(np.float32)
    )
