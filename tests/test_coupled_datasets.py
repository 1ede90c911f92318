"""Coupled dataset creation ETL (reference:
scripts/data_process/create_coupled_datasets.py +
coupled_dataset_utils.py): fraction reconciliation, sea-ice masks,
flux window averages, SST blending modes, and the three-stage CLI."""

import numpy as np
import yaml

from ace_tpu.data.store import open_file_dataset, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process.coupled_datasets import (
    ArrayDataset,
    CoupledFieldNamesConfig,
    CoupledSeaIceConfig,
    CoupledSeaSurfaceConfig,
    CoupledSurfaceTemperatureConfig,
    CreateCoupledDatasetsConfig,
    _interpolate_sst,
    compute_coupled_atmosphere,
    compute_coupled_ocean,
    compute_coupled_sea_ice,
)
from ace_tpu.data_process.window_avg import WindowAvgDatasetConfig

NY, NX = 4, 8
N_ATMOS = 20  # 6-hourly
N_OCEAN = 5  # daily


def _atmos_dataset(rng):
    time = TimeCoord.from_range("2000-01-01T06:00", N_ATMOS, 21600)
    lat = np.linspace(-60, 60, NY)
    lon = np.linspace(0, 360, NX, endpoint=False)
    lfrac = np.clip(rng.rand(NY, NX), 0, 1)
    lfrac = np.broadcast_to(lfrac, (N_ATMOS, NY, NX)).copy()
    ifrac = np.clip(rng.rand(N_ATMOS, NY, NX) * 0.5, 0, 1) * (
        lfrac < 0.9
    )
    ofrac = np.clip(1 - lfrac - ifrac, 0, 1)
    ts = 280.0 + 10 * rng.randn(N_ATMOS, NY, NX)
    flux = rng.randn(N_ATMOS, NY, NX)
    data = {
        "land_fraction": lfrac, "sea_ice_fraction": ifrac,
        "ocean_fraction": ofrac, "surface_temperature": ts,
        "LHTFLsfc": flux,
    }
    return ArrayDataset(data, time, lat, lon)


def _ocean_dataset(rng, atmos):
    # daily means starting at the end of the first day
    time = TimeCoord.from_range("2000-01-02T00:00", N_OCEAN, 86400)
    sst = 275.0 + 8 * rng.randn(N_OCEAN, NY, NX)
    sst[:, 0, :] = 260.0  # cold band -> sea ice mask
    hfds = rng.randn(N_OCEAN, NY, NX)
    sfrac = np.clip(1 - atmos.data["land_fraction"][0], 0, 1)
    return ArrayDataset(
        {"sst": sst, "hfds": hfds, "sea_surface_fraction": sfrac},
        time, atmos.lat, atmos.lon,
    )


def test_coupled_sea_ice_fraction_reconciliation():
    rng = np.random.RandomState(0)
    atmos = _atmos_dataset(rng)
    ocean = _ocean_dataset(rng, atmos)
    out = compute_coupled_sea_ice(
        atmos, CoupledSeaIceConfig(), ocean=ocean,
    )
    lf = out.data["land_fraction"]
    of = out.data["ocean_fraction"]
    if_ = out.data["sea_ice_fraction"]
    sic = out.data["ocean_sea_ice_fraction"]
    # fractions sum to one everywhere
    np.testing.assert_allclose(lf + of + if_, 1.0, atol=1e-6)
    # sea ice concentration is ice fraction per unit sea surface
    sfrac = 1.0 - lf
    nz = sfrac > 1e-6
    np.testing.assert_allclose(
        if_[nz], (sic * sfrac)[nz], atol=1e-6
    )
    assert ((sic >= 0) & (sic <= 1)).all()
    # ts dropped by default
    assert "surface_temperature" not in out.data


def test_coupled_ocean_masking_and_fluxes():
    rng = np.random.RandomState(1)
    atmos = _atmos_dataset(rng)
    ocean = _ocean_dataset(rng, atmos)
    coupled_si = compute_coupled_sea_ice(
        atmos, CoupledSeaIceConfig(), ocean=ocean
    )
    config = CoupledSeaSurfaceConfig(
        surface_flux_window_avg=WindowAvgDatasetConfig(
            window_timedelta="24h",
            first_timestamp="2000-01-02T00:00:00",
            subset_names=["LHTFLsfc"],
        ),
        sst_threshold=265.0,
    )
    out = compute_coupled_ocean(
        ocean, atmos, coupled_si, config,
    )
    # only the configured flux subset is window-averaged into the ocean
    # dataset (the reference subsets before averaging)
    assert "surface_temperature" not in out.data
    assert len(out.time) == N_OCEAN
    # mask: 1 only where time-mean SST < threshold (the cold band)
    mask = out.data["mask_sea_ice_fraction"]
    assert mask[0].all() and not mask[1:].any()
    # sea ice fraction NaN outside the mask, finite inside
    sif = out.data["sea_ice_fraction"]
    assert np.isnan(sif[:, 1:]).all()
    assert np.isfinite(sif[:, 0]).all()
    # hfds scaled by sea surface fraction
    np.testing.assert_allclose(
        out.data["hfds_total_area"],
        ocean.data["hfds"] * out.data["sea_surface_fraction"],
        atol=1e-6,
    )
    # windowed flux average: the first ocean step's window covers the
    # first day of atmosphere steps (right-closed, labeled at the ocean
    # timestep)
    np.testing.assert_allclose(
        out.data["LHTFLsfc"][0],
        atmos.data["LHTFLsfc"][0:4].mean(axis=0),
        atol=1e-6,
    )


def test_coupled_atmosphere_sst_blending_modes():
    rng = np.random.RandomState(2)
    atmos = _atmos_dataset(rng)
    ocean = _ocean_dataset(rng, atmos)
    coupled_si = compute_coupled_sea_ice(
        atmos, CoupledSeaIceConfig(), ocean=ocean
    )
    css = CoupledSeaSurfaceConfig(
        surface_flux_window_avg=WindowAvgDatasetConfig(
            window_timedelta="24h",
            first_timestamp="2000-01-02T00:00:00",
        ),
        sst_threshold=265.0,
    )
    coupled_ocean = compute_coupled_ocean(
        ocean, atmos, coupled_si, css
    )
    ts = atmos.data["surface_temperature"]
    names = CoupledFieldNamesConfig()

    out_thresh = compute_coupled_atmosphere(
        atmos, ocean, coupled_ocean,
        CoupledSurfaceTemperatureConfig(
            how="threshold", ocean_fraction_threshold=0.9
        ),
        names=names,
    )
    ofrac = out_thresh.data["ocean_fraction"]
    sst_ff = ocean.data["sst"][np.clip(
        np.searchsorted(ocean.time.values, atmos.time.values,
                        side="right") - 1, 0, N_OCEAN - 1,
    )]
    ts_out = out_thresh.data["surface_temperature"]
    open_ocean = ofrac >= 0.9
    np.testing.assert_allclose(ts_out[open_ocean], sst_ff[open_ocean])
    np.testing.assert_allclose(ts_out[~open_ocean], ts[~open_ocean])

    out_interp = compute_coupled_atmosphere(
        atmos, ocean, coupled_ocean,
        CoupledSurfaceTemperatureConfig(how="interpolate_sst"),
        names=names,
    )
    expected = _interpolate_sst(ts, sst_ff, ofrac)
    np.testing.assert_allclose(
        out_interp.data["surface_temperature"], expected, atol=1e-6
    )

    out_solid = compute_coupled_atmosphere(
        atmos, ocean, coupled_ocean,
        CoupledSurfaceTemperatureConfig(how="solid_ts"),
        names=names,
    )
    # no NaNs survive; open-ocean cells equal the SST
    ts_solid = out_solid.data["surface_temperature"]
    assert np.isfinite(ts_solid).all()
    full_ocean = ofrac >= 1.0
    if full_ocean.any():
        np.testing.assert_allclose(
            ts_solid[full_ocean], sst_ff[full_ocean]
        )


def test_create_coupled_datasets_cli(tmp_path):
    rng = np.random.RandomState(3)
    atmos = _atmos_dataset(rng)
    ocean = _ocean_dataset(rng, atmos)
    for name, ds in [("atmos", atmos), ("ocean", ocean)]:
        dims = {}
        for k, v in ds.data.items():
            dims[k] = ("time", "lat", "lon") if v.shape[:1] == (
                len(ds.time),
            ) else ("lat", "lon")
        write_zarr(
            str(tmp_path / f"{name}.zarr"), ds.data, dims,
            coords={"lat": ds.lat, "lon": ds.lon}, time=ds.time,
        )
    cfg = {
        "version": "v1",
        "family_name": "test",
        "output_directory": str(tmp_path / "out"),
        "coupled_datasets": {
            "coupled_sea_ice": {},
            "coupled_ts": {"how": "interpolate_sst"},
            "coupled_sea_surface": {
                "surface_flux_window_avg": {
                    "window_timedelta": "24h",
                    "first_timestamp": "2000-01-02T00:00:00",
                },
                "sst_threshold": 265.0,
            },
        },
        "input_datasets": {
            "atmosphere": {"zarr_path": str(tmp_path / "atmos.zarr")},
            "ocean": {"zarr_path": str(tmp_path / "ocean.zarr")},
        },
    }
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    from ace_tpu.data_process.coupled_datasets import main

    main(["--yaml", str(path)])
    for label, n_expected in [("sea_ice", N_ATMOS), ("ocean", N_OCEAN),
                              ("atmosphere", N_ATMOS)]:
        ds = open_file_dataset(
            str(tmp_path / "out" / f"v1-test-{label}.zarr")
        )
        assert len(ds.read_time()) == n_expected, label
        assert "land_fraction" in ds


def test_create_coupled_ic(tmp_path):
    """IC extraction merges coupled over original at selected times
    (reference: scripts/data_process/create_coupled_ic.py)."""
    rng = np.random.RandomState(4)
    atmos = _atmos_dataset(rng)
    ocean = _ocean_dataset(rng, atmos)
    for name, ds in [("atmos", atmos), ("ocean", ocean)]:
        dims = {}
        for k, v in ds.data.items():
            dims[k] = ("time", "lat", "lon") if v.shape[:1] == (
                len(ds.time),
            ) else ("lat", "lon")
        write_zarr(
            str(tmp_path / f"{name}.zarr"), ds.data, dims,
            coords={"lat": ds.lat, "lon": ds.lon}, time=ds.time,
        )
    coupled_cfg = {
        "version": "v1", "family_name": "t",
        "output_directory": str(tmp_path / "out"),
        "coupled_datasets": {
            "coupled_ts": {"how": "threshold"},
            "coupled_sea_surface": {
                "surface_flux_window_avg": {
                    "window_timedelta": "24h",
                    "first_timestamp": "2000-01-02T00:00:00",
                },
                "sst_threshold": 265.0,
            },
        },
        "input_datasets": {
            "atmosphere": {"zarr_path": str(tmp_path / "atmos.zarr")},
            "ocean": {"zarr_path": str(tmp_path / "ocean.zarr")},
        },
    }
    cpath = tmp_path / "coupled.yaml"
    with open(cpath, "w") as f:
        yaml.safe_dump(coupled_cfg, f)

    from ace_tpu.data_process.coupled_datasets import (
        CreateCoupledDatasetsConfig as CCD, run as run_coupled,
    )

    run_coupled(CCD.from_file(str(cpath)))

    ic_cfg = {
        "coupled_config_path": str(cpath),
        "time": {"timestamp": "2000-01-03T00:00:00"},
        "output_directory": str(tmp_path / "ics"),
        "output_prefix": "myic",
    }
    ipath = tmp_path / "ic.yaml"
    with open(ipath, "w") as f:
        yaml.safe_dump(ic_cfg, f)

    from ace_tpu.data_process.create_coupled_ic import main as ic_main

    ic_main(["--yaml", str(ipath)])

    atm_ic = open_file_dataset(str(tmp_path / "ics" /
                                   "myic_atmosphere_ic.nc"))
    assert len(atm_ic.read_time()) == 1
    # coupled surface temperature (threshold blend) overrides original
    t_idx = 7  # 2000-01-03T00:00 is the 8th 6-hourly step from T06
    coupled_atm = open_file_dataset(
        str(tmp_path / "out" / "v1-t-atmosphere.zarr")
    )
    np.testing.assert_allclose(
        atm_ic["surface_temperature"].read(())[0],
        coupled_atm["surface_temperature"].read(())[t_idx],
        rtol=1e-6,
    )
    # original-only variables carried through
    assert "LHTFLsfc" in atm_ic
    ocn_ic = open_file_dataset(str(tmp_path / "ics" / "myic_ocean_ic.nc"))
    assert "hfds_total_area" in ocn_ic
