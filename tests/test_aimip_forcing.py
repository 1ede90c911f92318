"""Tests for the AIMIP forcing tools and the conservative regridder.

Reference behaviors: scripts/aimip_forcing/{regrid_aimip_forcing.py,
interpolate_aimip_forcing.py, prepend_first_timestep_forcing.py,
create_aimip_ic_datasets.py}.
"""

import numpy as np
import pytest

from ace_tpu.data.store import open_file_dataset, write_h5, write_zarr
from ace_tpu.data.time import TimeCoord
from ace_tpu.data_process.aimip_forcing import (
    AimipInterpolateConfig,
    AimipRegridConfig,
    CreateAimipICsConfig,
    PrependFirstTimestepConfig,
    create_aimip_ics,
    derive_ocean_fraction,
    interp_time,
    interpolate_aimip_forcing,
    prepend_first_timestep,
    regrid_aimip_forcing,
)
from ace_tpu.ops.conservative_regrid import (
    ConservativeRegridder,
    latitude_weights,
    longitude_weights,
)


def _grid(nlat, nlon, descending=False):
    lat = np.linspace(-90 + 90 / nlat, 90 - 90 / nlat, nlat)
    if descending:
        lat = lat[::-1]
    lon = np.linspace(0, 360, nlon, endpoint=False)
    return lat, lon


class TestConservativeRegridder:
    def test_constant_field_preserved(self):
        lat_in, lon_in = _grid(24, 48)
        lat_out, lon_out = _grid(8, 16)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        out = r(np.full((24, 48), 3.25))
        np.testing.assert_allclose(out, 3.25, rtol=1e-6)

    def test_global_mean_conserved(self):
        lat_in, lon_in = _grid(36, 72)
        lat_out, lon_out = _grid(10, 20)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        rng = np.random.RandomState(0)
        x = rng.randn(36, 72)

        def gmean(v, lat):
            w = np.cos(np.deg2rad(lat))
            return (v * w[:, None]).sum() / (w.sum() * v.shape[1])

        out = r(x)
        # conservative weights preserve the area integral; cos-lat mean
        # of equally spaced cells approximates it to grid accuracy
        assert abs(gmean(out, lat_out) - gmean(x, lat_in)) < 2e-3

    def test_exact_area_integral_conserved(self):
        lat_in, lon_in = _grid(36, 72)
        lat_out, lon_out = _grid(12, 24)
        rng = np.random.RandomState(1)
        x = rng.randn(36, 72)
        wlat_i = latitude_weights(lat_in, lat_in).sum(axis=1)
        wlat_o = latitude_weights(lat_out, lat_out).sum(axis=1)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        out = r(x)
        integral_in = (x * wlat_i[:, None]).sum() / 72
        integral_out = (out * wlat_o[:, None]).sum() / 24
        np.testing.assert_allclose(integral_out, integral_in, rtol=1e-6)

    def test_descending_latitudes_match_flipped_ascending(self):
        lat_asc, lon_in = _grid(24, 48)
        lat_out, lon_out = _grid(8, 16)
        rng = np.random.RandomState(3)
        x = rng.randn(24, 48)
        up = ConservativeRegridder(lat_asc, lon_in, lat_out, lon_out)(x)
        down = ConservativeRegridder(
            lat_asc[::-1], lon_in, lat_out[::-1], lon_out
        )(x[::-1])
        np.testing.assert_allclose(down[::-1], up, rtol=1e-5)

    def test_longitude_wrap(self):
        lon_in = np.linspace(0, 360, 36, endpoint=False)
        lon_out = (np.linspace(0, 360, 12, endpoint=False) + 185.0) % 360.0
        w = longitude_weights(lon_in, lon_out)
        np.testing.assert_allclose(w.sum(axis=1), 30.0, rtol=1e-9)

    def test_skipna_renormalizes(self):
        lat_in, lon_in = _grid(8, 16)
        lat_out, lon_out = _grid(4, 8)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        x = np.full((8, 16), 5.0)
        x[:, :8] = np.nan  # half the globe invalid
        out = r(x, skipna=True, na_thres=1.0)
        valid = np.isfinite(out)
        assert valid.any() and (~valid).any()
        np.testing.assert_allclose(out[valid], 5.0, rtol=1e-6)

    def test_all_nan_stays_nan(self):
        lat_in, lon_in = _grid(8, 16)
        lat_out, lon_out = _grid(4, 8)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        out = r(np.full((8, 16), np.nan), skipna=True)
        assert np.isnan(out).all()

    def test_na_thres_zero_requires_full_validity(self):
        lat_in, lon_in = _grid(8, 16)
        lat_out, lon_out = _grid(4, 8)
        r = ConservativeRegridder(lat_in, lon_in, lat_out, lon_out)
        x = np.ones((8, 16))
        x[3, 5] = np.nan
        out = r(x, skipna=True, na_thres=0.0)
        assert np.isnan(out).sum() >= 1
        assert np.isfinite(out).sum() >= 1


def test_derive_ocean_fraction_clips_and_folds():
    land = np.array([[0.0, 0.5, 0.9]])
    ice = np.array([[0.3, 0.6, 0.3]])
    ocean, ice_out = derive_ocean_fraction(land, ice)
    np.testing.assert_allclose(ocean, [[0.7, 0.0, 0.0]])
    # deficit (-0.1, -0.2) folds back into sea ice
    np.testing.assert_allclose(ice_out, [[0.3, 0.5, 0.1]])


def test_interp_time_linear_and_nan_outside():
    t_src = np.array([0.0, 10.0, 20.0])
    vals = np.array([[0.0], [10.0], [40.0]])
    out = interp_time(vals, t_src, np.array([-1.0, 5.0, 15.0, 25.0]))
    assert np.isnan(out[0, 0]) and np.isnan(out[3, 0])
    np.testing.assert_allclose(out[1:3, 0], [5.0, 25.0])


@pytest.fixture()
def monthly_forcing(tmp_path):
    """A tiny monthly AIMIP-style source dataset + target grid file."""
    nlat, nlon, nt = 12, 24, 4
    lat, lon = _grid(nlat, nlon)
    time = TimeCoord.from_range("2000-01-15T00:00:00", nt, 30 * 86400)
    rng = np.random.RandomState(0)
    land = (rng.rand(nlat, nlon) > 0.7).astype(np.float64)
    sst = 280.0 + 10 * rng.rand(nt, nlat, nlon)
    sst[:, land > 0.5] = np.nan
    ice = 0.2 * rng.rand(nt, nlat, nlon)
    ice[:, land > 0.5] = np.nan
    src = str(tmp_path / "aimip_monthly.nc")
    write_h5(
        src,
        {
            "land_sea_mask": land,
            "sea_ice_cover": ice,
            "sea_surface_temperature": sst,
        },
        {
            "land_sea_mask": ("latitude", "longitude"),
            "sea_ice_cover": ("time", "latitude", "longitude"),
            "sea_surface_temperature": ("time", "latitude", "longitude"),
        },
        coords={"latitude": lat, "longitude": lon},
        time=time,
    )
    tlat, tlon = _grid(6, 12)
    tgt = str(tmp_path / "target_grid.nc")
    write_h5(
        tgt, {"HGTsfc": np.zeros((6, 12))},
        {"HGTsfc": ("latitude", "longitude")},
        coords={"latitude": tlat, "longitude": tlon},
    )
    return src, tgt


def test_regrid_aimip_forcing(tmp_path, monthly_forcing):
    src, tgt = monthly_forcing
    out_path = str(tmp_path / "regridded.nc")
    regrid_aimip_forcing(AimipRegridConfig(
        input_path=src, output_path=out_path, target_path=tgt,
    ))
    out = open_file_dataset(out_path)
    land = out["land_fraction"].read(())
    ocean = out["ocean_fraction"].read(())
    ice = out["sea_ice_fraction"].read(())
    sst = out["surface_temperature"].read(())
    assert land.shape == (6, 12)
    assert ice.shape[0] == 4 and ice.shape[1:] == (6, 12)
    # fractions sum to one everywhere after the fold-back
    np.testing.assert_allclose(land[None] + ocean + ice, 1.0, atol=1e-5)
    # SST exists wherever some ocean contributed, and stays physical
    finite = np.isfinite(sst)
    assert finite.any()
    assert (sst[finite] > 270).all() and (sst[finite] < 295).all()
    out.close()


def test_interpolate_prepend_and_ics(tmp_path, monthly_forcing):
    src, tgt = monthly_forcing
    regridded = str(tmp_path / "regridded.nc")
    regrid_aimip_forcing(AimipRegridConfig(
        input_path=src, output_path=regridded, target_path=tgt,
    ))

    # a fake 6-hourly ERA5 forcing store covering the monthly period
    nlat, nlon = 6, 12
    lat, lon = _grid(nlat, nlon)
    n_e = 4 * 115
    e_time = TimeCoord.from_range("2000-01-15T00:00:00", n_e, 21600)
    rng = np.random.RandomState(1)
    era5 = str(tmp_path / "era5.zarr")
    write_zarr(
        era5,
        {
            "HGTsfc": rng.rand(n_e, nlat, nlon).astype(np.float32),
            "DSWRFtoa": rng.rand(n_e, nlat, nlon).astype(np.float32),
        },
        {"HGTsfc": ("time", "latitude", "longitude"),
         "DSWRFtoa": ("time", "latitude", "longitude")},
        coords={"latitude": lat, "longitude": lon},
        time=e_time,
    )

    out_zarr = str(tmp_path / "forcing.zarr")
    interpolate_aimip_forcing(AimipInterpolateConfig(
        input_path=regridded,
        era5_forcing_path=era5,
        output_path=out_zarr,
        start_time="2000-01-15T00:00:00",
        end_time="2000-04-20T18:00:00",
        extension_start="2000-04-01T00:00:00",
        repeat_source_start="2000-02-01T00:00:00",
        repeat_source_end="2000-03-31T18:00:00",
    ))
    out = open_file_dataset(out_zarr)
    t = out.read_time()
    assert t.timestep_seconds() == 21600
    sst = out["surface_temperature"].read(())
    assert sst.shape[1:] == (nlat, nlon)
    # interior times are interpolated (finite over ocean)
    mid = len(t) // 4
    assert np.isfinite(sst[mid]).any()
    # land stays NaN at every time
    land_mask = ~np.isfinite(sst).any(axis=0)
    assert land_mask.any()
    # insolation over the extension repeats the source window
    dsw = out["DSWRFtoa"].read(())
    e_vals = np.asarray(
        open_file_dataset(era5)["DSWRFtoa"].read(())
    )
    ext_i = int(np.searchsorted(
        t.values,
        TimeCoord.from_range("2000-04-01T00:00:00", 1, 1).values[0],
    ))
    src_i = int(np.searchsorted(
        e_time.values,
        TimeCoord.from_range("2000-02-01T00:00:00", 1, 1).values[0],
    ))
    np.testing.assert_allclose(dsw[ext_i], e_vals[src_i])
    out.close()

    # prepend the first step under an earlier timestamp
    prepended = str(tmp_path / "prepended.zarr")
    prepend_first_timestep(PrependFirstTimestepConfig(
        input_path=out_zarr,
        output_path=prepended,
        input_timestamp="2000-01-15T00:00:00",
        output_timestamp="2000-01-14T18:00:00",
    ))
    pds = open_file_dataset(prepended)
    pt = pds.read_time()
    assert len(pt) == len(t) + 1
    np.testing.assert_allclose(
        pds["HGTsfc"].read((slice(0, 1),)),
        pds["HGTsfc"].read((slice(1, 2),)),
    )
    pds.close()

    # IC extraction relabels times to the single target timestamp
    ics = create_aimip_ics(CreateAimipICsConfig(
        input_path=out_zarr,
        output_dir=str(tmp_path / "ics"),
        ic_timestamps=["2000-01-16T00:00:00", "2000-01-17T00:00:00"],
        target_timestamp="2000-01-14T18:00:00",
        variables=["HGTsfc"],
    ))
    assert len(ics) == 2
    ic0 = open_file_dataset(ics[0])
    it = ic0.read_time()
    assert len(it) == 1
    assert it.values[0] == TimeCoord.from_range(
        "2000-01-14T18:00:00", 1, 1
    ).values[0]
    ic0.close()


def test_create_ics_missing_timestamp_raises(tmp_path, monthly_forcing):
    src, _ = monthly_forcing
    with pytest.raises(ValueError, match="not in dataset"):
        create_aimip_ics(CreateAimipICsConfig(
            input_path=src,
            output_dir=str(tmp_path / "ics"),
            ic_timestamps=["1999-01-01T00:00:00"],
        ))
