"""IO layer: Dataset selection semantics, NetCDF roundtrip, GeoTIFF."""

import numpy as np
import pytest

from windtpu.io.dataset import (
    DataArray,
    Dataset,
    concat_time,
    nearest_indices,
    open_dataset,
)
from windtpu.io.geotiff import open_rasterio, write_geotiff_like


def _sample_ds():
    time = np.arange("2016-04-01T00", "2016-04-02T00", dtype="datetime64[h]")
    lat = np.linspace(50.0, 48.0, 9)   # descending like ERA5
    lon = np.linspace(-1.0, 3.0, 17)
    u10 = np.random.RandomState(0).standard_normal(
        (24, 9, 17)).astype(np.float32)
    return Dataset(
        {"u10": DataArray(("time", "latitude", "longitude"), u10),
         "v10": DataArray(("time", "latitude", "longitude"), u10 * 2)},
        {"time": DataArray(("time",), time),
         "latitude": DataArray(("latitude",), lat),
         "longitude": DataArray(("longitude",), lon)},
    )


class TestNearest:
    def test_ascending(self):
        grid = np.array([0.0, 1.0, 2.0, 3.0])
        idx = nearest_indices(grid, np.array([-5.0, 0.4, 0.6, 2.9, 99.0]))
        np.testing.assert_array_equal(idx, [0, 0, 1, 3, 3])

    def test_descending(self):
        grid = np.array([3.0, 2.0, 1.0, 0.0])
        idx = nearest_indices(grid, np.array([2.9, 0.4, -1.0]))
        np.testing.assert_array_equal(idx, [0, 3, 3])


class TestDataset:
    def test_isel_and_sizes(self):
        ds = _sample_ds()
        assert ds.sizes == {"time": 24, "latitude": 9, "longitude": 17}
        sub = ds.isel(time=slice(0, 6), latitude=slice(2, 5))
        assert sub.sizes == {"time": 6, "latitude": 3, "longitude": 17}
        assert sub["u10"].shape == (6, 3, 17)

    def test_sel_nearest_regrids(self):
        ds = _sample_ds()
        hi_lon = np.linspace(-1, 3, 50)
        hi_lat = np.linspace(48, 50, 40)
        out = ds.sel_nearest(longitude=hi_lon, latitude=hi_lat)
        assert out["u10"].shape == (24, 40, 50)
        np.testing.assert_array_equal(out.coords["longitude"].values, hi_lon)

    def test_sel_range_descending_lat(self):
        ds = _sample_ds()
        sub = ds.sel_range(latitude=(48.5, 49.5))
        vals = sub.coords["latitude"].values
        assert vals.min() >= 48.5 and vals.max() <= 49.5
        assert len(vals) > 0

    def test_expand_time(self):
        static = Dataset(
            {"elevation": DataArray(("y", "x"), np.ones((4, 5)))},
            {"y": DataArray(("y",), np.arange(4.0)),
             "x": DataArray(("x",), np.arange(5.0))},
        )
        t = np.arange("2016-01-01", "2016-01-02", dtype="datetime64[h]")[:3]
        out = static.expand_time(t)
        assert out["elevation"].shape == (3, 4, 5)
        assert out["elevation"].dims == ("time", "y", "x")

    def test_netcdf_roundtrip(self, tmp_path):
        ds = _sample_ds()
        path = tmp_path / "sample.nc"
        ds.to_netcdf(path)
        back = open_dataset(path)
        assert set(back.data_vars) == {"u10", "v10"}
        np.testing.assert_allclose(back["u10"].values, ds["u10"].values)
        assert back["u10"].dims == ("time", "latitude", "longitude")
        # time decodes back to datetime64
        assert np.issubdtype(back.coords["time"].values.dtype,
                             np.datetime64)
        np.testing.assert_array_equal(
            back.coords["time"].values.astype("datetime64[h]"),
            ds.coords["time"].values.astype("datetime64[h]"))

    def test_concat_time(self):
        ds = _sample_ds()
        a = ds.isel(time=slice(0, 12))
        b = ds.isel(time=slice(12, 24))
        merged = concat_time(b, a)  # order-independent
        assert merged.sizes["time"] == 24
        np.testing.assert_allclose(merged["u10"].values, ds["u10"].values)

    def test_concat_time_missing_variable_is_loud(self):
        """A time-dimensioned variable absent from one input must raise a
        clear error, not crash later with a dim-length mismatch."""
        import pytest

        ds = _sample_ds()
        a = ds.isel(time=slice(0, 12))
        b = ds.isel(time=slice(12, 24))[["u10"]]
        with pytest.raises(ValueError, match="v10"):
            concat_time(a, b)
        with pytest.raises(ValueError, match="v10"):
            concat_time(b, a)

    def test_h5_placeholder_dimension_is_not_a_coord(self, tmp_path):
        """netCDF4/xarray write zero-valued placeholder dimension scales
        for dims without coordinate variables (NAME attr is bytes); they
        must be skipped, not surfaced as phantom zero coords."""
        h5py = pytest.importorskip("h5py")
        path = tmp_path / "placeholder.nc"
        with h5py.File(path, "w") as f:
            t = f.create_dataset("time", data=np.zeros(4))
            t.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
            t.attrs["NAME"] = np.bytes_(
                "This is a netCDF dimension but not a netCDF variable."
                "         4")
            lat = f.create_dataset("latitude", data=np.array([1.0, 2.0]))
            lat.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
            lat.attrs["NAME"] = np.bytes_("latitude")
            v = f.create_dataset("u10", data=np.ones((4, 2), np.float32))
            v.dims[0].attach_scale(t)
            v.dims[1].attach_scale(lat)
            v.dims[0].label = "time"
            v.dims[1].label = "latitude"
        ds = open_dataset(path)
        assert "time" not in ds.coords          # placeholder skipped
        assert "latitude" in ds.coords          # real scale kept
        assert ds["u10"].dims == ("time", "latitude")
        np.testing.assert_array_equal(ds.coords["latitude"].values,
                                      [1.0, 2.0])


class TestGeoTIFF:
    def test_roundtrip(self, tmp_path):
        x = np.linspace(5.0, 11.0, 30)
        y = np.linspace(48.0, 45.0, 20)   # north-up raster: y descending
        dem = np.random.RandomState(1).uniform(
            100, 4000, (20, 30)).astype(np.float32)
        path = tmp_path / "dem.tif"
        write_geotiff_like(path, dem, x, y)
        ds = open_rasterio(path)
        assert ds["band_data"].shape == (1, 20, 30)
        np.testing.assert_allclose(ds["band_data"].values[0], dem)
        np.testing.assert_allclose(ds.coords["x"].values, x, atol=1e-5)
        np.testing.assert_allclose(ds.coords["y"].values, y, atol=1e-5)
