"""Foreign-layout file robustness (VERDICT r1 item 6).

windtpu chose self-contained IO (no xarray/rasterio, reference cli.py:22-23),
so it owns the field-data edge cases.  These tests fabricate files the way
OTHER tools write them — raw h5py with CDS-style int16 packing, hand-crafted
GDAL-style tiled/deflate GeoTIFFs — and assert the readers unpack them
exactly like their self-written twins:

* ERA5 as the CDS actually delivers it: packed int16 with scale_factor /
  add_offset / _FillValue, deflate-chunked, int time coordinate with CF
  "hours since" units (io/dataset.py:_apply_cf).
* GDAL-produced DEMs: TILED layout (not PIL strips), deflate-compressed,
  float32 and int16 (SRTM) sample formats, GDAL_NODATA voids -> NaN.
"""

import struct
import zlib

import h5py
import numpy as np
import pytest

from windtpu.io.dataset import open_dataset
from windtpu.io.geotiff import open_rasterio, write_geotiff_like

# ---------------------------------------------------------------------------
# Hand-crafted tiled GeoTIFF writer: the GDAL layout (tile grid + optional
# deflate), written byte-by-byte so the test does not depend on PIL's own
# (strip-based) writer producing the layout under test.
# ---------------------------------------------------------------------------

_SAMPLE_FORMAT = {np.dtype(np.float32): 3, np.dtype(np.int16): 2}


def write_tiled_geotiff(path, data, x, y, compress=True, tile=64,
                        nodata=None):
    data = np.ascontiguousarray(data)
    fmt = _SAMPLE_FORMAT[data.dtype]
    bits = data.dtype.itemsize * 8
    ny, nx = data.shape
    tiles = []
    for ty in range(0, ny, tile):
        for tx in range(0, nx, tile):
            block = np.zeros((tile, tile), data.dtype)
            sub = data[ty:ty + tile, tx:tx + tile]
            block[:sub.shape[0], :sub.shape[1]] = sub
            raw = block.tobytes()
            tiles.append(zlib.compress(raw) if compress else raw)

    dx = float(x[1] - x[0]) if len(x) > 1 else 1.0
    dy = float(y[0] - y[1]) if len(y) > 1 else 1.0

    # Layout: header(8) | tile data | pad | geo doubles | nodata ascii |
    #         offset/count arrays | IFD
    offset = 8
    tile_offsets = []
    for t in tiles:
        tile_offsets.append(offset)
        offset += len(t)
    pad = (-offset) % 4
    offset += pad
    scale_off = offset
    tie_off = scale_off + 24
    extra_off = tie_off + 48
    arrays = b""
    nodata_entry = []
    if nodata is not None:
        nd_bytes = f"{nodata}".encode() + b"\x00"
        nd_off = extra_off + len(arrays)
        if len(nd_bytes) <= 4:
            nodata_entry = [_entry(42113, 2, len(nd_bytes),
                                   nd_bytes.ljust(4, b"\x00"))]
        else:
            arrays += nd_bytes + (b"\x00" * ((-len(nd_bytes)) % 2))
            nodata_entry = [_entry(42113, 2, len(nd_bytes), _long(nd_off))]
    n_tiles = len(tiles)
    if n_tiles > 1:
        to_off = extra_off + len(arrays)
        arrays += struct.pack(f"<{n_tiles}I", *tile_offsets)
        tc_off = extra_off + len(arrays)
        arrays += struct.pack(f"<{n_tiles}I", *(len(t) for t in tiles))
    ifd_off = extra_off + len(arrays)

    entries = [
        _entry(256, 3, 1, _short(nx)),                    # ImageWidth
        _entry(257, 3, 1, _short(ny)),                    # ImageLength
        _entry(258, 3, 1, _short(bits)),                  # BitsPerSample
        _entry(259, 3, 1, _short(8 if compress else 1)),  # Compression
        _entry(262, 3, 1, _short(1)),                     # Photometric
        _entry(277, 3, 1, _short(1)),                     # SamplesPerPixel
        _entry(322, 3, 1, _short(tile)),                  # TileWidth
        _entry(323, 3, 1, _short(tile)),                  # TileLength
        _entry(324, 4, n_tiles,
               _long(tile_offsets[0]) if n_tiles == 1 else _long(to_off)),
        _entry(325, 4, n_tiles,
               _long(len(tiles[0])) if n_tiles == 1 else _long(tc_off)),
        _entry(339, 3, 1, _short(fmt)),                   # SampleFormat
        _entry(33550, 12, 3, _long(scale_off)),           # ModelPixelScale
        _entry(33922, 12, 6, _long(tie_off)),             # ModelTiepoint
    ] + nodata_entry
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for t in tiles:
            f.write(t)
        f.write(b"\x00" * pad)
        f.write(struct.pack("<3d", dx, abs(dy), 0.0))
        f.write(struct.pack("<6d", 0.0, 0.0, 0.0,
                            float(x[0]) - dx / 2,
                            float(y[0]) + abs(dy) / 2, 0.0))
        f.write(arrays)
        f.write(struct.pack("<H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))


def _entry(tag, typ, count, value):
    return struct.pack("<HHI4s", tag, typ, count, value)


def _short(v):
    return struct.pack("<HH", v, 0)


def _long(v):
    return struct.pack("<I", v)


# ---------------------------------------------------------------------------
# Packed int16 NetCDF (CDS delivery layout)
# ---------------------------------------------------------------------------

def _write_packed_era5(path):
    """ERA5 exactly as the CDS delivers it: int16 + scale/offset/fill,
    deflate-chunked, int hour axis — written with RAW h5py, not our writer."""
    nt, nlat, nlon = 4, 5, 6
    rng = np.random.RandomState(0)
    truth = rng.uniform(-10, 10, (nt, nlat, nlon))
    scale = (truth.max() - truth.min()) / (2 ** 16 - 3)
    offset = truth.min() + scale * (2 ** 15 - 2)
    packed = np.round((truth - offset) / scale).astype(np.int16)
    packed[0, 0, 0] = -32767
    with h5py.File(path, "w") as f:
        time = f.create_dataset("time", data=np.arange(nt, dtype=np.int32))
        time.attrs["units"] = b"hours since 2016-04-01 00:00:00"
        time.attrs["calendar"] = b"proleptic_gregorian"
        lat = f.create_dataset("latitude", data=np.linspace(48, 46, nlat))
        lon = f.create_dataset("longitude", data=np.linspace(5, 8, nlon))
        for name, ds in (("time", time), ("latitude", lat),
                         ("longitude", lon)):
            ds.make_scale(name)
        u = f.create_dataset("u10", data=packed, chunks=(2, nlat, nlon),
                             compression="gzip", compression_opts=4)
        u.attrs["scale_factor"] = np.float64(scale)
        u.attrs["add_offset"] = np.float64(offset)
        u.attrs["_FillValue"] = np.int16(-32767)
        u.attrs["units"] = b"m s**-1"
        u.dims[0].attach_scale(time)
        u.dims[1].attach_scale(lat)
        u.dims[2].attach_scale(lon)
    expected = truth.copy()
    expected[0, 0, 0] = np.nan
    return expected, scale


class TestPackedNetCDF:
    def test_cf_unpack_scale_offset_fill(self, tmp_path):
        path = tmp_path / "packed_era5.nc"
        exp, scale = _write_packed_era5(path)
        ds = open_dataset(path)
        got = ds["u10"].values
        assert ds["u10"].dims == ("time", "latitude", "longitude")
        assert got.dtype == np.float32
        assert np.isnan(got[0, 0, 0])          # _FillValue -> NaN
        m = ~np.isnan(exp)
        assert np.abs(got[m] - exp[m]).max() <= scale  # quantization only

    def test_cf_time_units_decode(self, tmp_path):
        path = tmp_path / "packed_era5.nc"
        _write_packed_era5(path)
        t = open_dataset(path).coords["time"].values
        assert t.dtype.kind == "M"
        assert t[0] == np.datetime64("2016-04-01T00:00:00")
        assert t[3] == np.datetime64("2016-04-01T03:00:00")

    def test_missing_value_alias(self, tmp_path):
        """Some producers use missing_value instead of _FillValue."""
        path = tmp_path / "mv.nc"
        with h5py.File(path, "w") as f:
            d = f.create_dataset("z", data=np.array([1.0, -9999.0, 3.0],
                                                    np.float32))
            d.attrs["missing_value"] = np.float32(-9999.0)
        got = open_dataset(path)["z"].values
        assert np.isnan(got[1]) and got[0] == 1.0


class TestForeignGeoTIFF:
    @pytest.fixture
    def dem(self):
        rng = np.random.RandomState(1)
        ny, nx = 100, 130
        return (rng.uniform(200, 3000, (ny, nx)).astype(np.float32),
                np.linspace(5.0, 9.0, nx), np.linspace(47.9, 45.1, ny))

    def test_tiled_deflate_matches_striped(self, tmp_path, dem):
        data, xs, ys = dem
        write_tiled_geotiff(tmp_path / "tiled.tif", data, xs, ys,
                            compress=True)
        write_geotiff_like(tmp_path / "striped.tif", data, xs, ys)
        a = open_rasterio(tmp_path / "tiled.tif")
        b = open_rasterio(tmp_path / "striped.tif")
        np.testing.assert_allclose(a["band_data"].values,
                                   b["band_data"].values)
        np.testing.assert_allclose(a.coords["x"].values,
                                   b.coords["x"].values)
        np.testing.assert_allclose(a.coords["y"].values,
                                   b.coords["y"].values)

    def test_tiled_uncompressed(self, tmp_path, dem):
        data, xs, ys = dem
        write_tiled_geotiff(tmp_path / "raw.tif", data, xs, ys,
                            compress=False)
        got = open_rasterio(tmp_path / "raw.tif")["band_data"].values[0]
        np.testing.assert_allclose(got, data)

    def test_int16_srtm_with_nodata_voids(self, tmp_path, dem):
        """SRTM delivery format: int16 elevations, -32768 voids marked by
        the GDAL_NODATA ascii tag — voids must read back as NaN."""
        data, xs, ys = dem
        srtm = data.astype(np.int16)
        srtm[10:14, 20:25] = -32768
        write_tiled_geotiff(tmp_path / "srtm.tif", srtm, xs, ys,
                            compress=True, nodata=-32768)
        got = open_rasterio(tmp_path / "srtm.tif")["band_data"].values[0]
        assert np.isnan(got[10:14, 20:25]).all()
        valid = ~np.isnan(got)
        np.testing.assert_allclose(got[valid],
                                   srtm.astype(np.float32)[valid])

    def test_through_process_topo(self, tmp_path, dem):
        """A tiled/deflate DEM flows through the inference regridder."""
        from windtpu.infer.template import process_topo
        from windtpu.io.dataset import DataArray, Dataset

        data, xs, ys = dem
        write_tiled_geotiff(tmp_path / "dem.tif", data, xs, ys)
        raster = open_rasterio(tmp_path / "dem.tif")
        tpl = Dataset({}, {
            "lat_1": DataArray(("lat_1",), np.linspace(47.5, 45.5, 40)),
            "lon_1": DataArray(("lon_1",), np.linspace(5.5, 8.5, 50))})
        topo = process_topo(raster, tpl)
        assert topo["elevation"].shape == (40, 50)
        assert np.isfinite(topo["elevation"].values).all()
