"""Out-of-the-box CLI: the REAL bundled generator, no mocks.

The reference's headline promise is that `downscale` works out of the
box because weights-55.ckpt ships with the wheel (reference api.py:21,
85).  tests/test_cli.py covers the CLI plumbing with a monkeypatched
tiny network; THIS test runs the full shipped path — flagship
ModelConfig, `assets/weights/generator-synth.npz` auto-loaded by
`api.get_network`, real tiling/normalization/stitch — on fabricated
ERA5 + DEM inputs, and asserts the downscaled fields are finite and on
the upsampled template grid.  A packaging break (bundle missing,
loader drift, flagship-config drift) that the mocked tests cannot see
fails here.

Heavyweight (~2 min on the CI CPU: one flagship 96 px T=24 compile +
6-patch domain), so it is a single test.
"""

import numpy as np

from windtpu.io.dataset import DataArray, Dataset, open_dataset
from windtpu.io.geotiff import write_geotiff_like


def test_downscale_cli_with_bundled_weights(tmp_path, capsys, monkeypatch):
    from windtpu import api, cli

    # Single-device path: under the suite's 8-device virtual CPU mesh,
    # api.predict would otherwise compile the ensemble/tile-parallel
    # flagship program 8 ways (~8 min); the mesh composition has its own
    # tests (test_parallel.py, test_tile_parallel.py) — this test is
    # about the BUNDLE, the flagship config, and the CLI contract.
    monkeypatch.setattr(api, "inference_mesh",
                        lambda *a, **k: None)

    era_dir = tmp_path / "era"
    era_dir.mkdir()
    nt, nlat, nlon = 24, 8, 9
    time = np.arange("2016-04-01T00", "2016-04-02T00",
                     dtype="datetime64[h]")
    lat = np.linspace(46.0, 45.0, nlat)
    lon = np.linspace(6.0, 7.0, nlon)
    rng = np.random.RandomState(0)
    ds = Dataset(
        {"u10": DataArray(("time", "latitude", "longitude"),
                          (rng.standard_normal((nt, nlat, nlon)) + 3)
                          .astype(np.float32)),
         "v10": DataArray(("time", "latitude", "longitude"),
                          rng.standard_normal((nt, nlat, nlon))
                          .astype(np.float32))},
        {"time": DataArray(("time",), time),
         "latitude": DataArray(("latitude",), lat),
         "longitude": DataArray(("longitude",), lon)})
    ds.to_netcdf(era_dir / "20160401_era5_surface_hourly.nc")
    x = np.linspace(5.9, 7.1, 260)
    y = np.linspace(46.1, 44.9, 200)
    dem = (1500 + 700 * rng.standard_normal((200, 260))).astype(np.float32)
    write_geotiff_like(tmp_path / "dem.tif", dem, x, y)

    out = tmp_path / "out.nc"
    cli.main(["--era", str(era_dir), "--dem", str(tmp_path / "dem.tif"),
              "--date", "20160401", "--lon", "6.0:7.0",
              "--lat", "45.0:46.0", "-o", str(out)])

    res = open_dataset(str(out))
    assert {"u10", "v10"} <= set(res.data_vars)
    u = np.asarray(res["u10"].values)
    v = np.asarray(res["v10"].values)
    assert u.shape[0] == nt
    # x26 lat / x18 lon upsampling (reference api.py:47-48) of the
    # inside-bbox ERA5 cells, minus border crop: well above input res.
    assert u.shape[1] > 8 * nlat and u.shape[2] > 8 * nlon
    m = ~np.isnan(u)
    assert m.any()
    assert np.isfinite(u[m]).all() and np.isfinite(v[~np.isnan(v)]).all()
    # The bundled generator must actually transform the field, not pass
    # the blur through: downscaled fields carry fine-scale variance.
    assert float(np.nanstd(u)) > 0.05
