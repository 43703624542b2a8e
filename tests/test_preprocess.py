"""Preprocessing: topo descriptor job, daily x/y builder, derived
predictors, idempotency."""

import numpy as np
import pytest

from windtpu.io.dataset import DataArray, Dataset, open_dataset
from windtpu.io.geotiff import write_geotiff_like
from windtpu.preprocess.daily import (
    compute_time_varying_topo_pred,
    compute_wind_speed_and_angle,
    process_imgs,
    process_imgs_cosmoblurred,
)
from windtpu.preprocess.topo import NAMES, process_topographic_variables_file


class TestDerived:
    def test_wind_speed_and_angle(self):
        u = np.array([3.0, 0.0])
        v = np.array([4.0, -2.0])
        speed, angle = compute_wind_speed_and_angle(u, v)
        np.testing.assert_allclose(speed, [5.0, 2.0])
        np.testing.assert_allclose(angle, [np.arctan2(4, 3), -np.pi / 2])

    def test_exposure_signs(self):
        """Wind blowing INTO an uphill slope gives e_plus > 0; the lee side
        gives e_minus < 0."""
        slope = np.full((2,), 0.3)
        aspect = np.array([0.0, 0.0])      # uphill to the east
        u = np.array([-2.0, 2.0])          # easterly (into slope) / westerly
        v = np.zeros(2)
        e_plus, e_minus = compute_time_varying_topo_pred(u, v, slope, aspect)
        assert e_plus[0] > 0 and e_minus[0] == 0
        assert e_minus[1] < 0 and e_plus[1] == 0


@pytest.fixture
def dem_file(tmp_path):
    x = np.linspace(6.0, 9.0, 60)
    y = np.linspace(47.5, 45.5, 40)
    rng = np.random.RandomState(0)
    dem = rng.uniform(300, 2500, (40, 60)).astype(np.float32)
    path = tmp_path / "dem.tif"
    write_geotiff_like(path, dem, x, y)
    return path


class TestTopoJob:
    def test_writes_all_descriptors_and_is_idempotent(self, dem_file,
                                                      capsys):
        process_topographic_variables_file(str(dem_file))
        for name in NAMES:
            out = dem_file.parent / f"topo_{name}.nc"
            assert out.exists(), name
            ds = open_dataset(out)
            assert name in ds.data_vars
            assert ds[name].dims == ("y", "x")
        process_topographic_variables_file(str(dem_file))
        assert "Already processed" in capsys.readouterr().out


def _write_day_files(tmp_path, d_str="20200101", ny=12, nx=14, nt=4):
    rng = np.random.RandomState(1)
    time = (np.datetime64("2020-01-01T00", "h") +
            np.arange(nt).astype("timedelta64[h]"))
    lat1 = np.linspace(46.0, 47.0, ny)
    lon1 = np.linspace(6.0, 8.0, nx)

    def mk(vars_, lat_name, lon_name, fname):
        coords = {
            "time": DataArray(("time",), time),
            lat_name: DataArray((lat_name,), lat1 if "lat" in lat_name
                                else lat1),
            lon_name: DataArray((lon_name,), lon1),
        }
        ds = Dataset(
            {v: DataArray(("time", lat_name, lon_name),
                          rng.standard_normal((nt, ny, nx))
                          .astype(np.float32)) for v in vars_},
            coords)
        ds.to_netcdf(tmp_path / fname)

    # COSMO day file on its 1-km grid (own directory, like the reference).
    (tmp_path / "cosmo").mkdir(exist_ok=True)
    (tmp_path / "era5").mkdir(exist_ok=True)
    mk(["U_10M", "V_10M"], "lat_1", "lon_1", f"cosmo/cosmo_{d_str}.nc")
    # ERA5 surface + z500 on a coarser grid.
    lat_e = np.linspace(47.2, 45.8, 5)
    lon_e = np.linspace(5.8, 8.2, 6)
    for fname, vars_ in ((f"era5/{d_str}_era5_surface_hourly.nc",
                          ["u10", "v10", "blh", "fsr", "sp"]),
                         (f"era5/{d_str}_era5_z500_hourly.nc",
                          ["z", "vo", "d"])):
        ds = Dataset(
            {v: DataArray(("time", "latitude", "longitude"),
                          rng.standard_normal((nt, 5, 6)).astype(np.float32))
             for v in vars_},
            {"time": DataArray(("time",), time),
             "latitude": DataArray(("latitude",), lat_e),
             "longitude": DataArray(("longitude",), lon_e)})
        ds.to_netcdf(tmp_path / fname)
    return lat1, lon1


class TestDailyBuilder:
    def test_process_imgs(self, tmp_path, dem_file):
        process_topographic_variables_file(str(dem_file))
        _write_day_files(tmp_path)
        process_imgs(str(tmp_path / "out"), str(tmp_path / "era5"), str(tmp_path / "cosmo"),
                     str(dem_file.parent), "2020-01-01", "2020-01-01")
        x = open_dataset(tmp_path / "out" / "x_20200101.nc")
        y = open_dataset(tmp_path / "out" / "y_20200101.nc")
        for v in ("u10", "v10", "blh", "fsr", "sp", "z", "vo", "d",
                  "elevation", "tpi_500", "slope", "aspect",
                  "e_plus", "e_minus", "w_speed", "w_angle"):
            assert v in x.data_vars, v
            assert x[v].dims == ("time", "y_1", "x_1")
        assert set(y.data_vars) == {"U_10M", "V_10M"}
        assert x["u10"].shape == (4, 12, 14)
        # e+ and e- are mutually exclusive by construction.
        ep = x["e_plus"].values
        em = x["e_minus"].values
        assert ((ep == 0) | (em == 0)).all()
        # Idempotent second run.
        process_imgs(str(tmp_path / "out"), str(tmp_path / "era5"), str(tmp_path / "cosmo"),
                     str(dem_file.parent), "2020-01-01", "2020-01-01")

    def test_process_imgs_cosmoblurred(self, tmp_path, dem_file):
        process_topographic_variables_file(str(dem_file))
        _write_day_files(tmp_path)
        process_imgs_cosmoblurred(str(tmp_path / "outb"), str(tmp_path / "cosmo"),
                                  str(dem_file.parent),
                                  "2020-01-01", "2020-01-01")
        x = open_dataset(tmp_path / "outb" / "x_cosmo_20200101.nc")
        assert "U_10M" in x.data_vars and "slope" in x.data_vars
        # Blurring must reduce variance vs the raw target field.
        y = open_dataset(tmp_path / "outb" / "y_20200101.nc")
        assert x["U_10M"].values.std() < y["U_10M"].values.std()


class TestPureDefaults:
    """windtpu-prepare output must train with PURE default configs: every
    variable in DataConfig.input_variables (incl. ridge_index_norm) is
    producible by the prepare pipeline, and DataConfig.patch_size composes
    with ModelConfig's image_size % 4 invariant."""

    def test_default_input_variables_flow_from_prepare_to_batches(
            self, tmp_path, dem_file):
        from windtpu.core.config import DataConfig, ModelConfig
        from windtpu.data import BatchGenerator, LocalFileProvider

        process_topographic_variables_file(str(dem_file))
        _write_day_files(tmp_path, ny=40, nx=44, nt=8)
        out = tmp_path / "out"
        process_imgs(str(out), str(tmp_path / "era5"), str(tmp_path / "cosmo"),
                     str(dem_file.parent), "2020-01-01", "2020-01-01")

        dcfg = DataConfig(batch_size=2)          # pure variable defaults
        for v in dcfg.input_variables:
            assert v in open_dataset(out / "x_20200101.nc").data_vars, v
        # Defaults compose: the default patch is a valid model image size.
        ModelConfig(image_size=dcfg.patch_size,
                    in_channels=len(dcfg.input_variables))
        bg = BatchGenerator(LocalFileProvider(str(out), "x_{date}.nc"),
                            output_provider=LocalFileProvider(
                                str(out), "y_{date}.nc"),
                            config=dcfg, seed=0)
        xb, yb = next(iter(bg))
        assert xb.shape == (2, dcfg.sequence_length, dcfg.patch_size,
                            dcfg.patch_size, len(dcfg.input_variables))
        assert yb.shape[-1] == len(dcfg.output_variables)
        assert np.isfinite(xb).all() and np.isfinite(yb).all()


class TestCosmoFetcher:
    def test_fetch_with_retry_is_atomic(self, tmp_path, monkeypatch):
        """Failed transfers leave no artifact (only *.part, cleaned up);
        the destination appears only after a complete transfer."""
        from windtpu.preprocess import download_cosmo as dc

        monkeypatch.setattr(dc.time, "sleep", lambda s: None)

        class FlakyConn:
            def __init__(self, failures):
                self.failures = failures

            def retrbinary(self, cmd, cb):
                assert cmd == "RETR remote.nc"
                if self.failures > 0:
                    self.failures -= 1
                    cb(b"trunc")          # partial write, then the line drops
                    raise EOFError("connection dropped")
                cb(b"complete contents")

            def quit(self):
                pass

        conn = FlakyConn(failures=2)
        dest = tmp_path / "x.nc"
        dc._fetch_with_retry(lambda: conn, conn, "remote.nc", dest)
        assert dest.read_bytes() == b"complete contents"
        assert not dest.with_suffix(".nc.part").exists()

        conn = FlakyConn(failures=99)
        with pytest.raises(EOFError):
            dc._fetch_with_retry(lambda: conn, conn, "remote.nc",
                                 tmp_path / "y.nc")
        assert not (tmp_path / "y.nc").exists()
        assert not (tmp_path / "y.nc.part").exists()
