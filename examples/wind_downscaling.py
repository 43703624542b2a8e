"""End-to-end walk-through — the windtpu equivalent of the reference's
``wind_downscaling.ipynb`` (27 cells: download -> DEM clip -> downscale over
France -> COSMO-template Switzerland path).

Run stages selectively:

    python examples/wind_downscaling.py fabricate   # synthetic inputs (no network access)
    python examples/wind_downscaling.py downscale   # bbox path (notebook cells 9-16)
    python examples/wind_downscaling.py swiss       # COSMO-template path (cells 18-26)
    python examples/wind_downscaling.py train       # synthetic training smoke
    python examples/wind_downscaling.py ensemble    # stochastic members

With real data, replace the `fabricate` stage with the reference's
acquisition path:

    from windtpu.preprocess.download_era5 import download_ERA5
    download_ERA5("data/era5", start, end, lat_range, lon_range)  # needs ~/.cdsapirc
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent / "_demo_data"


def fabricate():
    """Synthetic ERA5 day + DEM so the demo runs without credentials."""
    from windtpu.io.dataset import DataArray, Dataset
    from windtpu.io.geotiff import write_geotiff_like

    (ROOT / "era5").mkdir(parents=True, exist_ok=True)
    nt, nlat, nlon = 24, 8, 9
    time = np.arange("2016-04-01T00", "2016-04-02T00", dtype="datetime64[h]")
    lat = np.linspace(47.5, 45.0, nlat)
    lon = np.linspace(5.5, 9.5, nlon)
    rng = np.random.RandomState(0)
    ds = Dataset(
        {v: DataArray(("time", "latitude", "longitude"),
                      (rng.standard_normal((nt, nlat, nlon)) * 3)
                      .astype(np.float32))
         for v in ("u10", "v10")},
        {"time": DataArray(("time",), time),
         "latitude": DataArray(("latitude",), lat),
         "longitude": DataArray(("longitude",), lon)})
    ds.to_netcdf(ROOT / "era5" / "20160401_era5_surface_hourly.nc")

    ny, nx = 300, 400
    x = np.linspace(5.4, 9.6, nx)
    y = np.linspace(47.6, 44.9, ny)
    ridge = 1500 * np.sin(np.linspace(0, 6, ny))[:, None] * \
        np.cos(np.linspace(0, 8, nx))[None, :]
    write_geotiff_like(ROOT / "dem.tif", (2000 + ridge).astype(np.float32),
                       x, y)
    print(f"fabricated inputs under {ROOT}")


def downscale():
    """Notebook cells 9-16: open inputs, downscale a bbox, plot, save."""
    from windtpu import api
    from windtpu.io.dataset import open_mfdataset
    from windtpu.io.geotiff import open_rasterio
    from windtpu.viz import plot_elevation, plot_wind_fields

    era5 = open_mfdataset(str(ROOT / "era5" / "20160401*surface*.nc"))
    raster = open_rasterio(ROOT / "dem.tif")
    result = api.downscale(era5, raster, range_lon=(5.5, 9.5),
                           range_lat=(45.0, 47.5), overlap_factor=0.01)
    out = ROOT / "downscaled.nc"
    result.to_netcdf(out)
    print(f"wrote {out}: {result.sizes}")
    plot_wind_fields(result, title="windtpu downscaled").savefig(
        ROOT / "wind_fields.png", dpi=80)
    plot_elevation(raster).savefig(ROOT / "dem.png", dpi=80)
    print("saved plots")


def swiss():
    """Notebook cells 18-26: use the Swiss COSMO grid template instead of
    the generic x26/x18 upsampled bbox."""
    from windtpu import api
    from windtpu.assets import swiss_cosmo_grid
    from windtpu.io.dataset import DataArray, Dataset, open_mfdataset
    from windtpu.io.geotiff import open_rasterio
    from windtpu.infer.template import process_topo

    grid = swiss_cosmo_grid()
    # 1-D template coords from the grid's axis medians.
    lat_1 = np.median(grid.coords["lat_1"].values, axis=1)
    lon_1 = np.median(grid.coords["lon_1"].values, axis=0)
    era5 = open_mfdataset(str(ROOT / "era5" / "20160401*surface*.nc"))
    template = Dataset({}, {
        "lon_1": DataArray(("lon_1",), lon_1),
        "lat_1": DataArray(("lat_1",), lat_1),
        "time": era5.coords["time"],
    })
    inputs_era5 = era5[["u10", "v10"]].sel_nearest(
        longitude=lon_1, latitude=lat_1).rename(
        {"longitude": "lon_1", "latitude": "lat_1"})
    inputs_topo = process_topo(open_rasterio(ROOT / "dem.tif"), template)
    result = api.predict(inputs_era5, inputs_topo, template,
                         overlap_factor=0.01)
    out = ROOT / "downscaled_swiss.nc"
    result.to_netcdf(out)
    print(f"wrote {out}: {result.sizes}")


def train():
    """Synthetic-data training smoke (there is no training driver in the
    reference at all; this is the windtpu one)."""
    from windtpu.cli import train_main

    train_main(["--inputs", "x", "--outputs", "y", "--synthetic",
                "--checkpoint-dir", str(ROOT / "ckpt"),
                "--steps", "3", "--batch-size", "4", "--patch-size", "24",
                "--sequence-length", "2"])


def ensemble():
    """Stochastic ensemble: one member per PRNG key (one per device on a
    TPU slice with an 'ensemble' mesh axis)."""
    from windtpu import api
    from windtpu.io.dataset import open_mfdataset
    from windtpu.io.geotiff import open_rasterio

    era5 = open_mfdataset(str(ROOT / "era5" / "20160401*surface*.nc"))
    raster = open_rasterio(ROOT / "dem.tif")
    result = api.downscale(era5, raster, range_lon=(5.5, 9.5),
                           range_lat=(45.0, 47.5), overlap_factor=0.01,
                           ensemble_members=4)
    spread = np.nanstd(np.asarray(result["u10"].values), axis=0)
    print("member spread (std over members):", float(np.nanmean(spread)))


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "fabricate"
    {"fabricate": fabricate, "downscale": downscale, "swiss": swiss,
     "train": train, "ensemble": ensemble}[stage]()
