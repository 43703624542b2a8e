"""DEM -> topographic descriptor files.

Mirrors the reference pipeline step (data_processing.py:41-65): read the
DEM GeoTIFF, compute (elevation, tpi_500, we_derivative, sn_derivative,
slope, aspect) and write each as ``topo_<name>.nc`` next to the DEM,
skipping idempotently if all outputs exist.  The descriptors themselves run
as convolution stencils on the TPU (windtpu.ops.stencil) instead of host
scipy filters.

Unlike the reference, this also emits ``ridge_index_norm`` /
``ridge_index_dir`` — the reference's default training inputs require
ridge_index_norm (data_generator.py:103-110) but its topo job never
produces it; see windtpu.ops.stencil.ridge_index for the definition.
"""

from __future__ import annotations

import pathlib

import numpy as np

from windtpu.io.dataset import DataArray, Dataset
from windtpu.io.geotiff import open_rasterio
from windtpu.ops.stencil import topographic_descriptors

NAMES = ("elevation", "tpi_500", "we_derivative", "sn_derivative",
         "slope", "aspect", "ridge_index_norm", "ridge_index_dir")


def process_topographic_variables_file(path_to_file: str,
                                       scale_meters: float = 500.0):
    path = pathlib.Path(path_to_file)
    if all((path.parent / f"topo_{n}.nc").exists() for n in NAMES):
        print("Already processed all topo files")
        return
    raster = open_rasterio(path)
    dem = raster["band_data"].values[0]
    y = raster.coords["y"].values
    x = raster.coords["x"].values
    descriptors = topographic_descriptors(dem, y, x, scale_meters)
    for name in NAMES:
        vals = np.asarray(descriptors[name])
        ds = Dataset(
            {name: DataArray(("y", "x"), vals)},
            {"y": DataArray(("y",), y), "x": DataArray(("x",), x)},
        )
        out = path.parent / f"topo_{name}.nc"
        ds.to_netcdf(out)
        print(f"wrote {out}")
