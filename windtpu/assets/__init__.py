"""Bundled grid assets.

The reference packages ``switzerland_cosmo_map.nc`` — the COSMO-1 analysis
grid over Switzerland (294 x 429 cells, Swiss CH1903/LV03 projected
x_1/y_1 coordinates plus 2-D lat_1/lon_1; SURVEY.md §2 "Grid template
asset").  The original data blob is not redistributable here, so
:func:`swiss_cosmo_grid` reconstructs an equivalent grid analytically:
CH1903 coordinates at ~1.1 km spacing spanning the same Swiss domain, with
lat/lon computed by the official approximate CH1903 -> WGS84 conversion
formulas (swisstopo).  Shapes and coordinate conventions match the
reference asset; exact cell centers may differ at the sub-kilometer level.
"""

from __future__ import annotations

import numpy as np

from windtpu.io.dataset import DataArray, Dataset

# Reference asset dimensions (h5dump-verified in SURVEY.md §2).
NY, NX = 294, 429
# CH1903/LV03 bounds of the COSMO-1 Swiss window (~1.1 km spacing).
X_MIN, X_MAX = 480000.0, 865000.0    # easting  (y-axis in CH1903 naming)
Y_MIN, Y_MAX = 62000.0, 302000.0     # northing


def _ch1903_to_wgs84(e: np.ndarray, n: np.ndarray):
    """Approximate CH1903 -> WGS84 (swisstopo series expansion)."""
    y = (e - 600000.0) / 1e6
    x = (n - 200000.0) / 1e6
    lon = (2.6779094 + 4.728982 * y + 0.791484 * y * x
           + 0.1306 * y * x**2 - 0.0436 * y**3) * 100.0 / 36.0
    lat = (16.9023892 + 3.238272 * x - 0.270978 * y**2
           - 0.002528 * x**2 - 0.0447 * y**2 * x - 0.0140 * x**3) \
        * 100.0 / 36.0
    return lon, lat


def swiss_cosmo_grid() -> Dataset:
    """294 x 429 Swiss 1-km grid template with (x_1, y_1) CH1903 coords and
    2-D (lat_1, lon_1), the shape/convention of the bundled reference
    asset."""
    x_1 = np.linspace(X_MIN, X_MAX, NX)
    y_1 = np.linspace(Y_MIN, Y_MAX, NY)
    ee, nn = np.meshgrid(x_1, y_1)
    lon_1, lat_1 = _ch1903_to_wgs84(ee, nn)
    return Dataset(
        {},
        {
            "x_1": DataArray(("x_1",), x_1),
            "y_1": DataArray(("y_1",), y_1),
            "lon_1": DataArray(("y_1", "x_1"), lon_1),
            "lat_1": DataArray(("y_1", "x_1"), lat_1),
        },
    )
