"""Bundled grid asset correctness.

The reference packages the real COSMO-1 Swiss grid
(``src/downscaling/switzerland_cosmo_map.nc``, packaged at ``setup.py:10-11``
and used as the high-res template in notebook cells 20-22).  windtpu
reconstructs it analytically from four scalars; these tests pin the
reconstruction to the true geometry, and — when the reference asset is
readable on this machine — compare cell centers directly against it.
"""

import os

import numpy as np
import pytest

from windtpu.assets import swiss_cosmo_grid

REF_ASSET = "/root/reference/src/downscaling/switzerland_cosmo_map.nc"


def test_grid_geometry_exact():
    grid = swiss_cosmo_grid()
    x = np.asarray(grid["x_1"].values)
    y = np.asarray(grid["y_1"].values)
    assert x.shape == (429,) and y.shape == (294,)
    # True COSMO-1 Swiss window: exactly 1 km spacing.
    assert x[0] == 439000.0 and x[-1] == 867000.0
    assert y[0] == 40500.0 and y[-1] == 333500.0
    np.testing.assert_allclose(np.diff(x), 1000.0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.diff(y), 1000.0, rtol=0, atol=1e-6)
    assert grid["lat_1"].values.shape == (294, 429)
    assert grid["lon_1"].values.shape == (294, 429)


@pytest.mark.skipif(not os.path.exists(REF_ASSET),
                    reason="reference asset not present")
def test_grid_matches_reference_asset():
    h5py = pytest.importorskip("h5py")
    grid = swiss_cosmo_grid()
    with h5py.File(REF_ASSET, "r") as f:
        ref_x = f["x_1"][:]
        ref_y = f["y_1"][:]
        ref_lat = f["lat_1"][:]
        ref_lon = f["lon_1"][:]
    np.testing.assert_allclose(grid["x_1"].values, ref_x, atol=1e-3)
    np.testing.assert_allclose(grid["y_1"].values, ref_y, atol=1e-3)
    # swisstopo approximate CH1903->WGS84 series is good to ~1e-3 deg
    # (~100 m).  Cell centers must agree to that tolerance everywhere.
    lat_err = np.abs(grid["lat_1"].values - ref_lat)
    lon_err = np.abs(grid["lon_1"].values - ref_lon)
    assert lat_err.max() < 2e-3, f"max lat error {lat_err.max():.5f} deg"
    assert lon_err.max() < 2e-3, f"max lon error {lon_err.max():.5f} deg"
