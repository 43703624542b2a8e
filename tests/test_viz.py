"""Direct plotting assertions (reference api.py:163-216): render to an Agg
canvas and check axes, colorbars, symmetric color limits, and extents —
previously plotting was only executed implicitly via the notebook test
(VERDICT r2 item 8)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from windtpu.io.dataset import DataArray, Dataset  # noqa: E402
from windtpu.viz import plot_elevation, plot_wind_fields  # noqa: E402


@pytest.fixture
def wind_ds():
    rng = np.random.RandomState(0)
    ny, nx, t = 12, 16, 3
    lon = np.linspace(5.0, 7.0, nx)
    lat = np.linspace(45.0, 46.0, ny)
    lon2, lat2 = np.meshgrid(lon, lat)
    u = 4.0 * rng.standard_normal((t, ny, nx)).astype(np.float32)
    v = 2.0 * rng.standard_normal((t, ny, nx)).astype(np.float32)
    return Dataset(
        {"u10": DataArray(("time", "y", "x"), u),
         "v10": DataArray(("time", "y", "x"), v)},
        {"lon_1": DataArray(("y", "x"), lon2),
         "lat_1": DataArray(("y", "x"), lat2)},
    ), u, v


def test_plot_wind_fields_panels_and_colorbars(wind_ds):
    ds, u, v = wind_ds
    fig = plot_wind_fields(ds, title="test fields")
    try:
        fig.canvas.draw()  # force a real Agg render
        # Two map panels + two horizontal colorbars.
        map_axes = [a for a in fig.axes if a.get_title() == "test fields"]
        assert len(map_axes) == 2
        assert len(fig.axes) == 4
        # Symmetric per-panel color limits around 0 at the data max.
        for ax, field, label in zip(map_axes, (u, v), ("U", "V")):
            meshes = [c for c in ax.collections
                      if hasattr(c, "get_clim")]
            assert meshes, "panel lost its pcolormesh"
            vmin, vmax = meshes[0].get_clim()
            bound = float(np.nanmax(np.abs(field[0])))
            assert vmax == pytest.approx(bound, rel=1e-6)
            assert vmin == pytest.approx(-bound, rel=1e-6)
        labels = [cb.get_xlabel() for cb in fig.axes if cb not in map_axes]
        assert any("U-component" in lab for lab in labels)
        assert any("V-component" in lab for lab in labels)
    finally:
        plt.close(fig)


def test_plot_wind_fields_extent_and_time_index(wind_ds):
    ds, u, _ = wind_ds
    fig = plot_wind_fields(ds, range_lon=(5.2, 6.8), range_lat=(45.1, 45.9),
                           time_index=2)
    try:
        fig.canvas.draw()
        ax = fig.axes[0]
        assert ax.get_xlim() == pytest.approx((5.2, 6.8))
        assert ax.get_ylim() == pytest.approx((45.1, 45.9))
        # time_index selects the plotted slice -> color bound follows it.
        vmin, vmax = ax.collections[0].get_clim()
        assert vmax == pytest.approx(float(np.nanmax(np.abs(u[2]))),
                                     rel=1e-6)
    finally:
        plt.close(fig)


def test_plot_wind_fields_all_nan_slice_is_safe(wind_ds):
    ds, _, _ = wind_ds
    ds["u10"].values[:] = np.nan
    fig = plot_wind_fields(ds)
    try:
        fig.canvas.draw()
        vmin, vmax = fig.axes[0].collections[0].get_clim()
        assert (vmin, vmax) == (-1.0, 1.0)  # documented fallback bound
    finally:
        plt.close(fig)


def test_plot_elevation_lognorm_and_extent():
    rng = np.random.RandomState(1)
    ny, nx = 10, 14
    dem = np.abs(1200.0 * rng.standard_normal((1, ny, nx))).astype(
        np.float32)
    raster = Dataset(
        {"band_data": DataArray(("band", "y", "x"), dem)},
        {"x": DataArray(("x",), np.linspace(6.0, 8.0, nx)),
         "y": DataArray(("y",), np.linspace(47.0, 46.0, ny))},
    )
    fig = plot_elevation(raster, range_lon=(6.2, 7.8),
                         range_lat=(46.1, 46.9))
    try:
        fig.canvas.draw()
        ax = fig.axes[0]
        assert ax.get_title() == "DEM"
        pcm = ax.collections[0]
        # Log color normalization with the reference's fixed terrain range.
        from matplotlib.colors import LogNorm

        assert isinstance(pcm.norm, LogNorm)
        assert (pcm.norm.vmin, pcm.norm.vmax) == (58, 4473)
        assert ax.get_xlim() == pytest.approx((6.2, 7.8))
        assert ax.get_ylim() == pytest.approx((46.1, 46.9))
        # One horizontal colorbar with the terrain label.
        cbs = [a for a in fig.axes if a is not ax]
        assert len(cbs) == 1
        assert "terrain height" in cbs[0].get_xlabel()
    finally:
        plt.close(fig)
