"""On-device terrain descriptor stencils."""

import jax.numpy as jnp
import numpy as np

from windtpu.ops.stencil import (
    disc_mean,
    fill_nans,
    gradient_descriptors,
    meters_per_pixel,
    topographic_descriptors,
    tpi,
)


class TestStencils:
    def test_disc_mean_constant_field(self):
        dem = jnp.full((32, 32), 5.0)
        out = np.asarray(disc_mean(dem, 7))
        np.testing.assert_allclose(out, 5.0, atol=1e-5)

    def test_tpi_flat_is_zero_peak_positive(self):
        dem = np.zeros((33, 33), np.float32)
        dem[16, 16] = 100.0
        t = np.asarray(tpi(jnp.asarray(dem), 9))
        assert t[16, 16] > 50.0       # a peak stands above its surroundings
        assert abs(t[0, 0]) < 1e-3    # flat corner

    def test_gradient_of_plane(self):
        """A plane z = a*x + b*y must give constant derivatives a, b."""
        res = (1000.0, 1000.0)
        yy, xx = np.mgrid[:40, :40].astype(np.float32)
        a, b = 0.01, -0.02  # per meter
        dem = a * xx * res[1] + b * yy * res[0]
        ddx, ddy, slope, aspect = gradient_descriptors(
            jnp.asarray(dem), 1, res)
        inner = np.s_[5:-5, 5:-5]
        np.testing.assert_allclose(np.asarray(ddx)[inner], a, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ddy)[inner], b, atol=1e-4)
        want_slope = np.arctan(np.hypot(a, b))
        np.testing.assert_allclose(np.asarray(slope)[inner], want_slope,
                                   atol=1e-4)
        want_aspect = np.arctan2(b, a)
        np.testing.assert_allclose(np.asarray(aspect)[inner], want_aspect,
                                   atol=1e-3)

    def test_fill_nans(self):
        dem = np.ones((16, 16), np.float32) * 3.0
        dem[5:8, 5:8] = np.nan
        out = np.asarray(fill_nans(jnp.asarray(dem)))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, 3.0, atol=1e-2)

    def test_meters_per_pixel_sign(self):
        lat = np.linspace(48, 45, 10)   # descending (north-up)
        lon = np.linspace(5, 9, 10)
        res_y, res_x = meters_per_pixel(lat, lon)
        assert res_y < 0 and res_x > 0
        assert 30000 < abs(res_y) < 40000

    def test_full_descriptor_set(self):
        rng = np.random.RandomState(0)
        dem = rng.uniform(200, 3000, (64, 80)).astype(np.float32)
        dem[10, 10] = np.nan
        lat = np.linspace(47.5, 45.5, 64)
        lon = np.linspace(6.0, 9.0, 80)
        desc = topographic_descriptors(dem, lat, lon, 500.0)
        assert set(desc) == {"elevation", "tpi_500", "we_derivative",
                             "sn_derivative", "slope", "aspect",
                             "ridge_index_norm", "ridge_index_dir"}
        for name, arr in desc.items():
            a = np.asarray(arr)
            assert a.shape == (64, 80), name
            assert np.isfinite(a).all(), name
        assert (np.abs(np.asarray(desc["slope"])) <= np.pi / 2).all()
        assert (np.asarray(desc["ridge_index_norm"]) >= 0).all()
        d = np.asarray(desc["ridge_index_dir"])
        assert ((d >= 0) & (d < np.pi)).all()

    def test_ridge_index_detects_crest_axis(self):
        """A north-south Gaussian ridge peaks at the crest column with the
        crest axis reported as pi/2; flats report zero."""
        from windtpu.ops.stencil import ridge_index

        x = np.arange(64, dtype=np.float32)
        dem = np.tile(1000.0 * np.exp(-((x - 32.0) ** 2) / 30.0), (64, 1))
        norm, dirn = ridge_index(jnp.asarray(dem), 9)
        norm, dirn = np.asarray(norm), np.asarray(dirn)
        assert norm[32].argmax() == 32
        assert norm[32, 32] > 100.0
        assert norm[32, 2] == 0.0                      # flat far field
        assert abs(dirn[32, 32] - np.pi / 2) < 1e-6    # crest runs N-S
        # 90-degree rotation rotates the reported crest axis accordingly.
        norm_t, dirn_t = ridge_index(jnp.asarray(dem.T.copy()), 9)
        assert abs(float(dirn_t[32, 32])) < 1e-6
        np.testing.assert_allclose(np.asarray(norm_t), norm.T, atol=1e-3)
