"""Metric suite vs numpy oracles (the reference's *_from_xarray twins,
gan/metrics.py:48-60,113-118,143-152,193-198, are the model for this)."""

import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.metrics import metrics as M
from windtpu.metrics import oracles as O


@pytest.fixture
def pair(rng):
    real = rng.standard_normal((2, 3, 12, 12, 2)).astype(np.float32) * 3
    fake = rng.standard_normal((2, 3, 12, 12, 2)).astype(np.float32) * 3
    return real, fake


def test_wind_speed_weighted_rmse(pair):
    real, fake = pair
    got = np.asarray(M.wind_speed_weighted_rmse(jnp.array(real), jnp.array(fake)))
    want = O.wind_speed_weighted_rmse_np(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_extreme_weighted_rmse(pair):
    real, fake = pair
    got = np.asarray(M.extreme_weighted_rmse(jnp.array(real), jnp.array(fake)))
    want = O.extreme_weighted_rmse_np(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_wind_speed_rmse(pair):
    real, fake = pair
    got = np.asarray(M.wind_speed_rmse(jnp.array(real), jnp.array(fake)))
    want = O.wind_speed_rmse_np(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_angular_cosine_distance(pair):
    real, fake = pair
    got = np.asarray(M.angular_cosine_distance(jnp.array(real), jnp.array(fake)))
    want = O.angular_cosine_distance_np(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # Identical fields => zero angular distance.
    zero = np.asarray(M.angular_cosine_distance(jnp.array(real), jnp.array(real)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-3)


def test_opposite_cosine_similarity(pair):
    real, fake = pair
    # OCS of identical vectors is 0; of opposite vectors is 1.
    same = np.asarray(M.opposite_cosine_similarity(jnp.array(real), jnp.array(real)))
    np.testing.assert_allclose(same, 0.0, atol=1e-5)
    opp = np.asarray(M.opposite_cosine_similarity(jnp.array(real), jnp.array(-real)))
    np.testing.assert_allclose(opp, 1.0, atol=1e-5)


def test_log_spectral_distance(pair):
    real, fake = pair
    got = np.asarray(M.log_spectral_distance(jnp.array(real), jnp.array(fake)))
    want = O.log_spectral_distance_np(real, fake)
    np.testing.assert_allclose(got, want, rtol=1e-3)
    same = np.asarray(M.log_spectral_distance(jnp.array(real), jnp.array(real)))
    np.testing.assert_allclose(same, 0.0, atol=1e-3)


def test_spatial_ks_integral_image_equals_bruteforce(rng):
    """The box-filter KS must match the reference's direct patch
    extraction algorithm."""
    real = rng.standard_normal((1, 2, 10, 10, 1)).astype(np.float32) * 5
    fake = rng.standard_normal((1, 2, 10, 10, 1)).astype(np.float32) * 5
    got = np.asarray(M.spatially_convolved_ks_stat(
        jnp.array(real), jnp.array(fake), patch_size=4, num_points=25))
    want = O.spatial_ks_bruteforce_np(real, fake, patch_size=4, num_points=25)
    assert got.shape == want.shape == (7, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_ks_default_patch_size_matches_oracle(rng):
    """Both default patch_size from the HEIGHT axis (reference
    gan/metrics.py:166 uses shape[2]//10) — on a non-square field a
    mismatched default would silently compare different statistics."""
    real = rng.standard_normal((1, 1, 30, 50, 1)).astype(np.float32) * 5
    fake = rng.standard_normal((1, 1, 30, 50, 1)).astype(np.float32) * 5
    got = np.asarray(M.spatially_convolved_ks_stat(
        jnp.array(real), jnp.array(fake), num_points=25))
    want = O.spatial_ks_bruteforce_np(real, fake, num_points=25)
    assert got.shape == want.shape == (28, 48)  # patch 30//10 = 3
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_extreme_rmse_axis_name_matches_global(rng):
    """Under shard_map with the batch sharded, passing axis_name must make
    the weight denominator global: mean-of-shards == single-device."""
    import jax
    from jax.sharding import PartitionSpec as P

    from windtpu.core.mesh import make_mesh

    real = rng.standard_normal((8, 2, 6, 6, 2)).astype(np.float32) * 3
    fake = real + rng.standard_normal(real.shape).astype(np.float32)
    whole = float(np.mean(np.asarray(
        M.extreme_weighted_rmse(jnp.array(real), jnp.array(fake)))))
    mesh = make_mesh({"data": 4})
    sharded = jax.shard_map(
        lambda r, f: jax.lax.pmean(
            jnp.mean(M.extreme_weighted_rmse(r, f, axis_name="data")),
            "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    got = float(sharded(jnp.array(real), jnp.array(fake)))
    np.testing.assert_allclose(got, whole, rtol=1e-5)


def test_spatial_ks_identical_fields_is_zero(rng):
    x = rng.standard_normal((1, 1, 12, 12, 2)).astype(np.float32)
    ks = np.asarray(M.spatially_convolved_ks_stat(
        jnp.array(x), jnp.array(x), patch_size=3))
    np.testing.assert_allclose(ks, 0.0, atol=1e-6)


def test_metrics_zero_nan_handling():
    real = jnp.zeros((1, 2, 8, 8, 2))
    fake = jnp.zeros((1, 2, 8, 8, 2))
    # All-zero fields: weighted metrics must not produce NaN.
    assert np.isfinite(np.asarray(M.extreme_weighted_rmse(real, fake))).all()
    assert np.isfinite(np.asarray(M.wind_speed_weighted_rmse(real, fake))).all()
    assert np.isfinite(np.asarray(M.log_spectral_distance(real, fake))).all()
