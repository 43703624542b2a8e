"""Pallas spatial-KS kernel vs the XLA metric and the brute-force oracle
(interpret mode on CPU; the compiled kernel is exercised on TPU by
tools/prof_variant + bench)."""

import jax.numpy as jnp
import numpy as np

from windtpu.metrics import oracles as O
from windtpu.metrics.metrics import spatially_convolved_ks_stat
from windtpu.ops.pallas_ks import spatial_ks_pallas


def test_pallas_matches_xla_and_oracle(rng):
    real = rng.standard_normal((1, 2, 12, 12, 2)).astype(np.float32) * 5
    fake = rng.standard_normal((1, 2, 12, 12, 2)).astype(np.float32) * 5
    got = np.asarray(spatial_ks_pallas(
        jnp.asarray(real), jnp.asarray(fake), patch_size=4, num_points=25,
        interpret=True))
    xla = np.asarray(spatially_convolved_ks_stat(
        jnp.asarray(real), jnp.asarray(fake), patch_size=4, num_points=25))
    brute = O.spatial_ks_bruteforce_np(real, fake, patch_size=4,
                                       num_points=25)
    np.testing.assert_allclose(got, xla, atol=1e-5)
    np.testing.assert_allclose(got, brute, atol=1e-5)


def test_pallas_identical_fields_zero(rng):
    x = rng.standard_normal((1, 1, 10, 10, 1)).astype(np.float32)
    ks = np.asarray(spatial_ks_pallas(jnp.asarray(x), jnp.asarray(x),
                                      patch_size=3, interpret=True))
    np.testing.assert_allclose(ks, 0.0, atol=1e-6)
