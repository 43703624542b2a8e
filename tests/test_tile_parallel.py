"""Spatial-tile-parallel inference on the 8-device virtual mesh must match
the single-device result exactly (identity apply_fn -> deterministic)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.core.config import InferenceConfig, ModelConfig
from windtpu.core.mesh import make_mesh
from windtpu.infer.engine import (
    make_tile_parallel_predictor,
    make_tiled_predictor,
)
from windtpu.infer.tiling import plan_tiling

TINY_M = ModelConfig(image_size=32, in_channels=3, noise_channels=2,
                     out_channels=2, sequence_length=4,
                     generator_features=16, discriminator_features=8)
TINY_I = InferenceConfig(sequence_length=4, image_size=32, noise_channels=2,
                         border_crop=2, group_size=2, overlap_factor=0.5,
                         replicate_normalization_quirk=False)


def _identity(v, patches, noise):
    return patches[..., :2]


def test_tile_parallel_matches_single_device():
    mesh = make_mesh({"data": 8})
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.standard_normal((4, 64, 72, 3)).astype(np.float32))
    plan = plan_tiling(64, 72, 4, 32, 4, TINY_I.overlap_factor)
    single = make_tiled_predictor(TINY_M, TINY_I, plan, apply_fn=_identity)
    sharded = make_tile_parallel_predictor(TINY_M, TINY_I, plan, mesh,
                                           apply_fn=_identity)
    key = jax.random.key(0)
    p1, c1 = single({}, field, key)
    p2, c2 = sharded({}, field, key)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    a, b = np.asarray(p1), np.asarray(p2)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], atol=1e-5)


def _noise_passthrough(v, patches, noise):
    # Output IS the noise: any divergence in per-group PRNG folding
    # between the single-device and sharded paths becomes visible.
    return noise[..., :2]


def test_tile_parallel_noise_matches_single_device():
    """Sharded inference must fold the noise PRNG by the GLOBAL group
    index: with local indices every device would draw the same noise for
    its groups (spatially correlated realizations) and diverge from the
    single-device predictor."""
    mesh = make_mesh({"data": 4})
    rng = np.random.RandomState(7)
    field = jnp.asarray(rng.standard_normal((4, 64, 72, 3)).astype(np.float32))
    plan = plan_tiling(64, 72, 4, 32, 4, TINY_I.overlap_factor)
    single = make_tiled_predictor(TINY_M, TINY_I, plan,
                                  apply_fn=_noise_passthrough)
    sharded = make_tile_parallel_predictor(TINY_M, TINY_I, plan, mesh,
                                           apply_fn=_noise_passthrough)
    key = jax.random.key(5)
    p1, _ = single({}, field, key)
    p2, _ = sharded({}, field, key)
    a, b = np.asarray(p1), np.asarray(p2)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], atol=1e-5)
    # And the field is not all one repeated tile: distinct groups did get
    # distinct noise (guards against a fold that collapses all indices).
    assert np.nanstd(a) > 0


def test_tile_parallel_quirk_stats_global():
    """Quirk normalization stats must be identical whether computed on one
    device or psum'ed across shards."""
    import dataclasses

    icfg = dataclasses.replace(TINY_I, replicate_normalization_quirk=True)
    mesh = make_mesh({"data": 4})
    rng = np.random.RandomState(3)
    field = jnp.asarray(rng.standard_normal((4, 48, 48, 3)).astype(np.float32))
    plan = plan_tiling(48, 48, 4, 32, 4, icfg.overlap_factor)
    single = make_tiled_predictor(TINY_M, icfg, plan, apply_fn=_identity)
    sharded = make_tile_parallel_predictor(TINY_M, icfg, plan, mesh,
                                           apply_fn=_identity)
    p1, _ = single({}, field, jax.random.key(1))
    p2, _ = sharded({}, field, jax.random.key(1))
    a, b = np.asarray(p1), np.asarray(p2)
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], atol=1e-5)


def test_tile_parallel_predictor_memoized():
    """Repeated downscale_field(mesh=...) calls over same-shaped domains
    must reuse the compiled shard_map program (same memoization as the
    single-device make_tiled_predictor)."""
    mesh = make_mesh({"data": 8})
    plan = plan_tiling(64, 72, 4, 32, 4, TINY_I.overlap_factor)
    p1 = make_tile_parallel_predictor(TINY_M, TINY_I, plan, mesh)
    p2 = make_tile_parallel_predictor(TINY_M, TINY_I, plan, mesh)
    assert p1 is p2
    # A custom apply_fn must NOT be memoized (unhashable, test-only path).
    p3 = make_tile_parallel_predictor(TINY_M, TINY_I, plan, mesh,
                                      apply_fn=_identity)
    assert p3 is not p1


def test_ensemble_tile_combined_matches_per_member():
    """The combined ensemble+tile shard_map must equal a per-member
    single-device run (noise passthrough makes per-member PRNG visible)
    AND actually shard the member axis over the ensemble mesh axis —
    vmap over the tile-parallel predictor replicates every member on
    every ensemble group (same output, ~3x the compute)."""
    from windtpu.infer.engine import make_ensemble_tile_parallel_predictor

    mesh = make_mesh({"data": 2, "ensemble": 4})
    rng = np.random.RandomState(11)
    field = jnp.asarray(rng.standard_normal((4, 64, 72, 3)).astype(np.float32))
    plan = plan_tiling(64, 72, 4, 32, 4, TINY_I.overlap_factor)
    keys = jax.random.split(jax.random.key(9), 4)

    comb = make_ensemble_tile_parallel_predictor(
        TINY_M, TINY_I, plan, mesh, apply_fn=_noise_passthrough)
    preds, counts = comb({}, field, keys)
    assert preds.shape == (4,) + field.shape[:3] + (2,)
    # Member axis genuinely sharded: P('ensemble') over axis 0, spread
    # across all 8 devices (replicated over the data axis).
    assert preds.sharding.spec[0] == "ensemble"
    assert len(preds.sharding.device_set) == 8

    single = make_tiled_predictor(TINY_M, TINY_I, plan,
                                  apply_fn=_noise_passthrough)
    ref = np.stack([np.asarray(single({}, field, k)[0]) for k in keys])
    got = np.asarray(preds)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-5)
    # Distinct members drew distinct noise.
    assert np.nanstd(got[0] - got[1]) > 0


def test_downscale_field_routes_combined_mesh():
    """downscale_field with a (data, ensemble) mesh + ensemble_keys must
    use the combined predictor (member axis sharded over 'ensemble')."""
    from windtpu.infer.engine import downscale_field
    from windtpu.models.generator import init_generator

    mesh = make_mesh({"data": 2, "ensemble": 2})
    rng = np.random.RandomState(13)
    field = jnp.asarray(rng.standard_normal((4, 64, 72, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(3), 2)
    g_vars = init_generator(TINY_M, jax.random.key(0))
    preds, _ = downscale_field(g_vars, field, TINY_M, TINY_I,
                               ensemble_keys=keys, mesh=mesh)
    assert preds.shape[0] == 2
    assert preds.sharding.spec[0] == "ensemble"
