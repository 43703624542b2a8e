"""Multi-device parallelism on the 8-device virtual CPU mesh:
sharded-jit DP (XLA-inserted psums) and explicit shard_map DP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.core.mesh import make_mesh, replicate, shard_batch
from windtpu.parallel import make_sharded_train_step
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

CFG = GANConfig(
    model=ModelConfig(image_size=12, in_channels=3, noise_channels=2,
                      out_channels=2, sequence_length=2,
                      generator_features=8, discriminator_features=4),
    train=TrainConfig(batch_size=8, n_critic=1, compute_metrics=False),
)


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    m = CFG.model
    lr = rng.standard_normal((8, m.sequence_length, m.image_size,
                              m.image_size, m.in_channels)).astype(np.float32)
    hr = rng.standard_normal((8, m.sequence_length, m.image_size,
                              m.image_size, m.out_channels)).astype(np.float32)
    return lr, hr


def test_mesh_shapes():
    mesh = make_mesh({"data": 4, "ensemble": 2})
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "ensemble": 2}


def test_sharded_jit_dp_step():
    """Default path: batch sharded over data axis, params replicated;
    XLA handles grad sync."""
    mesh = make_mesh({"data": 8})
    state = replicate(mesh, create_train_state(CFG))
    step = make_train_step(CFG)
    lr, hr = _batch()
    lr, hr = shard_batch(mesh, (lr, hr))
    key = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))
    state, metrics = step(state, lr, hr, key)
    assert int(jax.device_get(state.step)) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # Updated params stay replicated over all 8 devices.
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_shard_map_dp_step_matches_replication():
    """Explicit shard_map path runs, syncs grads (params identical across
    devices) and advances the step."""
    mesh = make_mesh({"data": 8})
    state = replicate(mesh, create_train_state(CFG))
    step = make_sharded_train_step(CFG, mesh)
    lr, hr = _batch(seed=3)
    lr, hr = shard_batch(mesh, (lr, hr))
    key = jax.device_put(jax.random.key(1), NamedSharding(mesh, P()))
    state, metrics = step(state, lr, hr, key)
    assert int(jax.device_get(state.step)) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # Explicit check: each device holds identical (synced) parameters.
    leaf = jax.tree_util.tree_leaves(state.d_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_ensemble_axis_inference():
    """Members sharded over the ensemble axis produce distinct fields."""
    from windtpu.core.config import InferenceConfig
    from windtpu.infer.engine import downscale_field
    from windtpu.models.generator import init_generator

    mesh = make_mesh({"ensemble": 8})
    m = CFG.model
    g_vars = replicate(mesh, init_generator(m, jax.random.key(0)))
    field = np.random.RandomState(0).standard_normal(
        (2, 14, 14, 3)).astype(np.float32)
    keys = jax.random.split(jax.random.key(7), 8)
    keys = jax.device_put(keys, NamedSharding(mesh, P("ensemble")))
    icfg = InferenceConfig(sequence_length=2, image_size=12,
                           noise_channels=2, group_size=2,
                           overlap_factor=0.1)
    preds, _ = downscale_field(g_vars, jnp.asarray(field), m, icfg,
                               ensemble_keys=keys)
    p = np.asarray(jax.device_get(preds))
    assert p.shape[0] == 8
    mask = ~np.isnan(p[0])
    assert not np.allclose(p[0][mask], p[1][mask])


def test_distributed_initialize_noop_single_process(monkeypatch):
    from windtpu.parallel import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_shard_map_batch_stats_replicated():
    """BatchNorm running stats are data-dependent, so each shard computes
    different values; the explicit-collective step must pmean them or the
    'replicated' output state silently holds one arbitrary shard's stats."""
    from jax import shard_map

    mesh = make_mesh({"data": 4})
    state = create_train_state(CFG)
    raw = make_train_step(CFG, pmean_axis="data", jit_wrap=False)

    def body(st, lr, hr, rng):
        new_state, _ = raw(st, lr, hr, rng)
        # Expose every device's copy of the stats along a leading axis.
        return jax.tree_util.tree_map(lambda a: a[None],
                                      new_state.g_batch_stats)

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=P("data"), check_vma=False))
    lr, hr = _batch(seed=7)
    stats = jax.device_get(fn(state, lr, hr, jax.random.key(2)))
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves, "generator has no batch_stats?"
    for leaf in leaves:
        assert leaf.shape[0] == 4
        for i in range(1, 4):
            np.testing.assert_array_equal(leaf[0], leaf[i])


def test_inference_mesh_auto_shapes():
    """api.inference_mesh: ensemble gets the largest member-divisor that
    fits, leftover device factor tiles patches; single device -> None."""
    from windtpu.api import inference_mesh

    devs = jax.devices()
    assert inference_mesh(1, devices=devs[:1]) is None

    m = inference_mesh(1, devices=devs)  # tile-only
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 8}

    m = inference_mesh(4, devices=devs)  # 4 members over 8 devices
    assert dict(zip(m.axis_names, m.devices.shape)) == {
        "data": 2, "ensemble": 4}

    m = inference_mesh(8, devices=devs)  # exact fit
    assert dict(zip(m.axis_names, m.devices.shape)) == {"ensemble": 8}

    # 50 = 2*5^2: the largest divisor that also divides the device count
    # is 2 — prefer data=4 x ensemble=2 (all 8 devices busy) over the
    # stranding ensemble=5 factorization that would idle 3 devices.
    m = inference_mesh(50, devices=devs)
    assert dict(zip(m.axis_names, m.devices.shape)) == {
        "data": 4, "ensemble": 2}

    m = inference_mesh(7, devices=devs[:6])  # prime > devices -> tile only
    assert "ensemble" not in m.axis_names
    assert m.shape["data"] == 6
