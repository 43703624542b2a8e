"""Explicit-collective data-parallel train step via shard_map.

The default path (train/wgan_gp.make_train_step under sharded jit) lets
XLA's SPMD partitioner insert the gradient psums.  This variant spells the
collectives out: the step body runs per-device on its local batch shard and
pmeans gradients/metrics over the ``data`` mesh axis — useful when you want
guaranteed collective placement (ICI) and per-device control, and as an
executable specification of the DP semantics (BASELINE.json config 3).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from windtpu.core.config import GANConfig
from windtpu.train.wgan_gp import make_train_step


def make_sharded_train_step(cfg: GANConfig, mesh: Mesh, axis: str = "data"):
    """(state, low_res, high_res, rng) -> (state, metrics) with the batch
    axis sharded over ``axis`` and explicit pmean grad sync."""
    raw_step = make_train_step(cfg, pmean_axis=axis, jit_wrap=False)

    state_spec = P()      # replicated parameters/opt state
    batch_spec = P(axis)  # shard the leading batch dim

    sharded = shard_map(
        raw_step, mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,  # optimizer state updates are replicated by pmean
    )
    return jax.jit(sharded, donate_argnums=(0,))
