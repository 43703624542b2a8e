"""Training state: both networks' parameters, mutable collections and
optimizer states in one pytree, so the whole WGAN-GP step is a pure
function (state, batch, key) -> (state, metrics)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from windtpu.core.config import GANConfig
from windtpu.models.discriminator import Discriminator, init_discriminator
from windtpu.models.generator import Generator, init_generator
from windtpu.train import optim


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    # Generator.
    g_params: Any
    g_batch_stats: Any
    g_spectral: Any
    g_opt_state: Any
    # Discriminator (no batch norm => no batch_stats).
    d_params: Any
    d_spectral: Any
    d_opt_state: Any

    def g_variables(self):
        return {"params": self.g_params, "batch_stats": self.g_batch_stats,
                "spectral_stats": self.g_spectral}

    def d_variables(self):
        return {"params": self.d_params, "spectral_stats": self.d_spectral}


def create_train_state(cfg: GANConfig, rng: Optional[jax.Array] = None) -> GANTrainState:
    rng = rng if rng is not None else jax.random.key(cfg.seed)
    g_rng, d_rng = jax.random.split(rng)
    g_vars = init_generator(cfg.model, g_rng, batch_size=1)
    d_vars = init_discriminator(cfg.model, d_rng, batch_size=1)
    g_tx = optim.generator_optimizer(cfg.train)
    d_tx = optim.discriminator_optimizer(cfg.train)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars["batch_stats"],
        g_spectral=g_vars["spectral_stats"],
        g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_spectral=d_vars["spectral_stats"],
        d_opt_state=d_tx.init(d_vars["params"]),
    )
