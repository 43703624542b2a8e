"""Optimizers — optax chains with Keras-parity hyperparameters.

Reference (gan/train.py:34-36,57-59): G Adam(1e-4, beta=(0.5, 0.9),
eps=0.1), D Adam(4e-4, same), with RMSprop(5e-5) as the commented-out
alternative the shipped weights-55 checkpoint was trained with.
optax.adam applies eps after the sqrt like Keras, so the settings carry
over verbatim.
"""

from __future__ import annotations

import optax

from windtpu.core.config import TrainConfig


def generator_optimizer(cfg: TrainConfig = TrainConfig()) -> optax.GradientTransformation:
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(cfg.rmsprop_learning_rate, decay=0.9, eps=1e-7)
    return optax.adam(cfg.g_learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                      eps=cfg.adam_eps)


def discriminator_optimizer(cfg: TrainConfig = TrainConfig()) -> optax.GradientTransformation:
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(cfg.rmsprop_learning_rate, decay=0.9, eps=1e-7)
    return optax.adam(cfg.d_learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                      eps=cfg.adam_eps)
