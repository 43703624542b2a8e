"""WGAN-GP losses (reference gan/train.py and gan/ganbase.py:22-59)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def discriminator_loss(real_score: jax.Array, fake_score: jax.Array) -> jax.Array:
    """Wasserstein critic loss: -(E[real] - E[fake])
    (reference gan/train.py:11-12)."""
    return -(jnp.mean(real_score) - jnp.mean(fake_score))


def generator_adversarial_loss(fake_score: jax.Array) -> jax.Array:
    """-E[D(G(z))] (reference gan/ganbase.py:54)."""
    return -jnp.mean(fake_score)


def gradient_penalty_from_grads(grads_image: jax.Array,
                                gamma: float = 100.0):
    """gamma * E[(||∂D/∂x||_{(1,2,3)} - 1)^2].

    The norm reduces over axes (1, 2, 3) = (T, H, W) of the 5-D image,
    leaving a per-(sample, channel) norm — the reference's exact reduction
    (gan/ganbase.py:36-37), which differs from canonical WGAN-GP (it never
    folds the channel axis into the norm).
    Returns (penalty, mean_grad_norm) — the latter is the reference's
    ``d_gradient_pen`` diagnostic (ganbase.py:79).
    """
    norms = jnp.sqrt(jnp.sum(grads_image**2, axis=(1, 2, 3)))
    penalty = gamma * jnp.mean((norms - 1.0) ** 2)
    return penalty, jnp.mean(norms)


def gradient_penalty(
    critic_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    eps: jax.Array,
    gamma: float = 100.0,
):
    """Full GP: interpolate, differentiate the critic w.r.t. its input.

    ``critic_fn`` maps a high-res image batch to per-sample scores.
    ``eps`` has shape (B, 1, 1, 1, 1) ~ U(0, 1) (reference ganbase.py:30-31).
    """
    mixed = eps * real + (1.0 - eps) * fake
    grads = jax.grad(lambda x: jnp.sum(critic_fn(x)))(mixed)
    return gradient_penalty_from_grads(grads, gamma)


class reconstruction_loss:
    """Perceptual feature-space loss (reference gan/train.py:19-26):
    coefficient * E[ ||enc(low_res_uv) - enc(fake)||_2 ]."""

    def __init__(self, feature_extractor: Callable[[jax.Array], jax.Array],
                 coefficient: float = 1.0):
        self.feature_extractor = feature_extractor
        self.coefficient = coefficient

    def __call__(self, low_res_uv: jax.Array, high_res: jax.Array) -> jax.Array:
        delta = self.feature_extractor(low_res_uv) - self.feature_extractor(high_res)
        return self.coefficient * jnp.mean(
            jnp.sqrt(jnp.sum(delta**2, axis=-1)))
