"""Noise generators — functional JAX replacements for the reference's
stateful TF generators (data_generator.py:296-335).

Both expose two forms:

* ``sample(key, ...)`` — pure function of an explicit PRNG key; this is what
  the jitted train/inference steps use (keys are split per step / per
  ensemble member / per device).
* ``__call__(bs, channels)`` — stateful convenience wrapper holding an
  internal key stream, mirroring the reference call signature.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from windtpu.core.prng import KeyStream


class FlexibleNoiseGenerator:
    """IID N(0, std) noise of shape (B, T, X, Y, C) — the generator used by
    the shipped model (reference data_generator.py:319-335, api.py:74-75)."""

    def __init__(self, noise_shape: Tuple[int, ...], std: float = 1.0,
                 random_seed: Optional[int] = None):
        self.noise_shape = tuple(noise_shape)
        self.std = float(std)
        self._keys = KeyStream(random_seed if random_seed is not None else 0)

    def sample(self, key: jax.Array, bs: Optional[int] = None,
               channels: Optional[int] = None,
               std: Optional[float] = None) -> jax.Array:
        b, t, x, y, c = self.noise_shape
        b = bs if bs is not None else b
        c = channels if channels is not None else c
        s = std if std is not None else self.std
        return s * jax.random.normal(key, (b, t, x, y, c), jnp.float32)

    def __call__(self, bs=None, channels=None, std=None) -> jax.Array:
        return self.sample(self._keys.next(), bs, channels, std)


class NoiseGenerator:
    """Structured 4-channel noise: time-only / lon-only / lat-only /
    lonlat-varying fields broadcast to (B, T, X, Y, 4)
    (reference data_generator.py:296-316)."""

    def __init__(self, noise_shape: Tuple[int, ...], std: float = 1.0,
                 random_seed: Optional[int] = None):
        self.noise_shape = tuple(noise_shape)
        self.std = float(std)
        self._keys = KeyStream(random_seed if random_seed is not None else 0)

    def sample(self, key: jax.Array, bs: Optional[int] = None) -> jax.Array:
        b0, t, x, y = self.noise_shape[:4]
        b = bs if bs is not None else b0
        k_t, k_x, k_y, k_xy = jax.random.split(key, 4)
        s = self.std
        time_noise = s * jax.random.normal(k_t, (b, t, 1, 1))
        lon_noise = s * jax.random.normal(k_x, (b, 1, x, 1))
        lat_noise = s * jax.random.normal(k_y, (b, 1, 1, y))
        lonlat_noise = s * jax.random.normal(k_xy, (b, 1, x, y))
        full = jnp.zeros((b, t, x, y))
        return jnp.stack(
            [time_noise + full, lon_noise + full, lat_noise + full,
             lonlat_noise + full],
            axis=-1,
        )

    def __call__(self, bs=None) -> jax.Array:
        return self.sample(self._keys.next(), bs)
