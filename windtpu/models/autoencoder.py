"""Convolutional autoencoder for perceptual (reconstruction) loss features.

Re-design of the reference AutoEncoder (autoencoder/autoencoder.py:11-52):
the encoder is a pyramid of [pad1 + SN conv 5x5 s3, channels x2, LeakyReLU,
LayerNorm] down to < 7 px, flattened per timestep, optionally bottlenecked
through a middle Dense, then projected to ``latent_dimension``.  The decoder
mirrors it with bilinear upsampling + transpose convs.  The encoder's output
feeds reconstruction_loss (gan/train.py:19-26).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from windtpu.models import layers as L


def _encoder_sizes(size: int):
    sizes = []
    while size >= 7:
        out = (size + 2 - 5) // 3 + 1
        sizes.append((size, out))
        size = out
    return sizes, size


class Encoder(nn.Module):
    image_size: int = 96
    latent_dimension: int = 96
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        # x: (B, T, I, I, 2) -> (B, T, latent)
        stages, _ = _encoder_sizes(x.shape[2])
        for size, _out in stages:
            x = L.TimeConv(x.shape[-1] * 2, (5, 5), strides=(3, 3), padding=1,
                           update_sn_stats=train, dtype=self.dtype,
                           name=f"conv_{size}")(x)
            x = L.KerasLayerNorm(dtype=self.dtype, name=f"ln_{size}")(x)
        b, t = x.shape[:2]
        x = x.reshape(b, t, -1)
        if x.shape[-1] > 2 * self.latent_dimension:
            middle = (x.shape[-1] + self.latent_dimension) // 2
            x = L.TimeDense(middle, dtype=self.dtype, name="middle")(x)
        x = L.TimeDense(self.latent_dimension, dtype=self.dtype,
                        name="latent")(x)
        return x


class Decoder(nn.Module):
    image_size: int = 96
    time_steps: int = 24
    latent_dimension: int = 96
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        # z: (B, T, latent) -> (B, T, I, I, 2)
        ld = self.latent_dimension
        x = L.TimeDense(ld * 6, dtype=self.dtype, name="dense1")(z)
        x = L.TimeDense(ld * 12, dtype=self.dtype, name="dense2")(x)
        b, t = x.shape[:2]
        x = x.reshape(b, t, 6, 6, ld // 3)
        i = 0
        while x.shape[2] < self.image_size // 2:
            new_channels = x.shape[-1] // 2 if x.shape[-1] >= 4 else 2
            x = L.bilinear_upsample_2x(x)
            x = L.TimeConvTranspose(new_channels, (5, 5), strides=(1, 1),
                                    padding="SAME", use_spectral_norm=False,
                                    dtype=self.dtype, name=f"upconv_{i}")(x)
            x = L.TimeBatchNorm(use_running_average=not train,
                                dtype=self.dtype, name=f"bn_{i}")(x)
            i += 1
        new_channels = x.shape[-1] // 2 if x.shape[-1] >= 4 else 2
        x = L.TimeConvTranspose(new_channels, (2, 2), strides=(2, 2),
                                padding="VALID", use_spectral_norm=False,
                                dtype=self.dtype, name="up_final")(x)
        x = L.TimeConv(2, (3, 3), padding="SAME", use_spectral_norm=False,
                       activation=None, dtype=self.dtype, name="out")(x)
        return x


class AutoEncoder(nn.Module):
    image_size: int = 96
    time_steps: int = 24
    latent_dimension: int = 96
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = Encoder(self.image_size, self.latent_dimension,
                               self.dtype)
        self.decoder = Decoder(self.image_size, self.time_steps,
                               self.latent_dimension, self.dtype)

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return self.decoder(self.encoder(x, train=train), train=train)

    def encode(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return self.encoder(x, train=train)


def weighted_vector_loss(y_true: jax.Array, y_pred: jax.Array,
                         weights=(0.5, 0.5)) -> jax.Array:
    """0.5 * RMSE + 0.5 * opposite-cosine-similarity
    (reference autoencoder/autoencoder.py:55-65)."""
    from windtpu.metrics.metrics import opposite_cosine_similarity

    rmse = jnp.sqrt(jnp.sum(
        jnp.mean((y_pred - y_true) ** 2, axis=(1, 2, 3)), axis=-1))
    ocs = opposite_cosine_similarity(y_true, y_pred)
    return rmse * weights[0] + ocs * weights[1]
