"""Recurrent super-resolution generator.

Re-design of the reference generator graph (gan/models.py:9-73) as a Flax
module.  Topology (image size I, feature width F, sequence length T):

    concat(img, noise)                                  (B,T,I,I,Cin+Cn)
    -> pad3 + SN conv 8x8 s2 + LReLU + BN   -> res_2    (B,T,I/2,I/2,min(8C,F))
    -> pad1 + SN conv 4x4 s2 + LReLU + BN   -> res_4    (B,T,I/4,I/4,F)
    -> ConvLSTM(F, 3x3)                                 (B,T,I/4,I/4,F)
    -> SN conv 3x3 + LReLU + BN                         (B,T,I/4,I/4,F/2)
    -> concat res_4 -> SN convT 2x2 s2 + LReLU + BN     (B,T,I/2,I/2,F/4)
    -> concat res_2 -> bilinear x2 + convT 5x5 + LReLU  (B,T,I,I,F/8)
       (or plain conv 3x3 when F/8 < out_channels)
    -> BN -> conv 3x3 linear                            (B,T,I,I,out)

All time-distributed convs fold time into batch (see layers.py); the only
sequential computation is the ConvLSTM scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from windtpu.core.config import ModelConfig
from windtpu.models import layers as L


class Generator(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        image: jax.Array,   # (B, T, I, I, in_channels)
        noise: jax.Array,   # (B, T, I, I, noise_channels)
        *,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        f = cfg.generator_features
        dtype = jnp.dtype(cfg.compute_dtype)
        total_in = cfg.in_channels + cfg.noise_channels
        intermediate = min(total_in * 8, f)

        x = jnp.concatenate([image, noise], axis=-1).astype(dtype)

        x = L.TimeConv(intermediate, (8, 8), strides=(2, 2), padding=3,
                       update_sn_stats=train, dtype=dtype, name="down1",
                       split_input_at=(cfg.in_channels if cfg.split_stem
                                       else 0))(x)
        x = L.TimeBatchNorm(use_running_average=not train, dtype=dtype,
                            name="bn1")(x)
        res_2 = x

        x = L.TimeConv(f, (4, 4), strides=(2, 2), padding=1,
                       update_sn_stats=train, dtype=dtype, name="down2")(x)
        x = L.TimeBatchNorm(use_running_average=not train, dtype=dtype,
                            name="bn2")(x)
        res_4 = x

        x = L.ConvLSTM(f, (3, 3), dtype=dtype, name="convlstm")(x)

        x = L.TimeConv(f // 2, (3, 3), padding="SAME",
                       update_sn_stats=train, dtype=dtype, name="mid")(x)
        x = L.TimeBatchNorm(use_running_average=not train, dtype=dtype,
                            name="bn3")(x)

        x = jnp.concatenate([x, res_4], axis=-1)
        x = L.TimeConvTranspose(f // 4, (2, 2), strides=(2, 2),
                                padding="VALID", use_spectral_norm=True,
                                update_sn_stats=train, dtype=dtype,
                                name="up1")(x)
        x = L.TimeBatchNorm(use_running_average=not train, dtype=dtype,
                            name="bn4")(x)

        x = jnp.concatenate([x, res_2], axis=-1)
        if f // 8 >= cfg.out_channels:
            x = L.bilinear_upsample_2x(x)
            # Note: the reference does NOT spectral-normalize this transpose
            # conv (gan/models.py:63-64).
            x = L.TimeConvTranspose(f // 8, (5, 5), strides=(1, 1),
                                    padding="SAME", use_spectral_norm=False,
                                    dtype=dtype, name="up2")(x)
        else:
            # The reference's narrow-feature branch (gan/models.py:67-68)
            # never upsamples back to full resolution, so its own shape
            # assert would fail — dead code.  Here: upsample, then conv.
            x = L.bilinear_upsample_2x(x)
            x = L.TimeConv(cfg.out_channels, (3, 3), padding="SAME",
                           use_spectral_norm=False, dtype=dtype,
                           name="up2_conv")(x)
        x = L.TimeBatchNorm(use_running_average=not train, dtype=dtype,
                            name="bn5")(x)

        x = L.TimeConv(cfg.out_channels, (3, 3), padding="SAME",
                       use_spectral_norm=False, activation=None,
                       dtype=dtype, name="out")(x)
        return x.astype(jnp.float32)


def init_generator(
    config: ModelConfig, rng: jax.Array, batch_size: int = 1
):
    """Initialize parameters/state with dummy inputs of the configured shape.

    Returns the flax variables dict: {'params', 'batch_stats',
    'spectral_stats'}.
    """
    model = Generator(config)
    t, i = config.sequence_length, config.image_size
    img = jnp.zeros((batch_size, t, i, i, config.in_channels), jnp.float32)
    noi = jnp.zeros((batch_size, t, i, i, config.noise_channels), jnp.float32)
    return model.init(rng, img, noi, train=False)
