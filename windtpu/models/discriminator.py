"""Wasserstein critic.

Re-design of the reference discriminator graph (gan/models.py:76-142):

* branch A: high-res only  -> ConvLSTM(out_ch) -> SN conv 3x3 (F) -> LN
* branch B: concat(LR,HR)  -> ConvLSTM(F)      -> SN conv 3x3 (F) -> LN
* concat -> pyramid of [pad1 + SN conv 7x7 s3, channels x2, LN] while the
  spatial size >= 16, a second such pyramid while >= 4 (with a strided
  shortcut residual added when that pyramid ran more than once,
  tf_utils.py:15-32), a third pyramid of [SN conv 3x3 s2, channels x2, LN]
  while > 2, then Flatten -> Dense(1) per timestep -> mean over time.

The pyramid depths depend only on static image size, so the loop unrolls at
trace time into a fixed conv stack (XLA-friendly; no dynamic shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from windtpu.core.config import ModelConfig
from windtpu.models import layers as L


def _pyramid_sizes(size: int):
    """Static per-stage spatial sizes for the three conv pyramids.

    Raises for image sizes whose pyramid collapses to zero pixels (e.g. 16,
    where stage 2 would need a 7x7 conv on a 4px map) — the reference fails
    there too, but with an opaque Keras shape error.
    """
    def _step(size, kernel, stride, pad):
        out = (size + 2 * pad - kernel) // stride + 1
        if out <= 0:
            raise ValueError(
                f"discriminator pyramid collapses at spatial size {size} "
                f"(conv {kernel}x{kernel}/s{stride} would output {out}px); "
                "choose an image size whose pyramid stays positive, e.g. "
                "24, 32, 48, 96")
        return out

    stage1 = []
    while size >= 16:
        out = _step(size, 7, 3, 1)
        stage1.append((size, out))
        size = out
    stage2 = []
    while size >= 4:
        out = _step(size, 7, 3, 1)
        stage2.append((size, out))
        size = out
    stage3 = []
    while size > 2:
        out = (size - 3) // 2 + 1
        stage3.append((size, out))
        size = out
    return stage1, stage2, stage3, size


class Discriminator(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        low_res: jax.Array,   # (B, T, I, I, in_channels)
        high_res: jax.Array,  # (B, T, I, I, out_channels)
        *,
        train: bool = False,
    ) -> jax.Array:          # (B, 1) critic score
        cfg = self.config
        f = cfg.discriminator_features
        dtype = jnp.dtype(cfg.compute_dtype)
        if low_res.shape[:-1] != high_res.shape[:-1]:
            raise ValueError(
                "low_res and high_res must share (B, T, H, W); upsample the "
                "low-res field first (reference gan/models.py:89-91)"
            )
        low_res = low_res.astype(dtype)
        high_res = high_res.astype(dtype)

        unroll = (getattr(cfg, "critic_scan_unroll", 0)
                  or cfg.sequence_length)

        # Branch A reads high-res only; branch B reads concat(LR, HR)
        # (reference gan/models.py:93-105).  Optionally the two narrow
        # recurrences run as ONE block-diagonal scan — identical math and
        # checkpoint tree (layers.fused_dual_convlstm).  Off by default:
        # see ModelConfig.critic_fused_branches for the measured ablation.
        mix_in = jnp.concatenate([low_res, high_res], axis=-1)
        if getattr(cfg, "critic_fused_branches", False):
            params_a = L.ConvLSTMParams(
                cfg.out_channels, cfg.out_channels, (3, 3),
                name="hr_convlstm")()
            params_b = L.ConvLSTMParams(
                cfg.in_channels + cfg.out_channels, f, (3, 3),
                name="mix_convlstm")()
            c_in = cfg.in_channels
            hr, mix = L.fused_dual_convlstm(
                mix_in, (c_in, c_in + cfg.out_channels),
                (0, c_in + cfg.out_channels), params_a, params_b,
                unroll=unroll)
        else:
            hr = L.ConvLSTM(cfg.out_channels, (3, 3), dtype=dtype,
                            unroll=unroll, name="hr_convlstm")(high_res)
            mix = L.ConvLSTM(f, (3, 3), dtype=dtype, unroll=unroll,
                             name="mix_convlstm")(mix_in)
        hr = L.TimeConv(f, (3, 3), padding="SAME", update_sn_stats=train,
                        dtype=dtype, name="hr_conv")(hr)
        hr = L.KerasLayerNorm(dtype=dtype, name="hr_ln")(hr)
        mix = L.TimeConv(f, (3, 3), padding="SAME", update_sn_stats=train,
                         dtype=dtype, name="mix_conv")(mix)
        mix = L.KerasLayerNorm(dtype=dtype, name="mix_ln")(mix)

        x = jnp.concatenate([hr, mix], axis=-1)

        stage1, stage2, stage3, _ = _pyramid_sizes(x.shape[2])

        for n, (size, _out) in enumerate(stage1):
            x = L.TimeConv(x.shape[-1] * 2, (7, 7), strides=(3, 3), padding=1,
                           update_sn_stats=train, dtype=dtype,
                           name=f"pyr1_conv_{size}")(x)
            x = L.KerasLayerNorm(dtype=dtype, name=f"pyr1_ln_{size}")(x)

        shortcut = x
        for n, (size, _out) in enumerate(stage2):
            x = L.TimeConv(x.shape[-1] * 2, (7, 7), strides=(3, 3), padding=1,
                           update_sn_stats=train, dtype=dtype,
                           name=f"pyr2_conv_{size}")(x)
            x = L.KerasLayerNorm(dtype=dtype, name=f"pyr2_ln_{size}")(x)
        if len(stage2) >= cfg.discriminator_shortcut_min_iters:
            shortcut = L.ShortcutConv(
                target_size=x.shape[2], features=x.shape[-1],
                update_sn_stats=train, dtype=dtype, name="shortcut",
            )(shortcut)
            x = x + shortcut

        for n, (size, _out) in enumerate(stage3):
            x = L.TimeConv(x.shape[-1] * 2, (3, 3), strides=(2, 2),
                           padding="VALID", update_sn_stats=train,
                           dtype=dtype, name=f"pyr3_conv_{size}")(x)
            x = L.KerasLayerNorm(dtype=dtype, name=f"pyr3_ln_{size}")(x)

        b, t = x.shape[:2]
        x = x.reshape(b, t, -1)
        x = L.TimeDense(1, dtype=dtype, name="score_dense")(x)  # (B, T, 1)
        score = jnp.mean(x, axis=1)                              # (B, 1)
        return score.astype(jnp.float32)


def init_discriminator(
    config: ModelConfig, rng: jax.Array, batch_size: int = 1
):
    model = Discriminator(config)
    t, i = config.sequence_length, config.image_size
    lr = jnp.zeros((batch_size, t, i, i, config.in_channels), jnp.float32)
    hr = jnp.zeros((batch_size, t, i, i, config.out_channels), jnp.float32)
    return model.init(rng, lr, hr, train=False)
