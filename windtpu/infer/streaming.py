"""Host-streaming tiled inference — the capacity fallback for domains too
large to hold (field + canvas + psum buffer) in one chip's HBM.

The on-device engine (infer/engine.py) keeps the full (T, H, W, C) field
and the output canvas resident in HBM — the fastest path at COSMO scale,
but an Alps-wide multi-year framing (BASELINE config 5) eventually exceeds
a single chip.  This module trades throughput for unbounded domain size:

* the field, the canvas, and the coverage map live in HOST memory;
* only one fixed-shape patch group (group_size, T_seq, 96, 96, C) is ever
  resident on device, so HBM use is independent of domain size;
* normalization statistics, patch extraction, border crop, and
  scatter-add stitching replicate the engine's math exactly — same
  grouping, same global-group-index noise PRNG (fold_in(key, g_idx)),
  same lat-reversed rows, same (lon, channel) quirk statistics — so a
  streamed run is seam-identical to the monolithic engine wherever both
  fit.

This mirrors how the reference handles memory: its predict loops groups
of 16 patches through Keras on the host (api.py:132-138) and stitches
with pandas; here the forward is still a jitted fixed-shape XLA program
and the stitch is vectorized numpy.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.core.config import InferenceConfig, ModelConfig
from windtpu.infer.engine import (
    _coverage_counts,
    _grouped_origins,
)
from windtpu.infer.tiling import TilingPlan, plan_tiling
from windtpu.models.generator import Generator


@functools.lru_cache(maxsize=8)
def _group_apply(mcfg: ModelConfig, icfg: InferenceConfig, seq: int,
                 img: int):
    """Jitted fixed-shape (g_vars, patches, key, g_idx) -> cropped preds.

    Noise is drawn INSIDE the program from fold_in(key, g_idx) with the
    engine's exact shape, so streamed noise matches the on-device
    engine's per-group streams bit for bit."""
    model = Generator(mcfg)
    crop = icfg.border_crop

    @jax.jit
    def run(g_vars, patches, key, g_idx):
        noise = icfg.noise_std * jax.random.normal(
            jax.random.fold_in(key, g_idx),
            patches.shape[:-1] + (mcfg.noise_channels,))
        preds = model.apply(g_vars, patches, noise, train=False)
        preds = preds[:, :, ::-1, :, :]          # back to ascending rows
        return preds[:, :, crop:img - crop, crop:img - crop, :]

    return run


def _clamped_start(start: int, size: int, dim: int) -> int:
    """jax.lax.dynamic_slice start-index clamping: slices never run out of
    bounds, they shift back instead.  The engine inherits this from XLA;
    the host path must reproduce it for plans whose covered window exceeds
    the field (numpy slicing would silently truncate, then the stitch
    would broadcast-crash)."""
    return max(0, min(start, dim - size))


def _host_patch(field: np.ndarray, origin, seq: int, img: int) -> np.ndarray:
    sx, sy, k = int(origin[0]), int(origin[1]), int(origin[2])
    t0 = _clamped_start(k * seq, seq, field.shape[0])
    y0 = _clamped_start(sy, img, field.shape[1])
    x0 = _clamped_start(sx, img, field.shape[2])
    patch = field[t0:t0 + seq, y0:y0 + img, x0:x0 + img]
    return patch[:, ::-1, :, :]                  # lat-reversed (api.py:119)


def _host_stats(field: np.ndarray, origins: np.ndarray, weights: np.ndarray,
                seq: int, img: int, quirk: bool):
    """nan-aware mean/std over all patches — the engine's stats_pass on the
    host, one group at a time (never materializes the full patch stack)."""
    # Engine reduce axes (patch, time, lat[, lon]) minus the patch axis:
    # one patch at a time here, so (time, lat) for the quirk's per-(lon,
    # channel) statistics, (time, lat, lon) for per-channel.
    axes = (0, 1) if quirk else (0, 1, 2)
    c = field.shape[-1]
    shape = (img, c) if quirk else (c,)
    s = np.zeros(shape, np.float64)
    s2 = np.zeros(shape, np.float64)
    n = np.zeros(shape, np.float64)
    for o, w in zip(origins.reshape(-1, 3), weights.ravel()):
        if not w:
            continue
        patch = _host_patch(field, o, seq, img)
        mask = (~np.isnan(patch)).astype(np.float64) * float(w)
        vals = np.where(np.isnan(patch), 0.0, patch).astype(np.float64)
        s += np.sum(vals * mask, axis=axes)
        s2 += np.sum(vals * vals * mask, axis=axes)
        n += np.sum(mask, axis=axes)
    mean = s / np.maximum(n, 1.0)
    var = np.maximum(s2 / np.maximum(n, 1.0) - mean**2, 0.0)
    std = np.sqrt(var)
    std = np.where(std == 0, 1.0, std)
    return mean.astype(np.float32), std.astype(np.float32)


def downscale_field_streaming(
    g_vars,
    field: np.ndarray,               # (T, H, W, in_channels), HOST array
    mcfg: ModelConfig,
    icfg: Optional[InferenceConfig] = None,
    key: Optional[jax.Array] = None,
    plan: Optional[TilingPlan] = None,
    ensemble_keys: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, TilingPlan]:
    """Tile + predict + stitch with O(group) device memory.

    Same contract as engine.downscale_field but the field stays a numpy
    array and the (T, H, W, out_channels) result is assembled on the
    host.  Pixels no patch covers are NaN, as in the engine.

    With ``ensemble_keys`` (shape (M,)) the result gains a leading member
    axis, one stochastic downscaling per key — the normalization
    statistics and coverage map are key-independent and computed ONCE,
    not per member (on the huge domains this path exists for, the stats
    pass is a full-domain host sweep).
    """
    icfg = icfg or InferenceConfig(
        sequence_length=mcfg.sequence_length, image_size=mcfg.image_size,
        noise_channels=mcfg.noise_channels)
    field = np.asarray(field, np.float32)
    t_total, h, w_pix, _ = field.shape
    if plan is None:
        plan = plan_tiling(h, w_pix, t_total, icfg.image_size,
                           icfg.sequence_length, icfg.overlap_factor)
    seq, img, crop = plan.sequence_length, plan.image_size, icfg.border_crop

    origins_g, weights_g = _grouped_origins(plan, icfg.group_size)
    counts = _coverage_counts(plan, origins_g, weights_g, crop)
    if counts.shape[0] < t_total:
        counts = np.concatenate(
            [counts, np.zeros((t_total - counts.shape[0],) + counts.shape[1:],
                              np.float32)], axis=0)
    elif counts.shape[0] > t_total:
        counts = counts[:t_total]  # engine trims the same way (engine.py)
    mean, std = _host_stats(field, origins_g, weights_g, seq, img,
                            icfg.replicate_normalization_quirk)

    apply_group = _group_apply(mcfg, icfg, seq, img)
    size = img - 2 * crop

    def stream_one(member_key):
        canvas = np.zeros((t_total, h, w_pix, mcfg.out_channels), np.float32)
        for g_idx in range(origins_g.shape[0]):
            origins = origins_g[g_idx]
            weights = weights_g[g_idx]
            patches = np.stack([_host_patch(field, o, seq, img)
                                for o in origins])
            normalized = (patches - mean) / std
            preds = np.asarray(jax.device_get(apply_group(
                g_vars, jnp.asarray(normalized), member_key, g_idx)))
            preds = preds * weights[:, None, None, None, None]
            for i in range(icfg.group_size):
                if not weights[i]:
                    continue
                sx, sy, k = (int(v) for v in origins[i])
                t0 = _clamped_start(k * seq, seq, t_total)
                # Stitch starts clamp exactly as the engine's
                # dynamic_update_slice does: the CROPPED update (size =
                # img - 2*crop) is clamped against the canvas, which for
                # h - img < sy <= h - img + crop differs from clamping
                # the patch start and then adding crop.
                y0 = _clamped_start(sy + crop, size, h)
                x0 = _clamped_start(sx + crop, size, w_pix)
                canvas[t0:t0 + seq, y0:y0 + size, x0:x0 + size] += preds[i]
        return np.where(counts > 0, canvas / np.maximum(counts, 1.0),
                        np.nan)

    if ensemble_keys is not None:
        return np.stack([stream_one(k) for k in ensemble_keys]), plan
    key = key if key is not None else jax.random.key(0)
    return stream_one(key), plan
