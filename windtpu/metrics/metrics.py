"""Domain metric suite — pure JAX, jit-safe, runs inside the train step.

Re-implements every metric of the reference (gan/metrics.py) as a pure
function over ``(B, T, H, W, C)`` arrays.  Conventions preserved:

* per-sample reductions return shape ``(B,)`` (the reference wraps these in
  ``tfa.MeanMetricWrapper`` which then averages over the batch);
* NaNs in intermediate results are zeroed exactly where the reference does;
* the Dujardin wind-speed weighting constants eps=4, t=0.425
  (gan/metrics.py:38-39) are kept.

The spatial KS statistic (gan/metrics.py:155-187) is re-designed for TPU:
instead of materializing every (patch_size x patch_size) patch via
``tf.image.extract_patches`` and evaluating ``tfp.Empirical`` CDFs on it,
we note that the empirical CDF of a patch at threshold p is the *box mean*
of the indicator image ``x <= p`` — so the whole metric is 100 thresholded
box-filters, computed with integral images (two cumsums).  Numerically
identical, asymptotically ~patch_size^2 cheaper, and jit-compilable.

``windtpu.metrics.oracles`` holds numpy twins used as golden references in
tests (mirroring the reference's *_from_xarray functions).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # tf.keras.backend.epsilon()

# Dujardin & Lehning (2020) constants, reference gan/metrics.py:38-39.
DUJARDIN_EPS = 4.0
DUJARDIN_T = 0.425


def _zero_nans(x):
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def encoded_features_l2_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """L2 distance in encoder feature space over (B, T, latent)
    (reference gan/metrics.py:26-29; unused by the shipped path but part of
    the metric surface)."""
    result = _zero_nans((a - b) ** 2)
    return jnp.sqrt(jnp.mean(result, axis=(1, 2)))


def wind_speed_weighted_rmse(real: jax.Array, fake: jax.Array) -> jax.Array:
    """Dujardin wind-speed-weighted RMSE, shape (B,).
    Reference gan/metrics.py:32-45."""
    u, v = real[..., 0], real[..., 1]
    u_hat, v_hat = fake[..., 0], fake[..., 1]
    est = jnp.sqrt(u_hat**2 + v_hat**2)
    rea = jnp.sqrt(u**2 + v**2)
    beta = (DUJARDIN_EPS + rea) / (DUJARDIN_EPS + est)
    tau = jnp.where(est >= rea, DUJARDIN_T, 1.0 - DUJARDIN_T)
    result = tau * ((u_hat - beta * u) ** 2 + (v_hat - beta * v) ** 2)
    result = _zero_nans(result)
    return jnp.sqrt(jnp.mean(result, axis=(1, 2, 3)))


def extreme_weighted_rmse(real: jax.Array, fake: jax.Array,
                          axis_name: Optional[str] = None) -> jax.Array:
    """RMSE weighted by wind extremeness, shape (B,).
    Reference gan/metrics.py:66-73.

    The weights are normalized by the sum over the WHOLE batch; when the
    batch is sharded over a shard_map axis, pass ``axis_name`` so the
    denominator is the global sum — otherwise each shard normalizes over
    its local slice and the logged value depends on device count."""
    sq = real**2
    denom = jnp.sum(sq)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    weights = jnp.where(denom == 0, jnp.zeros_like(sq), sq / denom)
    result = weights * (real - fake) ** 2
    result = _zero_nans(result)
    return jnp.sqrt(jnp.sum(result, axis=(1, 2, 3, 4)))


def wind_speed_rmse(real: jax.Array, fake: jax.Array) -> jax.Array:
    """Plain wind-speed RMSE, shape (B,).  Reference gan/metrics.py:79-88."""
    u, v = real[..., 0], real[..., 1]
    u_hat, v_hat = fake[..., 0], fake[..., 1]
    est = jnp.sqrt(u_hat**2 + v_hat**2)
    rea = jnp.sqrt(u**2 + v**2)
    result = _zero_nans((rea - est) ** 2)
    return jnp.sqrt(jnp.mean(result, axis=(1, 2, 3)))


def _cosine_similarity(a: jax.Array, b: jax.Array, axis: int = -1):
    """Keras-convention cosine similarity (the true cos, not the loss)."""
    a_n = a * jax.lax.rsqrt(jnp.maximum(jnp.sum(a * a, axis=axis,
                                                keepdims=True), 1e-12))
    b_n = b * jax.lax.rsqrt(jnp.maximum(jnp.sum(b * b, axis=axis,
                                                keepdims=True), 1e-12))
    return jnp.sum(a_n * b_n, axis=axis)


def angular_cosine_distance(real: jax.Array, fake: jax.Array) -> jax.Array:
    """acos(cos_sim)/pi averaged over (T, H, W), shape (B,).
    Reference gan/metrics.py:94-101."""
    cos_sim = jnp.clip(_cosine_similarity(real, fake), -1.0, 1.0)
    acd = jnp.arccos(cos_sim) / jnp.pi
    return jnp.mean(acd, axis=(1, 2, 3))


def opposite_cosine_similarity(real: jax.Array, fake: jax.Array) -> jax.Array:
    """0.5 * (1 + keras_cosine_loss) = 0.5 * (1 - cos_sim), shape (B,).
    Reference gan/metrics.py:104-107 (keras cosine_similarity is -cos)."""
    cos_sim = _cosine_similarity(real, fake)
    return jnp.mean(0.5 * (1.0 - cos_sim), axis=(1, 2, 3))


def log_spectral_distance(real: jax.Array, fake: jax.Array) -> jax.Array:
    """LSD between 2-D power spectra, shape (B,).
    Reference gan/metrics.py:121-137 (rfft2d over the two spatial axes)."""
    def power(x):
        # (B, T, H, W, C): rfft over (H, W) per channel.
        spec = jnp.fft.rfft2(x, axes=(2, 3))
        return jnp.abs(spec) ** 2

    ps_real = power(real)
    ps_fake = power(fake)
    num = ps_real + EPSILON
    den = ps_fake + EPSILON
    ratio = jnp.where(den == 0, jnp.zeros_like(num), num / den)
    log10 = jnp.where(ratio > 0, jnp.log(ratio) / jnp.log(10.0),
                      jnp.zeros_like(ratio))
    result = (10.0 * log10) ** 2
    lsd = jnp.sqrt(jnp.mean(result, axis=(1, 2, 3, 4)))
    return _zero_nans(lsd)


def _box_mean(x: jax.Array, size: int) -> jax.Array:
    """Mean over all (size x size) windows (VALID), x: (..., H, W).

    Integral-image formulation: two cumsums + four gathers, O(HW) per
    threshold instead of O(HW * size^2).
    """
    # Integral image with a leading zero row/col.
    s = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)]
    s = jnp.pad(s, pad)
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = h - size + 1, w - size + 1
    a = s[..., size:size + oh, size:size + ow]
    b = s[..., size:size + oh, 0:ow]
    c = s[..., 0:oh, size:size + ow]
    d = s[..., 0:oh, 0:ow]
    return (a - b - c + d) / float(size * size)


def spatially_convolved_ks_stat(
    real: jax.Array,
    fake: jax.Array,
    patch_size: Optional[int] = None,
    num_points: int = 100,
    lo: float = -30.0,
    hi: float = 30.0,
) -> jax.Array:
    """Mean spatial Kolmogorov-Smirnov image, shape (OH, OW).

    For every sliding (patch_size x patch_size) window the KS statistic
    between the real and generated empirical distributions is
    ``max_p |CDF_real(p) - CDF_fake(p)|`` over a fixed grid of thresholds
    (reference gan/metrics.py:155-187).  Result is averaged over batch,
    time and channels, matching tf.reduce_mean(to_concat, axis=(0, 1)).
    """
    patch_size = patch_size or fake.shape[2] // 10
    points = jnp.linspace(lo, hi, num_points)

    # (B, T, H, W, C) -> (B*T*C, H, W): each (time, channel) slice is an
    # independent field, exactly as the reference's double loop.
    def fields(x):
        x = jnp.moveaxis(x, -1, 2)  # (B, T, C, H, W)
        return x.reshape((-1,) + x.shape[-2:])

    fr = fields(real)
    ff = fields(fake)

    def ks_at(p, running_max):
        cdf_r = _box_mean((fr <= p).astype(jnp.float32), patch_size)
        cdf_f = _box_mean((ff <= p).astype(jnp.float32), patch_size)
        return jnp.maximum(running_max, jnp.abs(cdf_r - cdf_f))

    oh = fr.shape[-2] - patch_size + 1
    ow = fr.shape[-1] - patch_size + 1
    init = jnp.zeros((fr.shape[0], oh, ow), jnp.float32)
    ks = jax.lax.fori_loop(
        0, num_points, lambda i, m: ks_at(points[i], m), init
    )
    return jnp.mean(ks, axis=0)


def spatial_ks_scalar(real, fake, use_pallas: Optional[bool] = None,
                      **kw) -> jax.Array:
    """Scalar summary of the KS image (mean), for in-step logging.

    Dispatches to the fused Pallas kernel on TPU (2.1x the XLA version at
    flagship size; windtpu.ops.pallas_ks) unless overridden.
    """
    if use_pallas is None:
        # TPU only (incl. TPUs behind remote platforms like axon, whose
        # backend name isn't "tpu" but whose device_kind is): the kernel
        # uses TPU memory spaces and does not lower on GPU backends.
        d = jax.devices()[0]
        use_pallas = "tpu" in f"{d.platform} {d.device_kind}".lower()
    if use_pallas:
        from windtpu.ops.pallas_ks import spatial_ks_pallas

        return jnp.mean(spatial_ks_pallas(real, fake, **kw))
    return jnp.mean(spatially_convolved_ks_stat(real, fake, **kw))


ALL_GENERATOR_METRICS = {
    "acd": angular_cosine_distance,
    "lsd": log_spectral_distance,
    "extreme_rmse": extreme_weighted_rmse,
    "ws_weighted_rmse": wind_speed_weighted_rmse,
    "ws_rmse": wind_speed_rmse,
}
