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


def highpass_energy_ratio_loss(fake: jax.Array, truth: jax.Array,
                               sigma: float = 7.0,
                               eps: float = 1e-6,
                               rel_floor: float = 0.05) -> jax.Array:
    """Per-sample squared log-ratio of high-pass energy, fake vs truth.

    The bundled-weights quality gate scores a generator by the ratio of
    fine-scale (above-blur-cutoff) energy in its output to the truth's
    (tools/train_shipped_ckpt.py:holdout_figures); WGAN training alone
    leaves a per-day tail where near-calm days overshoot that ratio by
    2-5x, because the critic sees mostly windy samples and the texture
    amplitude stops tracking the flow.  This term penalizes the statistic
    directly and PER SAMPLE — each day in the batch must carry the right
    fine-scale energy, not just the batch on average:

        E_{b,c}[ ( log hp(fake_bc) - log hp(truth_bc) )^2 ]

    where hp(x) is the mean squared residual of a Gaussian blur at
    ``sigma`` (the same cutoff the data pipeline blurs with, so "what
    blurring removed" is exactly the band being matched).  The ratio is
    PER CHANNEL as well as per sample: a day whose flow blows along v
    has an almost texture-free u-truth (the slope-locked gusts project
    with cos(angle) ~ 0 onto u), and a channel-pooled loss lets the
    generator paint isotropic texture that overshoots the quiet channel
    ~4x (the measured seed-4242 worst-day tail: mean flow 3.3 m/s but
    u-channel hp_truth 0.01 vs 0.10 for its calm batch).  Per-channel
    log-ratios force the texture amplitude to track each component's
    actual energy.  Computed with an FFT transfer function over (H, W) —
    differentiable, fp32, and a rounding error of the step cost next to
    the critic passes.  No reference counterpart: the reference has no
    sharpness objective at all (its generator loss is adversarial +
    optional perceptual reconstruction, gan/train.py:29-31).

    ``rel_floor`` conditions the objective the same way the eval metric
    is conditioned (tools/train_shipped_ckpt.floored_ratio_stats): both
    energies get an additive floor of rel_floor * mean(hp_truth) over
    the batch.  An axis-pinned day's quiet channel has hp_truth ~ 1% of
    typical, so the unfloored log-ratio explodes to (log 50)^2 ~ 15
    with an O(1/hp) gradient — measured to destabilize fine-tuning
    (d-loss swinging +-300 within 200 steps, _ft7_run log).  With the
    floor, the loss asks the quiet channel to bring its texture down
    toward the negligible floor with a bounded gradient, instead of
    chasing a near-zero target in log space.
    """
    def hp_energy(x):
        x = x.astype(jnp.float32)
        h, w = x.shape[2], x.shape[3]
        ky = jnp.fft.fftfreq(h)[:, None]
        kx = jnp.fft.rfftfreq(w)[None, :]
        g = jnp.exp(-2.0 * (jnp.pi * sigma) ** 2 * (ky ** 2 + kx ** 2))
        spec = jnp.fft.rfft2(x, axes=(2, 3))
        blurred = jnp.fft.irfft2(spec * g[None, None, :, :, None],
                                 s=(h, w), axes=(2, 3))
        return jnp.mean((x - blurred) ** 2, axis=(1, 2, 3))   # (B, C)

    hp_f = hp_energy(fake)
    hp_t = hp_energy(truth)
    floor = rel_floor * jnp.mean(hp_t)
    # Additive (not clamped) floor: log((f+floor)/(t+floor)) is exactly 0
    # when matched, keeps a usable gradient for a blurry fake whose
    # energy sits below the floor, and bounds the degenerate-channel
    # term at ~log(1/rel_floor)^2 instead of log(t_typical/t_quiet)^2.
    log_ratio = (jnp.log(hp_f + floor + eps)
                 - jnp.log(hp_t + floor + eps))
    return jnp.mean(log_ratio ** 2)


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
