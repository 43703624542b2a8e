"""Train the bundled generator weights on structured synthetic terrain-wind
data (COSMO-blurred self-downscaling surrogate).

The reference ships weights-55.ckpt so its CLI produces meaningful output
out of the box (api.py:21); those blobs are stripped from this mount, so
windtpu trains its own bundled checkpoint.  No real COSMO/ERA5 data exists
in this environment either, so the training signal is the reference's own
self-downscaling trick (data_processing.py:153-211): generate plausible
high-res wind over synthetic terrain, blur it to make the low-res input,
and train the flagship generator to restore the terrain-locked detail.

Synthetic data model (structured, not white noise):

* DEM: power-law (fractal) random surface — realistic ridge/valley spectra.
* High-res wind: a smooth time-varying synoptic flow modulated by the
  wind-terrain exposure predictor e+/e- (preprocess/daily.py:31-38) plus
  slope-locked small-scale turbulence, so the fine structure is CAUSED by
  the terrain channel the generator sees.
* Low-res input: Gaussian-blurred wind (sigma=7 px, the reference's
  default blurring) + elevation/1e3 — exactly the flagship inference
  contract (u10, v10, elevation) of api.predict.

Training: WGAN-GP with the reference's identity-feature reconstruction
anchor (enc = identity: ties the fake to the blurred field at large scales
while the critic pushes high-frequency detail).

Usage: python tools/train_shipped_ckpt.py [--steps 3000] [--batch 8]
Writes windtpu/assets/weights/generator-synth.npz and prints a sharpness
report (high-pass energy ratio fake/bilinear/truth).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fractal_field(ny, nx, rng, beta=2.6):
    """Zero-mean unit-std random field with a k^-beta power spectrum."""
    ky = np.fft.fftfreq(ny)[:, None]
    kx = np.fft.fftfreq(nx)[None, :]
    k = np.hypot(ky, kx)
    k[0, 0] = np.partition(k.ravel(), 1)[1]  # smallest nonzero |k|
    amp = k ** (-beta / 2.0)
    phase = np.exp(2j * np.pi * rng.rand(ny, nx))
    f = np.fft.ifft2(amp * phase).real
    return ((f - f.mean()) / f.std()).astype(np.float32)


def gaussian_blur(field, sigma):
    """FFT Gaussian blur over the last two axes (periodic — fine for
    synthetic training crops)."""
    ny, nx = field.shape[-2:]
    ky = np.fft.fftfreq(ny)[:, None]
    kx = np.fft.fftfreq(nx)[None, :]
    g = np.exp(-2.0 * (np.pi * sigma) ** 2 * (ky ** 2 + kx ** 2))
    return np.fft.ifft2(np.fft.fft2(field) * g).real.astype(np.float32)


def make_domain(rng, ny=384, nx=384):
    """(dem_norm, slope, aspect) for one synthetic terrain.

    Pinned to the host CPU backend: pool synthesis runs dozens of tiny
    stencil convs, and routing those over the axon TPU link has wedged
    the trainer before the first step (watchdog attempt 1 of the
    calm-frac run stalled 935 s inside this loop).  The pool is built
    once on the host; only training itself should touch the device.
    """
    import jax
    import jax.numpy as jnp

    from windtpu.ops.stencil import gradient_descriptors

    dem = 1400.0 + 900.0 * fractal_field(ny, nx, rng)
    with jax.default_device(jax.devices("cpu")[0]):
        _, _, slope, aspect = (np.asarray(a) for a in gradient_descriptors(
            jnp.asarray(dem), 2, (1000.0, 1000.0)))
    return dem.astype(np.float32), slope, aspect


def synth_day(rng, dem, slope, aspect, t=6, sigma=7.0,
              speed_lo=3.0, speed_hi=10.0, axis_aligned=False):
    """One day of (low_res, high_res) fields over the full domain.

    high_res u/v = synoptic flow * terrain exposure response + slope-locked
    gusts; low_res = Gaussian-blurred high_res (self-downscaling input).
    ``speed_lo/speed_hi`` bound the base synoptic speed draw (the truth's
    fine-scale energy scales ~flow^2, so calm days are the hard regime —
    see ``make_day_pool(calm_frac=...)``).

    ``axis_aligned``: pin the flow direction to a grid axis (±5°, small
    drift).  The gusts project onto (cos angle, sin angle), so on such a
    day ONE velocity component's truth is nearly texture-free — the
    regime where an isotropic-texture generator overshoots that
    channel's high-pass ratio 3-4x (the measured seed-4242 worst batch:
    moderate flow along v, u-channel hp_truth 0.01).  Without
    oversampling, only ~8% of uniform-angle days are this degenerate
    and neither the sharpness loss nor checkpoint selection sees enough
    of them to fix the tail.
    """
    from windtpu.preprocess.daily import compute_time_varying_topo_pred

    ny, nx = dem.shape
    # Smooth synoptic flow: speed 2..12 m/s, direction drifting over the day.
    phase = rng.uniform(0, 2 * np.pi)
    speed = rng.uniform(speed_lo, speed_hi) + 2.0 * np.sin(
        np.linspace(0, 2 * np.pi, t) + phase)
    if axis_aligned:
        angle = (rng.randint(4) * (np.pi / 2) + rng.uniform(-0.09, 0.09)
                 + 0.05 * np.sin(np.linspace(0, 2 * np.pi, t)
                                 + rng.uniform(0, 2 * np.pi)))
    else:
        angle = rng.uniform(0, 2 * np.pi) + 0.3 * np.sin(
            np.linspace(0, 2 * np.pi, t) + rng.uniform(0, 2 * np.pi))
    u0 = (speed * np.cos(angle))[:, None, None].astype(np.float32)
    v0 = (speed * np.sin(angle))[:, None, None].astype(np.float32)

    e_plus, e_minus = compute_time_varying_topo_pred(
        np.broadcast_to(u0, (t, ny, nx)), np.broadcast_to(v0, (t, ny, nx)),
        slope[None], aspect[None])
    # Exposure response: windward speed-up, lee sheltering (the signal the
    # generator must reconstruct from terrain + blurred flow).
    gain = (1.0 + 0.9 * e_plus + 1.1 * e_minus).astype(np.float32)
    gust = np.stack([
        0.35 * fractal_field(ny, nx, rng, beta=1.8) * np.tanh(8 * slope)
        for _ in range(t)])
    hu = u0 * gain + gust * np.cos(angle)[:, None, None]
    hv = v0 * gain + gust * np.sin(angle)[:, None, None]
    high = np.stack([hu, hv], axis=-1).astype(np.float32)     # (T, H, W, 2)
    low_uv = gaussian_blur(np.moveaxis(high, -1, 0), sigma)   # (2, T, H, W)
    elev = np.broadcast_to(dem / 1e3, (t, ny, nx)).astype(np.float32)
    low = np.stack([low_uv[0], low_uv[1], elev], axis=-1)     # (T, H, W, 3)
    return low, high


def make_day_pool(rng, n_domains, days_per_domain, t, calm_frac=0.0,
                  axis_frac=0.0):
    """Pre-generate every training day as two stacked arrays.

    The whole pool is pushed to the device ONCE and random crops are taken
    on-device (`make_sampler`).  Streaming fresh numpy batches every step
    is not an option on this platform: each host->device transfer above
    ~0.5 MB permanently leaks its full size in host RSS (axon client bug,
    measured at 100% of transfer size), which OOM-kills runs past ~13k
    steps at the flagship batch shape.

    ``calm_frac``: fraction of each domain's days drawn from a calm
    synoptic regime (base speed 0.5-4 m/s instead of 3-10).  Truth
    fine-scale energy scales ~flow^2, so a generator trained only on
    windy days learns a near-constant texture amplitude and overshoots
    ~5x on calm days (measured: per-day hp ratio 5.09 on the calmest
    seed-4242 eval batch).  Oversampling calm days teaches the texture
    gain to follow the input flow.
    """
    lows, highs = [], []
    for _ in range(n_domains):
        dem, slope, aspect = make_domain(rng)
        n_calm = int(round(calm_frac * days_per_domain))
        n_axis = int(round(axis_frac * days_per_domain))
        for d in range(days_per_domain):
            kw = {}
            if d < n_calm:
                kw = dict(speed_lo=0.5, speed_hi=4.0)
            elif d < n_calm + n_axis:
                # ``axis_frac``: moderate-speed days with axis-pinned
                # flow — the channel-degenerate texture regime (see
                # synth_day) the worst-day tail lives in.
                kw = dict(speed_lo=3.0, speed_hi=7.0, axis_aligned=True)
            lo, hi = synth_day(rng, dem, slope, aspect, t=t, **kw)
            lows.append(lo)
            highs.append(hi)
    return np.stack(lows), np.stack(highs)


def make_sampler(batch, patch):
    """Jitted on-device batch sampler over the resident day pool.

    Draws (day, y0, x0) uniformly per element and crops with
    ``lax.dynamic_slice`` — the per-step host->device traffic is one
    folded PRNG key, so host RSS stays flat for arbitrarily long runs.
    """
    import jax
    import jax.numpy as jnp

    def sample(pool_low, pool_high, key):
        n, t, ny, nx, _ = pool_low.shape
        kd, ky, kx = jax.random.split(key, 3)
        idx = jax.random.randint(kd, (batch,), 0, n)
        y0 = jax.random.randint(ky, (batch,), 0, ny - patch + 1)
        x0 = jax.random.randint(kx, (batch,), 0, nx - patch + 1)

        def crop(pool, i, y, x):
            c = pool.shape[-1]
            cube = jax.lax.dynamic_slice(
                pool, (i, 0, y, x, 0), (1, t, patch, patch, c))
            return jnp.squeeze(cube, 0)

        lo = jax.vmap(crop, in_axes=(None, 0, 0, 0))(pool_low, idx, y0, x0)
        hi = jax.vmap(crop, in_axes=(None, 0, 0, 0))(pool_high, idx, y0, x0)
        return lo, hi

    return jax.jit(sample)


def highpass_energy(field, sigma=7.0):
    """Mean squared high-frequency content (what blurring removes)."""
    return float(np.mean((field - gaussian_blur(field, sigma)) ** 2))


# Denominator floor for per-(day, channel) high-pass ratios, as a fraction
# of the protocol-wide mean truth energy.  The raw ratio hp_fake/hp_truth is
# ill-conditioned: on an axis-pinned day one velocity component's truth is
# nearly texture-free (hp_truth ~ 1% of typical), so a tiny absolute excess
# reads as a 50-60x "overshoot" (the _ft6/_ft7 sidecar worst_day 57-62
# numbers were exactly this).  Flooring the denominator at FLOOR_EPS of the
# mean truth energy bounds what a physically negligible channel can
# contribute: a floored ratio of r means the fake carries at most
# r*FLOOR_EPS of a typical day's texture energy on that channel — at 0.05,
# a floored 1.5 caps spurious texture at 7.5% of typical, inaudible in any
# field the reference's own metrics (LSD, KS, ACD) can see.  Raw ratios are
# still reported alongside everywhere.
FLOOR_EPS = 0.05


def floored_ratio_stats(hp_f, hp_t, eps=FLOOR_EPS):
    """Per-(day, channel) high-pass ratios with conditioned energies.

    ``hp_f``/``hp_t`` are parallel lists of per-(batch, channel) high-pass
    energies.  Returns (raw_ratios, floored_ratios, floor): raw divides by
    max(hp_t, 1e-9) (reporting only); floored is
    max(hp_f, floor) / max(hp_t, floor) with floor = eps * mean(hp_t) —
    the gate/selection statistic.  The floor is SYMMETRIC: a generator
    returning the exact truth scores exactly 1.0 on every day including
    degenerate ones (a denominator-only floor would read a perfect
    output as hp_t/floor -> 0 on a texture-free channel and flag it).
    """
    floor = eps * (sum(hp_t) / max(len(hp_t), 1))
    raw = [f / max(t, 1e-9) for f, t in zip(hp_f, hp_t)]
    floored = [max(f, floor) / max(t, floor) for f, t in zip(hp_f, hp_t)]
    return raw, floored, float(floor)


def log_spectral_distance(a, b):
    """RMS log power-spectrum gap in dB (0 = identical spectra)."""
    fa = np.abs(np.fft.rfft2(a)) ** 2 + 1e-12
    fb = np.abs(np.fft.rfft2(b)) ** 2 + 1e-12
    return float(np.sqrt(np.mean((10.0 * np.log10(fa / fb)) ** 2)))


def make_holdout_batches(seed, n_batches=4, batch=8, patch=96, seq=6,
                         calm_batches=1, axis_batches=0):
    """Fixed (low, high) eval batches on terrain the trainer never sees.

    The construction is THE protocol shared by tools/eval_ckpt_ab.py:
    2 domains from ``RandomState(seed)``, one synthetic day per batch,
    random crops, plus ``calm_batches`` appended batches from an
    explicitly calm day (base speed 0.5-2.5 m/s) — the regime where an
    amplitude-blind generator overshoots hardest, so both selection and
    the final report measure it.  Seed roles: 0 = training pool, 777 =
    in-training checkpoint selection, 4242 = final A/B report.
    Selection and final report use different seeds so picking the best
    checkpoint never overfits the terrain the A/B verdict is computed
    on.

    ``axis_batches`` appends batches from axis-pinned moderate-flow days
    (the channel-degenerate regime, see synth_day) AFTER the protocol
    batches.  It defaults to 0 and the A/B protocol (eval_ckpt_ab, the
    bundled-weights band test) never sets it — the appended batches
    extend what in-training SELECTION can see without changing what the
    final verdict is measured on.
    """
    rng = np.random.RandomState(seed)
    domains = [make_domain(rng) for _ in range(2)]
    batches = []
    for b in range(n_batches + calm_batches + axis_batches):
        dem, slope, aspect = domains[b % len(domains)]
        kw = {}
        if b >= n_batches + calm_batches:
            kw = dict(speed_lo=3.0, speed_hi=7.0, axis_aligned=True)
        elif b >= n_batches:
            kw = dict(speed_lo=0.5, speed_hi=2.5)
        low, high = synth_day(rng, dem, slope, aspect, t=seq, **kw)
        ny, nx = low.shape[1:3]
        lows, highs = [], []
        for _ in range(batch):
            y0 = rng.randint(ny - patch + 1)
            x0 = rng.randint(nx - patch + 1)
            lows.append(low[:, y0:y0 + patch, x0:x0 + patch])
            highs.append(high[:, y0:y0 + patch, x0:x0 + patch])
        batches.append((np.stack(lows), np.stack(highs)))
    return batches


def holdout_figures(fwd, g_vars, batches, worst_weight=0.10):
    """(hp_pooled, worst_day_ratio, lsd_mean, ws_rmse_mean, score).

    ``hp_pooled`` is sum(hp_fake)/sum(hp_truth) over all batches — the
    stable sharpness statistic (truth fine-scale energy scales ~flow^2,
    so a per-batch ratio has a near-zero denominator on calm days and a
    mean of ratios is outlier-dominated).  ``worst_day_ratio`` is the
    per-(batch, channel) FLOORED ratio (floored_ratio_stats) farthest
    from 1.0 in log space: the calm/axis-pinned overshoot diagnostic
    with a conditioned denominator — the raw ratio explodes on
    texture-free truth channels (measured 57-62 on the very bytes whose
    A/B worst day was 3.1) and selecting on it rejects good
    checkpoints.  ``score`` (lower = better) combines ws-RMSE with
    log-space penalties on both, so selection rewards checkpoints whose
    texture amplitude tracks the flow instead of averaging out.
    Shipping gate: hp_pooled in [0.8, 1.5], floored worst day in
    [0.8, 1.5], ws-rmse < 0.4.
    """
    import jax
    import jax.numpy as jnp

    hp_f, hp_t, hp_f_ch, hp_t_ch, lsds, rmses = [], [], [], [], [], []
    for i, (low, high) in enumerate(batches):
        noise = 0.1 * jax.random.normal(
            jax.random.key(100 + i), low.shape[:-1] + (20,))
        fake = np.asarray(fwd(g_vars, jnp.asarray(low), noise))
        hp_f.append(highpass_energy(fake[..., 0]))
        hp_t.append(highpass_energy(high[..., 0]))
        # The worst-day figure looks at BOTH components: an axis-pinned
        # day leaves one channel's truth texture-free, and which one
        # depends on the flow direction — a u-only figure is blind to
        # the v-degenerate half of that regime.
        for ch in (0, 1):
            hp_f_ch.append(highpass_energy(fake[..., ch]))
            hp_t_ch.append(highpass_energy(high[..., ch]))
        lsds.append(log_spectral_distance(fake[..., 0], high[..., 0]))
        rmses.append(float(np.sqrt(np.mean(
            (np.hypot(fake[..., 0], fake[..., 1])
             - np.hypot(high[..., 0], high[..., 1])) ** 2))))
    pooled = sum(hp_f) / max(sum(hp_t), 1e-9)
    _, floored, _ = floored_ratio_stats(hp_f_ch, hp_t_ch)
    worst = max(floored, key=lambda r: abs(np.log(max(r, 1e-9))))
    lsd, rmse = np.mean(lsds), np.mean(rmses)
    score = (rmse + 0.25 * abs(np.log(max(pooled, 1e-9)))
             + worst_weight * abs(np.log(max(worst, 1e-9))))
    return float(pooled), float(worst), float(lsd), float(rmse), float(score)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--reco", type=float, default=20.0)
    ap.add_argument("--adv", type=float, default=1.0,
                    help="generator adversarial-term weight; 0 with "
                         "--n-critic 0 is the supervised-polish mode "
                         "(reconstruction anchor + sharpness only, no "
                         "critic in the compiled program) — sculpts the "
                         "per-channel texture amplitude directly against "
                         "the gated statistic without the WGAN "
                         "equilibrium fighting the gain")
    ap.add_argument("--n-critic", type=int, default=2,
                    help="critic updates per generator update; more gives "
                         "the critic a better read on over-sharpened "
                         "texture when fine-tuning")
    ap.add_argument("--noise-std", type=float, default=None,
                    help="instance-noise std on critic inputs (default "
                         "TrainConfig's 0.1); lower lets the critic see "
                         "finer texture differences")
    ap.add_argument("--g-lr", type=float, default=None,
                    help="override the generator Adam learning rate "
                         "(default: TrainConfig's 1e-4). Use a reduced "
                         "rate to fine-tune a warm-started checkpoint "
                         "without the fresh critic dragging it off its "
                         "optimum at full step size")
    ap.add_argument("--d-lr", type=float, default=None,
                    help="override the critic Adam learning rate "
                         "(default: TrainConfig's 4e-4)")
    ap.add_argument("--domains", type=int, default=4,
                    help="number of distinct synthetic terrains; longer "
                         "runs generalize better to held-out terrain with "
                         "more of them")
    ap.add_argument("--days", type=int, default=6,
                    help="synthetic days per terrain in the device-resident "
                         "pool (~18 MB HBM each at T=6)")
    ap.add_argument("--sharp", type=float, default=0.0,
                    help="per-sample high-pass energy-ratio penalty "
                         "coefficient (TrainConfig.sharpness_coefficient); "
                         "ties each day's texture amplitude to its truth — "
                         "the direct lever on the worst-day hp-ratio tail")
    ap.add_argument("--axis-frac", type=float, default=0.0,
                    help="fraction of each terrain's days with axis-pinned "
                         "flow (channel-degenerate texture regime — the "
                         "measured worst-day tail; see synth_day)")
    ap.add_argument("--axis-eval-batches", type=int, default=0,
                    help="axis-pinned batches appended to the SELECTION "
                         "holdout (never to the A/B protocol) so the "
                         "best-checkpoint score sees the degenerate regime")
    ap.add_argument("--calm-frac", type=float, default=0.0,
                    help="fraction of each terrain's days drawn from a "
                         "calm synoptic regime (0.5-4 m/s base speed); "
                         "teaches the texture amplitude to track the flow "
                         "(see make_day_pool)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "windtpu", "assets", "weights", "generator-synth.npz"))
    ap.add_argument("--save-every", type=int, default=2000,
                    help="write the generator npz (and the full train "
                         "state when --ckpt-dir is set) every N steps")
    ap.add_argument("--holdout-every", type=int, default=0,
                    help="every N steps, score the generator on fixed "
                         "held-out terrain (selection seed 777, disjoint "
                         "from the final A/B seed 4242) and write "
                         "<out>.best.npz whenever the combined score "
                         "improves; 0 disables. Best-by-protocol beats "
                         "last-step selection because WGAN sharpness "
                         "oscillates across critic/generator phases")
    ap.add_argument("--holdout-seed", type=int, default=777)
    ap.add_argument("--score-worst-weight", type=float, default=0.10,
                    help="weight of |log worst-day hp ratio| in the "
                         "selection score (holdout_figures); raise it when "
                         "fine-tuning specifically for the calm-day tail — "
                         "the default mostly tracks ws-RMSE")
    ap.add_argument("--calm-eval-batches", type=int, default=1,
                    help="number of explicitly-calm batches in the "
                         "selection holdout (make_holdout_batches "
                         "calm_batches); one calm batch makes the worst-day "
                         "statistic a single high-variance draw that "
                         "transfers poorly to the final A/B seed — more "
                         "batches stabilize tail-targeted selection")
    ap.add_argument("--ckpt-dir", default=None,
                    help="directory for periodic full-train-state Orbax "
                         "checkpoints (enables --resume)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --ckpt-dir")
    ap.add_argument("--init-npz", default=None,
                    help="warm-start the generator from a save_generator_npz "
                         "file (fresh critic and optimizers); ignored when "
                         "--resume finds a full train-state checkpoint. The "
                         "reconstruction anchor keeps the generator pinned "
                         "to the blurred input's large scales while the "
                         "fresh critic catches up")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.models.generator import Generator
    from windtpu.train.checkpoint import (latest_checkpoint,
                                          restore_checkpoint,
                                          save_checkpoint,
                                          save_generator_npz)
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    cfg = GANConfig(
        model=ModelConfig(image_size=args.patch, in_channels=3,
                          noise_channels=20, out_channels=2,
                          sequence_length=args.seq, generator_features=128,
                          discriminator_features=16,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=args.batch, n_critic=args.n_critic,
                          reconstruction_coefficient=args.reco,
                          sharpness_coefficient=args.sharp,
                          adversarial_coefficient=args.adv,
                          compute_metrics=False,
                          **({"g_learning_rate": args.g_lr}
                             if args.g_lr is not None else {}),
                          **({"d_learning_rate": args.d_lr}
                             if args.d_lr is not None else {}),
                          **({"noise_std": args.noise_std}
                             if args.noise_std is not None else {})),
    )
    # Identity features: reconstruction anchors the fake to the blurred
    # input's large scales (reference enc(low)-enc(fake), gan/train.py:26).
    feature_fn = lambda x: x  # noqa: E731
    step_fn = make_train_step(cfg, feature_fn=feature_fn)
    state = create_train_state(cfg)
    start_step = 0
    if args.resume:
        if not args.ckpt_dir:
            raise SystemExit("--resume needs --ckpt-dir")
        latest = latest_checkpoint(args.ckpt_dir)
        if latest:
            state = restore_checkpoint(latest, state)
            start_step = int(state.step)
            print(f"resumed from {latest} at step {start_step}", flush=True)
    if args.init_npz and start_step == 0:
        from windtpu.train.checkpoint import load_generator_npz
        g_vars = load_generator_npz(args.init_npz, state.g_variables())
        state = state.replace(g_params=g_vars["params"],
                              g_batch_stats=g_vars["batch_stats"],
                              g_spectral=g_vars["spectral_stats"])
        print(f"warm-started generator from {args.init_npz}", flush=True)

    rng = np.random.RandomState(0)
    print(f"synthesizing {args.domains} terrains x {args.days} days...",
          flush=True)
    pool_low, pool_high = make_day_pool(rng, args.domains, args.days,
                                        args.seq, calm_frac=args.calm_frac,
                                        axis_frac=args.axis_frac)
    # ALL host synthesis must finish before the first big tunnel
    # transfer: dispatching the ~850 MB pool device_put and then running
    # the holdout builder's CPU-pinned stencil convs while it is in
    # flight wedged the axon link twice in a row (every thread futex-
    # parked, zero CPU, no error — the known remote-link failure mode
    # the watchdog exists for).  Holdout batches are built first, the
    # pool transfer is dispatched after, and its completion is forced
    # before training starts.
    holdout_batches = None
    if args.holdout_every:
        print(f"building holdout batches (seed {args.holdout_seed})...",
              flush=True)
        holdout_batches = make_holdout_batches(
            args.holdout_seed, batch=args.batch, patch=args.patch,
            seq=args.seq, calm_batches=args.calm_eval_batches,
            axis_batches=args.axis_eval_batches)
    print("transferring day pool to device...", flush=True)
    pool_low = jax.device_put(pool_low)    # once: the only big transfers
    pool_high = jax.device_put(pool_high)
    # Real barrier (block_until_ready returns at dispatch on axon):
    # touch one element of each so a wedged transfer is caught HERE,
    # inside the watchdog's stall window, not mid-training.
    float(jax.device_get(pool_low[0, 0, 0, 0, 0]))
    float(jax.device_get(pool_high[0, 0, 0, 0, 0]))
    print("day pool resident on device", flush=True)
    sample = make_sampler(args.batch, args.patch)

    def save_all(tag=""):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        g_vars = jax.device_get(state.g_variables())
        tmp = args.out + ".tmp"
        save_generator_npz(tmp, g_vars)
        os.replace(tmp, args.out)  # atomic: a kill never truncates it
        print(f"wrote {args.out}{tag} "
              f"({os.path.getsize(args.out) / 1e6:.1f} MB)", flush=True)
        if args.ckpt_dir:
            have = latest_checkpoint(args.ckpt_dir)
            if not (have and have.endswith(f"step_{int(state.step):08d}")):
                save_checkpoint(args.ckpt_dir, state)
        return g_vars

    holdout = None
    if args.holdout_every:
        gen_sel = Generator(cfg.model)
        fwd_sel = jax.jit(
            lambda v, x, n: gen_sel.apply(v, x, n, train=False))
        holdout = holdout_batches  # built above, before device traffic
        # Survive watchdog restarts: without a stored score, best_score
        # resets to inf on relaunch and the first post-restart eval
        # overwrites .best.npz even when it is worse than the stored one.
        # The authoritative score comes from RE-SCORING the stored npz on
        # the (deterministic: fixed batches, fixed noise keys) holdout —
        # the npz and its .best.json sidecar are written in two separate
        # os.replace steps, so a kill between them can leave the pair
        # inconsistent; the file itself cannot lie.  The sidecar remains
        # the human-readable record and the fallback if loading fails.
        best_score = float("inf")
        best_npz = args.out + ".best.npz"
        best_json = args.out + ".best.json"
        if os.path.exists(best_npz):
            try:
                from windtpu.train.checkpoint import load_generator_npz

                stored = load_generator_npz(
                    best_npz, jax.device_get(state.g_variables()))
                *_, best_score = holdout_figures(
                    fwd_sel, stored, holdout,
                    worst_weight=args.score_worst_weight)
                print(f"re-scored stored best checkpoint {best_npz}: "
                      f"{best_score:.3f}", flush=True)
            except Exception as e:  # shape mismatch after a config edit
                if os.path.exists(best_json):
                    with open(best_json) as f:
                        best_score = float(json.load(f)["score"])
                print(f"could not re-score {best_npz} ({e!r}); using "
                      f"sidecar score {best_score:.3f}", flush=True)
        elif os.path.exists(best_json):
            with open(best_json) as f:
                best_score = float(json.load(f)["score"])
            print(f"resuming best-checkpoint score {best_score:.3f} "
                  f"from {best_json}", flush=True)

    key = jax.random.key(1)
    t0 = time.time()
    for step in range(start_step, args.steps):
        kstep = jax.random.fold_in(key, step)
        low, high = sample(pool_low, pool_high,
                           jax.random.fold_in(kstep, 0))
        state, metrics = step_fn(state, low, high,
                                 jax.random.fold_in(kstep, 1))
        if step % 100 == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {step}: d={m.get('d_loss', 0):+.3f} "
                  f"g={m.get('g_loss', 0):+.3f} "
                  f"reco={m.get('g_reco_loss', 0):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if holdout and step and step % args.holdout_every == 0:
            hp, worst, lsd, rmse, score = holdout_figures(
                fwd_sel, state.g_variables(), holdout,
                worst_weight=args.score_worst_weight)
            marker = ""
            if score < best_score:
                best_score = score
                g_vars = jax.device_get(state.g_variables())
                tmp = args.out + ".best.tmp"
                save_generator_npz(tmp, g_vars)
                os.replace(tmp, args.out + ".best.npz")
                with open(best_json + ".tmp", "w") as f:
                    json.dump({"score": score, "step": int(step),
                               "hp_pooled": hp, "worst_day": worst,
                               "lsd_db": lsd, "ws_rmse": rmse}, f)
                os.replace(best_json + ".tmp", best_json)
                marker = "  -> best"
            print(f"  holdout[{step}]: hp={hp:.3f} worst-day={worst:.2f} "
                  f"lsd={lsd:.2f}dB ws-rmse={rmse:.3f} "
                  f"score={score:.3f}{marker}", flush=True)
        if args.save_every and step and step % args.save_every == 0:
            save_all(tag=f" [step {step}]")

    g_vars = save_all()

    # ---- sharpness report: generator vs bilinear vs truth -----------------
    low, high = (np.asarray(a) for a in sample(
        pool_low, pool_high, jax.random.key(555)))
    gen = Generator(cfg.model)
    noise = 0.1 * jax.random.normal(
        jax.random.key(9), low.shape[:-1] + (cfg.model.noise_channels,))
    fake = np.asarray(jax.jit(
        lambda v, x, n: gen.apply(v, x, n, train=False))(
            {"params": g_vars["params"],
             "batch_stats": g_vars["batch_stats"],
             "spectral_stats": g_vars["spectral_stats"]},
            jnp.asarray(low), noise))
    hp_truth = highpass_energy(np.moveaxis(high[..., 0], 0, 0))
    hp_input = highpass_energy(low[..., 0])     # == "bilinear" upscaling: 0
    hp_fake = highpass_energy(fake[..., 0])
    print(f"high-pass energy: truth={hp_truth:.4f} fake={hp_fake:.4f} "
          f"blurred-input={hp_input:.4f} "
          f"(fake/truth={hp_fake / max(hp_truth, 1e-9):.2f})")


if __name__ == "__main__":
    main()
