"""A/B-compare generator checkpoints on identical held-out synthetic batches.

The shipped-checkpoint trainer (tools/train_shipped_ckpt.py) prints a
single-batch sharpness figure from its own data stream; that number is not
comparable across runs (different eval batches, training-domain terrain).
This tool is the fair protocol used to decide what ships: fixed held-out
terrain (a seed the trainer never uses), the same batches for every
candidate, and three complementary figures per checkpoint:

* hp-ratio  — high-pass energy of the fake over the truth (1.0 = matches
  the ground-truth fine-scale energy; >1 overshoots, <1 is blurry);
* lsd       — log-spectral distance to the truth field (dB);
* ws-rmse   — wind-speed RMSE against the truth.

Usage: python tools/eval_ckpt_ab.py ckpt_a.npz [ckpt_b.npz ...]
       [--seed 4242] [--batches 4] [--batch 8]

The reference ships exactly one pretrained checkpoint and no evaluation
harness (weights-55.ckpt, reference api.py:21); this protocol is what
replaces eyeballing when retraining the windtpu bundle.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_shipped_ckpt import (highpass_energy, log_spectral_distance,  # noqa: E402
                                make_holdout_batches)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+", help="generator .npz files")
    ap.add_argument("--seed", type=int, default=4242,
                    help="held-out terrain seed (trainer uses 0)")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--seq", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from windtpu.core.config import ModelConfig
    from windtpu.models.generator import Generator, init_generator
    from windtpu.train.checkpoint import load_generator_npz

    mcfg = ModelConfig(image_size=args.patch, in_channels=3,
                       noise_channels=20, out_channels=2,
                       sequence_length=args.seq, generator_features=128,
                       discriminator_features=16, compute_dtype="bfloat16")

    batches = make_holdout_batches(args.seed, n_batches=args.batches,
                                   batch=args.batch, patch=args.patch,
                                   seq=args.seq)

    gen = Generator(mcfg)
    fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
    template = jax.device_get(init_generator(mcfg, jax.random.key(0)))

    for path in args.checkpoints:
        v = load_generator_npz(path, template)
        hp_f, hp_t, ratios, lsds, rmses = [], [], [], [], []
        for i, (low, high) in enumerate(batches):
            noise = 0.1 * jax.random.normal(
                jax.random.key(100 + i), low.shape[:-1] + (20,))
            fake = np.asarray(fwd(v, jnp.asarray(low), noise))
            hp_f.append(highpass_energy(fake[..., 0]))
            hp_t.append(highpass_energy(high[..., 0]))
            ratios.append(hp_f[-1] / max(hp_t[-1], 1e-9))
            lsds.append(log_spectral_distance(fake[..., 0], high[..., 0]))
            rmses.append(float(np.sqrt(np.mean(
                (np.hypot(fake[..., 0], fake[..., 1])
                 - np.hypot(high[..., 0], high[..., 1])) ** 2))))
        # Headline sharpness is the energy-POOLED ratio: truth fine-scale
        # energy scales ~flow^2, so a near-calm day has a near-zero
        # denominator and one such batch dominates a mean of per-batch
        # ratios (observed std 2.4 on 4 batches).  The pooled ratio
        # weighs each day by its real energy; the per-day extremes are
        # kept as the calm-day overshoot diagnostic.
        pooled = sum(hp_f) / max(sum(hp_t), 1e-9)
        print(f"{path}: hp-pooled={pooled:.3f} "
              f"hp-ratio/day=[{min(ratios):.2f}..{max(ratios):.2f}] "
              f"lsd={np.mean(lsds):.2f}dB ws-rmse={np.mean(rmses):.3f}")


if __name__ == "__main__":
    main()
