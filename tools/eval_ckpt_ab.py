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
* ws-rmse   — wind-speed RMSE against the truth;
* acd       — angular cosine distance of the (u, v) vectors, in [0, 1]
  (0 = perfectly aligned wind directions; reference gan/metrics.py:94-101);
* ks        — mean spatially-convolved Kolmogorov-Smirnov statistic
  between real and fake patch distributions, in [0, 1] (0 = identical
  local distributions; reference gan/metrics.py:155-187).

Together these cover the reference's own metric axes (BASELINE gate:
"RMSE / spectra statistically matching" plus the ACD and spatial-KS
columns of gan/metrics.py) — VERDICT r3 item 6.

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

from train_shipped_ckpt import (floored_ratio_stats, highpass_energy,  # noqa: E402
                                log_spectral_distance, make_holdout_batches)


def _sha256(path):
    import hashlib
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+", help="generator .npz files")
    ap.add_argument("--seed", type=int, default=4242,
                    help="held-out terrain seed (trainer uses 0)")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--json", default=None,
                    help="append one JSON record per checkpoint to this "
                         "file, keyed by the checkpoint's SHA-256 — the "
                         "auditable evidence chain for a shipped bundle "
                         "(docs/eval_shipped_bundle.json)")
    ap.add_argument("--gate", default=None, const="__bundled__", nargs="?",
                    help="apply the flow-conditional texture gate "
                         "(models/texture_gate.py) to every candidate's "
                         "output before scoring, matching the shipping "
                         "inference path; optional value = gate .npz path "
                         "(default: the bundled asset)")
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The env var alone does NOT stop the axon TPU plugin from
        # connecting the (single-client) tunnel — a second client wedges
        # any live trainer AND itself (utils/hostcpu.py docstring).  The
        # config.update before first backend use is what actually works.
        jax.config.update("jax_platforms", "cpu")
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

    from windtpu.metrics.metrics import (angular_cosine_distance,
                                         spatially_convolved_ks_stat)

    gen = Generator(mcfg)
    if args.gate:
        from windtpu.models.texture_gate import apply_gate, load_gate_npz
        gate_path = (os.path.join(REPO, "windtpu", "assets", "weights",
                                  "texture-gate.npz")
                     if args.gate == "__bundled__" else args.gate)
        gate_params = load_gate_npz(gate_path)
        fwd = jax.jit(lambda v, x, n: apply_gate(
            gate_params, x, gen.apply(v, x, n, train=False)))
    else:
        fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
    acd_fn = jax.jit(lambda r, f: jnp.mean(angular_cosine_distance(r, f)))
    ks_fn = jax.jit(lambda r, f: jnp.mean(
        spatially_convolved_ks_stat(r, f, lo=-10.0, hi=10.0)))
    template = jax.device_get(init_generator(mcfg, jax.random.key(0)))

    records = []
    for path in args.checkpoints:
        v = load_generator_npz(path, template)
        hp_f, hp_t, hp_f_ch, hp_t_ch, lsds, rmses = [], [], [], [], [], []
        acds, kss = [], []
        for i, (low, high) in enumerate(batches):
            noise = 0.1 * jax.random.normal(
                jax.random.key(100 + i), low.shape[:-1] + (20,))
            high_j = jnp.asarray(high)
            fake_j = fwd(v, jnp.asarray(low), noise)
            fake = np.asarray(fake_j)
            hp_f.append(highpass_energy(fake[..., 0]))
            hp_t.append(highpass_energy(high[..., 0]))
            # Per-day ratios cover BOTH velocity components: axis-pinned
            # flow leaves one channel's truth texture-free, and which one
            # depends on the flow direction.
            for ch in (0, 1):
                hp_f_ch.append(highpass_energy(fake[..., ch]))
                hp_t_ch.append(highpass_energy(high[..., ch]))
            lsds.append(log_spectral_distance(fake[..., 0], high[..., 0]))
            rmses.append(float(np.sqrt(np.mean(
                (np.hypot(fake[..., 0], fake[..., 1])
                 - np.hypot(high[..., 0], high[..., 1])) ** 2))))
            # The synthetic wind fields live in roughly [-15, 15] m/s, so
            # the KS threshold grid is [-10, 10] (the reference's [-30,
            # 30] spreads 100 points over a range mostly empty here).
            acds.append(float(acd_fn(high_j, fake_j)))
            kss.append(float(ks_fn(high_j, fake_j)))
        # Headline sharpness is the energy-POOLED ratio: truth fine-scale
        # energy scales ~flow^2, so a near-calm day has a near-zero
        # denominator and one such batch dominates a mean of per-batch
        # ratios (observed std 2.4 on 4 batches).  The pooled ratio
        # weighs each day by its real energy; per-day extremes are the
        # overshoot diagnostic, reported RAW (denominator can collapse on
        # axis-pinned channels) and FLOORED (conditioned denominator —
        # the gate statistic; see floored_ratio_stats).
        pooled = sum(hp_f) / max(sum(hp_t), 1e-9)
        raw, floored, floor = floored_ratio_stats(hp_f_ch, hp_t_ch)
        print(f"{path}: hp-pooled={pooled:.3f} "
              f"hp-floored/day=[{min(floored):.2f}..{max(floored):.2f}] "
              f"hp-raw/day=[{min(raw):.2f}..{max(raw):.2f}] "
              f"lsd={np.mean(lsds):.2f}dB ws-rmse={np.mean(rmses):.3f} "
              f"acd={np.mean(acds):.4f} ks={np.mean(kss):.4f}")
        if args.json:
            sha = _sha256(path)
            records.append({
                "checkpoint": os.path.relpath(path, REPO),
                "sha256": sha,
                "protocol": {"seed": args.seed, "batches": args.batches,
                             "batch": args.batch, "patch": args.patch,
                             "seq": args.seq,
                             "noise_keys": "key(100+i), std 0.1",
                             "texture_gate": (_sha256(gate_path)
                                              if args.gate else None)},
                "hp_pooled": round(pooled, 4),
                "hp_floored_per_day": [round(r, 4) for r in floored],
                "hp_raw_per_day": [round(r, 4) for r in raw],
                "hp_denominator_floor": round(floor, 6),
                "lsd_db": round(float(np.mean(lsds)), 4),
                "ws_rmse": round(float(np.mean(rmses)), 4),
                "acd": round(float(np.mean(acds)), 5),
                "ks": round(float(np.mean(kss)), 5),
            })
    if args.json:
        import json
        out = []
        if os.path.exists(args.json):
            with open(args.json) as f:
                out = json.load(f)
        out.extend(records)
        with open(args.json + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(args.json + ".tmp", args.json)
        print(f"wrote {len(records)} record(s) to {args.json}")


if __name__ == "__main__":
    main()
