"""A/B: IID vs structured noise geometry on the degenerate-day tail.

The worst per-day high-pass ratios live on axis-pinned days where one
velocity component's truth is nearly texture-free while the generator's
stochastic texture has a floor.  The reference defines TWO noise
geometries (data_generator.py:296-335): the IID `FlexibleNoiseGenerator`
the shipped model uses, and a structured 4-channel `NoiseGenerator`
(time-only / lon-only / lat-only / lonlat fields) that is implemented in
windtpu (data/noise.py) but unused by the flagship.  If the tail is a
noise-geometry problem (IID texture floor vs near-zero truth texture),
swapping the geometry at inference should move the degenerate-channel
ratios; if the ratios barely move, the floor lives in the generator's
learned filters, not in the noise input (VERDICT r4 item 7).

Protocol: the fixed A/B holdout construction (seed 4242) plus explicit
axis-pinned batches, the shipped bundle, both velocity channels, floored
ratios (tools/train_shipped_ckpt.floored_ratio_stats).  The structured
variant tiles five 4-channel structured draws to fill the flagship's 20
noise channels at the same std.  Writes docs/ab_structured_noise.json.

Usage: python tools/ab_structured_noise.py [--ckpt path] [--seed 4242]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_shipped_ckpt import (floored_ratio_stats, highpass_energy,  # noqa: E402
                                log_spectral_distance, make_holdout_batches)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        REPO, "windtpu", "assets", "weights", "generator-synth.npz"))
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--axis-batches", type=int, default=3,
                    help="explicit axis-pinned batches appended to the "
                         "protocol (the degenerate regime under test)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "ab_structured_noise.json"))
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    from windtpu.core.config import ModelConfig
    from windtpu.data.noise import NoiseGenerator
    from windtpu.models.generator import Generator, init_generator
    from windtpu.train.checkpoint import load_generator_npz

    mcfg = ModelConfig(image_size=96, in_channels=3, noise_channels=20,
                       out_channels=2, sequence_length=6,
                       generator_features=128, discriminator_features=16,
                       compute_dtype="bfloat16")
    gen = Generator(mcfg)
    fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
    template = jax.device_get(init_generator(mcfg, jax.random.key(0)))
    v = load_generator_npz(args.ckpt, template)

    batches = make_holdout_batches(args.seed, axis_batches=args.axis_batches)
    n_protocol = len(batches) - args.axis_batches

    def structured_noise(key, shape):
        """(B, T, X, Y, 20) from five independent structured 4-channel
        draws at the flagship noise std."""
        b, t, x, y = shape
        ng = NoiseGenerator((b, t, x, y), std=0.1)
        parts = [ng.sample(k, bs=b) for k in jax.random.split(key, 5)]
        return jnp.concatenate(parts, axis=-1)

    variants = {
        "iid": lambda key, shape: 0.1 * jax.random.normal(
            key, shape + (20,)),
        "structured": structured_noise,
    }

    report = {"checkpoint": os.path.relpath(args.ckpt, REPO),
              "seed": args.seed, "axis_batches": args.axis_batches,
              "variants": {}}
    for name, make_noise in variants.items():
        hp_f, hp_t, lsds, rmses = [], [], [], []
        axis_flags = []
        for i, (low, high) in enumerate(batches):
            noise = make_noise(jax.random.key(100 + i), low.shape[:-1])
            fake = np.asarray(fwd(v, jnp.asarray(low), noise))
            for ch in (0, 1):
                hp_f.append(highpass_energy(fake[..., ch]))
                hp_t.append(highpass_energy(high[..., ch]))
                axis_flags.append(i >= n_protocol)
            lsds.append(log_spectral_distance(fake[..., 0], high[..., 0]))
            rmses.append(float(np.sqrt(np.mean(
                (np.hypot(fake[..., 0], fake[..., 1])
                 - np.hypot(high[..., 0], high[..., 1])) ** 2))))
        raw, floored, floor = floored_ratio_stats(hp_f, hp_t)
        axis_fl = [r for r, a in zip(floored, axis_flags) if a]
        proto_fl = [r for r, a in zip(floored, axis_flags) if not a]
        entry = {
            "floored_all": [round(r, 3) for r in floored],
            "floored_protocol_worst": round(max(
                proto_fl, key=lambda r: abs(np.log(r))), 3),
            "floored_axis_worst": round(max(
                axis_fl, key=lambda r: abs(np.log(r))), 3) if axis_fl
            else None,
            "raw_worst": round(max(raw, key=lambda r: abs(np.log(r))), 3),
            "lsd_db": round(float(np.mean(lsds)), 3),
            "ws_rmse": round(float(np.mean(rmses)), 4),
        }
        report["variants"][name] = entry
        print(f"{name}: axis-worst={entry['floored_axis_worst']} "
              f"protocol-worst={entry['floored_protocol_worst']} "
              f"lsd={entry['lsd_db']}dB ws-rmse={entry['ws_rmse']}")

    iid = report["variants"]["iid"]
    st = report["variants"]["structured"]
    improves_tail = (st["floored_axis_worst"] is not None
                     and st["floored_axis_worst"]
                     < 0.9 * iid["floored_axis_worst"])
    degrades_field = (st["ws_rmse"] > 1.15 * iid["ws_rmse"]
                      or st["lsd_db"] > iid["lsd_db"] + 1.0)
    report["verdict"] = (
        "adopt-candidate" if improves_tail and not degrades_field
        else "ruled-out")
    report["verdict_detail"] = (
        f"structured axis-worst {st['floored_axis_worst']} vs IID "
        f"{iid['floored_axis_worst']}; ws-rmse {st['ws_rmse']} vs "
        f"{iid['ws_rmse']}; lsd {st['lsd_db']} vs {iid['lsd_db']} dB")
    with open(args.out + ".tmp", "w") as f:
        json.dump(report, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(f"verdict: {report['verdict']} — {report['verdict_detail']}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
