"""Calibrate the flow-conditional texture gate (models/texture_gate.py).

The gate's only learned piece is a tiny MLP that predicts the TRUTH's
per-(sample, channel) high-pass energy from intensive statistics of the
low-res input — a pure physics regression on the synthetic data model
(train_shipped_ckpt.synth_day): truth fine-scale energy scales ~flow^2
and projects onto (cos, sin) of the flow direction, both observable in
the blurred input.  No generator is involved in the fit at all — the
gate measures the generator's actual output energy at inference time.

Training data: days drawn with the same regime mix the tail lives in
(normal / calm / axis-pinned) over seed-0-range terrain (the training
pool seed role — see make_holdout_batches docstring; seeds 777/4242/31337
stay held out for selection/verdict).  Validation: the seed-777 protocol
plus explicit axis-pinned batches, reporting log-energy R^2 and the
floored-ratio frontier a PERFECT generator would see after gating (the
gate's own error floor).

Runs on the host CPU in ~a minute; writes
windtpu/assets/weights/texture-gate.npz and prints a JSON fit record
(committed as docs/texture_gate_fit.json).

Usage: python tools/train_texture_gate.py [--out PATH] [--steps 3000]
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


def build_dataset(seed, n_domains, days_per_domain, crops_per_day,
                  patch=96, seq=6):
    """(features, log hp_truth) rows over a mixed-regime day sample.

    Regime mix per domain: 50% normal, 25% calm, 25% axis-pinned —
    calm and degenerate days are oversampled relative to nature because
    they are the regimes the gate exists to fix (and where the raw
    ratio's denominator collapses).
    """
    import jax
    import jax.numpy as jnp

    from train_shipped_ckpt import make_domain, synth_day
    from windtpu.models.texture_gate import _features, _hp_energy

    feats_fn = jax.jit(_features)
    hp_fn = jax.jit(lambda x: _hp_energy(jnp.moveaxis(x, -1, -4)))

    rng = np.random.RandomState(seed)
    X, Y = [], []
    for _ in range(n_domains):
        dem, slope, aspect = make_domain(rng)
        for d in range(days_per_domain):
            r = d % 4
            kw = {}
            if r == 2:
                kw = dict(speed_lo=0.5, speed_hi=2.5)
            elif r == 3:
                kw = dict(speed_lo=3.0, speed_hi=7.0, axis_aligned=True)
            low, high = synth_day(rng, dem, slope, aspect, t=seq, **kw)
            ny, nx = low.shape[1:3]
            lows, highs = [], []
            for _ in range(crops_per_day):
                y0 = rng.randint(ny - patch + 1)
                x0 = rng.randint(nx - patch + 1)
                lows.append(low[:, y0:y0 + patch, x0:x0 + patch])
                highs.append(high[:, y0:y0 + patch, x0:x0 + patch])
            lo_b = jnp.asarray(np.stack(lows))
            hi_b = jnp.asarray(np.stack(highs))
            X.append(np.asarray(feats_fn(lo_b)))          # (B, 2, F)
            Y.append(np.log(np.asarray(hp_fn(hi_b)) + 1e-8))  # (B, 2)
    X = np.concatenate(X).reshape(-1, X[0].shape[-1])
    Y = np.concatenate(Y).reshape(-1)
    return X.astype(np.float32), Y.astype(np.float32)


def fit(X, Y, steps=3000, hidden=32, lr=3e-3, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    from windtpu.models import texture_gate as tg

    params = tg.init_params(jax.random.key(seed), hidden=hidden)
    mu = X.mean(0)
    sd = X.std(0) + 1e-6
    params["f_mu"] = jnp.asarray(mu)
    params["f_sd"] = jnp.asarray(sd)

    Xn = jnp.asarray((X - mu) / sd)
    Yj = jnp.asarray(Y)

    def mlp(p, f):
        h = jnp.tanh(f @ p["w1"] + p["b1"])
        h = jnp.tanh(h @ p["w2"] + p["b2"])
        return (h @ p["w3"] + p["b3"])[..., 0]

    trainable = ("w1", "b1", "w2", "b2", "w3", "b3")

    def loss_fn(tp):
        pred = mlp({**params, **tp}, Xn)
        return jnp.mean((pred - Yj) ** 2)

    opt = optax.adam(lr)
    tp = {k: params[k] for k in trainable}
    state = opt.init(tp)

    @jax.jit
    def step(tp, state):
        loss, grads = jax.value_and_grad(loss_fn)(tp)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(tp, upd), state, loss

    for i in range(steps):
        tp, state, loss = step(tp, state)
    params.update(tp)
    final = float(loss)
    r2 = 1.0 - final / float(np.var(Y))
    return params, {"train_mse_log": final, "train_r2_log": r2}


def validate(params, seed=777):
    """Gate-error floor on held-out terrain: what floored ratios would a
    PERFECT generator (fake == truth) see after gating?  Uses the A/B
    protocol batches plus explicit axis-pinned ones."""
    import jax.numpy as jnp

    from train_shipped_ckpt import (FLOOR_EPS, floored_ratio_stats,
                                    highpass_energy, make_holdout_batches)
    from windtpu.models import texture_gate as tg

    batches = make_holdout_batches(seed, axis_batches=2)
    hp_g, hp_t = [], []
    log_err = []
    for low, high in batches:
        gated = np.asarray(tg.apply_gate(params, jnp.asarray(low),
                                         jnp.asarray(high)))
        pred = np.asarray(tg.predict_log_energy(params, jnp.asarray(low)))
        for ch in (0, 1):
            t_e = highpass_energy(high[..., ch])
            hp_g.append(highpass_energy(gated[..., ch]))
            hp_t.append(t_e)
            log_err.append(float(np.mean(pred[:, ch]))
                           - float(np.log(t_e + 1e-8)))
    raw, floored, floor = floored_ratio_stats(hp_g, hp_t)
    return {
        "protocol_seed": seed,
        "identity_floored_range": [round(min(floored), 3),
                                   round(max(floored), 3)],
        "identity_raw_range": [round(min(raw), 3), round(max(raw), 3)],
        "log_energy_rmse": round(float(np.sqrt(np.mean(
            np.square(log_err)))), 4),
        "floor": floor,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "windtpu", "assets", "weights", "texture-gate.npz"))
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--domains", type=int, default=6)
    ap.add_argument("--days", type=int, default=20)
    ap.add_argument("--crops", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from train_shipped_ckpt import FLOOR_EPS, make_holdout_batches
    from windtpu.models import texture_gate as tg

    print(f"# building dataset: {args.domains} domains x {args.days} days "
          f"x {args.crops} crops")
    X, Y = build_dataset(0, args.domains, args.days, args.crops)
    print(f"# {X.shape[0]} rows, {X.shape[1]} features")

    params, fit_stats = fit(X, Y, steps=args.steps)

    # The metric's conditioning floor, estimated on a held-out replica of
    # the A/B protocol (same statistic eval_ckpt_ab's floored ratios use).
    from train_shipped_ckpt import highpass_energy
    hp_t = [highpass_energy(high[..., ch])
            for low, high in make_holdout_batches(777)
            for ch in (0, 1)]
    params["floor"] = jnp.asarray(FLOOR_EPS * float(np.mean(hp_t)),
                                  jnp.float32)

    val = validate(params)
    record = {
        "_what": "texture-gate calibration record (tools/train_texture_gate.py)",
        "dataset_rows": int(X.shape[0]),
        "train_seed_role": 0,
        **fit_stats,
        "floor": float(params["floor"]),
        "validation": val,
    }
    print(json.dumps(record, indent=1))

    tg.save_gate_npz(args.out, params)
    print(f"# wrote {args.out}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
