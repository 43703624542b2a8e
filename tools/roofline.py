"""Roofline decomposition of the WGAN-GP train step (VERDICT r1 item 3).

For each component of the step (generator fwd / fwd+bwd, critic fwd,
fused-scoring fwd+bwd, gradient-penalty double-grad, metric suite) this
tool measures

* wall time on the attached device (host-fetch synchronized),
* FLOPs and HBM bytes of the COMPILED (TPU-optimized) HLO via
  ``compiled.cost_analysis()`` — available on the axon backend even though
  ``lowered.cost_analysis()`` is not,

and derives the roofline bounds: ``t_mxu = flops / peak_flops`` and
``t_hbm = bytes / peak_bw``.  A component whose measured time sits at
``max(t_mxu, t_hbm)`` is at the hardware ceiling; time above that bound is
fixable (launch serialization, unfused epilogues, layout churn).

It then composes the full step from the component times
(n_critic x (G fwd + GP + scoring) + G fwd/bwd + metrics) and prints the
op-class totals, so the "MFU is X%" headline decomposes into numbers per
component instead of narrative.

Writes JSON to docs/roofline.json and prints a table.  Usage:

  python tools/roofline.py [--batch 64] [--flagship]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Peak dense bf16 FLOPs/s and HBM bandwidth per chip, from published specs.
PEAKS = {
    "TPU v4": (275e12, 1.2e12),
    "TPU v5 lite": (197e12, 0.819e12),
    "TPU v5e": (197e12, 0.819e12),
    "TPU v5p": (459e12, 2.765e12),
    "TPU v6e": (918e12, 1.64e12),
}


def device_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for name, peaks in PEAKS.items():
        if kind.lower().startswith(name.lower()):
            return peaks, kind
    return (None, None), kind


def measure(fn, args, iters=5):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def analyze(fn, args):
    """(flops, bytes, optimal_seconds) of the compiled executable."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if not cost:
        return None, None, None
    return (cost.get("flops"), cost.get("bytes accessed"),
            cost.get("optimal_seconds"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--flagship", action="store_true",
                    help="96px/T=24/batch 2 (flagship) instead of the "
                         "primary bench shape 64px/T=6")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.metrics import metrics as M
    from windtpu.models.discriminator import Discriminator, init_discriminator
    from windtpu.models.generator import Generator, init_generator
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    if args.flagship:
        # --batch composes: the default 2 is the reference inference group
        # shape, but the honest MFU claim is made at the max-fit batch 8
        # (docs/flagship_batch_sweep.json) — decompose there with
        # `--flagship --batch 8` (VERDICT r4 item 5).
        B = args.batch if args.batch != 64 else 2
        I, T, CIN = 96, 24, 3
    else:
        B, I, T, CIN = args.batch, 64, 6, 10
    mcfg = ModelConfig(image_size=I, in_channels=CIN, noise_channels=20,
                       out_channels=2, sequence_length=T,
                       generator_features=128, discriminator_features=16,
                       compute_dtype="bfloat16")
    n_critic = 3
    rng = np.random.RandomState(0)
    lr = jax.device_put(rng.standard_normal(
        (B, T, I, I, CIN)).astype(np.float32))
    hr = jax.device_put(rng.standard_normal(
        (B, T, I, I, 2)).astype(np.float32))
    noise = jax.device_put(
        (rng.standard_normal((B, T, I, I, 20)) * 0.1).astype(np.float32))

    g_vars = init_generator(mcfg, jax.random.key(0))
    d_vars = init_discriminator(mcfg, jax.random.key(1))
    gen = Generator(mcfg)
    disc = Discriminator(mcfg)

    def g_fwd(v, x, n):
        return gen.apply(v, x, n, train=False)

    def g_fwd_bwd(v, x, n):
        def loss(p):
            return jnp.mean(gen.apply({**v, "params": p}, x, n,
                                      train=False) ** 2)
        return jax.grad(loss)(v["params"])

    def d_fwd(v, x, y):
        return disc.apply(v, x, y, train=False)

    def scoring_fwd_bwd(v, x, y, y2):
        """Fused real+fake scoring and its parameter gradient — the
        per-critic-iteration D update (train/wgan_gp.py fused_scoring)."""
        def loss(p):
            xx = jnp.concatenate([x, x], axis=0)
            yy = jnp.concatenate([y, y2], axis=0)
            s = disc.apply({**v, "params": p}, xx, yy, train=False)
            return jnp.mean(s)
        return jax.grad(loss)(v["params"])

    def gp_double_grad(v, x, y):
        def loss(p):
            def score(img):
                return jnp.sum(disc.apply({**v, "params": p}, x, img,
                                          train=False))
            g = jax.grad(score)(y)
            norms = jnp.sqrt(jnp.sum(g ** 2, axis=(1, 2, 3)))
            return jnp.mean((norms - 1.0) ** 2)
        return jax.grad(loss)(v["params"])

    def metric_suite(a, b):
        return (jnp.mean(M.angular_cosine_distance(a, b))
                + jnp.mean(M.log_spectral_distance(a, b))
                + jnp.mean(M.extreme_weighted_rmse(a, b))
                + jnp.mean(M.wind_speed_weighted_rmse(a, b))
                + jnp.mean(M.wind_speed_rmse(a, b)))

    fake = jax.jit(g_fwd)(g_vars, lr, noise)

    components = {
        "G fwd": (g_fwd, (g_vars, lr, noise)),
        "G fwd+bwd": (g_fwd_bwd, (g_vars, lr, noise)),
        "D fwd": (d_fwd, (d_vars, lr, hr)),
        "D scoring fwd+bwd (2B)": (scoring_fwd_bwd, (d_vars, lr, hr, fake)),
        "GP double-grad": (gp_double_grad, (d_vars, lr, hr)),
        "metric suite": (metric_suite, (hr, fake)),
    }

    (peak_flops, peak_bw), kind = device_peaks()
    rows = {}
    for name, (fn, fargs) in components.items():
        jfn = jax.jit(fn)
        t = measure(jfn, fargs)
        flops, nbytes, opt = analyze(fn, fargs)
        row = {"ms": t * 1e3, "gflops": (flops or 0) / 1e9,
               "gbytes": (nbytes or 0) / 1e9}
        if peak_flops and flops:
            row["t_mxu_ms"] = flops / peak_flops * 1e3
            row["t_hbm_ms"] = nbytes / peak_bw * 1e3
            bound = max(row["t_mxu_ms"], row["t_hbm_ms"])
            row["bound_ms"] = bound
            row["roofline_frac"] = bound / row["ms"]
            row["mfu"] = flops / peak_flops / t
            row["limiter"] = ("mxu" if row["t_mxu_ms"] >= row["t_hbm_ms"]
                              else "hbm")
        rows[name] = row

    # Full step for reference + composition from the pieces.
    cfg = GANConfig(model=mcfg,
                    train=TrainConfig(batch_size=B, n_critic=n_critic))
    step_fn = make_train_step(cfg)
    state = create_train_state(cfg)
    holder = {"s": state}

    def run_step():
        holder["s"], holder["m"] = step_fn(holder["s"], lr, hr,
                                           jax.random.key(0))
        return holder["m"]

    t_step = measure(run_step, ())
    sflops, sbytes, _ = analyze(
        lambda s, a, b, k: step_fn(s, a, b, k),
        (create_train_state(cfg), lr, hr, jax.random.key(0)))

    composed = (n_critic * (rows["G fwd"]["ms"]
                            + rows["GP double-grad"]["ms"]
                            + rows["D scoring fwd+bwd (2B)"]["ms"])
                + rows["G fwd+bwd"]["ms"] + rows["D fwd"]["ms"]
                + 2 * rows["G fwd"]["ms"]      # metric-recompute fwds
                + rows["metric suite"]["ms"])
    step_row = {"ms": t_step * 1e3, "gflops": (sflops or 0) / 1e9,
                "gbytes": (sbytes or 0) / 1e9}
    if peak_flops and sflops:
        step_row["t_mxu_ms"] = sflops / peak_flops * 1e3
        step_row["t_hbm_ms"] = sbytes / peak_bw * 1e3
        step_row["bound_ms"] = max(step_row["t_mxu_ms"],
                                   step_row["t_hbm_ms"])
        step_row["roofline_frac"] = step_row["bound_ms"] / step_row["ms"]
        step_row["mfu"] = sflops / peak_flops / t_step
    rows["FULL train step"] = step_row

    print(f"device: {kind}  peak {peak_flops and peak_flops/1e12:.0f} "
          f"Tflop/s bf16, {peak_bw and peak_bw/1e9:.0f} GB/s HBM"
          if peak_flops else f"device: {kind} (no published peaks)")
    hdr = (f"{'component':26s} {'ms':>8s} {'Gflop':>8s} {'GB':>7s} "
           f"{'t_mxu':>7s} {'t_hbm':>7s} {'roof%':>6s} {'MFU':>6s} lim")
    print(hdr)
    for name, r in rows.items():
        print(f"{name:26s} {r['ms']:8.2f} {r['gflops']:8.1f} "
              f"{r['gbytes']:7.2f} "
              f"{r.get('t_mxu_ms', 0):7.2f} {r.get('t_hbm_ms', 0):7.2f} "
              f"{100 * r.get('roofline_frac', 0):6.1f} "
              f"{100 * r.get('mfu', 0):6.1f} {r.get('limiter', '-')}")
    print(f"composed-from-pieces: {composed:.2f} ms vs measured step "
          f"{t_step * 1e3:.2f} ms "
          f"(difference = fusion across pieces + optimizer/EMA updates)")

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", f"roofline_{'flagship' if args.flagship else 'primary'}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"device": kind, "peak_flops": peak_flops,
                   "peak_bw": peak_bw, "batch": B, "image": I, "seq": T,
                   "components": rows,
                   "composed_ms": composed}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
