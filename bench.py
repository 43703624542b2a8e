"""Benchmark: WGAN-GP training throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload = the BASELINE.json north-star training config scaled to one chip:
64x64 patches, T=6, the reference's 10 input variables / 20 noise channels
/ 2 outputs, batch 64, n_critic=3, with the in-step metric suite enabled
(the reference recomputes metrics every step too, ganbase.py:63-72).

``vs_baseline`` compares against the reference's TF-CPU equivalent measured
once by tools/bench_baseline_tf.py into BASELINE_MEASURED.json (the
reference publishes no numbers — BASELINE.md).  Extra keys:

* ``mfu`` — model FLOPs utilization for the primary config, computed from
  ``jax.jit(step).lower(...).cost_analysis()['flops']`` (HLO-level count,
  includes the unrolled n_critic D updates and the grad-of-grad gradient
  penalty) against the device's peak dense bf16 FLOPs.
* ``flagship_steps_per_sec`` — the full-size 96px / T=24 generator config.
* ``inference_km2_per_sec`` — downscaled km^2/s at 1 km on the flagship
  96px tiled inference engine.  Failures are LOUD: any benchmark exception
  aborts the run with a traceback (a broken path must never report null).

Synchronization note: jax.block_until_ready is unreliable on the axon remote
platform; the only trustworthy sync is a host fetch (device_get) of a value
at the end of the dependency chain.  Every timed section here fetches.
"""

import argparse
import json
import os
import time

import numpy as np

# Peak dense matmul FLOPs/s per chip (bf16 with fp32 accumulation), from
# published TPU/GPU specs.  Used as the MFU denominator; unknown device
# kinds report mfu=null rather than guessing.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _detect_contention():
    """Describe any competing compute on this host, or None if quiet.

    Two checks: (a) live trainer pids recorded by tools/train_watchdog.sh
    run dirs (`_*/trainer.pid` at the repo root) — a trainer holds the
    TPU tunnel AND burns every host core, which depressed BENCH_r03's
    virtual-CPU-mesh tile_efficiency to 0.694 (vs 0.915 quiet); (b) a
    1-minute loadavg above half the core count, which catches competing
    work this repo didn't launch.  Diagnostic only: the bench still runs,
    but the JSON records what it was sharing the machine with."""
    import glob

    notes = []
    root = os.path.dirname(os.path.abspath(__file__))
    for pidfile in sorted(glob.glob(os.path.join(root, "_*", "trainer.pid"))):
        try:
            pid = int(open(pidfile).read().strip())
            os.kill(pid, 0)  # raises if dead
        except (ValueError, OSError):
            continue
        notes.append(f"live trainer pid {pid} ({os.path.dirname(pidfile)})")
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        if load1 > 0.5 * ncpu:
            notes.append(f"loadavg {load1:.1f} on {ncpu} cores")
    except OSError:
        pass
    return "; ".join(notes) or None


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(name.lower()):
            return peak, kind
    return None, kind


def _train_setup(image_size, seq_len, batch, n_critic, g_feat=128, d_feat=16,
                 metrics=True):
    import jax

    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    cfg = GANConfig(
        model=ModelConfig(image_size=image_size, in_channels=10,
                          noise_channels=20, out_channels=2,
                          sequence_length=seq_len,
                          generator_features=g_feat,
                          discriminator_features=d_feat,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=batch, n_critic=n_critic,
                          compute_metrics=metrics),
    )
    m, t = cfg.model, cfg.train
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg)
    rng = np.random.RandomState(0)
    lr = jax.device_put(rng.standard_normal(
        (t.batch_size, m.sequence_length, m.image_size, m.image_size,
         m.in_channels)).astype(np.float32))
    hr = jax.device_put(rng.standard_normal(
        (t.batch_size, m.sequence_length, m.image_size, m.image_size,
         m.out_channels)).astype(np.float32))
    key = jax.random.key(0)
    return step_fn, state, lr, hr, key


def _flops_per_step(step_fn, state, lr, hr, key,
                    shape=None):
    """HLO flop count of one full train step (trace-only, no device work).

    The axon remote TPU plugin returns None from Lowered.cost_analysis();
    the count is backend-independent, so fall back to lowering the same
    step on the always-available CPU platform in a subprocess.
    """
    import jax

    try:
        lowered = jax.jit(step_fn).lower(state, lr, hr, key)
        cost = lowered.cost_analysis()
        flops = cost.get("flops") if isinstance(cost, dict) else None
        if flops and flops > 0:
            return float(flops)
    except Exception as e:
        print(f"# cost_analysis unavailable on this backend: {e!r}")
    if shape is None:
        return None
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from bench import _train_setup, _flops_per_step; "
        f"s = _train_setup({shape[0]}, {shape[1]}, {shape[2]}, {shape[3]}); "
        "f = _flops_per_step(*s); print('FLOPS', f)")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in proc.stdout.splitlines():
        if line.startswith("FLOPS ") and line.split()[1] != "None":
            return float(line.split()[1])
    print(f"# CPU cost_analysis fallback failed: rc={proc.returncode} "
          f"{proc.stderr.strip()[-300:]}")
    return None


def bench_train(image_size=64, seq_len=6, batch=64, n_critic=3,
                steps=10, warmup=3, metrics=True, want_flops=False):
    import jax

    step_fn, state, lr, hr, key = _train_setup(
        image_size, seq_len, batch, n_critic, metrics=metrics)
    flops = _flops_per_step(step_fn, state, lr, hr, key,
                            shape=(image_size, seq_len, batch, n_critic)) \
        if want_flops else None
    for _ in range(warmup):
        state, m = step_fn(state, lr, hr, key)
    float(jax.device_get(m["g_loss"]))  # real sync (see module docstring)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, lr, hr, key)
    float(jax.device_get(m["g_loss"]))
    dt = time.perf_counter() - t0
    return steps / dt, flops


def bench_inference(smoke=False):
    """Downscaled km^2/s: flagship generator over a 24h, ~750x550 km domain
    at 1 km (tiled, stitched on device)."""
    import jax

    from windtpu.api import flagship_config
    from windtpu.core.config import InferenceConfig
    from windtpu.infer.engine import make_tiled_predictor
    from windtpu.infer.tiling import plan_tiling
    from windtpu.models.generator import init_generator

    if smoke:
        from windtpu.core.config import ModelConfig

        mcfg = ModelConfig(image_size=32, in_channels=3, noise_channels=4,
                           out_channels=2, sequence_length=3,
                           generator_features=16, discriminator_features=8)
        icfg = InferenceConfig(sequence_length=3, image_size=32,
                               noise_channels=4, overlap_factor=0.05)
        t, h, w = 3, 120, 140
    else:
        mcfg = flagship_config().model
        icfg = InferenceConfig(overlap_factor=0.05)
        t, h, w = 24, 546, 756
    plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                       icfg.overlap_factor)
    predictor = make_tiled_predictor(mcfg, icfg, plan)
    g_vars = init_generator(mcfg, jax.random.key(0))
    field = jax.device_put(np.random.RandomState(0).standard_normal(
        (t, h, w, 3)).astype(np.float32))
    pred, _ = predictor(g_vars, field, jax.random.key(1))  # compile + run
    float(jax.device_get(pred[0, h // 2, w // 2, 0]))       # real sync
    best = None
    for i in range(1 if smoke else 3):
        t0 = time.perf_counter()
        pred, _ = predictor(g_vars, field, jax.random.key(2 + i))
        float(jax.device_get(pred[0, h // 2, w // 2, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return h * w / best          # km^2 of domain downscaled per second (24h)


def bench_inference_streaming(smoke=False):
    """Downscaled km^2/s on the host-streaming capacity-fallback path
    (infer/streaming.py): same domain as bench_inference, but the field,
    canvas, and stitch live in host memory and only one patch group is
    ever device-resident.  Slower than the monolithic engine by design —
    this exists so a regression on the streaming path (a 10x slowdown in
    the stats sweep or the per-group transfer loop) flags instead of
    staying perf-invisible (VERDICT r3 weak #5).  The timed run includes
    the full-domain host statistics sweep: that IS the path's cost."""
    import jax

    from windtpu.api import flagship_config
    from windtpu.core.config import InferenceConfig
    from windtpu.infer.streaming import downscale_field_streaming
    from windtpu.models.generator import init_generator

    if smoke:
        from windtpu.core.config import ModelConfig

        mcfg = ModelConfig(image_size=32, in_channels=3, noise_channels=4,
                           out_channels=2, sequence_length=3,
                           generator_features=16, discriminator_features=8)
        icfg = InferenceConfig(sequence_length=3, image_size=32,
                               noise_channels=4, overlap_factor=0.05)
        t, h, w = 3, 120, 140
    else:
        mcfg = flagship_config().model
        icfg = InferenceConfig(overlap_factor=0.05)
        t, h, w = 24, 546, 756
    g_vars = init_generator(mcfg, jax.random.key(0))
    field = np.random.RandomState(0).standard_normal(
        (t, h, w, 3)).astype(np.float32)

    def timed(cfg):
        # Warmup once to compile the fixed-shape group program; the timed
        # pass then measures the steady-state streaming cost.
        downscale_field_streaming(g_vars, field, mcfg, cfg,
                                  key=jax.random.key(1))
        t0 = time.perf_counter()
        downscale_field_streaming(g_vars, field, mcfg, cfg,
                                  key=jax.random.key(2))
        return h * w / (time.perf_counter() - t0)

    import dataclasses

    # Two figures: the default float32 path (seam-identical to the
    # monolithic engine) and the bfloat16-transfer mode — on
    # remote-attached links the path is transfer-bound (measured: ~9 MB/s
    # effective tunnel bandwidth, compute per group in the milliseconds),
    # so halving the bytes roughly doubles throughput.
    fp32 = timed(icfg)
    bf16 = timed(dataclasses.replace(
        icfg, streaming_transfer_dtype="bfloat16"))
    return fp32, bf16


def check_regressions(result: dict, skip_prefixes: tuple = ()) -> list:
    """Compare a bench result against committed BENCH_EXPECTED.json.

    Returns a list of human-readable regression strings (empty = green).
    Only slow-side misses count: running FASTER than expected is not a
    regression.  Keys support dotted paths into nested dicts ("parallel.
    dp_efficiency").  Each entry: {"expected": E, "rel_tol": f} flags
    value < E*(1-f); {"min": M} flags value < M.  Silent throughput drift
    (the unexplained r01->r02 -4.8% km^2/s slide) is what this catches.

    ``skip_prefixes``: expected keys the caller legitimately did not
    measure (e.g. "parallel." under --no-parallel, "mfu" when the device
    kind has no known peak FLOPS) — skipped, not flagged.  A metric that
    is missing because its measurement CRASHED still counts as a
    regression: 'empty = green' must mean everything configured to run
    actually ran.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_EXPECTED.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        expected = json.load(f)
    regressions = []
    for key, spec in expected.items():
        if key.startswith("_"):
            continue
        if any(key == p or key.startswith(p) for p in skip_prefixes):
            continue
        node = result
        for part in key.split("."):
            node = node.get(part) if isinstance(node, dict) else None
        if node is None:
            regressions.append(f"{key}: missing from result")
            continue
        floor = None
        if "expected" in spec:
            floor = spec["expected"] * (1.0 - spec.get("rel_tol", 0.10))
        if "min" in spec:
            floor = max(floor or 0.0, spec["min"])
        if floor is not None and node < floor:
            regressions.append(
                f"{key}: {node:.4g} < floor {floor:.4g} "
                f"(expected {spec.get('expected', spec.get('min')):.4g})")
    return regressions


def flagship_max_batch(peak):
    """Largest per-chip batch the flagship (96px, T=24) step fits
    un-remat'd, with steps/s and MFU there.

    The flagship bench pins batch 2 (the reference's inference group
    shape); MFU at batch 2 understates the chip because the MXU idles
    between small convolutions.  This probes doubling batches until the
    step stops fitting and reports the honest per-chip number.
    """
    results = []
    for b in (2, 4, 8, 16, 32):
        try:
            sps, fl = bench_train(image_size=96, seq_len=24, batch=b,
                                  n_critic=3, steps=3, warmup=1,
                                  want_flops=True)
        except Exception as e:
            print(f"# flagship batch {b} does not fit: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            break
        mfu = (sps * fl / peak) if (fl and peak) else None
        results.append({"batch": b, "steps_per_sec": round(sps, 4),
                        "mfu": round(mfu, 4) if mfu else None,
                        "samples_per_sec": round(sps * b, 2)})
        print(f"# flagship batch {b}: {sps:.3f} steps/s"
              + (f", MFU {mfu:.3f}" if mfu else ""))
    return results


def main():
    # Persistent XLA compile cache: on the axon remote platform, compile
    # RPCs dominate wall time (~10 min for the smoke step when cold); the
    # cache makes repeat bench runs start in seconds.
    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, fewer steps: a fast all-paths check "
                         "for the pre-commit gate, not a perf measurement")
    ap.add_argument("--no-parallel", action="store_true",
                    help="skip the multi-device sharding-efficiency section "
                         "(tools/bench_parallel.py subprocess)")
    ap.add_argument("--flagship-max-batch", action="store_true",
                    help="probe the largest flagship (96px, T=24) batch "
                         "that fits un-remat'd and report steps/s + MFU "
                         "per batch, then exit (VERDICT r2 item 4)")
    ap.add_argument("--allow-contended", action="store_true",
                    help="measure immediately even on a loaded host "
                         "(skips the quiet-window wait; numbers will be "
                         "depressed and the contention note recorded)")
    args = ap.parse_args()

    contention = _detect_contention()
    if contention and not args.smoke and not args.allow_contended:
        # Don't take the signature measurement on a noisy host (BENCH_r03's
        # red tile_efficiency and r04's diagnostic-only spreads were both
        # contended runs).  Loadavg decays with a ~1-minute constant, so a
        # just-stopped trainer clears within the wait window; if the host
        # never quiets, proceed loudly rather than leave the round
        # benchless — the contention note travels with the numbers.
        deadline = time.time() + 600
        while contention and time.time() < deadline:
            print(f"# bench: host contended ({contention}); waiting for a "
                  f"quiet window (up to "
                  f"{int(deadline - time.time())}s left)...", flush=True)
            time.sleep(30)
            contention = _detect_contention()
    if contention:
        print(f"# WARNING: bench starting on a contended machine: "
              f"{contention} — throughput numbers (and especially the "
              f"virtual-CPU-mesh parallel efficiencies) will be "
              f"depressed.  BENCH_r03's red tile_efficiency came from "
              f"exactly this: a fine-tune trainer was live during the "
              f"end-of-round bench.")

    peak, device_kind = _peak_flops()

    if args.flagship_max_batch:
        results = flagship_max_batch(peak)
        print(json.dumps({"metric": "flagship_batch_sweep",
                          "device": device_kind, "sweep": results}))
        return

    flagship_mfu = None
    if args.smoke:
        steps_per_sec, flops = bench_train(
            image_size=24, seq_len=2, batch=2, n_critic=1, steps=2,
            warmup=1, want_flops=True)
        km2_per_sec = bench_inference(smoke=True)
        km2_streaming, km2_streaming_bf16 = \
            bench_inference_streaming(smoke=True)
        flagship_sps = None
    else:
        steps_per_sec, flops = bench_train(want_flops=True)
        flagship_sps, flagship_flops = bench_train(
            image_size=96, seq_len=24, batch=2, n_critic=3, steps=5,
            warmup=2, want_flops=True)
        if flagship_flops and peak:
            flagship_mfu = flagship_sps * flagship_flops / peak
        km2_per_sec = bench_inference()
        km2_streaming, km2_streaming_bf16 = \
            bench_inference_streaming()

    mfu = (steps_per_sec * flops / peak) if (flops and peak) else None

    # Multi-device sharding efficiency (DP train + tile-parallel inference).
    # One real chip here: runs on an 8-device virtual CPU mesh in a
    # subprocess, reporting sharding OVERHEAD diagnostics (regression
    # canary); on a real slice it reports true scaling.
    parallel = None
    if not args.smoke and not args.no_parallel:
        import subprocess
        import sys

        # --force-cpu is mandatory here: this process holds the
        # single-client TPU, so a child that probes jax.devices() would
        # block forever (and the 900 s TimeoutExpired would abort the
        # whole bench after every number was already measured).  The
        # parallel section is auxiliary — any failure degrades to
        # parallel=null rather than killing the primary results.
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_parallel.py"), "--force-cpu"],
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired as e:
            print(f"# bench_parallel timed out after {e.timeout}s")
        else:
            for line in proc.stdout.splitlines()[::-1]:
                if line.startswith("{"):
                    try:
                        parallel = json.loads(line)
                    except ValueError:
                        continue  # '{'-prefixed diagnostic, keep scanning
                    break
            if parallel is None:
                print(f"# bench_parallel failed rc={proc.returncode}: "
                      f"{proc.stderr.strip()[-300:]}")

    baseline = None
    if not args.smoke:  # baseline was measured at the full bench config only
        path = os.path.join(os.path.dirname(__file__),
                            "BASELINE_MEASURED.json")
        if os.path.exists(path):
            with open(path) as f:
                baseline = json.load(f).get("tf_cpu_train_steps_per_sec")
    vs = (steps_per_sec / baseline) if baseline else None

    result = {
        "metric": "wgan_gp_train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": ("steps/s (SMOKE: batch 2, 24px, T=2)" if args.smoke else
                 "steps/s (batch 64, 64px, T=6, n_critic=3)"),
        "vs_baseline": round(vs, 2) if vs else None,
        "mfu": round(mfu, 4) if mfu else None,
        "flops_per_step": flops,
        "device": device_kind,
        "flagship_steps_per_sec":
            round(flagship_sps, 4) if flagship_sps else None,
        "flagship_mfu": round(flagship_mfu, 4) if flagship_mfu else None,
        "inference_km2_per_sec": round(km2_per_sec, 1) if km2_per_sec else None,
        "inference_km2_per_sec_streaming":
            round(km2_streaming, 1) if km2_streaming else None,
        "inference_km2_per_sec_streaming_bf16":
            round(km2_streaming_bf16, 1) if km2_streaming_bf16
            else None,
        "parallel": parallel,
        "contention": contention,
    }
    if not args.smoke:
        # Committed expected values with tolerances: an empty list is the
        # green light; anything here is a throughput regression that a
        # human must explain before shipping (BENCH_EXPECTED.json).
        # Sections the flags/device legitimately exclude are skipped, not
        # flagged (a crashed section still flags as missing).
        skip = ()
        if args.no_parallel:
            skip += ("parallel.",)
        if peak is None:
            skip += ("mfu",)  # unknown device peak FLOPS, not a slowdown
            # (a crashed flops estimate on a KNOWN device still flags)
        result["regressions"] = check_regressions(result, skip)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
