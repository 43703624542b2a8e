"""Parallel-path benchmark: DP scaling of the train step and tile-parallel
inference throughput on whatever device mesh exists.

On the single-chip driver machine this runs on an 8-device VIRTUAL CPU mesh
(re-exec with --xla_force_host_platform_device_count=8), so the numbers are
sharding-OVERHEAD diagnostics, not absolute throughput: all eight "devices"
share one physical CPU, and an efficiency near (or above) 1.0 means the
sharded program costs no more than the single-device program for the same
global work — a regression in the collective layout would show up as a
sharp drop.  On a real multi-chip slice the same script reports true
scaling.

Prints ONE JSON line:

  {"dp_efficiency": median over interleaved rounds of t_single/t_sharded
                    at the same global batch,
   "dp_spread": (max-min)/median of those per-round ratios — > ~0.2
                means the host was contended and the ratio is noise,
   "tile_efficiency"/"tile_spread": same for t_single/t_tiled inference,
   "times_ms": median per-mode wall times (train_single, train_dp,
               infer_single, infer_tiled),
   "tile_parallel_matches": max|tiled - single| <= 1e-5,
   "n_devices": N, "platform": "cpu"|"tpu"}

Consumed by bench.py (optional "parallel" key) and runnable standalone:

  python tools/bench_parallel.py [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_once(fn, sync, inner=3):
    """Best-of-``inner`` wall time for one measurement sample.

    min() within a sample suppresses per-call jitter (queue scheduling,
    GC); drift across samples is handled by _paired_ratio's interleaving
    instead, so ``inner`` stays small."""
    best = None
    for _ in range(inner):
        t0 = time.perf_counter()
        fn()
        sync()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _paired_ratio(fn_a, sync_a, fn_b, sync_b, rounds=11, trim=2):
    """median and spread of t_a/t_b over interleaved A/B rounds.

    The r03 bench shipped a red tile_efficiency (0.694 vs r02's 0.915)
    measured best-of-5 with the two sides timed back-to-back while a
    trainer was burning the same host CPUs — a load change between the
    two blocks skews the ratio arbitrarily.  Interleaving A and B within
    each round makes every ratio sample see the same machine state, and
    the median across rounds discards the outlier rounds that best-of-N
    kept.  Returns (ratio_median, ratio_spread, t_a_median, t_b_median).

    ``spread`` is a TRIMMED range: (max - min) / median over the per-round
    ratios with the ``trim`` smallest and largest dropped.  The r4 full
    range was dominated by a single OS-jitter round on the shared-CPU
    virtual mesh (one descheduled ~25 ms call moves a ratio 10-20%),
    which says nothing about the sharding layout the figure exists to
    watch; the middle rounds carry that signal.  > ~0.1 after trimming
    still means the host was noisy and the number should not be trusted
    as a layout diagnostic."""
    fn_a()
    sync_a()  # compile A
    fn_b()
    sync_b()  # compile B
    ratios, tas, tbs = [], [], []
    for _ in range(rounds):
        ta = _time_once(fn_a, sync_a)
        tb = _time_once(fn_b, sync_b)
        ratios.append(ta / tb)
        tas.append(ta)
        tbs.append(tb)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    kept = ratios[trim:-trim] if trim and len(ratios) > 2 * trim else ratios
    spread = (kept[-1] - kept[0]) / med if med else None
    tas.sort()
    tbs.sort()
    return med, spread, tas[len(tas) // 2], tbs[len(tbs) // 2]


def run_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from windtpu.core.config import (GANConfig, InferenceConfig, ModelConfig,
                                     TrainConfig)
    from windtpu.core.mesh import make_mesh, replicate, shard_batch
    from windtpu.infer.engine import (make_tile_parallel_predictor,
                                      make_tiled_predictor)
    from windtpu.infer.tiling import plan_tiling
    from windtpu.models.generator import init_generator
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    n = jax.device_count()
    cfg = GANConfig(
        model=ModelConfig(image_size=24, in_channels=3, noise_channels=2,
                          out_channels=2, sequence_length=2,
                          generator_features=16, discriminator_features=8),
        train=TrainConfig(batch_size=2 * n, n_critic=1,
                          compute_metrics=False),
    )
    m = cfg.model
    rng = np.random.RandomState(0)
    lr_np = rng.standard_normal(
        (cfg.train.batch_size, m.sequence_length, m.image_size,
         m.image_size, m.in_channels)).astype(np.float32)
    hr_np = rng.standard_normal(
        (cfg.train.batch_size, m.sequence_length, m.image_size,
         m.image_size, m.out_channels)).astype(np.float32)
    step_fn = make_train_step(cfg)

    # -- single device, full global batch ----------------------------------
    dev0 = jax.devices()[0]
    holder = {"s1": jax.device_put(create_train_state(cfg), dev0)}
    lr1 = jax.device_put(lr_np, dev0)
    hr1 = jax.device_put(hr_np, dev0)
    key1 = jax.device_put(jax.random.key(0), dev0)

    def run_single():
        # the step donates its state argument: always pass the latest
        holder["s1"], holder["m1"] = step_fn(holder["s1"], lr1, hr1, key1)

    sync_single = lambda: float(jax.device_get(holder["m1"]["g_loss"]))  # noqa: E731

    dp_eff = dp_spread = t_single = t_sharded = None
    if n > 1:
        mesh = make_mesh({"data": n})
        holder["sn"] = replicate(mesh, create_train_state(cfg))
        lrn, hrn = shard_batch(mesh, (lr_np, hr_np))
        keyn = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))

        def run_sharded():
            holder["sn"], holder["mn"] = step_fn(holder["sn"], lrn, hrn,
                                                 keyn)

        dp_eff, dp_spread, t_single, t_sharded = _paired_ratio(
            run_single, sync_single,
            run_sharded,
            lambda: float(jax.device_get(holder["mn"]["g_loss"])))

    # -- tile-parallel inference -------------------------------------------
    # Domain sized so one tiled-predict call costs >~100 ms on the 8-way
    # virtual CPU mesh: at 96x128 a call was ~25 ms and OS scheduling
    # noise alone moved the single/tiled ratio +-10% run to run; 4x the
    # patches pushes the compute above the jitter floor (the ratio is a
    # sharding-overhead canary — it must be stable to ~5% to be one).
    icfg = InferenceConfig(sequence_length=2, image_size=24,
                           noise_channels=2, group_size=4,
                           overlap_factor=0.1)
    t, h, w = 2, 192, 256
    plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                       icfg.overlap_factor)
    g_vars = init_generator(m, jax.random.key(0))
    field = jnp.asarray(rng.standard_normal((t, h, w, 3)).astype(np.float32))
    pred_single = make_tiled_predictor(m, icfg, plan)

    def run_ps():
        holder["p1"], _ = pred_single(g_vars, field, jax.random.key(1))

    sync_ps = lambda: float(jax.device_get(  # noqa: E731
        holder["p1"][0, h // 2, w // 2, 0]))

    tile_eff = tile_spread = t_inf_single = t_inf_tiled = None
    tile_match = None
    if n > 1:
        mesh = make_mesh({"data": n})
        g_rep = replicate(mesh, g_vars)
        pred_tiled = make_tile_parallel_predictor(m, icfg, plan, mesh, "data")

        def run_pt():
            holder["pt"], _ = pred_tiled(g_rep, field, jax.random.key(1))

        tile_eff, tile_spread, t_inf_single, t_inf_tiled = _paired_ratio(
            run_ps, sync_ps,
            run_pt, lambda: float(jax.device_get(
                holder["pt"][0, h // 2, w // 2, 0])))
        a = np.asarray(jax.device_get(holder["pt"]))
        b = np.asarray(jax.device_get(holder["p1"]))
        valid = ~np.isnan(a)
        tile_match = bool(np.allclose(a[valid], b[valid], atol=1e-5))

    def _ms(t):
        return round(1e3 * t, 2) if t else None

    return {
        "dp_efficiency": round(dp_eff, 3) if dp_eff else None,
        "dp_spread": round(dp_spread, 3) if dp_spread is not None else None,
        "tile_efficiency": round(tile_eff, 3) if tile_eff else None,
        "tile_spread": (round(tile_spread, 3)
                        if tile_spread is not None else None),
        "times_ms": {"train_single": _ms(t_single),
                     "train_dp": _ms(t_sharded),
                     "infer_single": _ms(t_inf_single),
                     "infer_tiled": _ms(t_inf_tiled)},
        "tile_parallel_matches": tile_match,
        "n_devices": n,
        "platform": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count when fewer real devices "
                         "exist (re-exec)")
    ap.add_argument("--force-cpu", action="store_true",
                    help="re-exec onto the virtual CPU mesh WITHOUT probing "
                         "jax.devices() first.  Required when the caller "
                         "holds the (single-client) TPU: a probe from this "
                         "process would block forever as a second TPU "
                         "client.  bench.py always passes this.")
    ap.add_argument("--inner", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if not args.inner:
        need_reexec = True
        if not args.force_cpu:
            # Safe to probe only when no other process holds the TPU
            # (standalone human invocation).
            import jax

            need_reexec = len(jax.devices()) < args.devices
        if need_reexec:
            import subprocess

            from windtpu.utils.hostcpu import virtual_cpu_env

            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            env = virtual_cpu_env(args.devices, repo)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner",
                 "--devices", str(args.devices)],
                cwd=repo, env=env)
            raise SystemExit(proc.returncode)
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from windtpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
