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

  {"dp_efficiency": t_single/t_sharded at the same global batch,
   "tile_efficiency": t_single/t_tiled for the same domain,
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


def _measure(fn, sync, repeats=5):
    fn()          # compile
    sync()
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        sync()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


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

    t_single = _measure(run_single,
                        lambda: float(jax.device_get(
                            holder["m1"]["g_loss"])))

    dp_eff = None
    if n > 1:
        mesh = make_mesh({"data": n})
        holder["sn"] = replicate(mesh, create_train_state(cfg))
        lrn, hrn = shard_batch(mesh, (lr_np, hr_np))
        keyn = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))

        def run_sharded():
            holder["sn"], holder["mn"] = step_fn(holder["sn"], lrn, hrn,
                                                 keyn)

        t_sharded = _measure(run_sharded,
                             lambda: float(jax.device_get(
                                 holder["mn"]["g_loss"])))
        dp_eff = t_single / t_sharded

    # -- tile-parallel inference -------------------------------------------
    icfg = InferenceConfig(sequence_length=2, image_size=24,
                           noise_channels=2, group_size=4,
                           overlap_factor=0.1)
    t, h, w = 2, 96, 128
    plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                       icfg.overlap_factor)
    g_vars = init_generator(m, jax.random.key(0))
    field = jnp.asarray(rng.standard_normal((t, h, w, 3)).astype(np.float32))
    pred_single = make_tiled_predictor(m, icfg, plan)

    def run_ps():
        holder["p1"], _ = pred_single(g_vars, field, jax.random.key(1))

    t_inf_single = _measure(
        run_ps, lambda: float(jax.device_get(
            holder["p1"][0, h // 2, w // 2, 0])))

    tile_eff = None
    tile_match = None
    if n > 1:
        mesh = make_mesh({"data": n})
        g_rep = replicate(mesh, g_vars)
        pred_tiled = make_tile_parallel_predictor(m, icfg, plan, mesh, "data")

        def run_pt():
            holder["pt"], _ = pred_tiled(g_rep, field, jax.random.key(1))

        t_inf_tiled = _measure(
            run_pt, lambda: float(jax.device_get(
                holder["pt"][0, h // 2, w // 2, 0])))
        tile_eff = t_inf_single / t_inf_tiled
        a = np.asarray(jax.device_get(holder["pt"]))
        b = np.asarray(jax.device_get(holder["p1"]))
        valid = ~np.isnan(a)
        tile_match = bool(np.allclose(a[valid], b[valid], atol=1e-5))

    return {
        "dp_efficiency": round(dp_eff, 3) if dp_eff else None,
        "tile_efficiency": round(tile_eff, 3) if tile_eff else None,
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
