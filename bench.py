"""Benchmark: WGAN-GP training throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload = the BASELINE.json north-star training config scaled to one chip:
64x64 patches, T=6, the reference's 10 input variables / 20 noise channels
/ 2 outputs, batch 64, n_critic=3, with the in-step metric suite enabled
(the reference recomputes metrics every step too, ganbase.py:63-72).

``vs_baseline`` compares against the reference's TF-CPU equivalent measured
once by tools/bench_baseline_tf.py into BASELINE_MEASURED.json (the
reference publishes no numbers — BASELINE.md).  A secondary inference
figure (downscaled km^2/s at 1 km on the flagship 96px generator) is
included as an extra key.
"""

import json
import os
import time

import numpy as np


def bench_train(steps: int = 10, warmup: int = 3):
    import jax

    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    cfg = GANConfig(
        model=ModelConfig(image_size=64, in_channels=10, noise_channels=20,
                          out_channels=2, sequence_length=6,
                          generator_features=128, discriminator_features=16,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=64, n_critic=3, compute_metrics=True),
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
    for _ in range(warmup):
        state, metrics = step_fn(state, lr, hr, key)
    # NOTE: jax.block_until_ready is unreliable on the axon remote platform;
    # a host fetch of a value at the end of the dependency chain is the only
    # trustworthy synchronization (each step consumes the previous state, so
    # fetching the last metrics waits for every step).
    float(jax.device_get(metrics["g_loss"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, lr, hr, key)
    float(jax.device_get(metrics["g_loss"]))
    dt = time.perf_counter() - t0
    return steps / dt


def bench_inference():
    """Downscaled km^2/s: flagship generator over a 24h, ~750x550 km domain
    at 1 km (tiled, stitched on device)."""
    import jax

    from windtpu.api import flagship_config
    from windtpu.core.config import InferenceConfig
    from windtpu.infer.engine import make_tiled_predictor
    from windtpu.infer.tiling import plan_tiling
    from windtpu.models.generator import init_generator

    mcfg = flagship_config().model
    icfg = InferenceConfig(overlap_factor=0.05)
    t, h, w = 24, 546, 756  # one day, ~COSMO-1 Switzerland-sized domain
    plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                       icfg.overlap_factor)
    predictor = make_tiled_predictor(mcfg, icfg, plan)
    g_vars = init_generator(mcfg, jax.random.key(0))
    field = jax.device_put(np.random.RandomState(0).standard_normal(
        (t, h, w, 3)).astype(np.float32))
    pred, _ = predictor(g_vars, field, jax.random.key(1))  # compile + run
    float(jax.device_get(pred[0, h // 2, w // 2, 0]))       # real sync
    best = None
    for i in range(3):
        t0 = time.perf_counter()
        pred, _ = predictor(g_vars, field, jax.random.key(2 + i))
        float(jax.device_get(pred[0, h // 2, w // 2, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return h * w / best          # km^2 of domain downscaled per second (24h)


def main():
    steps_per_sec = bench_train()
    try:
        km2_per_sec = bench_inference()
    except Exception:
        km2_per_sec = None

    baseline = None
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f).get("tf_cpu_train_steps_per_sec")
    vs = (steps_per_sec / baseline) if baseline else None

    print(json.dumps({
        "metric": "wgan_gp_train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s (batch 64, 64px, T=6, n_critic=3)",
        "vs_baseline": round(vs, 2) if vs else None,
        "inference_km2_per_sec": round(km2_per_sec, 1) if km2_per_sec else None,
    }))


if __name__ == "__main__":
    main()
