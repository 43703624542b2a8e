"""A/B the critic dual-branch ConvLSTM fusion on the real device.

Times one full WGAN-GP train step with ModelConfig.critic_fused_branches
on vs off, at the primary bench shape (batch 64, 64px, T=6) or the
flagship shape (batch 2, 96px, T=24) — `python tools/ab_fused_branches.py
[primary|flagship] [on|off]`.  One variant per process so the timings see
a quiet chip and a fresh compile cache entry.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

shape = sys.argv[1] if len(sys.argv) > 1 else "primary"
fused = (sys.argv[2] if len(sys.argv) > 2 else "on") == "on"

if shape == "primary":
    batch, px, t = 64, 64, 6
else:
    batch, px, t = 2, 96, 24
model = ModelConfig(image_size=px, in_channels=10, noise_channels=20,
                    out_channels=2, sequence_length=t,
                    generator_features=128, discriminator_features=16,
                    compute_dtype="bfloat16",
                    critic_fused_branches=fused)
cfg = GANConfig(model=model, train=TrainConfig(batch_size=batch, n_critic=3))
state = create_train_state(cfg)
step = make_train_step(cfg)
rng = np.random.RandomState(0)
lr = jax.device_put(rng.standard_normal(
    (batch, t, px, px, model.in_channels)).astype(np.float32))
hr = jax.device_put(rng.standard_normal(
    (batch, t, px, px, model.out_channels)).astype(np.float32))
key = jax.random.key(0)
t0 = time.perf_counter()
state, metrics = step(state, lr, hr, key)
float(jax.device_get(metrics["g_loss"]))
print(f"{shape} fused={fused}: compile+1 {time.perf_counter()-t0:.0f}s")
for reps in (5, 5):
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, lr, hr, key)
    float(jax.device_get(metrics["g_loss"]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{shape} fused={fused}: {dt*1000:.1f} ms/step "
          f"({1/dt:.3f} steps/s)")
