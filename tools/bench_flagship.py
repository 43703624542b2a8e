"""Flagship-shape train-step throughput: batch 8, T=24, 96px, 3 in / 20
noise / 2 out — the exact reference training tensor shape (api.py:22-28)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
from windtpu.api import flagship_config
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

cfg = flagship_config()
m = cfg.model
state = create_train_state(cfg)
step = make_train_step(cfg)
rng = np.random.RandomState(0)
lr = jax.device_put(rng.standard_normal((BATCH, m.sequence_length, m.image_size, m.image_size, m.in_channels)).astype(np.float32))
hr = jax.device_put(rng.standard_normal((BATCH, m.sequence_length, m.image_size, m.image_size, m.out_channels)).astype(np.float32))
key = jax.random.key(0)
t0 = time.perf_counter()
state, metrics = step(state, lr, hr, key)
print(f"compile+1: {time.perf_counter()-t0:.0f}s  g_loss={float(jax.device_get(metrics['g_loss'])):.4f}")
t0 = time.perf_counter()
for _ in range(10):
    state, metrics = step(state, lr, hr, key)
float(jax.device_get(metrics["g_loss"]))
dt = (time.perf_counter()-t0)/10
print(f"flagship train: {dt*1000:.1f} ms/step ({1/dt:.3f} steps/s) "
      f"at batch {BATCH}, T=24, 96px")
