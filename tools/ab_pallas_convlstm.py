"""A/B the fused Pallas ConvLSTM on the real device.

Times (a) the generator inference forward and (b) one full WGAN-GP train
step with the fused recurrence on vs off, at the primary bench shape
(batch 64, 64px, T=6) or the flagship shape (batch 2, 96px, T=24):

    WINDTPU_FUSED_CONVLSTM=0 python tools/ab_pallas_convlstm.py primary
    WINDTPU_FUSED_CONVLSTM=1 python tools/ab_pallas_convlstm.py primary

One variant per process so timings see a quiet chip.  The interesting
asymmetry: inference runs the fused forward only, while training pays the
custom_vjp's scan-replay backward (ops/pallas_convlstm.py:_make_fused) —
the train-step row shows whether that trade nets out.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax

from windtpu.utils.compilecache import enable_persistent_cache
enable_persistent_cache()

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.models.generator import Generator
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

shape = sys.argv[1] if len(sys.argv) > 1 else "primary"
tag = f"fused={os.environ.get('WINDTPU_FUSED_CONVLSTM', 'auto')}"

if shape == "primary":
    batch, px, t = 64, 64, 6
else:
    batch, px, t = 2, 96, 24
model = ModelConfig(image_size=px, in_channels=10, noise_channels=20,
                    out_channels=2, sequence_length=t,
                    generator_features=128, discriminator_features=16,
                    compute_dtype="bfloat16")
rng = np.random.RandomState(0)
lr = jax.device_put(rng.standard_normal(
    (batch, t, px, px, model.in_channels)).astype(np.float32))
noise = jax.device_put(rng.standard_normal(
    (batch, t, px, px, model.noise_channels)).astype(np.float32))

gen = Generator(model)
g_vars = gen.init(jax.random.key(0), lr, noise, train=False)
fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
def sync(x):
    # block_until_ready does not synchronize under the axon remote
    # platform; a 1-element device_get does (same trick as roofline.py).
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


sync(fwd(g_vars, lr, noise))
for reps in (10, 10):
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fwd(g_vars, lr, noise)
    sync(y)
    dt = (time.perf_counter() - t0) / reps
    print(f"{shape} {tag}: G fwd {dt*1000:.2f} ms", flush=True)

cfg = GANConfig(model=model, train=TrainConfig(batch_size=batch, n_critic=3))
state = create_train_state(cfg)
step = make_train_step(cfg)
hr = jax.device_put(rng.standard_normal(
    (batch, t, px, px, model.out_channels)).astype(np.float32))
key = jax.random.key(0)
t0 = time.perf_counter()
state, metrics = step(state, lr, hr, key)
float(jax.device_get(metrics["g_loss"]))
print(f"{shape} {tag}: step compile+1 {time.perf_counter()-t0:.0f}s",
      flush=True)
for reps in (5, 5):
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, lr, hr, key)
    float(jax.device_get(metrics["g_loss"]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{shape} {tag}: step {dt*1000:.1f} ms ({1/dt:.3f} steps/s)",
          flush=True)
