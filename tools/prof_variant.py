import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, numpy as np, jax
from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

variant = sys.argv[1]
model = ModelConfig(image_size=64, in_channels=10, noise_channels=20,
                    out_channels=2, sequence_length=6,
                    generator_features=128, discriminator_features=16,
                    compute_dtype="bfloat16")
train_cfgs = {
    "metrics": TrainConfig(batch_size=64, n_critic=3),
    "d_only": TrainConfig(batch_size=64, n_critic=3),
    "nometrics": TrainConfig(batch_size=64, n_critic=3, compute_metrics=False),
    "noremat": TrainConfig(batch_size=64, n_critic=3, compute_metrics=False, remat=False),
    "f32": TrainConfig(batch_size=64, n_critic=3, compute_metrics=False),
}
if variant == "f32":
    import dataclasses
    model = dataclasses.replace(model, compute_dtype="float32")
cfg = GANConfig(model=model, train=train_cfgs[variant])
state = create_train_state(cfg)
step = make_train_step(cfg)
rng = np.random.RandomState(0)
m = cfg.model
lr = jax.device_put(rng.standard_normal((64, m.sequence_length, m.image_size, m.image_size, m.in_channels)).astype(np.float32))
hr = jax.device_put(rng.standard_normal((64, m.sequence_length, m.image_size, m.image_size, m.out_channels)).astype(np.float32))
key = jax.random.key(0)
t0 = time.perf_counter()
state, metrics = step(state, lr, hr, key)
float(jax.device_get(metrics["g_loss"]))
print(f"{variant}: compile+1 {time.perf_counter()-t0:.0f}s")
t0 = time.perf_counter()
for _ in range(5):
    state, metrics = step(state, lr, hr, key)
float(jax.device_get(metrics["g_loss"]))
dt = (time.perf_counter()-t0)/5
print(f"{variant}: {dt*1000:.1f} ms/step ({1/dt:.3f} steps/s)")
