"""Time the train step's components in isolation at the bench config.

Decomposes one WGAN-GP step: generator forward, generator fwd+bwd, critic
forward, gradient-penalty double-grad, one full critic iteration, and the
metric suite — each as its own jitted program, synchronized by host
fetches (block_until_ready is unreliable on the axon platform).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.metrics import metrics as M
from windtpu.models.discriminator import Discriminator, init_discriminator
from windtpu.models.generator import Generator, init_generator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mcfg = ModelConfig(image_size=64, in_channels=10, noise_channels=20,
                   out_channels=2, sequence_length=6,
                   generator_features=128, discriminator_features=16,
                   compute_dtype="bfloat16")
T, I = mcfg.sequence_length, mcfg.image_size
rng = np.random.RandomState(0)
lr = jax.device_put(rng.standard_normal((B, T, I, I, 10)).astype(np.float32))
hr = jax.device_put(rng.standard_normal((B, T, I, I, 2)).astype(np.float32))
noise = jax.device_put(rng.standard_normal((B, T, I, I, 20)).astype(np.float32) * 0.1)

g_vars = init_generator(mcfg, jax.random.key(0))
d_vars = init_discriminator(mcfg, jax.random.key(1))
gen = Generator(mcfg)
disc = Discriminator(mcfg)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms")
    return dt


@jax.jit
def g_fwd(v, x, n):
    return gen.apply(v, x, n, train=False)


@jax.jit
def g_fwd_train(v, x, n):
    out, mut = gen.apply(v, x, n, train=True,
                         mutable=["batch_stats", "spectral_stats"])
    return out


@jax.jit
def g_fwd_bwd(v, x, n):
    def loss(p):
        out = gen.apply({**v, "params": p}, x, n, train=False)
        return jnp.mean(out**2)
    return jax.grad(loss)(v["params"])


@jax.jit
def d_fwd(v, x, y):
    return disc.apply(v, x, y, train=False)


@jax.jit
def d_fwd_bwd(v, x, y):
    def loss(p):
        return jnp.mean(disc.apply({**v, "params": p}, x, y, train=False))
    return jax.grad(loss)(v["params"])


@jax.jit
def gp_double_grad(v, x, y):
    def loss(p):
        def score(img):
            return jnp.sum(disc.apply({**v, "params": p}, x, img,
                                      train=False))
        g = jax.grad(score)(y)
        norms = jnp.sqrt(jnp.sum(g**2, axis=(1, 2, 3)))
        return jnp.mean((norms - 1.0) ** 2)
    return jax.grad(loss)(v["params"])


@jax.jit
def metric_suite(a, b):
    return (jnp.mean(M.angular_cosine_distance(a, b))
            + jnp.mean(M.log_spectral_distance(a, b))
            + jnp.mean(M.extreme_weighted_rmse(a, b))
            + jnp.mean(M.wind_speed_weighted_rmse(a, b))
            + jnp.mean(M.wind_speed_rmse(a, b)))


fake = g_fwd(g_vars, lr, noise)
timeit("G fwd (eval)", g_fwd, g_vars, lr, noise)
timeit("G fwd (train-mode)", g_fwd_train, g_vars, lr, noise)
timeit("G fwd+bwd", g_fwd_bwd, g_vars, lr, noise)
timeit("D fwd", d_fwd, d_vars, lr, hr)
timeit("D fwd+bwd (params)", d_fwd_bwd, d_vars, lr, hr)
timeit("GP double grad", gp_double_grad, d_vars, lr, hr)
timeit("metric suite", metric_suite, hr, fake)
