"""Ablate the generator entry path: is a Pallas fused conv+noise kernel
worth it, or does XLA already fuse the concat(img, noise) -> conv stem?

BASELINE.json's north star names "Pallas-fused conv+noise-injection
kernels".  This tool measures, at the flagship inference shape, the three
candidate stems plus the full generator forward around them:

  concat   x = concat(img, noise); conv8x8s2(x)         (production path)
  split    conv_img(img) + conv_noise(noise) + bias     (no concat buffer)
  inline   same as concat but noise sampled inside the jit (what the tiled
           inference engine actually does — noise never crosses the host
           boundary but is still materialized in HBM)

and reports the optimized-HLO op mix (does a `concatenate` survive into
the compiled program? how many convolutions does the stem lower to?), so
the README can document the fusion decision with numbers instead of
folklore.

Usage: python tools/ablate_noise_fusion.py [batch] (default 16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.api import flagship_config
from windtpu.models.generator import Generator, init_generator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
mcfg = flagship_config().model
T, I, CIN, CN = (mcfg.sequence_length, mcfg.image_size, mcfg.in_channels,
                 mcfg.noise_channels)
F = min((CIN + CN) * 8, mcfg.generator_features)
DT = jnp.dtype(mcfg.compute_dtype)

rng = np.random.RandomState(0)
img = jax.device_put(rng.standard_normal(
    (B * T, I, I, CIN)).astype(np.float32))
noise_host = rng.standard_normal((B * T, I, I, CN)).astype(np.float32) * 0.1
noise = jax.device_put(noise_host)
kernel = jax.device_put(
    (rng.standard_normal((8, 8, CIN + CN, F)) * 0.05).astype(np.float32))
bias = jax.device_put(np.zeros(F, np.float32))
PAD = [(3, 3), (3, 3)]


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x.astype(DT), k.astype(DT), window_strides=(2, 2), padding=PAD,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def stem_concat(img, noise, kernel, bias):
    x = jnp.concatenate([img, noise], axis=-1)
    return jax.nn.leaky_relu(conv(x, kernel) + bias.astype(DT), 0.2)


@jax.jit
def stem_split(img, noise, kernel, bias):
    y = conv(img, kernel[:, :, :CIN]) + conv(noise, kernel[:, :, CIN:])
    return jax.nn.leaky_relu(y + bias.astype(DT), 0.2)


@jax.jit
def stem_inline(img, key, kernel, bias):
    noise = 0.1 * jax.random.normal(key, (B * T, I, I, CN))
    x = jnp.concatenate([img, noise], axis=-1)
    return jax.nn.leaky_relu(conv(x, kernel) + bias.astype(DT), 0.2)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>14}: {dt:7.3f} ms")
    return dt


def hlo_mix(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = {}
    for needle in ("convolution", "concatenate", "fusion", "rng"):
        ops[needle] = txt.count(f" {needle}(") + txt.count(f" {needle}.")
    return ops


key = jax.random.key(0)
print(f"stem ablation @ (B*T={B * T}, {I}px, {CIN}+{CN}ch -> {F}), {DT}")
t_concat = timeit("concat", stem_concat, img, noise, kernel, bias)
t_split = timeit("split", stem_split, img, noise, kernel, bias)
t_inline = timeit("inline-prng", stem_inline, img, key, kernel, bias)
for name, fn, args in [
        ("concat", stem_concat, (img, noise, kernel, bias)),
        ("split", stem_split, (img, noise, kernel, bias)),
        ("inline-prng", stem_inline, (img, key, kernel, bias))]:
    print(f"{name:>14} HLO: {hlo_mix(fn, *args)}")

# Full generator forward for scale: what fraction is the stem at all?
g_vars = init_generator(mcfg, jax.random.key(1), batch_size=B)
gen = Generator(mcfg)
img5 = img.reshape(B, T, I, I, CIN)
noise5 = noise.reshape(B, T, I, I, CN)
fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
t_full = timeit("generator fwd", fwd, g_vars, img5, noise5, iters=5)
print(f"stem share of forward: {t_concat / t_full:.1%} "
      f"(concat-vs-split delta {t_concat - t_split:+.3f} ms "
      f"= {(t_concat - t_split) / t_full:+.2%} of the forward)")
