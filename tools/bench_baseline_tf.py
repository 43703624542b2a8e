"""Measure the reference's TF-CPU training throughput (the baseline).

The reference publishes no performance numbers (BASELINE.md), so this
script reconstructs its training workload in TF2/Keras — same topology
(recurrent U-Net generator with ConvLSTM2D, two-branch critic pyramid,
spectral-normalized convs) and the same per-step work (n_critic=3 critic
updates with eps-interpolated gradient penalty + instance noise, one
generator update; reference gan/ganbase.py:21-61) — at the bench config
(64x64 patches, T=6, 10 inputs / 20 noise channels / 2 outputs, batch 64)
and times steps on CPU, which is what the reference's pinned TF-2.4 CPU
stack targets.

Run once: ``python tools/bench_baseline_tf.py`` -> writes
BASELINE_MEASURED.json consumed by bench.py for ``vs_baseline``.

This is an independent re-implementation for measurement (tfa is not
installed; SpectralNormalization is a minimal power-iteration wrapper with
tfa semantics).  Metric recompute is OMITTED (conservative: makes the
baseline faster than the real reference step).
"""

import json
import os
import sys
import time

import numpy as np
import tensorflow as tf

kl = tf.keras.layers

import argparse

IMG = 64
T = 6
C_IN = 10
C_NOISE = 20
C_OUT = 2
BATCH = 64  # overridden by --batch; steps/s extrapolates linearly to 64
FEAT = 128
DFEAT = 16
N_CRITIC = 3
GAMMA = 100.0
NOISE_STD = 0.1


class SpectralNorm(kl.Wrapper):
    """tfa-style 1-step power iteration on the wrapped layer's kernel."""

    def build(self, input_shape):
        super().build(input_shape)
        if not self.layer.built:
            self.layer.build(input_shape)
        self.w = self.layer.kernel
        out = int(self.w.shape[-1])
        self.u = self.add_weight(shape=(1, out), trainable=False, name="sn_u",
                                 initializer="random_normal")

    def call(self, x, training=None):
        if training:
            w = tf.reshape(self.w, [-1, self.w.shape[-1]])
            v = tf.math.l2_normalize(tf.matmul(self.u, tf.transpose(w)))
            u = tf.math.l2_normalize(tf.matmul(v, w))
            sigma = tf.matmul(tf.matmul(v, w), tf.transpose(u))
            self.u.assign(u)
            self.w.assign(self.w / sigma)
        return self.layer(x)

    def compute_output_shape(self, input_shape):
        return self.layer.compute_output_shape(input_shape)


def lrelu():
    return kl.LeakyReLU(0.2)


def snconv(f, k, s=1, pad="valid"):
    return kl.TimeDistributed(
        SpectralNorm(kl.Conv2D(f, k, strides=s, padding=pad,
                               activation=lrelu())))


def make_generator():
    img = kl.Input(shape=(T, IMG, IMG, C_IN))
    noi = kl.Input(shape=(T, IMG, IMG, C_NOISE))
    x = kl.Concatenate()([img, noi])
    x = kl.TimeDistributed(kl.ZeroPadding2D(3))(x)
    x = snconv(FEAT, 8, 2)(x)
    x = kl.BatchNormalization()(x)
    res2 = x
    x = kl.TimeDistributed(kl.ZeroPadding2D(1))(x)
    x = snconv(FEAT, 4, 2)(x)
    x = kl.BatchNormalization()(x)
    res4 = x
    x = kl.ConvLSTM2D(FEAT, 3, padding="same", return_sequences=True)(x)
    x = snconv(FEAT // 2, 3, 1, "same")(x)
    x = kl.BatchNormalization()(x)
    x = kl.Concatenate()([x, res4])
    x = kl.TimeDistributed(
        SpectralNorm(kl.Conv2DTranspose(FEAT // 4, 2, strides=2,
                                        activation=lrelu())))(x)
    x = kl.BatchNormalization()(x)
    x = kl.Concatenate()([x, res2])
    x = kl.TimeDistributed(kl.UpSampling2D(2, interpolation="bilinear"))(x)
    x = kl.TimeDistributed(kl.Conv2DTranspose(FEAT // 8, 5, padding="same",
                                              activation=lrelu()))(x)
    x = kl.BatchNormalization()(x)
    x = kl.TimeDistributed(kl.Conv2D(C_OUT, 3, padding="same"))(x)
    return tf.keras.Model([img, noi], x)


def make_discriminator():
    lo = kl.Input(shape=(T, IMG, IMG, C_IN))
    hi = kl.Input(shape=(T, IMG, IMG, C_OUT))
    hr = kl.ConvLSTM2D(C_OUT, 3, padding="same", return_sequences=True)(hi)
    hr = snconv(DFEAT, 3, 1, "same")(hr)
    hr = kl.LayerNormalization()(hr)
    mix = kl.Concatenate()([lo, hi])
    mix = kl.ConvLSTM2D(DFEAT, 3, padding="same", return_sequences=True)(mix)
    mix = snconv(DFEAT, 3, 1, "same")(mix)
    mix = kl.LayerNormalization()(mix)
    x = kl.Concatenate()([hr, mix])
    size = IMG
    while size >= 16:
        x = kl.TimeDistributed(kl.ZeroPadding2D())(x)
        x = snconv(int(x.shape[-1]) * 2, 7, 3)(x)
        x = kl.LayerNormalization()(x)
        size = (size + 2 - 7) // 3 + 1
    while size >= 4:
        x = kl.TimeDistributed(kl.ZeroPadding2D())(x)
        x = snconv(int(x.shape[-1]) * 2, 7, 3)(x)
        x = kl.LayerNormalization()(x)
        size = (size + 2 - 7) // 3 + 1
    while size > 2:
        x = snconv(int(x.shape[-1]) * 2, 3, 2)(x)
        x = kl.LayerNormalization()(x)
        size = (size - 3) // 2 + 1
    x = kl.TimeDistributed(kl.Flatten())(x)
    x = kl.TimeDistributed(kl.Dense(1))(x)
    x = kl.GlobalAveragePooling1D()(x)
    return tf.keras.Model([lo, hi], x)


def main():
    global BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8,
                    help="measured batch; result scaled to batch 64 "
                         "(CPU is throughput-bound, cost ~linear in batch)")
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    BATCH = args.batch
    if args.threads:
        tf.config.threading.set_intra_op_parallelism_threads(args.threads)
        tf.config.threading.set_inter_op_parallelism_threads(2)
    gen = make_generator()
    disc = make_discriminator()
    g_opt = tf.keras.optimizers.Adam(1e-4, beta_1=0.5, beta_2=0.9,
                                     epsilon=0.1)
    d_opt = tf.keras.optimizers.Adam(4e-4, beta_1=0.5, beta_2=0.9,
                                     epsilon=0.1)

    @tf.function
    def train_step(low_res, high_res):
        for _ in range(N_CRITIC):
            noise = tf.random.normal((BATCH, T, IMG, IMG, C_NOISE),
                                     stddev=NOISE_STD)
            fake = gen([low_res, noise], training=True)
            eps = tf.random.uniform((BATCH, 1, 1, 1, 1))
            mixed = eps * high_res + (1 - eps) * fake
            with tf.GradientTape() as reg_tape:
                reg_tape.watch(mixed)
                out = disc([low_res, mixed], training=True)
            g_img = reg_tape.gradient(out, mixed)
            norms = tf.sqrt(tf.reduce_sum(g_img**2, axis=[1, 2, 3]))
            penalty = GAMMA * tf.reduce_mean((norms - 1.0) ** 2)
            with tf.GradientTape() as tape:
                rs = disc([low_res, high_res + tf.random.normal(
                    tf.shape(high_res), stddev=NOISE_STD)], training=True)
                fs = disc([low_res, fake + tf.random.normal(
                    tf.shape(fake), stddev=NOISE_STD)], training=True)
                d_loss = -(tf.reduce_mean(rs) - tf.reduce_mean(fs)) + penalty
            grads = tape.gradient(d_loss, disc.trainable_weights)
            d_opt.apply_gradients(zip(grads, disc.trainable_weights))
        with tf.GradientTape() as tape:
            noise = tf.random.normal((BATCH, T, IMG, IMG, C_NOISE),
                                     stddev=NOISE_STD)
            fake = gen([low_res, noise], training=True)
            g_loss = -tf.reduce_mean(disc([low_res, fake], training=True))
        grads = tape.gradient(g_loss, gen.trainable_weights)
        g_opt.apply_gradients(zip(grads, gen.trainable_weights))
        return d_loss, g_loss

    rng = np.random.RandomState(0)
    lr = tf.constant(rng.standard_normal(
        (BATCH, T, IMG, IMG, C_IN)).astype(np.float32))
    hr = tf.constant(rng.standard_normal(
        (BATCH, T, IMG, IMG, C_OUT)).astype(np.float32))

    print("tracing + first step...")
    t0 = time.perf_counter()
    train_step(lr, hr)
    print(f"first step (incl. trace): {time.perf_counter() - t0:.1f}s")
    steps = args.steps
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step(lr, hr)
    dt = time.perf_counter() - t0
    sps = steps / dt
    sps64 = sps * BATCH / 64.0
    print(f"{steps} steps in {dt:.1f}s -> {sps:.4f} steps/s at batch "
          f"{BATCH} (~{sps64:.4f} at batch 64)")
    out = {
        "tf_cpu_train_steps_per_sec": sps64,
        "measured_batch": BATCH,
        "measured_steps_per_sec": sps,
        "config": f"{IMG}px, T={T}, n_critic={N_CRITIC}, "
                  f"{C_IN} inputs; scaled linearly to batch 64",
        "tf_version": tf.__version__,
        "note": "reference-equivalent workload re-implemented in TF2 Keras "
                "(tfa absent); metric recompute omitted (conservative)",
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "BASELINE_MEASURED.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote BASELINE_MEASURED.json")


if __name__ == "__main__":
    main()
