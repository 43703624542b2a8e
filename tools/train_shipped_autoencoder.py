"""Train the bundled perceptual autoencoder on synthetic terrain-wind data.

The reference's reconstruction loss needs an autoencoder checkpoint loaded
from ``$CHECKPOINT_ROOT/autoencoder`` (features_encoding.py:6-19) — and the
reference does NOT ship one, so its perceptual-loss path cannot run out of
the box.  windtpu bundles a small one: trained here on the same synthetic
high-res wind fields as the shipped generator
(tools/train_shipped_ckpt.py's data model), with the reference's
WeightedVectorLoss (0.5·RMSE + 0.5·opposite-cosine,
autoencoder/autoencoder.py:55-65).

windtpu.features.get_encoder_fn resolves, in order: the newest
``$CHECKPOINT_ROOT/autoencoder`` orbax checkpoint, then this bundled npz,
then random init with a warning (the reference's only behavior).

Usage: python tools/train_shipped_autoencoder.py [--steps 1500] [--batch 8]
Writes windtpu/assets/weights/autoencoder-synth.npz and prints the
reconstruction loss trajectory plus a random-init comparison.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_shipped_ckpt import make_domain, synth_day  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--seq", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default=os.path.join(
        REPO, "windtpu", "assets", "weights", "autoencoder-synth.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from windtpu.models.autoencoder import AutoEncoder, weighted_vector_loss
    from windtpu.train.checkpoint import save_generator_npz

    model = AutoEncoder(image_size=args.patch, time_steps=args.seq,
                        latent_dimension=96)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, args.seq, args.patch, args.patch, 2)), train=False)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    state_keys = tuple(state)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, batch):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, **state}, batch, train=True,
                mutable=list(state_keys))
            return (jnp.mean(weighted_vector_loss(batch, out)),
                    {k: mut[k] for k in state_keys})

        (loss, state_new), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), state_new, opt_state,
                loss)

    @jax.jit
    def eval_loss(params, state, batch):
        out = model.apply({"params": params, **state}, batch, train=False)
        return jnp.mean(weighted_vector_loss(batch, out))

    rng = np.random.RandomState(7)
    print("synthesizing terrain domains...", flush=True)
    domains = [make_domain(rng) for _ in range(3)]
    day_cache = []

    def next_batch():
        if not day_cache or rng.rand() < 0.05:
            dem, slope, aspect = domains[rng.randint(len(domains))]
            day_cache.append(synth_day(rng, dem, slope, aspect, t=args.seq))
            if len(day_cache) > 6:
                day_cache.pop(0)
        _, high = day_cache[rng.randint(len(day_cache))]
        ny, nx = high.shape[1:3]
        crops = []
        for _ in range(args.batch):
            y0 = rng.randint(ny - args.patch + 1)
            x0 = rng.randint(nx - args.patch + 1)
            crops.append(high[:, y0:y0 + args.patch, x0:x0 + args.patch])
        batch = np.stack(crops)
        # z-score per sample+channel: the GAN feeds the encoder
        # NaiveDecoder-normalized fields (data/decoders.py), so the
        # perceptual space must be learned at that scale.
        mean = batch.mean(axis=(1, 2, 3), keepdims=True)
        std = batch.std(axis=(1, 2, 3), keepdims=True) + 1e-6
        return jnp.asarray((batch - mean) / std)

    eval_batch = next_batch()
    init_loss = float(eval_loss(params, state, eval_batch))
    t0 = time.time()
    for i in range(args.steps):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              next_batch())
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    final_loss = float(eval_loss(params, state, eval_batch))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_generator_npz(args.out, jax.device_get(
        {"params": params, **state}))
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB)")
    print(f"eval weighted-vector loss: random-init={init_loss:.4f} "
          f"trained={final_loss:.4f} "
          f"(ratio {final_loss / max(init_loss, 1e-9):.3f})")


if __name__ == "__main__":
    main()
