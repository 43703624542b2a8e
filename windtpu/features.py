"""Perceptual feature encoder singleton.

Equivalent of the reference's features_encoding module
(autoencoder/features_encoding.py:6-19): build the autoencoder, load its
checkpoint from ``$CHECKPOINT_ROOT/autoencoder``, and expose the encoder as
the feature extractor for the reconstruction loss (gan/train.py:19-26).
Lazy: nothing loads until requested.  Resolution order:

1. newest ``$CHECKPOINT_ROOT/autoencoder`` orbax checkpoint (the
   reference's only mechanism);
2. the bundled ``assets/weights/autoencoder-synth.npz`` (trained by
   tools/train_shipped_autoencoder.py — the reference ships no
   autoencoder weights, so its perceptual loss cannot run out of the
   box; windtpu's can);
3. random init, with a warning.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from windtpu.models.autoencoder import AutoEncoder

_cache = {}


def checkpoint_path() -> Path:
    root = Path(os.getenv("CHECKPOINT_ROOT", "./checkpoints"))
    return root / "autoencoder"


def build_autoencoder(image_size: int = 96, time_steps: int = 24,
                      latent_dimension: int = 96):
    model = AutoEncoder(image_size=image_size, time_steps=time_steps,
                        latent_dimension=latent_dimension)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, time_steps, image_size, image_size, 2)), train=False)
    return model, variables


def get_encoder_fn(image_size: int = 96, time_steps: int = 24,
                   latent_dimension: int = 96) -> Callable:
    """Returns f(x: (B,T,I,I,2)) -> (B,T,latent) using the latest
    autoencoder checkpoint if present."""
    key = (image_size, time_steps, latent_dimension)
    if key in _cache:
        return _cache[key]
    model, variables = build_autoencoder(*key)
    ckpt_dir = checkpoint_path()
    loaded = False
    if ckpt_dir.is_dir():
        import orbax.checkpoint as ocp

        steps = sorted(d for d in os.listdir(ckpt_dir)
                       if re.fullmatch(r"step_\d+", d))
        if steps:
            variables = ocp.StandardCheckpointer().restore(
                str((ckpt_dir / steps[-1]).resolve()), variables)
            loaded = True
    if not loaded:
        bundled = (Path(__file__).parent / "assets" / "weights"
                   / "autoencoder-synth.npz")
        if bundled.exists():
            try:
                from windtpu.train.checkpoint import load_generator_npz

                variables = load_generator_npz(
                    bundled, jax.device_get(variables))
                loaded = True
            except ValueError:
                # Bundled weights were trained at the flagship geometry;
                # other image_size/latent shapes fall through to random.
                pass
            except Exception as e:  # corrupt/unreadable file: degrade
                print(f"warning: bundled autoencoder weights unreadable "
                      f"({e!r}); falling back")
    if not loaded:
        print(f"warning: no autoencoder checkpoint at {ckpt_dir} and no "
              "matching bundled weights; encoder uses random "
              "initialization")

    def encode(x):
        return model.apply(variables, x, train=False,
                           method=AutoEncoder.encode)

    _cache[key] = encode
    return encode
