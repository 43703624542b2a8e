"""The GAN bundle: generator + discriminator + noise generator + config.

Plays the role of the reference's ``GAN(keras.Model)`` wrapper
(gan/ganbase.py:8-140) in functional form: it owns the variable pytrees and
exposes train/eval/predict entry points that delegate to the jitted
programs.  ``save_weights``/``load_weights`` keep the reference's
"one directory per checkpoint" contract via Orbax.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from windtpu.core.config import GANConfig
from windtpu.data.noise import FlexibleNoiseGenerator
from windtpu.models.discriminator import Discriminator
from windtpu.models.generator import Generator
from windtpu.train import checkpoint as ckpt
from windtpu.train.state import GANTrainState, create_train_state
from windtpu.train.wgan_gp import make_eval_step, make_train_step


class WindDownscalingGAN:
    """Stateful convenience wrapper over the functional training core."""

    def __init__(self, cfg: GANConfig, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.state: GANTrainState = create_train_state(cfg, rng)
        m = cfg.model
        self.noise_generator = FlexibleNoiseGenerator(
            (cfg.train.batch_size, m.sequence_length, m.image_size,
             m.image_size, m.noise_channels),
            std=cfg.train.noise_std, random_seed=cfg.seed)
        self._train_step = None
        self._eval_step = None
        self._gen_fwd = None
        # Optional flow-conditional texture gate (models/texture_gate.py):
        # params dict, or None.  get_network() fills this from the bundled
        # asset; networks built directly stay ungated.
        self.texture_gate = None

    # -- forward -----------------------------------------------------------
    @property
    def generator_variables(self):
        return self.state.g_variables()

    def generate(self, low_res: jax.Array, noise: jax.Array) -> jax.Array:
        if self._gen_fwd is None:
            model = Generator(self.cfg.model)
            self._gen_fwd = jax.jit(
                lambda v, x, n: model.apply(v, x, n, train=False))
        return self._gen_fwd(self.state.g_variables(), low_res, noise)

    def discriminate(self, low_res: jax.Array, high_res: jax.Array):
        model = Discriminator(self.cfg.model)
        return model.apply(self.state.d_variables(), low_res, high_res,
                           train=False)

    # -- training ----------------------------------------------------------
    def train_step(self, low_res, high_res, rng):
        if self._train_step is None:
            self._train_step = make_train_step(self.cfg)
        self.state, metrics = self._train_step(
            self.state, low_res, high_res, rng)
        return metrics

    def test_step(self, low_res, high_res, rng):
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.cfg)
        return self._eval_step(self.state, low_res, high_res, rng)

    # -- checkpoint I/O (reference ganbase.py:132-140 contract) -------------
    def save_weights(self, filepath) -> str:
        return ckpt.save_checkpoint(filepath, self.state)

    def load_weights(self, filepath):
        path = filepath
        if str(filepath).endswith(".npz"):
            # Bundled single-file generator weights (inference-only).
            g_vars = ckpt.load_generator_npz(
                filepath, jax.device_get(self.state.g_variables()))
            self.state = self.state.replace(
                g_params=g_vars["params"],
                g_batch_stats=g_vars["batch_stats"],
                g_spectral=g_vars["spectral_stats"])
            return self
        if os.path.isdir(filepath) and not os.path.basename(
                str(filepath)).startswith("step_"):
            latest = ckpt.latest_checkpoint(filepath)
            if latest is None:
                raise FileNotFoundError(
                    f"no step_* checkpoints under {filepath}")
            path = latest
        self.state = ckpt.restore_checkpoint(path, self.state)
        return self
