"""Quality gate for the bundled generator checkpoint.

The reference ships weights-55.ckpt so its CLI works out of the box
(reference api.py:21,85); windtpu ships generator-synth.npz, trained on
the synthetic terrain-wind pipeline (tools/train_shipped_ckpt.py).  These
tests are the regression gate for that bundle: the file must load into
the flagship generator tree exactly, and its output on held-out terrain
(a seed the trainer never saw) must restore fine-scale structure — not
pass the blur through (under-sharpening) and not emit random-init static
(over-sharpening).  Without this, a re-export that silently breaks the
bundle would only be caught by eyeballing CLI output.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

BUNDLED = os.path.join(REPO, "windtpu", "assets", "weights",
                       "generator-synth.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BUNDLED), reason="bundled weights not present")


def _flagship_generator(t=6, batch=1):
    """Flagship-geometry generator at a cheap batch/sequence length.

    The weights are batch- and T-independent (time is a scan axis), so
    loading the bundle into a (batch=1, T=6) instance is exact."""
    from windtpu.core.config import ModelConfig
    from windtpu.models.generator import Generator

    cfg = ModelConfig(image_size=96, in_channels=3, noise_channels=20,
                      out_channels=2, sequence_length=t,
                      compute_dtype="bfloat16")
    gen = Generator(cfg)
    x = jnp.zeros((batch, t, 96, 96, 3))
    n = jnp.zeros((batch, t, 96, 96, 20))
    template = gen.init(jax.random.key(0), x, n, train=False)
    return gen, template


def test_bundle_matches_generator_tree():
    from windtpu.train.checkpoint import load_generator_npz

    _, template = _flagship_generator()
    loaded = load_generator_npz(BUNDLED, template)  # raises on mismatch
    # Loaded leaves must actually differ from the random init (a bundle
    # of zeros or a re-init would slip through the shape check).
    got = jax.tree_util.tree_leaves(loaded["params"])
    init = jax.tree_util.tree_leaves(template["params"])
    assert any(not np.allclose(a, b) for a, b in zip(got, init))


def test_bundle_sharpens_heldout_terrain():
    from train_shipped_ckpt import highpass_energy, make_domain, synth_day

    from windtpu.train.checkpoint import load_generator_npz

    gen, template = _flagship_generator()
    variables = load_generator_npz(BUNDLED, template)

    rng = np.random.RandomState(31337)  # never used by the trainer
    dem, slope, aspect = make_domain(rng, ny=192, nx=192)
    low, high = synth_day(rng, dem, slope, aspect, t=6)
    y0 = x0 = 48  # interior crop, away from the periodic-blur seam
    low_b = low[None, :, y0:y0 + 96, x0:x0 + 96, :]
    high_b = high[None, :, y0:y0 + 96, x0:x0 + 96, :]

    noise = 0.1 * jax.random.normal(jax.random.key(7),
                                    (1, 6, 96, 96, 20))
    fake = np.asarray(gen.apply(variables, jnp.asarray(low_b), noise,
                                train=False), np.float32)
    assert fake.shape == (1, 6, 96, 96, 2)
    assert np.isfinite(fake).all()

    hp_truth = highpass_energy(high_b[0, ..., 0])
    hp_input = highpass_energy(low_b[0, ..., 0])
    hp_fake = highpass_energy(fake[0, ..., 0])
    # The input is blurred, so its high-pass energy is a small fraction of
    # the truth's; the bundle must restore a solid share of it (but not
    # overshoot into static — random init fails the upper bound).
    assert hp_fake > 3.0 * hp_input, (hp_fake, hp_input, hp_truth)
    assert 0.25 * hp_truth < hp_fake < 4.0 * hp_truth, (hp_fake, hp_truth)

    # Large-scale fidelity backstop.  The blur is close to the
    # RMSE-optimal predictor (a GAN deliberately trades pointwise RMSE
    # for spectral realism — the shipped bundle lands around 2.7x the
    # blur's RMSE on this single held-out domain), so this bound only
    # catches breakdowns: output decorrelated from the synoptic flow.
    rmse_fake = float(np.sqrt(np.mean((fake - high_b) ** 2)))
    rmse_blur = float(np.sqrt(np.mean((low_b[..., :2] - high_b) ** 2)))
    assert rmse_fake < 4.0 * rmse_blur, (rmse_fake, rmse_blur)
