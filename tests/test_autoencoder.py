"""Autoencoder (perceptual features) and reconstruction loss."""

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.models.autoencoder import AutoEncoder, weighted_vector_loss
from windtpu.models.autoencoder import _encoder_sizes


def test_encoder_pyramid_96():
    # Reference pyramid (autoencoder.py:26-30): 96 -> 32 -> 10 -> 3.
    stages, final = _encoder_sizes(96)
    assert [o for _, o in stages] == [32, 10, 3]
    assert final == 3


def test_autoencoder_roundtrip_shapes():
    model = AutoEncoder(image_size=48, time_steps=2, latent_dimension=48)
    x = jax.random.normal(jax.random.key(0), (2, 2, 48, 48, 2))
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2, 48, 48, 2)
    z = model.apply(variables, x, train=False, method=AutoEncoder.encode)
    assert z.shape == (2, 2, 48)


def test_weighted_vector_loss():
    x = jax.random.normal(jax.random.key(0), (2, 2, 12, 12, 2))
    same = weighted_vector_loss(x, x)
    # identical: rmse 0, opposite-cos-sim 0.
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-5)
    worse = weighted_vector_loss(x, -x)
    assert float(jnp.mean(worse)) > float(jnp.mean(same))


def test_features_encoder_fn(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("CHECKPOINT_ROOT", str(tmp_path))
    from windtpu import features

    features._cache.clear()
    enc = features.get_encoder_fn(image_size=48, time_steps=2,
                                  latent_dimension=48)
    assert "warning" in capsys.readouterr().out
    z = enc(jnp.zeros((1, 2, 48, 48, 2)))
    assert z.shape == (1, 2, 48)


def test_reconstruction_loss_in_train_step():
    """Train step with a perceptual feature_fn: reco loss reported and
    non-zero."""
    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    cfg = GANConfig(
        model=ModelConfig(image_size=24, in_channels=3, noise_channels=2,
                          out_channels=2, sequence_length=2,
                          generator_features=16, discriminator_features=4),
        train=TrainConfig(batch_size=2, n_critic=1, compute_metrics=False,
                          reconstruction_coefficient=1.0),
    )

    def feature_fn(x):  # cheap stand-in encoder: spatial mean features
        return jnp.mean(x, axis=(2, 3))

    state = create_train_state(cfg)
    step = make_train_step(cfg, feature_fn=feature_fn)
    lr = jax.random.normal(jax.random.key(0), (2, 2, 24, 24, 3))
    hr = jax.random.normal(jax.random.key(1), (2, 2, 24, 24, 2))
    _, metrics = step(state, lr, hr, jax.random.key(2))
    assert float(metrics["g_reco_loss"]) > 0.0
    assert np.isfinite(float(metrics["g_loss"]))


def test_features_encoder_loads_bundled(tmp_path, monkeypatch, capsys):
    """At the flagship geometry, get_encoder_fn falls back to the bundled
    autoencoder-synth.npz (the reference ships no autoencoder weights and
    warns into random init; windtpu's perceptual loss works out of the
    box)."""
    import pathlib

    from windtpu import features

    bundled = (pathlib.Path(features.__file__).parent / "assets"
               / "weights" / "autoencoder-synth.npz")
    if not bundled.exists():
        import pytest
        pytest.skip("bundled autoencoder weights not present")
    monkeypatch.setenv("CHECKPOINT_ROOT", str(tmp_path))  # no orbax ckpt
    features._cache.clear()
    enc = features.get_encoder_fn(96, 2, 96)
    assert "warning" not in capsys.readouterr().out
    z = np.asarray(enc(jnp.zeros((1, 2, 96, 96, 2))))
    assert z.shape == (1, 2, 96)
    assert np.isfinite(z).all()
    # Bundled weights, not random init: encoding of a nonzero field must
    # differ from the fresh-init encoder's.
    model, variables = features.build_autoencoder(96, 2, 96)
    x = jax.random.normal(jax.random.key(3), (1, 2, 96, 96, 2))
    z_bundled = np.asarray(enc(x))
    z_random = np.asarray(model.apply(
        variables, x, train=False, method=type(model).encode))
    assert not np.allclose(z_bundled, z_random)
    features._cache.clear()
