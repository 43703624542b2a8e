"""Golden parity vs tf.keras for the recurrences the reference builds on
(SURVEY.md §7 hard part 3: ConvLSTM gate order / activations / init).

Weights are copied from a Keras layer into the windtpu module; outputs
must match to float tolerance.  Skipped when TF is unavailable.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from windtpu.models import layers as L  # noqa: E402


class TestConvLSTMParity:
    @pytest.mark.parametrize("features", [4, 8])
    def test_matches_keras_convlstm2d(self, features):
        b, t, h, w, c = 2, 5, 8, 8, 3
        rng = np.random.RandomState(0)
        x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)

        # Keras 3 defaults recurrent_activation to sigmoid (Keras 2.4 —
        # the reference pin — used hard_sigmoid); compare like for like.
        keras_layer = tf.keras.layers.ConvLSTM2D(
            features, (3, 3), padding="same", return_sequences=True,
            recurrent_activation="sigmoid")
        want = keras_layer(tf.constant(x)).numpy()

        kernel, recurrent_kernel, bias = [
            v.numpy() for v in keras_layer.weights]

        model = L.ConvLSTM(features=features, kernel_size=(3, 3),
                           recurrent_activation="sigmoid")
        variables = model.init(jax.random.key(0), jnp.asarray(x))
        params = {
            "input_conv": {"kernel": jnp.asarray(kernel),
                           "bias": jnp.asarray(bias)},
            "recurrent_kernel": jnp.asarray(recurrent_kernel),
            # Keras folds the unit forget bias INTO its bias vector; zero
            # the separate windtpu term so the sums match.
            "forget_bias": jnp.zeros((features,)),
        }
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bilinear_upsample_matches_keras():
    rng = np.random.RandomState(1)
    x = rng.standard_normal((2, 3, 6, 7, 4)).astype(np.float32)
    keras_up = tf.keras.layers.TimeDistributed(
        tf.keras.layers.UpSampling2D(size=(2, 2), interpolation="bilinear"))
    want = keras_up(tf.constant(x)).numpy()
    got = np.asarray(L.bilinear_upsample_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_hard_sigmoid_is_keras24_formula():
    """Keras 2.4 (the reference pin): clip(0.2x + 0.5, 0, 1).  (Keras 3
    redefined hard_sigmoid as relu6(x+3)/6 — NOT what weights-55 saw.)"""
    x = np.linspace(-4, 4, 33).astype(np.float32)
    want = np.clip(0.2 * x + 0.5, 0.0, 1.0)
    got = np.asarray(L.hard_sigmoid(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)
