"""Weights-55 conversion: name map against the shipped checkpoint index
(data blobs are stripped in this environment; the map + shapes are what we
can verify) and structural fit against the windtpu parameter trees."""

import os

import jax
import numpy as np
import pytest

REFERENCE_CKPT = "/root/reference/src/downscaling/weights-55.ckpt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CKPT),
    reason="reference checkpoint not mounted")


def test_generator_index_shapes():
    import tools.convert_weights55 as cw

    assert cw.verify_against_index(REFERENCE_CKPT)


def test_generator_tree_has_all_mapped_leaves():
    """Every path the converter writes must exist in the windtpu generator
    tree with the TF-side shape (transposed where applicable)."""
    from windtpu.api import flagship_config
    from windtpu.models.generator import init_generator

    cfg = flagship_config().model
    variables = jax.device_get(init_generator(cfg, jax.random.key(0)))
    p = variables["params"]
    st = variables["spectral_stats"]
    bs = variables["batch_stats"]

    # (windtpu path, expected shape) from the checkpoint index.
    assert p["down1"]["kernel"].shape == (8, 8, 23, 128)
    assert st["down1"]["sn"]["u"].shape == (128,)
    assert p["down2"]["kernel"].shape == (4, 4, 128, 128)
    assert p["convlstm"]["input_conv"]["kernel"].shape == (3, 3, 128, 512)
    assert p["convlstm"]["recurrent_kernel"].shape == (3, 3, 128, 512)
    assert p["convlstm"]["input_conv"]["bias"].shape == (512,)
    assert p["mid"]["kernel"].shape == (3, 3, 128, 64)
    # TF transpose kernel (2,2,32,192) -> HWIO (2,2,192,32).
    assert p["up1"]["kernel"].shape == (2, 2, 192, 32)
    # TF index layer-9: [5, 5, 16, 160] (kh, kw, OUT, IN) -> HWIO.
    assert p["up2"]["conv"]["kernel"].shape == (5, 5, 160, 16)
    assert p["out"]["conv"]["kernel"].shape == (3, 3, 16, 2)
    for bn in ("bn1", "bn2", "bn3", "bn4", "bn5"):
        assert "mean" in bs[bn]["bn"] and "var" in bs[bn]["bn"]


def test_discriminator_tree_matches_shipped_topology():
    """With discriminator_shortcut_min_iters=1 the windtpu discriminator
    reproduces the shipped graph including the 6x6 shortcut conv."""
    import dataclasses

    from windtpu.api import flagship_config
    from windtpu.models.discriminator import init_discriminator

    cfg = dataclasses.replace(flagship_config().model,
                              discriminator_shortcut_min_iters=1)
    variables = jax.device_get(init_discriminator(cfg, jax.random.key(0)))
    p = variables["params"]
    assert p["hr_convlstm"]["input_conv"]["kernel"].shape == (3, 3, 2, 8)
    assert p["mix_convlstm"]["input_conv"]["kernel"].shape == (3, 3, 5, 64)
    assert p["pyr1_conv_96"]["kernel"].shape == (7, 7, 32, 64)
    assert p["pyr1_conv_31"]["kernel"].shape == (7, 7, 64, 128)
    assert p["pyr2_conv_9"]["kernel"].shape == (7, 7, 128, 256)
    assert p["shortcut"]["conv"]["kernel"].shape == (6, 6, 128, 256)
    assert p["score_dense"]["dense"]["kernel"].shape == (1024, 1)


def test_generator_checkpoint_roundtrip(tmp_path):
    """Round-trip proof of the converter without the stripped weights-55
    blobs (VERDICT r2 item 5): fabricate a REAL TF object-graph checkpoint
    with the reference generator's variable paths and random values, run
    convert_generator on the on-disk checkpoint, and require (a) the
    converted tree equals the source values exactly and (b) the converted
    Flax generator's forward matches the Keras reference-graph twin fed
    the same checkpoint (reference save format: ganbase.py:132-140)."""
    tf = pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    import tools.convert_weights55 as cw
    from tests.test_graph_parity import (build_keras_generator, randomize,
                                         transfer_generator)
    from windtpu.core.config import ModelConfig
    from windtpu.models.generator import Generator, init_generator

    mcfg = ModelConfig(image_size=24, in_channels=3, noise_channels=4,
                       out_channels=2, sequence_length=2,
                       generator_features=16, discriminator_features=4,
                       compute_dtype="float32")
    template = jax.device_get(init_generator(mcfg, jax.random.key(0)))
    src = jax.device_get(randomize(template, seed=7))
    # Keras folds the forget-gate bias into the packed cell bias, so a
    # nonzero separate forget_bias cannot survive the trip bit-exactly
    # (the converter lands it in input_conv/bias instead).  Zero it so
    # exact tree equality is a valid assertion; forward parity below is
    # what proves the fold itself.
    src["params"]["convlstm"]["forget_bias"] = np.zeros_like(
        src["params"]["convlstm"]["forget_bias"])

    prefix = tmp_path / "weights-rt.ckpt" / "generator"
    cw.fabricate_generator_checkpoint(src, prefix)
    reader = cw.load_tf_reader(prefix)
    converted = cw.convert_generator(reader, template)

    flat_src = jax.tree_util.tree_leaves_with_path(src)
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(converted))
    for path, leaf in flat_src:
        got = flat_conv[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(got),
            err_msg=jax.tree_util.keystr(path))

    # Forward parity: converted Flax vs the Keras twin of the reference
    # graph loaded with the SAME checkpoint values.
    kmodel, handles = build_keras_generator(mcfg)
    transfer_generator(handles, converted)
    rng = np.random.RandomState(3)
    x = rng.standard_normal((2, 2, 24, 24, 3)).astype(np.float32)
    n = rng.standard_normal((2, 2, 24, 24, 4)).astype(np.float32)
    want = kmodel([tf.constant(x), tf.constant(n)], training=False).numpy()
    got = np.asarray(Generator(mcfg).apply(
        converted, jnp.asarray(x), jnp.asarray(n), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
