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
