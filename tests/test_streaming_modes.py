"""Streaming-engine transfer modes (r5): bfloat16 transfers and fused
ensemble uploads.

The pipelined streaming loop is transfer-bound on remote-attached links
(measured ~9 MB/s effective tunnel bandwidth, compute per group in the
milliseconds — ARCHITECTURE.md / docs/CAPACITY.md), so it gained two
byte-cutting modes:

* ``InferenceConfig(streaming_transfer_dtype="bfloat16")`` halves both
  transfer directions; outputs differ from the fp32 path only at the
  bf16 quantum.
* Ensemble members share each group's upload (patches are
  member-independent; noise differs per member inside the program), so
  M members cost up + M*down instead of M*(up + down) — and must be
  BITWISE identical to streaming each member separately.
"""

import dataclasses

import jax
import numpy as np

from windtpu.core.config import InferenceConfig, ModelConfig
from windtpu.infer.streaming import downscale_field_streaming
from windtpu.models.generator import init_generator

TINY_M = ModelConfig(image_size=32, in_channels=3, noise_channels=2,
                     out_channels=2, sequence_length=4,
                     generator_features=16, discriminator_features=8)
TINY_I = InferenceConfig(sequence_length=4, image_size=32, noise_channels=2,
                         border_crop=2, group_size=4, overlap_factor=0.5)


def _field(t=4, h=48, w=64, seed=0):
    return np.random.RandomState(seed).standard_normal(
        (t, h, w, 3)).astype(np.float32)


def test_bf16_transfers_match_fp32_at_quantum():
    g_vars = init_generator(TINY_M, jax.random.key(0))
    field = _field()
    key = jax.random.key(7)
    a, _ = downscale_field_streaming(g_vars, field, TINY_M, TINY_I, key=key)
    b, _ = downscale_field_streaming(
        g_vars, field, TINY_M,
        dataclasses.replace(TINY_I, streaming_transfer_dtype="bfloat16"),
        key=key)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(a)
    # Same noise streams, same stitch; only transfer rounding differs.
    # bf16 has ~8 mantissa bits: abs error ~ 2^-8 of the value scale.
    np.testing.assert_allclose(a[m], b[m], atol=2e-2)
    assert np.isfinite(b[m]).all()


def test_fused_ensemble_is_bitwise_equal_to_singles():
    g_vars = init_generator(TINY_M, jax.random.key(0))
    field = _field(seed=3)
    keys = jax.random.split(jax.random.key(11), 3)
    fused, _ = downscale_field_streaming(g_vars, field, TINY_M, TINY_I,
                                         ensemble_keys=keys)
    singles = np.stack([
        downscale_field_streaming(g_vars, field, TINY_M, TINY_I, key=k)[0]
        for k in keys])
    np.testing.assert_array_equal(np.isnan(fused), np.isnan(singles))
    m = ~np.isnan(fused)
    np.testing.assert_array_equal(fused[m], singles[m])
