"""Fused Pallas ConvLSTM vs the XLA scan reference (interpret mode on CPU).

The fused kernel (ops/pallas_convlstm.py) must reproduce
layers._convlstm_scan — the recurrence that re-designs the reference's
kl.ConvLSTM2D (reference gan/models.py:45) — and its gradients.  Gate math
runs in f32 inside the kernel while the bf16 scan computes gates in bf16,
so parity tolerances are dtype-dependent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.models.layers import _convlstm_scan, hard_sigmoid
from windtpu.ops.pallas_convlstm import (
    convlstm_seq_fused,
    fused_convlstm_supported,
    pick_batch_tile,
)


def _make_inputs(rng, b=2, t=3, h=8, w=8, f=128, dtype=jnp.float32):
    zx = jnp.asarray(
        rng.randn(b, t, h, w, 4 * f).astype(np.float32), dtype)
    rk = jnp.asarray(
        0.1 * rng.randn(3, 3, f, 4 * f).astype(np.float32), jnp.float32)
    return zx, rk


@pytest.mark.parametrize("hard_sig", [True, False])
def test_forward_matches_scan_f32(rng, hard_sig):
    zx, rk = _make_inputs(rng)
    r_act = hard_sigmoid if hard_sig else jax.nn.sigmoid
    want = _convlstm_scan(zx, rk, 128, r_act=r_act, unroll=1)
    got = convlstm_seq_fused(zx, rk, hard_sig=hard_sig, interpret=True)
    assert got.shape == want.shape == (2, 3, 8, 8, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_scan_bf16(rng):
    zx, rk = _make_inputs(rng, dtype=jnp.bfloat16)
    want = _convlstm_scan(zx, rk, 128, r_act=hard_sigmoid, unroll=1)
    got = convlstm_seq_fused(zx, rk, interpret=True)
    assert got.dtype == jnp.bfloat16
    # The kernel keeps gates in f32; the scan rounds through bf16 every
    # step, so drift is a few bf16 ulps on tanh outputs in [-1, 1].
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def test_batch_tiling_partitions_batch(rng):
    # b=4 with an 8x8 field tiles without remainder; every batch row must
    # see its own fresh (h, c) state — a carry-over across batch tiles
    # would corrupt rows in later tiles.
    zx, rk = _make_inputs(rng, b=4, t=4)
    want = _convlstm_scan(zx, rk, 128, r_act=hard_sigmoid, unroll=1)
    got = convlstm_seq_fused(zx, rk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan(rng):
    zx, rk = _make_inputs(rng, b=1, t=3, h=8, w=8)

    def loss_fused(zx_, rk_):
        return jnp.sum(convlstm_seq_fused(zx_, rk_, interpret=True) ** 2)

    def loss_scan(zx_, rk_):
        y = _convlstm_scan(zx_, rk_, 128, r_act=hard_sigmoid, unroll=1)
        return jnp.sum(y ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(zx, rk)
    g_scan = jax.grad(loss_scan, argnums=(0, 1))(zx, rk)
    for a, b in zip(g_fused, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gating():
    # Wide F, NHWC, T>=2: eligible.
    assert fused_convlstm_supported((8, 6, 24, 24, 512), jnp.bfloat16)
    # The critic's narrow recurrences are rejected by design.
    assert not fused_convlstm_supported((8, 6, 96, 96, 8), jnp.bfloat16)
    assert not fused_convlstm_supported((8, 6, 96, 96, 64), jnp.bfloat16)
    # Degenerate ranks / T.
    assert not fused_convlstm_supported((6, 24, 24, 512), jnp.bfloat16)
    assert not fused_convlstm_supported((8, 1, 24, 24, 512), jnp.bfloat16)
    # f32 measured over the scoped-VMEM limit on v5e: rejected statically.
    assert not fused_convlstm_supported((8, 6, 24, 24, 512), jnp.float32)
    # Too big for VMEM even at bt=1.
    assert not fused_convlstm_supported((1, 6, 512, 512, 512), jnp.bfloat16)
    # The kernel hard-codes 3x3 recurrent taps: any other kernel shape
    # must fall back to the scan (Pallas would silently mis-window it).
    assert fused_convlstm_supported((8, 6, 24, 24, 512), jnp.bfloat16,
                                    (3, 3, 128, 512))
    assert not fused_convlstm_supported((8, 6, 24, 24, 512), jnp.bfloat16,
                                        (5, 5, 128, 512))


def test_pick_batch_tile_divisor():
    bt = pick_batch_tile(8, 24, 24, 128, 2)
    assert bt is not None and 8 % bt == 0
    assert pick_batch_tile(1, 512, 512, 512, 4) is None


def test_jit_and_vmap_compose(rng):
    # The fused op must be usable under jit (the only way it's ever
    # called) and keep working when the caller wraps it in value_and_grad.
    zx, rk = _make_inputs(rng, b=2, t=2)

    @jax.jit
    def f(zx_, rk_):
        return convlstm_seq_fused(zx_, rk_, interpret=True).mean()

    want = float(
        _convlstm_scan(zx, rk, 128, r_act=hard_sigmoid, unroll=1).mean())
    assert abs(float(f(zx, rk)) - want) < 1e-5


def test_vmap_composes(rng):
    # Ensemble inference vmaps the generator over member noise; the
    # fused op must batch correctly (pallas_call's batching rule folds
    # the vmap axis into the grid).
    zx, rk = _make_inputs(rng, b=2, t=2)
    zxs = jnp.stack([zx, zx * 0.5])

    def one(zx_):
        return convlstm_seq_fused(zx_, rk, interpret=True)

    got = jax.vmap(one)(zxs)
    want = jnp.stack([one(zxs[0]), one(zxs[1])])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_env_opt_in_runs_fused_in_layer(rng, monkeypatch):
    # WINDTPU_FUSED_CONVLSTM=1 routes the ConvLSTM layer through the
    # fused kernel even off-TPU (interpret mode); output must match the
    # default scan path on the same weights/inputs.
    from windtpu.models.layers import ConvLSTM

    x = jnp.asarray(rng.randn(1, 3, 8, 8, 4).astype(np.float32))
    layer = ConvLSTM(128, (3, 3))
    v = layer.init(jax.random.key(0), x)

    monkeypatch.setenv("WINDTPU_FUSED_CONVLSTM", "0")
    want = layer.apply(v, x)
    monkeypatch.setenv("WINDTPU_FUSED_CONVLSTM", "1")
    got = layer.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
