"""Pallas TPU kernel: fused ConvLSTM sequence (recurrent conv + gates).

The generator's only sequential computation is its ConvLSTM recurrence
(re-design of reference gan/models.py:45 — kl.ConvLSTM2D; recurrence
semantics in windtpu/models/layers.py:_convlstm_scan).  Under XLA the
scan body round-trips the hidden/cell state through HBM every time step
and launches the recurrent conv as a separate kernel; the roofline
(ARCHITECTURE.md, docs/roofline_primary.json) puts the generator forward
at 32% of its HBM bound and names this serial state traffic + layout
churn as the entire gap.

Measured outcome (v5e, tools/ab_pallas_convlstm.py): END-TO-END the
kernel is neutral-to-+0.3% — generator forward 14.6 -> 13.5 ms at the
primary bench shape, full WGAN-GP step 435 -> 434.5 ms (flagship
178.6 -> 178.0 ms).  That nil result is evidence, not failure: with the
scan's per-step HBM state round-trips fully eliminated, nothing moved,
so the generator-forward roofline gap is NOT the recurrence's serial
state traffic (it is small-matmul/layout overhead spread across the
whole graph).  See ARCHITECTURE.md "Roofline" for where this closes the
MFU investigation.  The kernel stays on by default where eligible: it
is never slower, exercises the Pallas TPU path, and future wider-F
models inherit it for free.

This kernel runs the WHOLE sequence in one ``pallas_call``:

* grid = (B/bt, T) with T minor — the TPU executes the grid sequentially,
  so VMEM scratch carries (h, c) across time steps; they never touch HBM.
* per step, HBM traffic is exactly the compulsory bytes: read the
  pre-computed input-conv activations ``zx[:, t]`` (the hoisted input
  conv stays in XLA where it runs as one big folded conv — see
  layers.py:295), write the hidden state ``h_t``.
* the 3x3 recurrent conv is 9 shifted (bt*H*W, F) @ (F, 4F) matmuls from
  a zero-padded h held in VMEM — SAME padding falls out of the pad
  border, and every tap rides the MXU with the full 128-lane F.
* the 4-gate elementwise math (hard_sigmoid/sigmoid, tanh, cell update)
  fuses into the same kernel on the VPU.

Differentiation: the fused op carries a ``jax.custom_vjp`` whose backward
replays the XLA scan implementation (layers._convlstm_scan) and takes its
VJP — training steps can use the fused forward while gradients reuse the
battle-tested scan path (an extra forward recompute, the same trade
``jax.checkpoint`` makes).  The GP double-grad path (critic) never
routes here: the critic's narrow-F recurrences stay on the scan (F=2/16
would waste 126/112 of the MXU's 128 lanes — see layers.py LAYOUT note).

Eligibility is static (shapes/dtype/platform); ``fused_convlstm_supported``
reports it so callers can fall back to the scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one grid step's working set.  v5e has ~16 MB/core; the
# budget leaves headroom for what the estimate below does NOT count:
# Mosaic's f32 gate accumulator (bt*H*W*4F*4 B), per-tap shifted-window
# copies, and relayout scratch.  Measured on v5e: a 12 MiB budget let a
# 19.1 MiB stack through (compile-time VMEM OOM); 8 MiB keeps the
# flagship shapes (bt<=4 at 24x24xF128 bf16) safely under the limit.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _hard_sigmoid(x):
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def _vmem_bytes(bt: int, h: int, w: int, f: int, itemsize: int) -> int:
    """Working-set estimate for batch-tile ``bt`` (see kernel layout)."""
    zx_block = bt * h * w * 4 * f * itemsize * 2     # double-buffered in
    y_block = bt * h * w * f * itemsize * 2          # double-buffered out
    h_pad = bt * (h + 2) * (w + 2) * f * itemsize
    c_state = bt * h * w * f * itemsize
    rk = 9 * f * 4 * f * itemsize
    acc = bt * h * w * 4 * f * 4                     # f32 gate accumulator
    return zx_block + y_block + h_pad + c_state + rk + acc


def pick_batch_tile(b: int, h: int, w: int, f: int, itemsize: int,
                    max_tile: int = 8) -> Optional[int]:
    """Largest divisor of ``b`` (<= max_tile) whose working set fits VMEM.

    None if even bt=1 does not fit (caller falls back to the XLA scan).
    """
    for bt in range(min(b, max_tile), 0, -1):
        if b % bt == 0 and _vmem_bytes(bt, h, w, f, itemsize) <= _VMEM_BUDGET_BYTES:
            return bt
    return None


def fused_convlstm_supported(zx_shape: Tuple[int, ...], dtype,
                             kernel_shape: Optional[Tuple[int, ...]] = None,
                             ) -> bool:
    """Static eligibility: NHWC (B,T,H,W,4F) with MXU-aligned F.

    F must fill the 128-lane MXU (the whole point of the kernel); the
    batch tile must fit VMEM.  The critic's F=2/16 branches fail the
    first test by design.  ``kernel_shape`` is the recurrent kernel's
    shape: the kernel body hard-codes 3x3 taps (and a (3,3,F,4F)
    BlockSpec), so any other spatial extent must take the XLA scan —
    Pallas would silently slice a 3x3 window out of a larger kernel
    rather than erroring.  ``None`` (shape unknown) is accepted for
    shape-only probes; the layer always passes the real shape.
    """
    if kernel_shape is not None and tuple(kernel_shape[:2]) != (3, 3):
        return False
    if len(zx_shape) != 5:
        return False
    b, t, h, w, f4 = zx_shape
    f = f4 // 4
    if f4 % 4 or f % 128 or t < 2:
        return False
    # 2-byte compute dtypes only: the f32 path's gate accumulator plus
    # Mosaic's relayout scratch measured over the 16 MiB scoped-VMEM
    # limit on v5e even at small batch tiles, and nothing in the
    # production path (compute_dtype=bfloat16) runs the recurrence in
    # f32 on TPU.
    if jnp.dtype(dtype).itemsize != 2:
        return False
    return pick_batch_tile(b, h, w, f, jnp.dtype(dtype).itemsize) is not None


def _convlstm_kernel(zx_ref, rk_ref, y_ref, hpad_ref, c_ref, *,
                     hard_sig: bool):
    """One (batch-tile, time-step) grid cell.

    zx_ref:   (bt, 1, H, W, 4F) input-conv activations for this step
              (gate bias + unit forget bias already folded in upstream).
    rk_ref:   (3, 3, F, 4F) recurrent kernel.
    y_ref:    (bt, 1, H, W, F) hidden-state output for this step.
    hpad_ref: (bt, H+2, W+2, F) scratch — h_{t-1} with a zero border
              (SAME padding), persists across the T grid dimension.
    c_ref:    (bt, H, W, F) scratch — cell state, persists likewise.
    """
    t = pl.program_id(1)
    bt, _, hh, ww, f4 = zx_ref.shape
    f = f4 // 4
    dt = zx_ref.dtype
    r_act = _hard_sigmoid if hard_sig else jax.nn.sigmoid

    @pl.when(t == 0)
    def _():
        hpad_ref[:] = jnp.zeros_like(hpad_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    # Recurrent conv as 9 shifted taps.  Accumulate in f32 regardless of
    # the compute dtype (matches XLA's conv accumulation behaviour).
    z = zx_ref[:, 0].reshape(bt * hh * ww, f4).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = hpad_ref[:, dy:dy + hh, dx:dx + ww, :].reshape(
                bt * hh * ww, f)
            z = z + jnp.dot(v, rk_ref[dy, dx],
                            preferred_element_type=jnp.float32)

    zi = z[:, :f]
    zf = z[:, f:2 * f]
    zc = z[:, 2 * f:3 * f]
    zo = z[:, 3 * f:]
    c_prev = c_ref[:].reshape(bt * hh * ww, f).astype(jnp.float32)
    c_new = r_act(zf) * c_prev + r_act(zi) * jnp.tanh(zc)
    h_new = r_act(zo) * jnp.tanh(c_new)

    c_ref[:] = c_new.reshape(bt, hh, ww, f).astype(dt)
    h4 = h_new.reshape(bt, hh, ww, f).astype(dt)
    hpad_ref[:, 1:1 + hh, 1:1 + ww, :] = h4
    y_ref[:, 0] = h4


def _forward(zx: jax.Array, rk: jax.Array, *, hard_sig: bool,
             interpret: bool) -> jax.Array:
    b, t, hh, ww, f4 = zx.shape
    f = f4 // 4
    # Callers that force use_fused=True bypass fused_convlstm_supported();
    # the (3, 3, f, 4f) BlockSpec below would silently slice a 3x3 window
    # out of a larger recurrent kernel and compute garbage, so fail loudly.
    if rk.shape[:2] != (3, 3) or rk.shape[2] * 4 != f4 or rk.shape[3] != f4:
        raise ValueError(
            f"fused ConvLSTM requires a (3, 3, f, 4f) recurrent kernel; "
            f"got {rk.shape} for features={f}")
    bt = pick_batch_tile(b, hh, ww, f, zx.dtype.itemsize)
    if bt is None:
        raise ValueError(
            f"fused ConvLSTM does not fit VMEM at shape {zx.shape}; gate "
            "calls with fused_convlstm_supported()")
    rk = rk.astype(zx.dtype)

    kernel = functools.partial(_convlstm_kernel, hard_sig=hard_sig)
    flops = t * b * hh * ww * 9 * f * 4 * f * 2
    return pl.pallas_call(
        kernel,
        grid=(b // bt, t),
        in_specs=[
            pl.BlockSpec((bt, 1, hh, ww, f4), lambda i, s: (i, s, 0, 0, 0)),
            pl.BlockSpec((3, 3, f, f4), lambda i, s: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, 1, hh, ww, f),
                               lambda i, s: (i, s, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, hh, ww, f), zx.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, hh + 2, ww + 2, f), zx.dtype),
            pltpu.VMEM((bt, hh, ww, f), zx.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=zx.size * zx.dtype.itemsize
            + b * t * hh * ww * f * zx.dtype.itemsize,
            transcendentals=2 * b * t * hh * ww * f,
        ),
        interpret=interpret,
    )(zx, rk)


@functools.lru_cache(maxsize=None)
def _make_fused(hard_sig: bool, interpret: bool):
    """custom_vjp wrapper: Pallas forward, XLA-scan backward."""

    @jax.custom_vjp
    def fused(zx, rk):
        return _forward(zx, rk, hard_sig=hard_sig, interpret=interpret)

    def fwd(zx, rk):
        return fused(zx, rk), (zx, rk)

    def bwd(res, g):
        # Replay the scan implementation and differentiate it — one extra
        # (scan) forward, in exchange for never having to hand-derive the
        # recurrence's VJP.  Lazy import: layers.py imports this module.
        from windtpu.models.layers import _convlstm_scan, hard_sigmoid
        zx, rk = res
        f = rk.shape[2]
        r_act = hard_sigmoid if hard_sig else jax.nn.sigmoid

        def ref(zx_, rk_):
            return _convlstm_scan(zx_, rk_, f, r_act=r_act, unroll=1)

        _, vjp = jax.vjp(ref, zx, rk)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def convlstm_seq_fused(zx: jax.Array, rk: jax.Array, *,
                       hard_sig: bool = True,
                       interpret: bool = False) -> jax.Array:
    """Fused ConvLSTM sequence: (B,T,H,W,4F), (3,3,F,4F) -> (B,T,H,W,F).

    ``zx`` carries the hoisted input conv + biases (layers.py:295-320);
    semantics match layers._convlstm_scan bit-for-bit up to matmul
    accumulation order.  Differentiable via custom_vjp (scan backward).
    """
    return _make_fused(hard_sig, interpret)(zx, rk)
