"""TPU-first building blocks for the wind-downscaling models.

Design notes (vs the TF/Keras reference):

* **Time folding.**  Every "TimeDistributed" conv in the reference
  (gan/models.py:32-71,94-135) is here a single conv over ``(B*T, H, W, C)``.
  Merging the two leading axes is a free bitcast for XLA and hands the MXU
  one large batched convolution instead of T small ones.

* **Spectral normalization** (reference wraps convs in
  ``tfa.layers.SpectralNormalization``) is a one-step power iteration on the
  kernel reshaped to ``(-1, out_features)``, with the left singular vector
  ``u`` persisted in the ``spectral_stats`` variable collection and updated
  only when ``update_stats=True`` (train mode) — standard Miyato semantics.
  tfa instead re-assigns the normalized kernel in place each call; both keep
  the layer ~1-Lipschitz, which is the property WGAN-GP needs.

* **ConvLSTM** (reference kl.ConvLSTM2D, gan/models.py:45,93,101) is a
  ``jax.lax.scan`` over time.  The input-to-gate convolution for *all*
  timesteps is hoisted out of the scan and computed as one big folded conv;
  only the recurrent h->gates conv runs inside the loop.  Keras gate order
  (i, f, c, o), ``tanh`` activation, ``hard_sigmoid`` recurrent activation
  and unit forget bias are reproduced so retrained weights behave alike.

* Keras-parity epsilons: BatchNorm/LayerNorm use eps=1e-3, momentum=0.99
  (Keras 2.4 defaults), not the Flax defaults.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def leaky_relu(x, negative_slope: float = 0.2):
    """LeakyReLU(0.2) — the activation used everywhere in the reference."""
    return nn.leaky_relu(x, negative_slope=negative_slope)


def hard_sigmoid(x):
    """Keras hard_sigmoid: clip(0.2*x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def fold_time(x: jax.Array) -> Tuple[jax.Array, int]:
    """(B, T, H, W, C) -> ((B*T, H, W, C), B)."""
    b = x.shape[0]
    return x.reshape((-1,) + x.shape[2:]), b


def unfold_time(x: jax.Array, batch: int) -> jax.Array:
    """(B*T, H, W, C) -> (B, T, H, W, C)."""
    return x.reshape((batch, -1) + x.shape[1:])


def _l2_normalize(v, eps=1e-12):
    return v * jax.lax.rsqrt(jnp.sum(v * v) + eps)


class SpectralNorm(nn.Module):
    """One-step power-iteration spectral normalization of a kernel.

    Stores ``u`` (shape ``(out,)``) in the ``spectral_stats`` collection.
    Returns ``kernel / sigma``.
    """

    update_stats: bool = True

    @nn.compact
    def __call__(self, kernel: jax.Array) -> jax.Array:
        out_features = kernel.shape[-1]
        w = kernel.reshape(-1, out_features)
        u_var = self.variable(
            "spectral_stats", "u",
            lambda: jax.random.normal(jax.random.key(0), (out_features,)),
        )
        u = u_var.value
        # Power iteration in float32 regardless of compute dtype.
        w32 = w.astype(jnp.float32)
        v = _l2_normalize(w32 @ u)           # (in,)
        u_new = _l2_normalize(v @ w32)       # (out,)
        v = jax.lax.stop_gradient(v)
        u_new = jax.lax.stop_gradient(u_new)
        sigma = jnp.einsum("i,io,o->", v, w32.astype(kernel.dtype), u_new.astype(kernel.dtype))
        if self.update_stats and not self.is_initializing():
            u_var.value = u_new
        return kernel / sigma


class TimeConv(nn.Module):
    """Time-distributed Conv2D over (B, T, H, W, C) via time folding.

    Covers the reference's ``TimeDistributed(SpectralNormalization(Conv2D))``
    blocks (gan/models.py:33,39,49,94-96,102-104,113-115 …).  ``padding`` may
    be an int (symmetric zero-pad, matching Keras ZeroPadding2D + VALID conv),
    'SAME' or 'VALID'.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: "int | str" = "SAME"
    use_spectral_norm: bool = True
    activation: Optional[Callable] = leaky_relu
    update_sn_stats: bool = True
    dtype: Optional[Dtype] = None
    # Compute the conv as conv(x[..:s]) + conv(x[..s:]) with the SAME
    # parameter tensor sliced along the input-channel axis — numerically the
    # same function (convolution is linear in channels), but XLA lays the
    # two operands out separately, which measures ~14% faster on the
    # generator's entry stem than one conv over the fused concat buffer
    # (tools/ablate_noise_fusion.py).  0 disables.
    split_input_at: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        folded, b = fold_time(x)
        if self.use_spectral_norm:
            # Normalize the conv kernel before application.
            kernel = self.param(
                "kernel",
                nn.initializers.glorot_uniform(),
                self.kernel_size + (folded.shape[-1], self.features),
                jnp.float32,
            )
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            kernel = SpectralNorm(update_stats=self.update_sn_stats, name="sn")(kernel)
            dt = self.dtype or folded.dtype

            def run_conv(inp, ker):
                return jax.lax.conv_general_dilated(
                    inp.astype(dt), ker.astype(dt),
                    window_strides=self.strides, padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            s = self.split_input_at
            if 0 < s < folded.shape[-1]:
                y = run_conv(folded[..., :s], kernel[:, :, :s]) \
                    + run_conv(folded[..., s:], kernel[:, :, s:])
            else:
                y = run_conv(folded, kernel)
            y = y + bias.astype(y.dtype)
        else:
            y = nn.Conv(
                self.features, self.kernel_size, strides=self.strides,
                padding=pad, dtype=self.dtype, name="conv",
            )(folded)
        if self.activation is not None:
            y = self.activation(y)
        return unfold_time(y, b)


class _ConvTransposeParams(nn.Module):
    """Holds a transpose-conv kernel/bias pair (HWIO layout)."""

    shape: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class TimeConvTranspose(nn.Module):
    """Time-distributed Conv2DTranspose (reference gan/models.py:55,63-64).

    Keras/TF Conv2DTranspose is the GRADIENT of a forward conv — the kernel
    acts spatially flipped — whereas ``lax.conv_transpose``'s default (and
    flax's ConvTranspose) is a fractionally-strided conv with the kernel as
    given.  To keep forward outputs interchangeable with the reference
    graph (caught by tests/test_graph_parity.py), the kernel is stored in
    windtpu's usual HWIO layout and passed through the
    ``transpose_kernel=True`` path, which reproduces Keras exactly.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "VALID"
    use_spectral_norm: bool = False
    activation: Optional[Callable] = leaky_relu
    update_sn_stats: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        folded, b = fold_time(x)
        shape = self.kernel_size + (folded.shape[-1], self.features)
        if self.use_spectral_norm:
            kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                                shape, jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        else:
            # Park the plain variant's weights under "conv" to keep the
            # checkpoint tree of the previous flax.ConvTranspose layout.
            kernel, bias = _ConvTransposeParams(
                shape, self.features, name="conv")()
        # TF Conv2DTranspose layout (kh, kw, out, in) — the layout
        # lax.conv_transpose(transpose_kernel=True) consumes.
        kernel = jnp.transpose(kernel, (0, 1, 3, 2))
        if self.use_spectral_norm:
            # Normalize in TF layout so the matricization — reshape(-1,
            # last) — matches tfa.SpectralNormalization on Conv2DTranspose:
            # u lives in the IN-channel space, same as the shipped sn_u
            # vectors of weights-55 (tools/convert_weights55.py).
            kernel = SpectralNorm(
                update_stats=self.update_sn_stats, name="sn")(kernel)
        dt = self.dtype or folded.dtype
        y = jax.lax.conv_transpose(
            folded.astype(dt), kernel.astype(dt),
            strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        y = y + bias.astype(y.dtype)
        if self.activation is not None:
            y = self.activation(y)
        return unfold_time(y, b)


class TimeBatchNorm(nn.Module):
    """BatchNormalization over (B, T, H, W) per channel — Keras axis=-1
    semantics (reference gan/models.py:34,40,50,56,69), via time folding."""

    use_running_average: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        folded, b = fold_time(x)
        y = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.99, epsilon=1e-3, dtype=self.dtype, name="bn",
        )(folded)
        return unfold_time(y, b)


class KerasLayerNorm(nn.Module):
    """LayerNormalization over the channel axis, Keras eps=1e-3
    (reference gan/models.py:97,105,116,125,136)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="ln")(x)


class ConvLSTM(nn.Module):
    """ConvLSTM2D over (B, T, H, W, C) -> (B, T, H, W, features).

    Keras-compatible recurrence (kl.ConvLSTM2D, gan/models.py:45,93,101):
    gate order (i, f, c, o), hard_sigmoid recurrent activation, tanh cell
    activation, unit forget bias, orthogonal recurrent initializer.

    TPU shaping: the input conv for all T steps runs as ONE folded conv
    (B*T batch) before the scan; the scan body contains only the recurrent
    conv and elementwise gate math, which XLA fuses.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    # TF 2.4 (the reference's pin) defaults ConvLSTM2D to hard_sigmoid
    # recurrent activation; Keras 3 changed the default to sigmoid.
    recurrent_activation: str = "hard_sigmoid"
    dtype: Optional[Dtype] = None
    # lax.scan unroll factor.  Narrow-channel recurrences (the critic's
    # F=2/16 branches) are launch-overhead-bound: unrolling lets XLA fuse
    # across timesteps — measured 2x on the critic fwd+bwd and the GP
    # double-grad at T=6 (tools/ablate_step.py).  Semantically a no-op.
    unroll: int = 1
    # Fused Pallas recurrence (ops/pallas_convlstm.py): whole sequence in
    # one kernel, (h, c) carried in VMEM.  None = auto: engage on TPU
    # devices for MXU-aligned shapes (wide-F bf16 — the generator's
    # F=128; the critic's narrow recurrences are statically ineligible).
    # Measured END-TO-END neutral-to-+0.3% on v5e (tools/
    # ab_pallas_convlstm.py: G fwd 14.6->13.5 ms primary, train step
    # 435->434.5 ms; flagship 178.6->178.0 ms) — which is itself the
    # roofline's answer: the scan's state round-trips were NOT the
    # generator-forward gap (ARCHITECTURE.md "Roofline").  Kept on by
    # default (equal-or-better, eligibility-gated, env kill-switch
    # WINDTPU_FUSED_CONVLSTM=0).  Gate math runs in f32 inside the
    # kernel, so outputs differ from the bf16 scan by a few ulps.
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, _ = x.shape
        f = self.features
        r_act = (hard_sigmoid if self.recurrent_activation == "hard_sigmoid"
                 else jax.nn.sigmoid)

        # Hoisted input->gates conv over all timesteps at once.
        folded, _ = fold_time(x)
        zx = nn.Conv(
            4 * f, self.kernel_size, padding="SAME", dtype=self.dtype,
            name="input_conv",
        )(folded)
        zx = unfold_time(zx, b)  # (B, T, H, W, 4F)

        recurrent_kernel = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(),
            self.kernel_size + (f, 4 * f), jnp.float32,
        )
        # Keras unit_forget_bias: the forget-gate bias starts at 1.
        forget_bias = self.param(
            "forget_bias", nn.initializers.ones, (f,), jnp.float32
        )

        dt = zx.dtype
        # Fold the unit forget bias into the hoisted input conv ONCE —
        # adding it inside the scan makes XLA hoist a loop-length broadcast.
        # Full-width vector add (zeros outside the f-gate) fuses into the
        # conv epilogue; a slice update would materialize zx twice.
        fb = forget_bias.astype(dt)
        fb_vec = jnp.concatenate(
            [jnp.zeros((f,), dt), fb, jnp.zeros((2 * f,), dt)])
        zx = zx + fb_vec

        hard_sig = self.recurrent_activation == "hard_sigmoid"
        d = jax.devices()[0]
        on_tpu = "tpu" in f"{d.platform} {d.device_kind}".lower()
        use_fused = self.use_fused
        if use_fused is None:
            # Env escape hatch: WINDTPU_FUSED_CONVLSTM=0 forces the XLA
            # scan everywhere (field debugging / A-B timing); =1 opts in
            # wherever the static eligibility holds (off-TPU this runs
            # the kernel in interpret mode — correctness testing only).
            # Unset = auto: TPU devices, eligible shapes.
            import os

            from windtpu.ops.pallas_convlstm import fused_convlstm_supported

            env = os.environ.get("WINDTPU_FUSED_CONVLSTM")
            if env == "0":
                use_fused = False
            else:
                use_fused = ((on_tpu or env == "1")
                             and fused_convlstm_supported(
                                 zx.shape, zx.dtype,
                                 recurrent_kernel.shape))
        if use_fused:
            from windtpu.ops.pallas_convlstm import convlstm_seq_fused

            out = convlstm_seq_fused(zx, recurrent_kernel,
                                     hard_sig=hard_sig,
                                     interpret=not on_tpu)
        else:
            out = _convlstm_scan(zx, recurrent_kernel, f,
                                 r_act=r_act, unroll=max(1, self.unroll))
        # Named for remat policies: recomputing the serial scan in the
        # backward pass is the expensive part of jax.checkpoint; policies
        # can elect to save exactly this tensor (see train/wgan_gp.py).
        return jax.ad_checkpoint.checkpoint_name(out, "convlstm_out")


def _convlstm_scan(zx: jax.Array, recurrent_kernel: jax.Array, f: int,
                   *, r_act: Callable, unroll: int) -> jax.Array:
    """Shared ConvLSTM recurrence over pre-biased gate activations.

    ``zx`` is (B, T, H, W, 4F) — the hoisted input conv with gate bias and
    unit forget bias already added; ``recurrent_kernel`` (kh, kw, F, 4F).
    Returns the hidden-state sequence (B, T, H, W, F).
    """
    b, t, h, w, _ = zx.shape
    dt = zx.dtype
    rk = recurrent_kernel.astype(dt)

    # LAYOUT: the scan's stacked buffers and saved residuals are
    # (T, B, ..., C)-shaped.  In NHWC with narrow channels (the critic
    # uses F=2 and F=16) the lane dimension pads C -> 128: up to a 64x
    # HBM blowup per stacked tensor, which OOMs flagship training.
    # For narrow F the recurrence therefore runs in NCHW (W on the
    # lanes: 96 -> 128 is 1.33x); for wide F (the generator's 128)
    # NHWC already fills the lanes and its convs are faster.  NCHW only
    # pays off when the padded residuals are actually large — small
    # fields keep NHWC (measured: 64px critic is 17% faster in NHWC
    # and fits comfortably; 96px critic OOMs without NCHW).
    nchw = f < 64 and h * w >= 96 * 96

    if nchw:
        zx_tmajor = jnp.moveaxis(zx, 1, 0)          # (T, B, H, W, 4F)
        zx_tmajor = jnp.moveaxis(zx_tmajor, -1, 2)  # (T, B, 4F, H, W)
        dn = ("NCHW", "HWIO", "NCHW")
        split_axis = 1
        h0 = jnp.zeros((b, f, h, w), dt)
    else:
        zx_tmajor = jnp.moveaxis(zx, 1, 0)          # (T, B, H, W, 4F)
        dn = ("NHWC", "HWIO", "NHWC")
        split_axis = -1
        h0 = jnp.zeros((b, h, w, f), dt)
    c0 = h0

    def step(carry, zx_t):
        h_prev, c_prev = carry
        zh = jax.lax.conv_general_dilated(
            h_prev, rk, window_strides=(1, 1), padding="SAME",
            dimension_numbers=dn,
        )
        z = zx_t + zh
        zi, zf, zc, zo = jnp.split(z, 4, axis=split_axis)
        i = r_act(zi)
        fg = r_act(zf)
        c = fg * c_prev + i * jnp.tanh(zc)
        o = r_act(zo)
        h_new = o * jnp.tanh(c)
        return (h_new, c), h_new

    (_, _), ys = jax.lax.scan(step, (h0, c0), zx_tmajor, unroll=unroll)
    if nchw:
        return jnp.transpose(ys, (1, 0, 3, 4, 2))  # -> (B, T, H, W, F)
    return jnp.moveaxis(ys, 0, 1)


class _ConvKernelParams(nn.Module):
    """A kernel/bias pair with nn.Conv's parameter names, shapes and
    initializers — for layers that consume conv weights without running
    flax's conv (the fused dual ConvLSTM)."""

    shape: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class ConvLSTMParams(nn.Module):
    """The parameters of one ConvLSTM, without its computation.

    Creates a variable tree IDENTICAL to ``ConvLSTM``'s
    (``input_conv/{kernel,bias}``, ``recurrent_kernel``, ``forget_bias``)
    with the same shapes and initializers, so a critic built with
    ``fused_dual_convlstm`` shares checkpoints with one built from two
    plain ``ConvLSTM`` modules.
    """

    in_channels: int
    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        f = self.features
        ik, ib = _ConvKernelParams(
            self.kernel_size + (self.in_channels, 4 * f), 4 * f,
            name="input_conv")()
        rk = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                        self.kernel_size + (f, 4 * f), jnp.float32)
        fb = self.param("forget_bias", nn.initializers.ones, (f,),
                        jnp.float32)
        return ik, ib, rk, fb


def fused_dual_convlstm(
    x: jax.Array,
    span_a: Tuple[int, int],
    span_b: Tuple[int, int],
    params_a,
    params_b,
    *,
    recurrent_activation: str = "hard_sigmoid",
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Two independent ConvLSTMs over channel spans of one input stack,
    executed as ONE recurrence with block-structured kernels.

    The critic's branch ConvLSTMs (reference gan/models.py:93,101) are 2-
    and 16-feature recurrences — far too narrow to occupy the 128-lane MXU,
    and as separate ``lax.scan``s they serialize: a TPU core executes one
    op at a time, so T recurrent convs of branch A queue behind T of
    branch B.  Packing both into one scan halves the serial op count.  The
    fused kernels carry ZERO blocks where one branch would read the other's
    channels, so the math is exactly that of two separate ConvLSTMs
    (convolution is linear in its input channels; a 0-weighted tap
    contributes an exact 0) — asserted by
    tests/test_models.py::test_fused_critic_branches_match_unfused.

    ``x`` is (B, T, H, W, C); branch A consumes channels
    ``span_a[0]:span_a[1]``, branch B ``span_b[0]:span_b[1]``.
    ``params_a``/``params_b`` are ``ConvLSTMParams`` outputs.  The fused
    gate layout is per-gate-contiguous: [i_a i_b | f_a f_b | c_a c_b |
    o_a o_b], which makes the scan body literally ``_convlstm_scan`` at
    width F = f_a + f_b.  Returns the two hidden sequences
    (B, T, H, W, f_a) and (B, T, H, W, f_b).
    """
    ik_a, ib_a, rk_a, fb_a = params_a
    ik_b, ib_b, rk_b, fb_b = params_b
    fa, fb_n = rk_a.shape[2], rk_b.shape[2]
    ftot = fa + fb_n
    kh, kw = rk_a.shape[:2]
    ch = x.shape[-1]
    b = x.shape[0]
    dt = x.dtype
    r_act = (hard_sigmoid if recurrent_activation == "hard_sigmoid"
             else jax.nn.sigmoid)

    def blocks(k_a, k_b, rows_a, rows_b, rows):
        """Assemble (kh, kw, rows, 4*ftot) from two per-branch kernels."""
        out = jnp.zeros((kh, kw, rows, 4 * ftot), jnp.float32)
        for g in range(4):
            out = out.at[:, :, rows_a[0]:rows_a[1],
                         g * ftot:g * ftot + fa].set(
                k_a[:, :, :, g * fa:(g + 1) * fa])
            out = out.at[:, :, rows_b[0]:rows_b[1],
                         g * ftot + fa:(g + 1) * ftot].set(
                k_b[:, :, :, g * fb_n:(g + 1) * fb_n])
        return out

    ik = blocks(ik_a, ik_b, span_a, span_b, ch)
    rk = blocks(rk_a, rk_b, (0, fa), (fa, ftot), ftot)
    gate_bias = jnp.concatenate([
        jnp.concatenate([ib_a[g * fa:(g + 1) * fa],
                         ib_b[g * fb_n:(g + 1) * fb_n]])
        for g in range(4)])
    # Unit forget bias folded into the hoisted conv once, as in ConvLSTM.
    fb_vec = jnp.concatenate([
        jnp.zeros((ftot,)), fb_a, fb_b, jnp.zeros((2 * ftot,))])

    folded, _ = fold_time(x)
    zx = jax.lax.conv_general_dilated(
        folded, ik.astype(dt), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zx = zx + (gate_bias + fb_vec).astype(dt)
    zx = unfold_time(zx, b)

    out = _convlstm_scan(zx, rk, ftot, r_act=r_act, unroll=max(1, unroll))
    out = jax.ad_checkpoint.checkpoint_name(out, "convlstm_out")
    return out[..., :fa], out[..., fa:]


class TimeDense(nn.Module):
    """TimeDistributed Dense (reference gan/models.py:139)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.features, dtype=self.dtype, name="dense")(x)


def bilinear_upsample_2x(x: jax.Array) -> jax.Array:
    """Keras UpSampling2D(size=2, interpolation='bilinear') on (B,T,H,W,C).

    Keras uses tf.image.resize with half_pixel_centers; jax.image.resize
    with method='bilinear' matches that convention.
    """
    b, t, h, w, c = x.shape
    folded = x.reshape(b * t, h, w, c)
    y = jax.image.resize(folded, (b * t, 2 * h, 2 * w, c), method="bilinear")
    return y.reshape(b, t, 2 * h, 2 * w, c)


def shortcut_geometry(in_size: int, target: int) -> Tuple[int, int, int]:
    """Stride/padding/kernel so one conv maps ``in_size`` -> ``target``.

    Same arithmetic as the reference shortcut_convolution
    (tf_utils.py:23-26): used to align a residual branch with the output of
    a conv pyramid.
    """
    if target == 1:
        return 1, 0, in_size
    strides = -(-(2 + in_size) // (target - 1))  # ceil
    margin = 2
    padding = -(-(strides * (target - 1) - in_size) // 2) + 1 + margin
    kernel = strides * (1 - target) + in_size + 2 * padding
    return strides, padding, kernel


class ShortcutConv(nn.Module):
    """Strided SN conv + LayerNorm aligning a hi-res residual to a target
    spatial size (reference tf_utils.py:15-32)."""

    target_size: int
    features: int
    update_sn_stats: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_size = x.shape[2]
        strides, padding, kernel = shortcut_geometry(in_size, self.target_size)
        y = TimeConv(
            self.features, (kernel, kernel), strides=(strides, strides),
            padding=padding, use_spectral_norm=True,
            update_sn_stats=self.update_sn_stats, dtype=self.dtype,
            name="conv",
        )(x)
        return KerasLayerNorm(dtype=self.dtype, name="norm")(y)
