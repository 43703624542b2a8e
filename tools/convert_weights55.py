"""Convert the reference's TF object checkpoints (weights-55.ckpt) into a
windtpu Orbax checkpoint.

The reference ships generator/discriminator TF checkpoints
(ganbase.py:132-140, api.py:21).  This tool maps their
``layer_with_weights-N`` variable tree onto the windtpu Flax parameter tree
(layer order is deterministic in both graphs), transposing where the two
frameworks' kernel layouts differ:

* Conv2D kernels are HWIO in both — copied as is;
* Conv2DTranspose kernels are (kh, kw, OUT, IN) in TF vs HWIO here —
  transposed (0, 1, 3, 2);
* ConvLSTM2D kernel/recurrent_kernel/bias use the same (i, f, c, o) gate
  packing in both (Keras order preserved by windtpu.models.layers.ConvLSTM);
  the Keras bias (unit forget init) maps to input_conv/bias with the
  separate windtpu forget_bias zeroed;
* SpectralNormalization ``sn_u`` (1, out) -> spectral_stats u (out,) for
  Conv2D; for Conv2DTranspose tfa matricizes the TF-layout kernel to
  (-1, IN), and windtpu's TimeConvTranspose normalizes the same
  matricization, so its u is (in,) and maps across unchanged;
* BatchNorm gamma/beta/moving_* -> scale/bias/mean/var (eps matches).

In this environment the checkpoint DATA blobs are stripped
(.MISSING_LARGE_BLOBS) — only the indexes exist — so conversion is
opportunistic (SURVEY.md §7 hard-part 6): the name map is verified against
the index shapes, and the tool raises a clear error if the values are
unavailable.  With real blobs: ``python tools/convert_weights55.py
<weights-55.ckpt dir> <output dir>``.

Note: the shipped 96px discriminator includes the strided shortcut conv
(use ModelConfig(discriminator_shortcut_min_iters=1)).
"""

from __future__ import annotations

import sys

import numpy as np

# ---- layer order of the reference graphs (gan/models.py:9-142) ------------
# (tf layer index) -> (windtpu module path, kind)
GENERATOR_MAP = {
    0: ("down1", "snconv"),
    1: ("bn1", "bn"),
    2: ("down2", "snconv"),
    3: ("bn2", "bn"),
    4: ("convlstm", "convlstm"),
    5: ("mid", "snconv"),
    6: ("bn3", "bn"),
    7: ("up1", "snconvT"),
    8: ("bn4", "bn"),
    9: ("up2", "convT"),
    10: ("bn5", "bn"),
    11: ("out", "conv"),
}

DISCRIMINATOR_MAP = {
    0: ("hr_convlstm", "convlstm"),
    1: ("mix_convlstm", "convlstm"),
    2: ("hr_conv", "snconv"),
    3: ("hr_ln", "ln"),          # order: both convs then both LNs? see note
    4: ("mix_conv", "snconv"),
    5: ("mix_ln", "ln"),
    # Pyramid (96px graph): conv96, ln, conv31, ln, conv9(pyr2), ln,
    # shortcut conv, shortcut ln, dense.
}


def load_tf_reader(path):
    import tensorflow as tf

    return tf.train.load_checkpoint(str(path))


def _get(reader, name):
    full = f"{name}/.ATTRIBUTES/VARIABLE_VALUE"
    return np.asarray(reader.get_tensor(full))


def convert_generator(reader, variables):
    """Fill a windtpu generator variables dict from the TF reader.
    ``variables`` = init_generator(...) output (for structure/shapes)."""
    import copy

    out = copy.deepcopy(variables)
    p = out["params"]
    st = out["spectral_stats"]
    bs = out["batch_stats"]

    def snconv(i, name, transpose=False):
        w = _get(reader, f"layer_with_weights-{i}/layer/w")
        b = _get(reader, f"layer_with_weights-{i}/layer/layer/bias")
        u = _get(reader, f"layer_with_weights-{i}/layer/sn_u")[0]
        if transpose:
            w = w.transpose(0, 1, 3, 2)
        p[name]["kernel"] = w
        p[name]["bias"] = b
        st[name]["sn"]["u"] = u

    def conv(i, name, transpose=False, wrapped=True):
        prefix = f"layer_with_weights-{i}/layer" if wrapped else \
            f"layer_with_weights-{i}"
        w = _get(reader, f"{prefix}/kernel")
        b = _get(reader, f"{prefix}/bias")
        if transpose:
            w = w.transpose(0, 1, 3, 2)
        p[name]["conv"]["kernel"] = w
        p[name]["conv"]["bias"] = b

    def bn(i, name):
        bs[name]["bn"]["mean"] = _get(
            reader, f"layer_with_weights-{i}/moving_mean")
        bs[name]["bn"]["var"] = _get(
            reader, f"layer_with_weights-{i}/moving_variance")
        p[name]["bn"]["scale"] = _get(reader, f"layer_with_weights-{i}/gamma")
        p[name]["bn"]["bias"] = _get(reader, f"layer_with_weights-{i}/beta")

    def convlstm(i, name):
        p[name]["input_conv"]["kernel"] = _get(
            reader, f"layer_with_weights-{i}/cell/kernel")
        p[name]["input_conv"]["bias"] = _get(
            reader, f"layer_with_weights-{i}/cell/bias")
        p[name]["recurrent_kernel"] = _get(
            reader, f"layer_with_weights-{i}/cell/recurrent_kernel")
        p[name]["forget_bias"] = np.zeros_like(p[name]["forget_bias"])

    snconv(0, "down1")
    bn(1, "bn1")
    snconv(2, "down2")
    bn(3, "bn2")
    convlstm(4, "convlstm")
    snconv(5, "mid")
    snconv(7, "up1", transpose=True)
    bn(6, "bn3")
    bn(8, "bn4")
    conv(9, "up2", transpose=True)       # un-normalized ConvTranspose
    bn(10, "bn5")
    conv(11, "out")
    return out


def convert_discriminator(reader, variables):
    """Fill windtpu discriminator variables (96px graph with
    discriminator_shortcut_min_iters=1) from the TF reader.

    Empirical layer_with_weights order of the shipped discriminator.index:
    0 hr ConvLSTM, 1 mix ConvLSTM, 2 hr SN conv, 3 mix SN conv,
    4/5 branch LayerNorms, 6 conv96, 7 LN64, 8 conv31, 9 LN128,
    10 conv9 (pyramid 2), 11 shortcut conv (6x6), 12/13 LN256s,
    14 Dense(1).
    """
    import copy

    out = copy.deepcopy(variables)
    p = out["params"]
    st = out["spectral_stats"]

    def snconv(i, path):
        node = p
        for part in path[:-1]:
            node = node[part]
        leaf = path[-1]
        node[leaf]["kernel"] = _get(reader, f"layer_with_weights-{i}/layer/w")
        node[leaf]["bias"] = _get(
            reader, f"layer_with_weights-{i}/layer/layer/bias")
        s = st
        for part in path[:-1]:
            s = s[part]
        s[leaf]["sn"]["u"] = _get(
            reader, f"layer_with_weights-{i}/layer/sn_u")[0]

    def ln(i, path):
        node = p
        for part in path[:-1]:
            node = node[part]
        node[path[-1]]["ln"]["scale"] = _get(
            reader, f"layer_with_weights-{i}/gamma")
        node[path[-1]]["ln"]["bias"] = _get(
            reader, f"layer_with_weights-{i}/beta")

    def convlstm(i, name):
        p[name]["input_conv"]["kernel"] = _get(
            reader, f"layer_with_weights-{i}/cell/kernel")
        p[name]["input_conv"]["bias"] = _get(
            reader, f"layer_with_weights-{i}/cell/bias")
        p[name]["recurrent_kernel"] = _get(
            reader, f"layer_with_weights-{i}/cell/recurrent_kernel")
        p[name]["forget_bias"] = np.zeros_like(p[name]["forget_bias"])

    convlstm(0, "hr_convlstm")
    convlstm(1, "mix_convlstm")
    snconv(2, ("hr_conv",))
    snconv(3, ("mix_conv",))
    ln(4, ("hr_ln",))
    ln(5, ("mix_ln",))
    snconv(6, ("pyr1_conv_96",))
    ln(7, ("pyr1_ln_96",))
    snconv(8, ("pyr1_conv_31",))
    ln(9, ("pyr1_ln_31",))
    snconv(10, ("pyr2_conv_9",))
    snconv(11, ("shortcut", "conv"))
    ln(12, ("pyr2_ln_9",))
    ln(13, ("shortcut", "norm"))
    p["score_dense"]["dense"]["kernel"] = _get(
        reader, "layer_with_weights-14/layer/kernel")
    p["score_dense"]["dense"]["bias"] = _get(
        reader, "layer_with_weights-14/layer/bias")
    return out


def fabricate_generator_checkpoint(variables, prefix):
    """Write a REAL TF object-graph checkpoint with the reference
    generator's variable paths (ganbase.py:132-134 save format), taking
    values from a windtpu generator variables tree.

    This is the exact inverse of :func:`convert_generator` — each
    ``layer_with_weights-N`` node reproduces the object paths Keras
    tracking gives the reference graph (TimeDistributed -> .layer =
    SpectralNormalization -> .w/.sn_u, .layer.layer = inner Conv2D ->
    .bias; BatchNorm gamma/beta/moving_*; ConvLSTM .cell.*).  Exists so
    the converter can be round-trip proven in environments where the
    shipped weights-55 DATA blobs are stripped: fabricate -> convert ->
    forward parity (tests/test_convert.py).
    """
    import tensorflow as tf

    p = variables["params"]
    st = variables["spectral_stats"]
    bs = variables["batch_stats"]
    root = tf.train.Checkpoint()

    def node(i):
        m = tf.Module()
        setattr(root, f"layer_with_weights-{i}", m)
        return m

    def var(x):
        return tf.Variable(np.asarray(x))

    def snconv(i, name, transpose=False):
        m = node(i)
        w = np.asarray(p[name]["kernel"])
        if transpose:
            w = w.transpose(0, 1, 3, 2)
        m.layer = tf.Module()
        m.layer.w = var(w)
        m.layer.sn_u = var(np.asarray(st[name]["sn"]["u"])[None, :])
        m.layer.layer = tf.Module()
        m.layer.layer.bias = var(p[name]["bias"])

    def conv(i, name, transpose=False):
        m = node(i)
        w = np.asarray(p[name]["conv"]["kernel"])
        if transpose:
            w = w.transpose(0, 1, 3, 2)
        m.layer = tf.Module()
        m.layer.kernel = var(w)
        m.layer.bias = var(p[name]["conv"]["bias"])

    def bn(i, name):
        m = node(i)
        m.gamma = var(p[name]["bn"]["scale"])
        m.beta = var(p[name]["bn"]["bias"])
        m.moving_mean = var(bs[name]["bn"]["mean"])
        m.moving_variance = var(bs[name]["bn"]["var"])

    def convlstm(i, name):
        m = node(i)
        m.cell = tf.Module()
        m.cell.kernel = var(p[name]["input_conv"]["kernel"])
        # Keras folds the unit forget-gate init into the bias itself.
        bias = np.asarray(p[name]["input_conv"]["bias"]).copy()
        fcount = np.asarray(p[name]["forget_bias"]).shape[0]
        bias[fcount:2 * fcount] += np.asarray(p[name]["forget_bias"])
        m.cell.bias = var(bias)
        m.cell.recurrent_kernel = var(p[name]["recurrent_kernel"])

    snconv(0, "down1")
    bn(1, "bn1")
    snconv(2, "down2")
    bn(3, "bn2")
    convlstm(4, "convlstm")
    snconv(5, "mid")
    bn(6, "bn3")
    snconv(7, "up1", transpose=True)
    bn(8, "bn4")
    conv(9, "up2", transpose=True)
    bn(10, "bn5")
    conv(11, "out")
    return root.write(str(prefix))


def verify_against_index(ckpt_dir):
    """Shape-check the generator name map against the checkpoint index
    (works even with stripped blobs)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(str(ckpt_dir) + "/generator")
    shapes = reader.get_variable_to_shape_map()

    expect = {
        "layer_with_weights-0/layer/w": [8, 8, 23, 128],
        "layer_with_weights-2/layer/w": [4, 4, 128, 128],
        "layer_with_weights-4/cell/kernel": [3, 3, 128, 512],
        "layer_with_weights-4/cell/recurrent_kernel": [3, 3, 128, 512],
        "layer_with_weights-5/layer/w": [3, 3, 128, 64],
        "layer_with_weights-7/layer/w": [2, 2, 32, 192],
        "layer_with_weights-11/layer/kernel": [3, 3, 16, 2],
    }
    for short, want in expect.items():
        got = shapes.get(f"{short}/.ATTRIBUTES/VARIABLE_VALUE")
        assert got == want, (short, got, want)
    return True


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import jax

    from windtpu.api import flagship_config
    from windtpu.models.generator import init_generator

    verify_against_index(src)
    cfg = flagship_config().model
    template = init_generator(cfg, jax.random.key(0))
    reader = load_tf_reader(f"{src}/generator")
    try:
        converted = convert_generator(reader, jax.device_get(template))
    except Exception as e:
        raise SystemExit(
            f"checkpoint values unavailable ({type(e).__name__}: {e}); "
            "this mount ships index files only (.MISSING_LARGE_BLOBS) — "
            "run against a full weights-55.ckpt") from e
    import orbax.checkpoint as ocp

    ocp.StandardCheckpointer().save(dst, converted)
    print(f"wrote converted generator variables to {dst}")


if __name__ == "__main__":
    main()
