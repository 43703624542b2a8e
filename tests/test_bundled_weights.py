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
    # the truth's; the bundle must restore most of it (but not overshoot
    # into static — random init fails the upper bound).  The shipped
    # 17k-step fine-tune measures 0.79x the truth's energy here; the band
    # is the tightest that tolerates checkpoint-to-checkpoint variance.
    assert hp_fake > 3.0 * hp_input, (hp_fake, hp_input, hp_truth)
    assert 0.5 * hp_truth < hp_fake < 2.0 * hp_truth, (hp_fake, hp_truth)

    # Large-scale fidelity backstop: the shipped bundle actually beats the
    # blur's RMSE on this held-out domain (0.59x measured), so anything
    # past 1.5x the blur means the output decorrelated from the synoptic
    # flow.
    rmse_fake = float(np.sqrt(np.mean((fake - high_b) ** 2)))
    rmse_blur = float(np.sqrt(np.mean((low_b[..., :2] - high_b) ** 2)))
    assert rmse_fake < 1.5 * rmse_blur, (rmse_fake, rmse_blur)


def test_bundle_per_day_sharpness_band():
    """Gate the per-day high-pass tail, not just the pooled statistic.

    The pooled ratio can sit near 1.0 while a near-calm day overshoots
    badly (its truth energy is tiny, so pooling hides it).  This runs
    the fixed A/B protocol (tools/eval_ckpt_ab.py, seed 4242 — held out
    from both training and in-training selection) and bounds every
    per-(day, channel) ratio, BOTH velocity components (an axis-pinned
    day degenerates whichever channel is crosswind).

    The gated statistic is the FLOORED ratio
    (train_shipped_ckpt.floored_ratio_stats): the raw ratio divides by
    truth texture energy that collapses to ~1% of typical on
    axis-pinned days, so a physically negligible texture excess reads
    as a 3-60x "overshoot" (the same shipped bytes read raw-worst 3.13
    on this protocol and 62.5 on degenerate selection batches).  The
    floored ratio divides by max(hp_truth, 5% of the protocol-mean
    truth energy), so r means "at most r x 5% of a typical day's
    texture energy, spurious" — bounded, comparable across days, and
    the same statistic the in-training sharpness loss and checkpoint
    selection optimize.  Raw ratios are still printed on failure.

    SHIPPING PATH (generator + bundled texture gate): the demanded band
    [0.8, 1.5] holds on every per-(day, channel) floored ratio — the
    flow-conditional texture gate (models/texture_gate.py) rescales each
    output channel's high-pass band to the truth energy predicted from
    the input flow, which is exactly the multiplicative gating the
    round-4/5 fine-tune campaign proved the generator equilibrium cannot
    learn (docs/tail_campaign_r5.json: ~125k steps across five
    strategies plateaued the two-seed floored worst at ~2.2-2.6).
    Measured two-seed gated frontier (docs/eval_shipped_bundle.json,
    SHA-keyed to both assets): floored [0.93..1.05] / [0.91..1.07],
    pooled 1.03/1.00, and LSD/KS improve alongside.

    RAW GENERATOR guard (gate off): the pre-gate frontier [0.55, 2.8] /
    pooled [0.65, 1.25] still bounds the bundle itself, so a generator
    regression cannot hide behind the gate's normalization."""
    from train_shipped_ckpt import (floored_ratio_stats, highpass_energy,
                                    make_holdout_batches)

    from windtpu.models.texture_gate import apply_gate, load_gate_npz
    from windtpu.train.checkpoint import load_generator_npz

    gen, template = _flagship_generator(batch=8)
    variables = load_generator_npz(BUNDLED, template)
    gate = load_gate_npz(os.path.join(REPO, "windtpu", "assets",
                                      "weights", "texture-gate.npz"))
    fwd = jax.jit(lambda v, x, n: gen.apply(v, x, n, train=False))
    gate_fn = jax.jit(apply_gate)

    hp_f, hp_t, hp_f_ch, hp_t_ch, hp_g_ch = [], [], [], [], []
    for i, (low, high) in enumerate(make_holdout_batches(4242)):
        noise = 0.1 * jax.random.normal(jax.random.key(100 + i),
                                        low.shape[:-1] + (20,))
        fake_j = fwd(variables, jnp.asarray(low), noise)
        fake = np.asarray(fake_j)
        gated = np.asarray(gate_fn(gate, jnp.asarray(low), fake_j))
        hp_f.append(highpass_energy(fake[..., 0]))
        hp_t.append(highpass_energy(high[..., 0]))
        for ch in (0, 1):
            hp_f_ch.append(highpass_energy(fake[..., ch]))
            hp_g_ch.append(highpass_energy(gated[..., ch]))
            hp_t_ch.append(highpass_energy(high[..., ch]))

    # Shipping path: the demanded band, met with margin.
    _, floored_g, _ = floored_ratio_stats(hp_g_ch, hp_t_ch)
    pooled_g = sum(hp_g_ch) / sum(hp_t_ch)
    assert 0.85 < pooled_g < 1.15, (pooled_g, floored_g)
    assert all(0.8 < r < 1.5 for r in floored_g), floored_g

    # Raw-generator guard: the ungated frontier still bounds the bundle.
    pooled = sum(hp_f) / sum(hp_t)
    raw, floored, _ = floored_ratio_stats(hp_f_ch, hp_t_ch)
    assert 0.65 < pooled < 1.25, (pooled, floored, raw)
    assert all(0.55 < r < 2.8 for r in floored), (floored, raw)


def test_shipped_bundle_eval_artifact_matches_bytes():
    """The shipped bundle's quality claim must be reconstructable from
    the tree: docs/eval_shipped_bundle.json carries the full two-seed
    A/B record (all five metric axes, per-day ratios, protocol), keyed
    by SHA-256 of the bundle bytes.  A bundle swap without a re-run of
    tools/eval_ckpt_ab.py --json fails here — evidence in commit
    messages only is not auditable."""
    import hashlib
    import json

    art = os.path.join(REPO, "docs", "eval_shipped_bundle.json")
    assert os.path.exists(art), (
        "missing docs/eval_shipped_bundle.json — run "
        "tools/eval_ckpt_ab.py <bundle> --seed {4242,31337} --json it")
    with open(art) as f:
        records = json.load(f)
    with open(BUNDLED, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    matching = [r for r in records if r["sha256"] == sha]
    assert matching, (
        f"no A/B record for the shipped bundle bytes (sha256 {sha[:12]}…) "
        f"— re-run tools/eval_ckpt_ab.py --json after swapping the bundle")
    seeds = {r["protocol"]["seed"] for r in matching}
    assert {4242, 31337} <= seeds, f"need both unseen seeds, have {seeds}"
    for r in matching:
        assert {"hp_pooled", "hp_floored_per_day", "hp_raw_per_day",
                "lsd_db", "ws_rmse", "acd", "ks"} <= set(r)

    # The SHIPPING path includes the texture gate: both seeds also need
    # a record scored with the bundled gate bytes (eval_ckpt_ab --gate),
    # so a gate-asset swap without a re-run fails here too.
    gate_path = os.path.join(REPO, "windtpu", "assets", "weights",
                             "texture-gate.npz")
    with open(gate_path, "rb") as f:
        gate_sha = hashlib.sha256(f.read()).hexdigest()
    gated_seeds = {r["protocol"]["seed"] for r in matching
                   if r["protocol"].get("texture_gate") == gate_sha}
    assert {4242, 31337} <= gated_seeds, (
        f"need gated records for both seeds keyed to the bundled gate "
        f"(sha256 {gate_sha[:12]}…), have {gated_seeds}")
