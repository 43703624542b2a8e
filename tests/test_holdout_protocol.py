"""Unit tests for the shipped-checkpoint selection protocol.

tools/train_shipped_ckpt.py picks which generator ships by scoring
candidates on fixed held-out batches (``make_holdout_batches`` +
``holdout_figures``); tools/eval_ckpt_ab.py reuses the same construction
for the final A/B report.  The reference has no counterpart (it ships
weights-55.ckpt with no evaluation harness at all, reference api.py:21),
so this protocol IS the quality gate — these tests pin its two contracts:
the batches are a pure function of the seed (otherwise "same batches for
every candidate" is false), and the score orders obviously-better
generators ahead of obviously-worse ones (truth < overshoot < blur).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_shipped_ckpt import (  # noqa: E402
    gaussian_blur,
    holdout_figures,
    log_spectral_distance,
    make_holdout_batches,
)

# Small-but-real geometry: cheap on the 1-core CPU host, large enough
# that the high-pass statistic is not dominated by boundary effects.
KW = dict(n_batches=2, batch=2, patch=64, seq=2, calm_batches=1)


@pytest.fixture(scope="module")
def batches():
    return make_holdout_batches(seed=99, **KW)


def test_holdout_batches_are_a_pure_function_of_the_seed(batches):
    again = make_holdout_batches(seed=99, **KW)
    assert len(again) == len(batches) == KW["n_batches"] + KW["calm_batches"]
    for (l0, h0), (l1, h1) in zip(batches, again):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_array_equal(h0, h1)
    other = make_holdout_batches(seed=100, **KW)
    assert any(not np.array_equal(h0, h1)
               for (_, h0), (_, h1) in zip(batches, other))


def test_holdout_batches_shapes_and_finiteness(batches):
    for low, high in batches:
        assert low.shape == (KW["batch"], KW["seq"], 64, 64, low.shape[-1])
        assert high.shape == (KW["batch"], KW["seq"], 64, 64, 2)
        assert np.isfinite(low).all() and np.isfinite(high).all()


def test_calm_batches_are_appended_after_the_regular_ones(batches):
    """calm_batches extends the set; the regular prefix is unchanged.

    A candidate scored with calm_batches=1 must see the SAME regular
    batches as one scored with calm_batches=0, or scores are not
    comparable across configurations."""
    without = make_holdout_batches(seed=99, **{**KW, "calm_batches": 0})
    assert len(batches) == len(without) + KW["calm_batches"]
    for (l0, h0), (l1, h1) in zip(without, batches):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_array_equal(h0, h1)


def test_calm_speed_range_actually_lowers_the_flow():
    """synth_day's speed_lo/hi knob (what calm batches use: 0.5-2.5 vs
    the regular 3-10 m/s) shifts the day's flow distribution down."""
    from train_shipped_ckpt import make_domain, synth_day

    rng = np.random.RandomState(5)
    dem, slope, aspect = make_domain(rng, ny=96, nx=96)

    def mean_speed(**kw):
        speeds = []
        for _ in range(5):
            _, high = synth_day(rng, dem, slope, aspect, t=1, **kw)
            speeds.append(float(np.mean(np.hypot(high[..., 0],
                                                 high[..., 1]))))
        return np.mean(speeds)

    calm = mean_speed(speed_lo=0.5, speed_hi=2.5)
    regular = mean_speed()  # defaults 3-10 m/s
    assert calm < regular - 1.0, (calm, regular)


def _figures(batches, fwd):
    # g_vars is opaque to holdout_figures; the fake fwds ignore it.
    return holdout_figures(lambda g, low, noise: fwd(np.asarray(low),
                                                     np.asarray(noise)),
                           g_vars=None, batches=batches)


def _truth_lookup(batches):
    """fwd(low) -> the matching ground-truth high for that batch.

    holdout_figures hands fwd a float32 jnp cast of `low`, so the match
    is by value (allclose), not by bytes."""
    def lookup(low):
        for l, h in batches:
            if np.allclose(low, l.astype(np.float32), atol=1e-5):
                return h
        raise AssertionError("fwd got a batch not in the holdout set")
    return lookup


def test_truth_returning_generator_scores_near_zero(batches):
    truth = _truth_lookup(batches)
    hp, worst, lsd, rmse, score = _figures(
        batches, lambda low, noise: truth(low))
    assert hp == pytest.approx(1.0)
    assert worst == pytest.approx(1.0)
    assert lsd == pytest.approx(0.0, abs=1e-6)
    assert rmse == pytest.approx(0.0, abs=1e-6)
    assert score == pytest.approx(0.0, abs=1e-6)


def test_score_orders_truth_then_overshoot_then_blur(batches):
    truth = _truth_lookup(batches)

    def truth_fwd(low, noise):
        return truth(low)

    def blur_fwd(low, noise):
        # An under-sharpened generator: passes the blurred input through.
        h = truth_fwd(low, noise)
        return np.stack([gaussian_blur(h[..., c], sigma=7.0)
                         for c in range(2)], axis=-1)

    def overshoot_fwd(low, noise):
        # Truth plus flow-independent static: exactly the amplitude-blind
        # failure mode the calm batches exist to expose.
        h = truth_fwd(low, noise)
        return h + 2.0 * np.asarray(noise)[..., :2]

    s_truth = _figures(batches, truth_fwd)
    s_over = _figures(batches, overshoot_fwd)
    s_blur = _figures(batches, blur_fwd)

    assert s_blur[0] < 0.8 < s_truth[0] == pytest.approx(1.0)  # hp pooled
    assert s_over[0] > 1.0
    # worst-day ratio flags the calm-day overshoot harder than pooled hp
    assert s_over[1] > s_over[0]
    # and the combined selection score ranks them correctly
    assert s_truth[4] < s_over[4] < s_blur[4]


def test_log_spectral_distance_is_a_metric_like_gap():
    rng = np.random.RandomState(0)
    a = rng.standard_normal((2, 64, 64))
    assert log_spectral_distance(a, a) == pytest.approx(0.0)
    assert log_spectral_distance(a, gaussian_blur(a, 5.0)) > 1.0


def test_floored_ratio_stats_contract():
    """The gate statistic's three defining properties (VERDICT r4 item 1):

    * a perfect generator scores exactly 1.0 on EVERY (day, channel),
      including texture-free ones (symmetric floor — a denominator-only
      floor would read hp_t/floor -> 0 there and flag perfection);
    * a degenerate-channel overshoot is bounded by ~1/eps instead of
      the raw ratio's unbounded blowup (the 57-62x sidecar artifacts);
    * on well-conditioned days (hp_t >> floor) floored == raw.
    """
    from train_shipped_ckpt import FLOOR_EPS, floored_ratio_stats

    # 3 days x typical energies, one texture-free channel.
    hp_t = [1.0, 0.8, 1e-4]
    raw, floored, floor = floored_ratio_stats(list(hp_t), hp_t)
    assert floor == FLOOR_EPS * sum(hp_t) / 3
    assert all(abs(r - 1.0) < 1e-12 for r in floored), floored

    # Overshoot on the degenerate channel: raw explodes, floored bounded.
    hp_f = [1.0, 0.8, 0.5]
    raw, floored, floor = floored_ratio_stats(hp_f, hp_t)
    assert raw[2] > 1000
    assert floored[2] < 1.0 / FLOOR_EPS + 1
    # Well-conditioned days: identical.
    assert abs(floored[0] - raw[0]) < 1e-12
    assert abs(floored[1] - raw[1]) < 1e-12
