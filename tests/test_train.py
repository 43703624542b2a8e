"""WGAN-GP train step: compiles as one program, state advances, losses
finite, critic learns to separate real from fake (BASELINE config 2's
tiny-synthetic-train test, SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.core.config import DataConfig, GANConfig, ModelConfig, TrainConfig
from windtpu.data import BatchGenerator, SyntheticDayProvider
from windtpu.train import create_train_state, make_eval_step, make_train_step
from windtpu.train import checkpoint as ckpt

TINY = GANConfig(
    model=ModelConfig(image_size=24, in_channels=3, noise_channels=2,
                      out_channels=2, sequence_length=2,
                      generator_features=16, discriminator_features=4),
    train=TrainConfig(batch_size=2, n_critic=2),
)


def _batch(cfg, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    m = cfg.model
    lr = jax.random.normal(k1, (cfg.train.batch_size, m.sequence_length,
                                m.image_size, m.image_size, m.in_channels))
    hr = jax.random.normal(k2, (cfg.train.batch_size, m.sequence_length,
                                m.image_size, m.image_size, m.out_channels))
    return lr, hr


@pytest.fixture(scope="module")
def trained():
    state = create_train_state(TINY)
    step = make_train_step(TINY)
    lr, hr = _batch(TINY)
    rng = jax.random.key(3)
    metrics = None
    for _ in range(5):
        state, metrics = step(state, lr, hr, rng)
    return state, metrics


def test_step_advances_and_metrics_finite(trained):
    state, metrics = trained
    assert int(state.step) == 5
    expected_keys = {"g_loss", "g_disc_loss", "g_reco_loss", "d_loss",
                     "d_gradient_pen", "g_gradient_param",
                     "d_gradient_param", "d_real", "d_fake", "g_acd",
                     "g_lsd", "g_extreme_rmse", "g_ws_weighted_rmse",
                     "g_ws_rmse"}
    assert expected_keys <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} is not finite"


def test_critic_separates_real_from_fake():
    """After critic-only pressure the Wasserstein gap E[real]-E[fake]
    should become positive (critic assigns higher scores to real)."""
    cfg = TINY
    state = create_train_state(cfg)
    step = make_train_step(cfg)
    lr, hr = _batch(cfg, seed=7)
    rng = jax.random.key(11)
    gaps = []
    for _ in range(12):
        state, m = step(state, lr, hr, rng)
        gaps.append(float(m["d_real"]) - float(m["d_fake"]))
    assert gaps[-1] > gaps[0] or gaps[-1] > 0.0, gaps


def test_params_change():
    cfg = TINY
    state0 = create_train_state(cfg)
    step = make_train_step(cfg)
    lr, hr = _batch(cfg)
    state1, _ = step(state0, lr, hr, jax.random.key(0))
    g0 = jax.tree_util.tree_leaves(create_train_state(cfg).g_params)
    g1 = jax.tree_util.tree_leaves(state1.g_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(g0, g1))


def test_detach_gp_quirk_changes_critic_grads():
    """detach_gp=True (reference parity mode, ganbase.py:32-45) must remove
    the penalty's parameter gradient; the two modes diverge."""
    import dataclasses

    lr, hr = _batch(TINY, seed=5)
    rng = jax.random.key(0)
    cfg_gp = TINY
    cfg_nogp = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, detach_gp=True))
    s_gp, _ = make_train_step(cfg_gp)(create_train_state(cfg_gp), lr, hr, rng)
    s_ng, _ = make_train_step(cfg_nogp)(create_train_state(cfg_nogp), lr, hr, rng)
    d_gp = jax.tree_util.tree_leaves(s_gp.d_params)
    d_ng = jax.tree_util.tree_leaves(s_ng.d_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
               for a, b in zip(d_gp, d_ng))


def test_eval_step(trained):
    state, _ = trained
    lr, hr = _batch(TINY, seed=2)
    metrics = make_eval_step(TINY)(state, lr, hr, jax.random.key(1))
    assert {"loss", "d_real", "d_fake", "g_ws_rmse"} <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_checkpoint_roundtrip(tmp_path, trained):
    state, _ = trained
    path = ckpt.save_checkpoint(tmp_path, state)
    template = create_train_state(TINY)
    restored = ckpt.restore_checkpoint(path, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Generator-only restore for inference, validated against a template.
    g_vars = ckpt.restore_generator(path, template.g_variables())
    assert set(g_vars) == {"params", "batch_stats", "spectral_stats"}
    # A template from a different ModelConfig must fail loudly here, not
    # deep inside apply().
    import dataclasses

    other = create_train_state(dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, generator_features=24)))
    with pytest.raises(ValueError, match="shape|match"):
        ckpt.restore_generator(path, other.g_variables())
    # Saving the same step twice is a no-op, not an Orbax collision (the
    # train loop's cadence save and final save can land on the same step).
    assert ckpt.save_checkpoint(tmp_path, state) == path


def test_train_on_synthetic_pipeline():
    """End-to-end: synthetic day provider -> BatchGenerator -> train step."""
    from windtpu.train.loop import train

    dcfg = DataConfig(sequence_length=2, patch_size=24, batch_size=2,
                      input_variables=("u10", "v10", "elevation"),
                      output_variables=("U_10M", "V_10M"))
    cfg = GANConfig(model=TINY.model, train=TINY.train, data=dcfg)
    dates = ["20200101", "20200102"]
    bg = BatchGenerator(
        SyntheticDayProvider(dates, dcfg.input_variables, ny=32, nx=32, nt=4),
        output_provider=SyntheticDayProvider(
            dates, dcfg.output_variables, ny=32, nx=32, nt=4, seed=9),
        config=dcfg, seed=0,
    )
    state, history = train(cfg, iter(bg), num_steps=2, log_every=1)
    assert int(state.step) == 2
    assert len(history) == 2
    assert np.isfinite(history[-1][1]["g_loss"])


def test_fused_scoring_batches_are_per_sample():
    """fused_scoring's premise: the critic has no cross-sample ops, so
    scoring a doubled batch equals two separate calls (same stats)."""
    from windtpu.models.discriminator import Discriminator, init_discriminator

    m = TINY.model
    variables = init_discriminator(m, jax.random.key(0), batch_size=2)
    k1, k2, k3 = jax.random.split(jax.random.key(4), 3)
    t, i = m.sequence_length, m.image_size
    lr = jax.random.normal(k1, (2, t, i, i, m.in_channels))
    hr_a = jax.random.normal(k2, (2, t, i, i, m.out_channels))
    hr_b = jax.random.normal(k3, (2, t, i, i, m.out_channels))
    model = Discriminator(m)

    def score(lo, hi):
        out, _ = model.apply(variables, lo, hi, train=True,
                             mutable=["spectral_stats"])
        return np.asarray(out)

    both = score(jnp.concatenate([lr, lr]), jnp.concatenate([hr_a, hr_b]))
    np.testing.assert_allclose(both[:2], score(lr, hr_a), atol=1e-5)
    np.testing.assert_allclose(both[2:], score(lr, hr_b), atol=1e-5)


def test_fused_scoring_step_close_to_unfused():
    """One train step with fused_scoring differs from unfused only by the
    spectral-norm u advancing once instead of twice per critic iter — the
    losses must stay close."""
    import dataclasses

    lr, hr = _batch(TINY, seed=13)
    rng = jax.random.key(2)
    cfg_unfused = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, fused_scoring=False))
    cfg_fused = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, fused_scoring=True))
    _, m0 = make_train_step(cfg_unfused)(
        create_train_state(cfg_unfused), lr, hr, rng)
    _, m1 = make_train_step(cfg_fused)(
        create_train_state(cfg_fused), lr, hr, rng)
    for k in ("d_loss", "g_loss", "d_gradient_pen"):
        a, b = float(m0[k]), float(m1[k])
        assert abs(a - b) <= 1e-2 * max(1.0, abs(a)), (k, a, b)


@pytest.mark.parametrize("remat,remat_gp", [
    (False, True), (True, True), ("save_scans", True),
    ("d_only", True), ("d_only", False),
])
def test_remat_modes_are_semantics_preserving(remat, remat_gp):
    """Rematerialization trades memory for recompute; every mode must
    produce the same losses as no-remat to float tolerance."""
    import dataclasses

    lr, hr = _batch(TINY, seed=21)
    rng = jax.random.key(5)
    base = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, remat=False))
    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, remat=remat,
                                        remat_gp=remat_gp))
    _, m0 = make_train_step(base)(create_train_state(base), lr, hr, rng)
    _, m1 = make_train_step(cfg)(create_train_state(cfg), lr, hr, rng)
    for k in ("d_loss", "g_loss", "d_gradient_pen", "g_gradient_param"):
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-4,
                                   err_msg=k)


def test_generator_npz_roundtrip(tmp_path):
    """Bundled single-file weights: save -> load restores every leaf
    bit-exactly, and mismatched trees fail loudly."""
    import numpy as np

    from windtpu.core.config import ModelConfig
    from windtpu.models.generator import init_generator
    from windtpu.train.checkpoint import (load_generator_npz,
                                          save_generator_npz)

    cfg = ModelConfig(image_size=16, in_channels=3, noise_channels=2,
                      out_channels=2, sequence_length=2,
                      generator_features=8, discriminator_features=4)
    v = init_generator(cfg, jax.random.key(7))
    path = save_generator_npz(tmp_path / "g.npz", v)
    loaded = load_generator_npz(path, jax.device_get(v))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(v))[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    other = init_generator(
        ModelConfig(image_size=16, in_channels=4, noise_channels=2,
                    out_channels=2, sequence_length=2,
                    generator_features=8, discriminator_features=4),
        jax.random.key(0))
    with pytest.raises(ValueError):
        load_generator_npz(path, jax.device_get(other))


def test_multi_step_matches_single_steps():
    """steps_per_call scans K steps in one program; the PRNG folds by
    state.step, so results must be IDENTICAL to K single calls."""
    from windtpu.train.wgan_gp import make_multi_train_step

    lr, hr = _batch(TINY, seed=31)
    rng = jax.random.key(17)

    s_single = create_train_state(TINY)
    step = make_train_step(TINY)
    for _ in range(2):
        s_single, m_single = step(s_single, lr, hr, rng)

    s_multi = create_train_state(TINY)
    multi = make_multi_train_step(TINY, 2)
    # K batches arrive as tuples; stacking happens inside the jit so
    # device-sharded batches keep their sharding.
    s_multi, m_multi = multi(s_multi, (lr, lr), (hr, hr), rng)

    assert int(s_multi.step) == int(s_single.step) == 2
    for k in ("g_loss", "d_loss", "d_gradient_pen"):
        np.testing.assert_allclose(float(m_single[k]), float(m_multi[k]),
                                   rtol=1e-5, err_msg=k)
    # atol covers XLA fusion-order float noise between the scanned and
    # per-call programs (observed max |delta| ~2e-10 on ~1e-4 params).
    for a, b in zip(jax.tree_util.tree_leaves(s_single.g_params),
                    jax.tree_util.tree_leaves(s_multi.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-8)


def test_loop_steps_per_call_with_remainder():
    """Train loop with steps_per_call=2 over num_steps=3: one scanned call
    plus one single-step remainder call, still 3 optimizer steps."""
    import dataclasses

    from windtpu.train.loop import train

    dcfg = DataConfig(sequence_length=2, patch_size=24, batch_size=2,
                      input_variables=("u10", "v10", "elevation"),
                      output_variables=("U_10M", "V_10M"))
    tcfg = dataclasses.replace(TINY.train, steps_per_call=2)
    cfg = GANConfig(model=TINY.model, train=tcfg, data=dcfg)
    dates = ["20200101", "20200102"]
    bg = BatchGenerator(
        SyntheticDayProvider(dates, dcfg.input_variables, ny=32, nx=32, nt=4),
        output_provider=SyntheticDayProvider(
            dates, dcfg.output_variables, ny=32, nx=32, nt=4, seed=9),
        config=dcfg, seed=0,
    )
    state, history = train(cfg, iter(bg), num_steps=3, log_every=1)
    assert int(state.step) == 3
    assert np.isfinite(history[-1][1]["g_loss"])


def test_loop_wires_perceptual_reconstruction():
    """reconstruction_coefficient > 0 through the DRIVER must resolve an
    encoder (bundled or random-init) and produce a nonzero reco loss —
    the knob must never be a silent no-op."""
    import dataclasses

    from windtpu.train.loop import train

    dcfg = DataConfig(sequence_length=2, patch_size=24, batch_size=2,
                      input_variables=("u10", "v10", "elevation"),
                      output_variables=("U_10M", "V_10M"))
    tcfg = dataclasses.replace(TINY.train, reconstruction_coefficient=1.0)
    cfg = GANConfig(model=TINY.model, train=tcfg, data=dcfg)
    dates = ["20200101"]
    bg = BatchGenerator(
        SyntheticDayProvider(dates, dcfg.input_variables, ny=32, nx=32, nt=4),
        output_provider=SyntheticDayProvider(
            dates, dcfg.output_variables, ny=32, nx=32, nt=4, seed=9),
        config=dcfg, seed=0,
    )
    state, history = train(cfg, iter(bg), num_steps=1, log_every=1)
    assert float(history[-1][1]["g_reco_loss"]) > 0.0


def test_latest_checkpoint_ignores_orbax_tmp(tmp_path):
    """An interrupted Orbax save leaves step_N.orbax-checkpoint-tmp-<ts>
    beside the finished checkpoints; resume must never pick it (it sorts
    lexicographically after the real step_N)."""
    for name in ("step_00000099", "step_00000100",
                 "step_00000100.orbax-checkpoint-tmp-1755500000",
                 "step_00000101.orbax-checkpoint-tmp-1755500001"):
        (tmp_path / name).mkdir()
    latest = ckpt.latest_checkpoint(tmp_path)
    assert latest is not None and latest.endswith("step_00000100")


def test_train_step_follows_batch_time_length():
    """Noise/instance-noise shapes come from the batch, not ModelConfig:
    the recurrent nets handle any sequence length, so a batch with a
    different T than the config's nominal one must train."""
    state = create_train_state(TINY)
    step = make_train_step(TINY)
    m = TINY.model
    k1, k2 = jax.random.split(jax.random.key(11))
    t = m.sequence_length + 2
    lr = jax.random.normal(k1, (2, t, m.image_size, m.image_size,
                                m.in_channels))
    hr = jax.random.normal(k2, (2, t, m.image_size, m.image_size,
                                m.out_channels))
    state, metrics = step(state, lr, hr, jax.random.key(12))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_train_step_channel_mismatch_fails_fast():
    """A batch whose channel count disagrees with ModelConfig.in_channels
    must raise a clear error at trace time, not an opaque concat-shape
    error deep inside the generator."""
    state = create_train_state(TINY)
    step = make_train_step(TINY)
    m = TINY.model
    lr = jnp.zeros((2, m.sequence_length, m.image_size, m.image_size,
                    m.in_channels + 7))
    hr = jnp.zeros((2, m.sequence_length, m.image_size, m.image_size,
                    m.out_channels))
    with pytest.raises(ValueError, match="in_channels"):
        step(state, lr, hr, jax.random.key(0))


def test_sharpness_loss_zero_when_matched():
    from windtpu.train.losses import highpass_energy_ratio_loss

    x = jax.random.normal(jax.random.key(0), (2, 2, 24, 24, 2))
    assert float(highpass_energy_ratio_loss(x, x)) < 1e-10


def test_sharpness_loss_penalizes_blurry_and_oversharp():
    """A blurred fake (missing fine-scale energy) and an over-sharpened
    fake (excess energy) must both score positive, and the gradient wrt
    the fake must push energy in the correcting direction."""
    from windtpu.train.losses import highpass_energy_ratio_loss

    truth = jax.random.normal(jax.random.key(1), (2, 2, 24, 24, 2))
    k = jnp.ones((1, 1, 5, 5, 1)) / 25.0
    blurry = jax.lax.conv_general_dilated(
        truth.reshape(4, 24, 24, 2).transpose(0, 3, 1, 2),
        jnp.ones((2, 1, 5, 5)) / 25.0, (1, 1), "SAME",
        feature_group_count=2).transpose(0, 2, 3, 1).reshape(truth.shape)
    del k
    loss_blur = float(highpass_energy_ratio_loss(blurry, truth, sigma=3.0))
    loss_sharp = float(highpass_energy_ratio_loss(truth * 3.0, truth,
                                                  sigma=3.0))
    assert loss_blur > 0.1 and loss_sharp > 0.1
    # Gradient direction: moving the blurry fake toward the truth must
    # decrease the loss.
    g = jax.grad(lambda f: highpass_energy_ratio_loss(f, truth,
                                                      sigma=3.0))(blurry)
    stepped = blurry - 0.1 * g
    assert (float(highpass_energy_ratio_loss(stepped, truth, sigma=3.0))
            < loss_blur)


def test_sharpness_loss_floored_on_degenerate_channel():
    """An axis-pinned day leaves one truth channel nearly texture-free
    (hp_truth ~ 1% of typical).  The unfloored log-ratio there explodes
    to (log 50)^2 ~ 15 with an O(1/hp) gradient — measured to
    destabilize fine-tuning (_ft7_run: d-loss swinging +-300).  The
    rel_floor clamps both energies at 5% of the batch-mean truth
    energy, so a fake whose quiet-channel texture is AT the floor pays
    nothing, and one well above it pays a bounded log-vs-floor penalty."""
    from windtpu.train.losses import highpass_energy_ratio_loss

    k = jax.random.key(2)
    textured = jax.random.normal(k, (2, 2, 24, 24, 1))
    quiet = 0.01 * jax.random.normal(jax.random.key(3), (2, 2, 24, 24, 1))
    truth = jnp.concatenate([textured, quiet], axis=-1)

    # Fake matches the textured channel, paints isotropic texture on the
    # quiet one (the degenerate-regime failure mode).
    fake_over = jnp.concatenate(
        [textured, jax.random.normal(jax.random.key(4), quiet.shape)],
        axis=-1)
    loss_over = float(highpass_energy_ratio_loss(fake_over, truth,
                                                 sigma=3.0))
    # Bounded: each degenerate term is ~log((hp_fake+floor)/floor)^2
    # <= log(1/rel_floor + 1)^2 ~ 9.3, not log(hp_fake/hp_truth)^2
    # which is unbounded as the truth channel's texture vanishes.
    assert 0.0 < loss_over < 16.0, loss_over

    # A fake whose quiet channel sits at (or below) the floor pays ~0
    # for that channel: total loss is dominated by... nothing, both
    # channels matched => near zero.
    fake_ok = jnp.concatenate([textured, 0.01 * jax.random.normal(
        jax.random.key(5), quiet.shape)], axis=-1)
    assert float(highpass_energy_ratio_loss(fake_ok, truth,
                                            sigma=3.0)) < 1e-2

    # Gradient on the degenerate channel is finite and pushes its
    # energy down.
    g = jax.grad(lambda f: highpass_energy_ratio_loss(f, truth,
                                                      sigma=3.0))(fake_over)
    assert bool(jnp.isfinite(g).all())
    stepped = fake_over - 0.05 * g
    assert (float(highpass_energy_ratio_loss(stepped, truth, sigma=3.0))
            < loss_over)


def test_train_step_with_sharpness_coefficient():
    tcfg = TrainConfig(batch_size=2, n_critic=1, sharpness_coefficient=5.0,
                       compute_metrics=False)
    cfg = GANConfig(model=TINY.model, train=tcfg)
    state = create_train_state(cfg)
    step = make_train_step(cfg)
    lr, hr = _batch(cfg)
    state, metrics = step(state, lr, hr, jax.random.key(0))
    assert float(metrics["g_sharp_loss"]) > 0
    assert np.isfinite(float(metrics["g_loss"]))
    # Default config keeps the term off (reference parity).
    state0 = create_train_state(TINY)
    _, m0 = make_train_step(TINY)(state0, *_batch(TINY), jax.random.key(0))
    assert float(m0["g_sharp_loss"]) == 0.0


def test_supervised_polish_mode_trains_without_critic():
    """adversarial_coefficient=0 + n_critic=0: the generator trains on
    reconstruction + sharpness alone, the critic params must not move,
    and the generator's must (the supervised-polish mode for sculpting
    the bundled checkpoint's texture amplitude)."""
    tcfg = TrainConfig(batch_size=2, n_critic=0,
                       adversarial_coefficient=0.0,
                       reconstruction_coefficient=10.0,
                       sharpness_coefficient=5.0, compute_metrics=False)
    cfg = GANConfig(model=TINY.model, train=tcfg)
    state = create_train_state(cfg)
    step = make_train_step(cfg, feature_fn=lambda x: x)
    d0 = jax.device_get(state.d_params)
    g0 = jax.device_get(state.g_params)
    lr, hr = _batch(cfg)
    state, metrics = step(state, lr, hr, jax.random.key(0))
    assert float(metrics["g_sharp_loss"]) >= 0
    assert np.isfinite(float(metrics["g_loss"]))
    d1 = jax.device_get(state.d_params)
    g1 = jax.device_get(state.g_params)
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(d0), jax.tree_util.tree_leaves(d1)))
    assert any(not np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)))
