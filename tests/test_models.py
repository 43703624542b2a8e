"""Golden-shape and behavior tests for the Flax models.

Mirrors the construction-time shape asserts embedded in the reference model
builders (gan/models.py:35,41,46,51,57,65,68,72,109,138).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.core.config import ModelConfig
from windtpu.models.discriminator import Discriminator, _pyramid_sizes, init_discriminator
from windtpu.models.generator import Generator, init_generator
from windtpu.models import layers as L

TINY = ModelConfig(image_size=32, in_channels=3, noise_channels=4,
                   out_channels=2, sequence_length=3, generator_features=32,
                   discriminator_features=8)


def _gen_inputs(cfg, batch=2, seed=0):
    k = jax.random.key(seed)
    k1, k2 = jax.random.split(k)
    img = jax.random.normal(
        k1, (batch, cfg.sequence_length, cfg.image_size, cfg.image_size,
             cfg.in_channels))
    noi = jax.random.normal(
        k2, (batch, cfg.sequence_length, cfg.image_size, cfg.image_size,
             cfg.noise_channels))
    return img, noi


class TestGenerator:
    def test_output_shape(self):
        cfg = TINY
        variables = init_generator(cfg, jax.random.key(0), batch_size=2)
        img, noi = _gen_inputs(cfg)
        out = Generator(cfg).apply(variables, img, noi, train=False)
        assert out.shape == (2, cfg.sequence_length, cfg.image_size,
                             cfg.image_size, cfg.out_channels)
        assert out.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_variable_collections(self):
        variables = init_generator(TINY, jax.random.key(0))
        assert set(variables) == {"params", "batch_stats", "spectral_stats"}

    def test_noise_changes_output(self):
        cfg = TINY
        variables = init_generator(cfg, jax.random.key(0), batch_size=1)
        img, noi = _gen_inputs(cfg, batch=1)
        out1 = Generator(cfg).apply(variables, img, noi, train=False)
        out2 = Generator(cfg).apply(variables, img, noi * 2 + 1, train=False)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_train_mode_updates_state(self):
        cfg = TINY
        variables = init_generator(cfg, jax.random.key(0), batch_size=2)
        img, noi = _gen_inputs(cfg)
        _, updates = Generator(cfg).apply(
            variables, img, noi, train=True,
            mutable=["batch_stats", "spectral_stats"])
        old_bn = jax.tree_util.tree_leaves(variables["batch_stats"])
        new_bn = jax.tree_util.tree_leaves(updates["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(old_bn, new_bn)
        )
        assert changed, "batch_stats should move in train mode"


class TestDiscriminator:
    def test_score_shape(self):
        cfg = TINY
        variables = init_discriminator(cfg, jax.random.key(0), batch_size=2)
        img, _ = _gen_inputs(cfg)
        hr = jax.random.normal(
            jax.random.key(9),
            (2, cfg.sequence_length, cfg.image_size, cfg.image_size,
             cfg.out_channels))
        score = Discriminator(cfg).apply(variables, img, hr, train=False)
        assert score.shape == (2, 1)
        assert bool(jnp.all(jnp.isfinite(score)))

    def test_pyramid_sizes_96(self):
        # Reference: 96 -> 31 -> 9 (>=16 pyramid), 9 -> 2 (>=4 pyramid).
        s1, s2, s3, final = _pyramid_sizes(96)
        assert [o for _, o in s1] == [31, 9]
        assert [o for _, o in s2] == [2]
        assert s3 == []
        assert final == 2

    def test_mismatched_sizes_raise(self):
        cfg = TINY
        variables = init_discriminator(cfg, jax.random.key(0))
        img, _ = _gen_inputs(cfg, batch=1)
        bad_hr = jnp.zeros((1, cfg.sequence_length, cfg.image_size // 2,
                            cfg.image_size // 2, cfg.out_channels))
        with pytest.raises(ValueError):
            Discriminator(cfg).apply(variables, img, bad_hr)

    def test_hr_sensitivity(self):
        cfg = TINY
        variables = init_discriminator(cfg, jax.random.key(0), batch_size=1)
        img, _ = _gen_inputs(cfg, batch=1)
        hr1 = jax.random.normal(
            jax.random.key(1),
            (1, cfg.sequence_length, cfg.image_size, cfg.image_size,
             cfg.out_channels))
        s1 = Discriminator(cfg).apply(variables, img, hr1)
        s2 = Discriminator(cfg).apply(variables, img, hr1 * 3)
        assert not np.allclose(np.asarray(s1), np.asarray(s2))


class TestLayers:
    def test_spectral_norm_bounds_sigma(self):
        """After normalization the top singular value must be ~1."""
        key = jax.random.key(0)
        kernel = 5.0 * jax.random.normal(key, (3, 3, 8, 16))
        model = L.SpectralNorm(update_stats=True)
        variables = model.init(jax.random.key(1), kernel)
        # A few power iterations to converge u.
        for _ in range(20):
            normalized, variables = model.apply(
                kernel=kernel, variables=variables,
                mutable=["spectral_stats"])
        w = np.asarray(normalized).reshape(-1, 16)
        top_sv = np.linalg.svd(w, compute_uv=False)[0]
        assert abs(top_sv - 1.0) < 1e-2

    def test_convlstm_shapes_and_recurrence(self):
        model = L.ConvLSTM(features=8, kernel_size=(3, 3))
        x = jax.random.normal(jax.random.key(0), (2, 5, 8, 8, 4))
        variables = model.init(jax.random.key(1), x)
        y = model.apply(variables, x)
        assert y.shape == (2, 5, 8, 8, 8)
        # Output at t depends on inputs at t' <= t only (causality).
        x2 = x.at[:, 3].set(x[:, 3] + 1.0)
        y2 = model.apply(variables, x2)
        np.testing.assert_allclose(np.asarray(y[:, :3]),
                                   np.asarray(y2[:, :3]), rtol=1e-6)
        assert not np.allclose(np.asarray(y[:, 3:]), np.asarray(y2[:, 3:]))

    def test_shortcut_geometry_maps_size(self):
        """The stride/pad/kernel arithmetic must land exactly on target
        (reference tf_utils.py:23-26)."""
        for in_size, target in [(31, 2), (96, 9), (20, 6), (10, 2), (64, 7)]:
            s, p, k = L.shortcut_geometry(in_size, target)
            out = (in_size + 2 * p - k) // s + 1
            assert out == target, (in_size, target, s, p, k, out)

    def test_hard_sigmoid(self):
        x = jnp.array([-10.0, -2.5, 0.0, 2.5, 10.0])
        np.testing.assert_allclose(
            np.asarray(L.hard_sigmoid(x)), [0.0, 0.0, 0.5, 1.0, 1.0])

    def test_bilinear_upsample(self):
        x = jnp.arange(16.0).reshape(1, 1, 4, 4, 1)
        y = L.bilinear_upsample_2x(x)
        assert y.shape == (1, 1, 8, 8, 1)


class TestSplitStem:
    def test_split_stem_matches_fused_concat(self):
        """split_stem computes the entry conv as two sliced convs over the
        SAME kernel tensor — identical function, identical param tree."""
        import dataclasses

        cfg_split = dataclasses.replace(TINY, split_stem=True)
        cfg_fused = dataclasses.replace(TINY, split_stem=False)
        variables = init_generator(cfg_split, jax.random.key(1), batch_size=2)
        img, noi = _gen_inputs(TINY, seed=3)
        out_s = Generator(cfg_split).apply(variables, img, noi, train=False)
        out_f = Generator(cfg_fused).apply(variables, img, noi, train=False)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                                   atol=1e-5)


class TestFusedCriticBranches:
    """The block-diagonal dual-branch recurrence (layers.fused_dual_convlstm)
    must be the same function as two separate ConvLSTMs — same parameter
    tree, same outputs, same gradients."""

    def _setup(self):
        import dataclasses

        cfg_f = dataclasses.replace(TINY, critic_fused_branches=True)
        cfg_u = dataclasses.replace(TINY, critic_fused_branches=False)
        variables = init_discriminator(cfg_u, jax.random.key(3),
                                       batch_size=2)
        k1, k2 = jax.random.split(jax.random.key(9))
        t, i = TINY.sequence_length, TINY.image_size
        lr = jax.random.normal(k1, (2, t, i, i, TINY.in_channels))
        hr = jax.random.normal(k2, (2, t, i, i, TINY.out_channels))
        return cfg_f, cfg_u, variables, lr, hr

    def test_fused_critic_branches_match_unfused(self):
        cfg_f, cfg_u, variables, lr, hr = self._setup()
        s_u = Discriminator(cfg_u).apply(variables, lr, hr, train=False)
        s_f = Discriminator(cfg_f).apply(variables, lr, hr, train=False)
        np.testing.assert_allclose(np.asarray(s_u), np.asarray(s_f),
                                   atol=1e-5)

    def test_param_trees_interchangeable(self):
        cfg_f, cfg_u, v_unfused, *_ = self._setup()
        v_fused = init_discriminator(cfg_f, jax.random.key(3), batch_size=2)
        shapes_u = jax.tree_util.tree_map(lambda a: a.shape, v_unfused)
        shapes_f = jax.tree_util.tree_map(lambda a: a.shape, v_fused)
        assert shapes_u == shapes_f

    def test_gradients_match(self):
        cfg_f, cfg_u, variables, lr, hr = self._setup()

        def loss(params, cfg):
            v = {**variables, "params": params}
            return jnp.mean(Discriminator(cfg).apply(v, lr, hr, train=False))

        g_u = jax.grad(loss)(variables["params"], cfg_u)
        g_f = jax.grad(loss)(variables["params"], cfg_f)
        flat_u = jax.tree_util.tree_leaves_with_path(g_u)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
        for path, leaf_u in flat_u:
            np.testing.assert_allclose(
                np.asarray(leaf_u), np.asarray(flat_f[path]),
                atol=2e-5, err_msg=str(path))


class TestCriticScanUnroll:
    @pytest.mark.parametrize("unroll", [1, 2])
    def test_unroll_matches_rolled(self, unroll):
        """lax.scan unroll is a scheduling choice, not a math change: critic
        scores must match the fully-rolled recurrence for any factor
        (including non-divisors of T)."""
        import dataclasses

        cfg_rolled = dataclasses.replace(TINY, critic_scan_unroll=1)
        cfg_u = dataclasses.replace(TINY, critic_scan_unroll=unroll)
        variables = init_discriminator(cfg_rolled, jax.random.key(2),
                                       batch_size=2)
        k1, k2 = jax.random.split(jax.random.key(8))
        t, i = TINY.sequence_length, TINY.image_size
        lr = jax.random.normal(k1, (2, t, i, i, TINY.in_channels))
        hr = jax.random.normal(k2, (2, t, i, i, TINY.out_channels))
        s0 = Discriminator(cfg_rolled).apply(variables, lr, hr, train=False)
        s1 = Discriminator(cfg_u).apply(variables, lr, hr, train=False)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
