"""Flow-conditional texture gate (models/texture_gate.py).

Covers the exact-energy spectral solve, the floor semantics, the numpy
twins used by the streaming/API host paths, asset round-trip, the
bundled calibration's quality envelope on held-out protocol terrain, and
the API integration (gated vs ungated predict).  Reference parity note:
the reference has no such component — this gates a windtpu-only quality
addition (see the module docstring for the campaign evidence trail).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.models import texture_gate as tg

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

RNG = np.random.RandomState(7)
FAKE = RNG.randn(2, 4, 64, 64, 2).astype(np.float32)
LOW = RNG.randn(2, 4, 64, 64, 3).astype(np.float32)


def _metric_hp(field):
    """The sharpness metric's high-pass energy (numpy oracle, matching
    tools/train_shipped_ckpt.highpass_energy)."""
    ny, nx = field.shape[-2:]
    ky = np.fft.fftfreq(ny)[:, None]
    kx = np.fft.fftfreq(nx)[None, :]
    g = np.exp(-2.0 * (np.pi * tg.SIGMA) ** 2 * (ky ** 2 + kx ** 2))
    blur = np.fft.ifft2(np.fft.fft2(field) * g).real
    return float(np.mean((field - blur) ** 2))


class TestExactSolve:
    def test_gated_energy_hits_target(self):
        """The closed-form gain drives the METRIC's high-pass energy of
        the gated field to the requested target exactly (the naive
        sqrt(target/measured) would miss the HG-mid-band cross term)."""
        meas = np.array([[_metric_hp(FAKE[i, ..., c]) for c in (0, 1)]
                         for i in range(2)], np.float32)
        target = meas * np.array([[0.5, 2.0], [1.7, 0.3]], np.float32)
        out = np.asarray(tg.apply_gate_targeted(
            jnp.asarray(target), jnp.float32(1e-6), jnp.asarray(FAKE)))
        got = np.array([[_metric_hp(out[i, ..., c]) for c in (0, 1)]
                        for i in range(2)])
        np.testing.assert_allclose(got, target, rtol=1e-4)

    def test_identity_when_target_equals_measured(self):
        meas = np.array([[_metric_hp(FAKE[i, ..., c]) for c in (0, 1)]
                         for i in range(2)], np.float32)
        out = np.asarray(tg.apply_gate_targeted(
            jnp.asarray(meas), jnp.float32(1e-6), jnp.asarray(FAKE)))
        np.testing.assert_allclose(out, FAKE, atol=5e-6)

    def test_clip_bounds_attenuation(self):
        """An unreachably small target clamps at S_MIN — bounded damage."""
        meas = np.array([[_metric_hp(FAKE[i, ..., c]) for c in (0, 1)]
                         for i in range(2)], np.float32)
        out = np.asarray(tg.apply_gate_targeted(
            jnp.asarray(meas * 1e-4), jnp.float32(1e-9), jnp.asarray(FAKE)))
        got = np.array([[_metric_hp(out[i, ..., c]) for c in (0, 1)]
                        for i in range(2)])
        # Energy floor at roughly S_MIN^2 of the original (plus leakage).
        assert np.all(got > 0.8 * tg.S_MIN ** 2 * meas)
        assert np.all(got < 1.5 * tg.S_MIN ** 2 * meas)

    def test_floor_short_circuit(self):
        """Both prediction and measurement under the floor: the channel
        is texture-free on both sides — the gate must NOT amplify noise
        up to the floor; the field passes through unchanged."""
        calm = 1e-4 * FAKE
        meas = np.array([[_metric_hp(calm[i, ..., c]) for c in (0, 1)]
                         for i in range(2)], np.float32)
        floor = np.float32(meas.max() * 100)
        out = np.asarray(tg.apply_gate_targeted(
            jnp.asarray(meas * 0.5), floor, jnp.asarray(calm)))
        np.testing.assert_allclose(out, calm, atol=1e-7)


class TestNumpyTwins:
    def test_features_match(self):
        f_j = np.asarray(tg._features(jnp.asarray(LOW)))
        f_n = tg.features_np(LOW)
        np.testing.assert_allclose(f_j, f_n, atol=1e-5)

    def test_targeted_apply_matches(self):
        meas = np.array([[_metric_hp(FAKE[i, ..., c]) for c in (0, 1)]
                         for i in range(2)], np.float32)
        target = meas * np.array([[0.5, 2.0], [1.7, 0.3]], np.float32)
        out_j = np.asarray(tg.apply_gate_targeted(
            jnp.asarray(target), jnp.float32(1e-6), jnp.asarray(FAKE)))
        out_n = tg.apply_gate_targeted_np(target, 1e-6, FAKE)
        np.testing.assert_allclose(out_j, out_n, atol=1e-5)

    def test_full_gate_equals_split_path(self):
        """apply_gate (protocol path) == host prediction + targeted
        apply (API path) — the two shipping code paths agree."""
        params = tg.init_params(jax.random.key(0))
        params["floor"] = jnp.float32(1e-6)
        full = np.asarray(tg.apply_gate(params, jnp.asarray(LOW),
                                        jnp.asarray(FAKE)))
        pred = np.exp(tg.predict_log_energy_np(params, LOW))
        split = tg.apply_gate_targeted_np(pred, 1e-6, FAKE)
        np.testing.assert_allclose(full, split, atol=1e-5)


class TestAsset:
    def test_roundtrip(self, tmp_path):
        params = tg.init_params(jax.random.key(1))
        p = str(tmp_path / "gate.npz")
        tg.save_gate_npz(p, params)
        loaded = tg.load_gate_npz(p)
        assert set(loaded) == set(params)
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]),
                                          np.asarray(loaded[k]))

    def test_bundled_asset_contract(self):
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "windtpu", "assets", "weights",
            "texture-gate.npz")
        params = tg.load_gate_npz(path)
        assert params["w1"].shape[0] == tg.N_FEATURES
        assert float(params["floor"]) > 0
        # Calibration constants must be filled in (not init defaults).
        assert float(jnp.max(jnp.abs(params["f_mu"]))) > 0

    def test_bundled_calibration_envelope(self):
        """The shipped calibration's error envelope on HELD-OUT protocol
        terrain: gating a PERFECT generator (fake == truth) must keep
        every per-(day, channel) floored ratio within the demanded
        [0.8, 1.5] band — the gate's own error is what bounds how close
        the shipped bundle can sit to 1.0 (docs/texture_gate_fit.json
        records [0.90, 1.10] at calibration time)."""
        from train_shipped_ckpt import (floored_ratio_stats,
                                        highpass_energy,
                                        make_holdout_batches)

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "windtpu", "assets", "weights",
            "texture-gate.npz")
        params = tg.load_gate_npz(path)
        hp_g, hp_t = [], []
        for low, high in make_holdout_batches(777, axis_batches=1):
            gated = np.asarray(tg.apply_gate(params, jnp.asarray(low),
                                             jnp.asarray(high)))
            for ch in (0, 1):
                hp_g.append(highpass_energy(gated[..., ch]))
                hp_t.append(highpass_energy(high[..., ch]))
        _, floored, _ = floored_ratio_stats(hp_g, hp_t)
        assert all(0.8 < r < 1.5 for r in floored), floored


class TestApiIntegration:
    def test_predict_gated_vs_ungated(self):
        """api.predict applies the gate when asked: outputs differ from
        the ungated run, _LAST_RUN records it, and the gated output's
        metric energy lands on the host-side prediction."""
        from windtpu import api
        from windtpu.core.config import GANConfig, TrainConfig
        from windtpu.network import WindDownscalingGAN
        from test_infer import (TINY_M, _fake_dem, _fake_era5,
                                build_high_res_template_from_era5,
                                process_era5, process_topo)

        cfg = GANConfig(model=TINY_M, train=TrainConfig(batch_size=2))
        network = WindDownscalingGAN(cfg)
        era5 = _fake_era5(nt=4)
        tpl = build_high_res_template_from_era5(era5)
        inputs_era5 = process_era5(era5, tpl)
        inputs_topo = process_topo(_fake_dem(), tpl)

        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(0), mesh=None)
        plain = api.predict(inputs_era5, inputs_topo, tpl,
                            texture_gate=False, **kw)
        assert api._LAST_RUN["texture_gate"] is False

        params = tg.init_params(jax.random.key(2))
        params["floor"] = jnp.float32(1e-7)
        gated = api.predict(inputs_era5, inputs_topo, tpl,
                            texture_gate=params, **kw)
        assert api._LAST_RUN["texture_gate"] is True
        u0 = plain["u10"].values
        u1 = gated["u10"].values
        # The tiny config's canvas has NaN holes (cells no patch covers);
        # the gate must leave the hole mask identical and keep every
        # covered cell finite.
        finite = np.isfinite(u0)
        np.testing.assert_array_equal(finite, np.isfinite(u1))
        assert not np.allclose(u0[finite], u1[finite])
        # network.texture_gate is None on a hand-built network, so
        # "auto" must be OFF here (parity/seam tests rely on this).
        auto = api.predict(inputs_era5, inputs_topo, tpl, **kw)
        assert api._LAST_RUN["texture_gate"] is False
        np.testing.assert_allclose(auto["u10"].values[finite], u0[finite],
                                   atol=1e-6)

    def test_streaming_gate_matches_monolithic(self):
        """The streamed path gates through the numpy twin, the monolithic
        path through the jitted device fn — same gains, seam-identical
        output to float precision."""
        from windtpu import api
        from windtpu.core.config import GANConfig, TrainConfig
        from windtpu.network import WindDownscalingGAN
        from test_infer import (TINY_M, _fake_dem, _fake_era5,
                                build_high_res_template_from_era5,
                                process_era5, process_topo)

        cfg = GANConfig(model=TINY_M, train=TrainConfig(batch_size=2))
        network = WindDownscalingGAN(cfg)
        era5 = _fake_era5(nt=4)
        tpl = build_high_res_template_from_era5(era5)
        inputs_era5 = process_era5(era5, tpl)
        inputs_topo = process_topo(_fake_dem(), tpl)

        params = tg.init_params(jax.random.key(3))
        params["floor"] = jnp.float32(1e-7)
        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(0), mesh=None, texture_gate=params)
        mono = api.predict(inputs_era5, inputs_topo, tpl,
                           streaming=False, **kw)
        assert api._LAST_RUN["texture_gate"] is True
        stream = api.predict(inputs_era5, inputs_topo, tpl,
                             streaming=True, **kw)
        assert api._LAST_RUN["mode"] == "streaming"
        assert api._LAST_RUN["texture_gate"] is True
        a, b = mono["u10"].values, stream["u10"].values
        fin = np.isfinite(a)
        np.testing.assert_array_equal(fin, np.isfinite(b))
        np.testing.assert_allclose(a[fin], b[fin], atol=1e-4)
