"""Host-streaming inference engine (infer/streaming.py): the capacity
fallback for domains whose field+canvas would overflow one chip's HBM
(VERDICT r2 item 6 / BASELINE config 5).  Must be seam-identical to the
monolithic on-device engine — same tiling, statistics, and per-group
noise streams."""

import jax
import numpy as np
import pytest

from windtpu.core.config import GANConfig, InferenceConfig, ModelConfig, TrainConfig
from windtpu.infer.engine import downscale_field
from windtpu.infer.streaming import downscale_field_streaming
from windtpu.models.generator import init_generator

TINY_M = ModelConfig(image_size=32, in_channels=3, noise_channels=2,
                     out_channels=2, sequence_length=4,
                     generator_features=16, discriminator_features=8)
TINY_I = InferenceConfig(sequence_length=4, image_size=32, noise_channels=2,
                         border_crop=2, group_size=4, overlap_factor=0.5)


def _field(t=4, h=48, w=48, seed=0):
    return np.random.RandomState(seed).standard_normal(
        (t, h, w, 3)).astype(np.float32)


class TestStreamingEngine:
    def test_matches_monolithic_engine(self):
        """Same key, same domain -> same output (up to the fp64-vs-fp32
        statistics accumulation) wherever both engines fit."""
        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = _field()
        key = jax.random.key(7)
        on_device, plan = downscale_field(g_vars, field, TINY_M, TINY_I,
                                          key=key)
        streamed, s_plan = downscale_field_streaming(g_vars, field, TINY_M,
                                                     TINY_I, key=key)
        assert s_plan.patch_origins().tolist() == \
            plan.patch_origins().tolist()
        a, b = np.asarray(on_device), np.asarray(streamed)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], atol=2e-3, rtol=1e-3)

    def test_matches_per_channel_mode(self):
        """Seam identity holds in the fixed (non-quirk) normalization
        mode too — both engines reduce over (patch, time, lat, lon)."""
        import dataclasses

        icfg = dataclasses.replace(TINY_I,
                                   replicate_normalization_quirk=False)
        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = _field(seed=3)
        key = jax.random.key(11)
        on_device, _ = downscale_field(g_vars, field, TINY_M, icfg, key=key)
        streamed, _ = downscale_field_streaming(g_vars, field, TINY_M, icfg,
                                                key=key)
        a, b = np.asarray(on_device), np.asarray(streamed)
        m = ~np.isnan(a)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        np.testing.assert_allclose(a[m], b[m], atol=2e-3, rtol=1e-3)

    def test_nan_holes_excluded_from_stats(self):
        """NaN input pixels (uncovered regrid cells) must not poison the
        normalization statistics in either engine."""
        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = _field(seed=5)
        field[:, :3, :3, 0] = np.nan
        key = jax.random.key(2)
        on_device, _ = downscale_field(g_vars, field, TINY_M, TINY_I,
                                       key=key)
        streamed, _ = downscale_field_streaming(g_vars, field, TINY_M,
                                                TINY_I, key=key)
        a, b = np.asarray(on_device), np.asarray(streamed)
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], atol=2e-3, rtol=1e-3)

    def test_out_of_bounds_plan_matches_engine(self):
        """Seam identity for caller-supplied plans whose covered window
        exceeds the field (h - img < sy <= h - img + crop): the streamed
        stitch must clamp the CROPPED update start the way XLA's
        dynamic_update_slice does (clamp(sy + crop, h - size)), not clamp
        the patch start and add crop — those differ in this range."""
        from windtpu.infer.tiling import TilingPlan

        t, h, w = 4, 48, 48
        img, crop = TINY_M.image_size, TINY_I.border_crop
        assert h - img < 17 <= h - img + crop
        plan = TilingPlan(
            image_size=img, sequence_length=TINY_I.sequence_length,
            pixels_lat=h, pixels_lon=w, time_window=t,
            starts_x=(0, 16), starts_y=(0, 17), num_time_chunks=1)
        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = _field(t=t, h=h, w=w, seed=9)
        key = jax.random.key(13)
        on_device, _ = downscale_field(g_vars, field, TINY_M, TINY_I,
                                       key=key, plan=plan)
        streamed, _ = downscale_field_streaming(g_vars, field, TINY_M,
                                                TINY_I, key=key, plan=plan)
        a, b = np.asarray(on_device), np.asarray(streamed)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], atol=2e-3, rtol=1e-3)

    def test_device_memory_is_domain_independent(self):
        """The streamed path only ever puts one patch group on device:
        a domain 4x larger must not change the jitted program (cache
        keyed on group shape alone)."""
        from windtpu.infer.streaming import _group_apply

        _group_apply.cache_clear()
        g_vars = init_generator(TINY_M, jax.random.key(0))
        downscale_field_streaming(g_vars, _field(h=48, w=48), TINY_M,
                                  TINY_I, key=jax.random.key(0))
        downscale_field_streaming(g_vars, _field(h=96, w=96), TINY_M,
                                  TINY_I, key=jax.random.key(0))
        info = _group_apply.cache_info()
        assert info.misses == 1 and info.hits >= 1


class TestApiStreaming:
    def _setup(self):
        from windtpu.infer.template import (
            build_high_res_template_from_era5, process_era5, process_topo)
        from windtpu.network import WindDownscalingGAN
        from tests.test_infer import _fake_dem, _fake_era5

        cfg = GANConfig(model=TINY_M, train=TrainConfig(batch_size=2))
        network = WindDownscalingGAN(cfg)
        era5 = _fake_era5(nt=4)
        tpl = build_high_res_template_from_era5(era5)
        return (network, process_era5(era5, tpl),
                process_topo(_fake_dem(), tpl), tpl)

    def test_predict_streaming_matches_default(self):
        from windtpu import api

        network, inputs_era5, inputs_topo, tpl = self._setup()
        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(0))
        base = api.predict(inputs_era5, inputs_topo, tpl,
                           streaming=False, mesh=None, **kw)
        streamed = api.predict(inputs_era5, inputs_topo, tpl,
                               streaming=True, **kw)
        assert api.last_run_info()["mode"] == "streaming"
        for var in ("u10", "v10"):
            a = base[var].values
            b = streamed[var].values
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
            m = ~np.isnan(a)
            np.testing.assert_allclose(a[m], b[m], atol=2e-3, rtol=1e-3)

    def test_predict_streaming_ensemble(self):
        from windtpu import api

        network, inputs_era5, inputs_topo, tpl = self._setup()
        out = api.predict(inputs_era5, inputs_topo, tpl,
                          overlap_factor=0.01, network=network,
                          key=jax.random.key(1), ensemble_members=2,
                          streaming=True)
        assert out["u10"].dims == ("member", "time", "lat_1", "lon_1")
        p = out["u10"].values
        m = ~np.isnan(p[0])
        assert not np.allclose(p[0][m], p[1][m])

    def test_predict_streaming_ensemble_matches_monolithic(self):
        """Member-for-member seam identity of the ensemble path: the
        streamed predict must reproduce the monolithic vmapped ensemble
        (same jax.random.split member keys, same per-group noise
        streams) — not merely produce members that differ.

        Tolerance: on the real TPU the monolithic engine is one XLA
        program (members vmap-batched through the convs) and streaming
        is a small per-group program, so fp32 rounding differs across
        the program boundary — measured max |diff| 4.6e-3, mean 7e-6 on
        a v5e at value scale ~1.6 (a key-stream bug shows up as O(1)
        decorrelation, far above the 1e-2 bound)."""
        from windtpu import api

        network, inputs_era5, inputs_topo, tpl = self._setup()
        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(3), ensemble_members=2)
        base = api.predict(inputs_era5, inputs_topo, tpl,
                           streaming=False, mesh=None, **kw)
        streamed = api.predict(inputs_era5, inputs_topo, tpl,
                               streaming=True, **kw)
        for var in ("u10", "v10"):
            a = base[var].values
            b = streamed[var].values
            assert a.shape == b.shape and a.shape[0] == 2
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
            m = ~np.isnan(a)
            np.testing.assert_allclose(a[m], b[m], atol=1e-2, rtol=1e-3)

    def test_auto_trigger_on_hbm_budget(self, monkeypatch):
        """streaming='auto' flips to the host engine exactly when the
        resident-domain estimate crosses $WINDTPU_STREAMING_BYTES."""
        from windtpu import api

        network, inputs_era5, inputs_topo, tpl = self._setup()
        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(0), mesh=None)
        monkeypatch.setenv("WINDTPU_STREAMING_BYTES", "1")
        api.predict(inputs_era5, inputs_topo, tpl, **kw)
        assert api.last_run_info()["mode"] == "streaming"
        monkeypatch.setenv("WINDTPU_STREAMING_BYTES", str(1 << 40))
        api.predict(inputs_era5, inputs_topo, tpl, **kw)
        assert api.last_run_info()["mode"] != "streaming"

    def test_hbm_estimate_formula(self):
        from windtpu.api import _engine_hbm_bytes

        # field(in) + canvas(out) + psum buffer(out) + coverage(1), fp32.
        assert _engine_hbm_bytes(24, 100, 200, 3, 2) == \
            4 * 24 * 100 * 200 * (3 + 2 + 2 + 1)
        # Ensemble members multiply the canvas term only (the field and
        # coverage map are shared across members on a device).
        assert _engine_hbm_bytes(24, 100, 200, 3, 2,
                                 members_per_device=4) == \
            4 * 24 * 100 * 200 * (3 + 4 * (2 + 2) + 1)

    def test_auto_trigger_accounts_for_ensemble_members(self, monkeypatch):
        """A multi-member monolithic run holds one canvas per member:
        the auto threshold must trip on the member-scaled footprint, not
        the single-member one (members=8 used to OOM on domains the
        estimate said fit)."""
        from windtpu import api

        network, inputs_era5, inputs_topo, tpl = self._setup()
        t, h, w = (inputs_era5["u10"].shape[0],
                   tpl.sizes["lat_1"], tpl.sizes["lon_1"])
        one = api._engine_hbm_bytes(t, h, w, 3, 2, members_per_device=1)
        eight = api._engine_hbm_bytes(t, h, w, 3, 2, members_per_device=8)
        assert eight > one
        # Threshold between the 1-member and 8-member estimates: a single
        # member stays monolithic, 8 members stream.
        monkeypatch.setenv("WINDTPU_STREAMING_BYTES", str((one + eight) // 2))
        kw = dict(overlap_factor=0.01, network=network,
                  key=jax.random.key(0), mesh=None)
        api.predict(inputs_era5, inputs_topo, tpl, **kw)
        assert api.last_run_info()["mode"] != "streaming"
        api.predict(inputs_era5, inputs_topo, tpl, ensemble_members=8, **kw)
        assert api.last_run_info()["mode"] == "streaming"
