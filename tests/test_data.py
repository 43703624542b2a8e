"""Data pipeline: noise generators, decoders, providers, batch shapes,
augmentation determinism."""

import os
from pathlib import Path

import numpy as np
import jax
import pytest

from windtpu.core.config import DataConfig
from windtpu.data import (
    BatchGenerator,
    FlexibleNoiseGenerator,
    NaiveDecoder,
    NoiseGenerator,
    SyntheticDayProvider,
    WindComponentDecoder,
    WindSpeedDecoder,
)
from windtpu.data.providers import LocalFileProvider, _pattern_to_regex


class TestNoise:
    def test_flexible_shape_and_std(self):
        gen = FlexibleNoiseGenerator((4, 6, 16, 16, 20), std=0.1,
                                     random_seed=0)
        n = np.asarray(gen())
        assert n.shape == (4, 6, 16, 16, 20)
        assert abs(n.std() - 0.1) < 0.01
        assert abs(n.mean()) < 0.01

    def test_flexible_overrides(self):
        gen = FlexibleNoiseGenerator((4, 6, 16, 16, 20), std=0.1)
        n = np.asarray(gen(bs=2, channels=3, std=1.0))
        assert n.shape == (2, 6, 16, 16, 3)
        assert abs(n.std() - 1.0) < 0.05

    def test_flexible_pure_sampling_reproducible(self):
        gen = FlexibleNoiseGenerator((2, 3, 8, 8, 4), std=0.5)
        k = jax.random.key(42)
        np.testing.assert_array_equal(np.asarray(gen.sample(k)),
                                      np.asarray(gen.sample(k)))

    def test_structured_noise_broadcast_pattern(self):
        gen = NoiseGenerator((2, 4, 8, 8), std=1.0, random_seed=1)
        n = np.asarray(gen())
        assert n.shape == (2, 4, 8, 8, 4)
        # Channel 0 varies only along time.
        assert np.allclose(n[0, 0, :, :, 0], n[0, 0, 0, 0, 0])
        assert not np.allclose(n[0, 0, 0, 0, 0], n[0, 1, 0, 0, 0])
        # Channel 1 varies only along x (axis 2).
        assert np.allclose(n[0, :, 3, :, 1], n[0, 0, 3, 0, 1])
        # Channel 3 varies along x and y but not time.
        assert np.allclose(n[0, :, 3, 5, 3], n[0, 0, 3, 5, 3])


class TestDecoders:
    def test_naive_zscore_per_channel(self, rng):
        img = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 5 + 2
        out = NaiveDecoder()(img)
        np.testing.assert_allclose(out.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=(0, 1, 2)), 1.0, atol=1e-4)

    def test_wind_speed_decoder_masks_zeros(self):
        img = np.array([[0.0, 1.0], [-5.0, 3.0]], dtype=np.float32)
        out = WindSpeedDecoder()(img)
        assert np.isnan(out[0, 0])       # zero masked
        assert np.isnan(out[1, 0])       # below range
        assert out[0, 1] == 1.0
        assert out[1, 1] == np.float32(np.log10(100))  # clipped at max

    def test_wind_component_decoder_normalizes(self, rng):
        img = rng.uniform(-5, 5, (6, 6)).astype(np.float32)
        img[0, 0] = 0.0
        out = WindComponentDecoder()(img)
        assert np.isnan(out[0, 0])

    def test_wind_component_one_masked_pixel_does_not_poison(self, rng):
        """Documented divergence from the reference: its np.mean/np.std
        (data_generator.py:412) return all-NaN the moment __call__ masks
        a single pixel; windtpu uses NaN-aware stats."""
        img = rng.uniform(1, 5, (4, 8, 8, 2)).astype(np.float32)
        img[0, 0, 0, 0] = 0.0  # one masked (ocean) cell
        out = WindComponentDecoder()(img)
        assert np.isnan(out[0, 0, 0, 0])
        rest = np.delete(out.ravel(), 0)
        assert np.isfinite(rest).all()

    def test_wind_speed_decoder_normalize_is_usable(self):
        """Documented divergence: the reference's normalize divides by
        (hi - below_val) with below_val defaulting to NaN — all-NaN for
        every input.  windtpu anchors at value_range[0] instead."""
        img = np.array([[1.0, 2.0], [0.5, 3.0]], dtype=np.float32)
        out = WindSpeedDecoder(normalize=True)(img)
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestProviders:
    def test_pattern_regex(self):
        rx = _pattern_to_regex("x_{date}.nc")
        assert rx.match("x_20200101.nc").group("date") == "20200101"
        assert rx.match("y_20200101.nc") is None

    def test_local_provider(self, tmp_path):
        for d in ["20200101", "20200102"]:
            (tmp_path / f"x_{d}.nc").touch()
        (tmp_path / "unrelated.txt").touch()
        p = LocalFileProvider(tmp_path, "x_{date}.nc")
        assert p.available_dates == {"20200101", "20200102"}
        assert p.load("20200101").name == "x_20200101.nc"
        with p.provide("20200102") as path:
            assert path.exists()

    def test_local_provider_requires_date(self, tmp_path):
        with pytest.raises(ValueError):
            LocalFileProvider(tmp_path, "static.nc")

    def test_gcs_provider(self, tmp_path, monkeypatch):
        """Drive GCSFileProvider against a fake ``gsutil`` on PATH that
        serves a directory tree as the bucket."""
        from windtpu.data.providers import GCSFileProvider

        store = tmp_path / "bucket" / "days"
        store.mkdir(parents=True)
        for d in ["20200101", "20200102"]:
            (store / f"x_{d}.nc").write_text(d)
        (store / "README").touch()

        fake = tmp_path / "bin" / "gsutil"
        fake.parent.mkdir()
        fake.write_text(f"""#!/bin/sh
root={tmp_path}
cmd=$1; shift
case "$cmd" in
  ls) for f in "$root/${{1#gs://}}"*; do echo "gs://${{f#$root/}}"; done ;;
  cp) src="$root/${{1#gs://}}"; cp "$src" "$2" ;;
  *) exit 64 ;;
esac
""")
        fake.chmod(0o755)
        monkeypatch.setenv(
            "PATH", f"{fake.parent}:{os.environ['PATH']}")

        p = GCSFileProvider("gs://bucket", "days", pattern="x_{date}.nc")
        assert p.available_dates == {"20200101", "20200102"}
        with p.provide("20200101") as path:
            got = Path(path)
            assert got.read_text() == "20200101"
        assert not got.exists()        # unload removed the temp copy
        assert not got.parent.exists()  # ...and its per-load tempdir

    def test_object_store_failures_are_loud(self, tmp_path, monkeypatch):
        from windtpu.data.providers import GCSFileProvider

        # Missing binary: PATH with no gsutil at all.
        monkeypatch.setenv("PATH", str(tmp_path))
        p = GCSFileProvider("bucket", pattern="x_{date}.nc")
        with pytest.raises(RuntimeError, match="not runnable"):
            p.available_dates
        # Failing binary: nonzero exit must raise with the stderr text.
        fake = tmp_path / "gsutil"
        fake.write_text("#!/bin/sh\necho 'AccessDenied' >&2\nexit 1\n")
        fake.chmod(0o755)
        with pytest.raises(RuntimeError, match="AccessDenied"):
            p.available_dates

    def test_zero_padded_dates_round_trip(self, tmp_path):
        """A listed date must load the exact object it was listed from —
        int() coercion would turn '0101' into a request for x_101.nc."""
        from windtpu.data.providers import _substitute_date

        assert _substitute_date("x_{date}.nc", "0101") == "x_0101.nc"
        with pytest.raises(ValueError):
            _substitute_date("x_{date}.nc", "..")
        (tmp_path / "x_0101.nc").touch()
        p = LocalFileProvider(tmp_path, "x_{date}.nc")
        assert p.available_dates == {"0101"}
        assert p.load("0101").exists()


class TestBatchGenerator:
    CFG = DataConfig(sequence_length=3, patch_size=16, batch_size=4,
                     input_variables=("u10", "v10", "elevation"),
                     output_variables=("U_10M", "V_10M"))

    def _bg(self, transform=True, seed=0):
        import dataclasses

        cfg = dataclasses.replace(self.CFG, transform=transform)
        dates = ["20200101", "20200102", "20200103"]
        return BatchGenerator(
            SyntheticDayProvider(dates, cfg.input_variables, ny=32, nx=32,
                                 nt=6),
            output_provider=SyntheticDayProvider(
                dates, cfg.output_variables, ny=32, nx=32, nt=6, seed=5),
            config=cfg, seed=seed,
        )

    def test_shapes(self):
        x, y = next(iter(self._bg()))
        assert x.shape == (4, 3, 16, 16, 3)
        assert y.shape == (4, 3, 16, 16, 2)
        assert x.dtype == np.float32

    def test_elevation_scaled(self):
        """elevation is divided by 1e3 before normalization
        (reference data_generator.py:212-213) — check via decoder-less
        pipeline."""
        import dataclasses

        cfg = dataclasses.replace(self.CFG, transform=False)
        dates = ["20200101"]
        bg = BatchGenerator(
            SyntheticDayProvider(dates, cfg.input_variables, ny=32, nx=32,
                                 nt=6),
            decoder=lambda x: x,  # identity
            config=cfg, seed=0,
        )
        x = next(iter(bg))
        elev_channel = x[..., 2]
        assert np.abs(elev_channel).max() < 0.1  # raw synthetic ~O(1) / 1e3

    def test_seed_determinism(self):
        x1, y1 = next(iter(self._bg(seed=3)))
        x2, y2 = next(iter(self._bg(seed=3)))
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_augmentation_pairs_inputs_and_outputs(self):
        """Flips/rotations must be applied identically to X and Y: train on
        (u10, v10) inputs == (U, V) outputs and the crop correlation
        survives augmentation."""
        import dataclasses

        cfg = dataclasses.replace(
            self.CFG, input_variables=("u10", "v10"),
            output_variables=("u10", "v10"))
        dates = ["20200101"]
        prov = SyntheticDayProvider(dates, ["u10", "v10"], ny=32, nx=32, nt=6)
        bg = BatchGenerator(prov, decoder=lambda x: x, output_provider=prov,
                            config=cfg, seed=1)
        x, y = next(iter(bg))
        np.testing.assert_allclose(x, y, rtol=1e-6)

    def test_threaded_iteration(self):
        bg = self._bg()
        bg.num_workers = 2
        it = iter(bg)
        for _ in range(3):
            x, y = next(it)
            assert x.shape == (4, 3, 16, 16, 3)

    def test_threaded_iteration_is_seed_deterministic(self):
        """Per-item PRNG streams + ordered delivery: the batch sequence
        from a seeded generator must not depend on thread scheduling or
        worker count (reference OrderedEnqueuer contract)."""
        def take(workers, n=4):
            bg = self._bg(seed=6)
            bg.num_workers = workers
            it = iter(bg)
            out = [next(it) for _ in range(n)]
            it.close()
            return out

        a, b = take(2), take(2)
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
        # Worker count must not change the delivered sequence either.
        c = take(3)
        for (xa, ya), (xc, yc) in zip(a, c):
            np.testing.assert_array_equal(xa, xc)
            np.testing.assert_array_equal(ya, yc)

    def test_threaded_iterator_close_releases_workers(self):
        """Closing the iterator must unblock workers parked in q.put on a
        full queue — otherwise every discarded iterator leaks
        num_workers threads plus their queued batches."""
        import threading
        import time

        before = {t.ident for t in threading.enumerate()}
        bg = self._bg()
        bg.num_workers = 2
        it = iter(bg)
        next(it)            # workers running, queue filling to maxsize
        time.sleep(0.5)     # let them block in q.put
        it.close()          # consumer goes away
        deadline = time.time() + 5
        while time.time() < deadline:
            leaked = [t for t in threading.enumerate()
                      if t.ident not in before and t.is_alive()]
            if not leaked:
                break
            time.sleep(0.1)
        assert not leaked, f"worker threads leaked: {leaked}"

    def test_num_workers_flows_from_config(self):
        import dataclasses

        cfg = dataclasses.replace(self.CFG, num_workers=3)
        dates = ["20200101"]
        bg = BatchGenerator(
            SyntheticDayProvider(dates, cfg.input_variables, ny=32, nx=32,
                                 nt=6),
            output_provider=SyntheticDayProvider(dates, cfg.output_variables,
                                                 ny=32, nx=32, nt=6, seed=7),
            config=cfg, seed=0)
        assert bg.num_workers == 3          # config value, not a dead field
        bg2 = BatchGenerator(
            SyntheticDayProvider(dates, cfg.input_variables, ny=32, nx=32,
                                 nt=6),
            output_provider=SyntheticDayProvider(dates, cfg.output_variables,
                                                 ny=32, nx=32, nt=6, seed=7),
            config=cfg, num_workers=1, seed=0)
        assert bg2.num_workers == 1         # explicit argument wins

    def test_short_day_raises_with_context(self):
        import dataclasses

        cfg = dataclasses.replace(self.CFG, sequence_length=8)
        dates = ["20200101"]
        bg = BatchGenerator(
            SyntheticDayProvider(dates, cfg.input_variables, ny=32, nx=32,
                                 nt=4),
            output_provider=SyntheticDayProvider(dates, cfg.output_variables,
                                                 ny=32, nx=32, nt=4, seed=7),
            config=cfg, seed=0)
        with pytest.raises(ValueError, match="20200101.*nt=4"):
            next(iter(bg))

    def test_device_iterator_sharded(self):
        from windtpu.core.mesh import make_mesh

        mesh = make_mesh({"data": 4})
        bg = self._bg()
        it = bg.as_device_iterator(mesh)
        x, y = next(it)
        assert x.shape == (4, 3, 16, 16, 3)
        assert len(x.sharding.device_set) == 4
