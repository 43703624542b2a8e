"""Inference path: tiling plan math, on-device stitch correctness,
template/regrid, end-to-end predict."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from windtpu.core.config import GANConfig, InferenceConfig, ModelConfig, TrainConfig
from windtpu.infer.engine import downscale_field, make_tiled_predictor
from windtpu.infer.template import (
    build_high_res_template_from_era5,
    process_era5,
    process_topo,
)
from windtpu.infer.tiling import plan_tiling
from windtpu.io.dataset import DataArray, Dataset


def _reference_starts(pixels, img, overlap):
    """Independent transcription of the reference tiling math
    (api.py:101-116) used as the oracle."""
    min_c, max_c = math.ceil(pixels / img), pixels - img
    n = math.floor(min_c + overlap**2 * (max_c - min_c))
    dist = (pixels - img) // (n - 1) if n > 1 else 0
    leftovers = pixels - ((n - 1) * dist + img)
    shifts = np.concatenate(
        [[0], np.ones(leftovers), np.zeros(n - leftovers - 1)]).cumsum()
    return [int(i * dist + s) for i, s in zip(range(n), shifts)]


class TestTiling:
    @pytest.mark.parametrize("pixels,overlap", [
        (100, 0.05), (250, 0.05), (250, 0.5), (500, 0.01), (97, 0.0),
        (192, 1.0), (423, 0.3),
    ])
    def test_matches_reference_math(self, pixels, overlap):
        plan = plan_tiling(pixels, pixels, 24, 96, 24, overlap)
        want = _reference_starts(pixels, 96, overlap)
        assert list(plan.starts_x) == want
        assert list(plan.starts_y) == want

    def test_full_coverage(self):
        plan = plan_tiling(250, 300, 48, 96, 24, 0.05)
        covered = np.zeros((250, 300), bool)
        for sy in plan.starts_y:
            for sx in plan.starts_x:
                covered[sy:sy + 96, sx:sx + 96] = True
        assert covered.all(), "patches must cover the whole domain"
        assert plan.num_time_chunks == 2
        assert plan.num_patches == len(plan.starts_x) * len(plan.starts_y) * 2

    def test_too_small_raises(self):
        with pytest.raises(RuntimeError):
            plan_tiling(50, 300, 24, 96, 24, 0.05)
        with pytest.raises(RuntimeError):
            plan_tiling(300, 300, 10, 96, 24, 0.05)

    def test_exact_image_size_dimension(self):
        """A dimension equal to image_size needs exactly one tile; the
        blend formula alone would round it down to zero tiles and crash
        on a negative-length shift array."""
        for h, w in [(96, 200), (200, 96), (96, 96)]:
            plan = plan_tiling(h, w, 24, 96, 24, 0.05)
            assert plan.starts_y[0] == 0 and plan.starts_x[0] == 0
            covered = np.zeros((h, w), bool)
            for sy in plan.starts_y:
                for sx in plan.starts_x:
                    covered[sy:sy + 96, sx:sx + 96] = True
            assert covered.all()


TINY_M = ModelConfig(image_size=32, in_channels=3, noise_channels=2,
                     out_channels=2, sequence_length=4,
                     generator_features=16, discriminator_features=8)
TINY_I = InferenceConfig(sequence_length=4, image_size=32, noise_channels=2,
                         border_crop=2, group_size=4, overlap_factor=0.5)


class TestStitch:
    def _identity_apply(self, v, patches, noise):
        # Fake generator: echo the first 2 input channels.
        return patches[..., :2]

    def test_stitch_reconstructs_field(self):
        """With an identity 'generator' and per-channel normalization, the
        stitched output must equal the normalized input everywhere covered
        by at least one cropped patch (overlap-mean of identical values)."""
        icfg = dataclasses.replace(TINY_I,
                                   replicate_normalization_quirk=False)
        rng = np.random.RandomState(0)
        field = rng.standard_normal((4, 48, 56, 3)).astype(np.float32)
        plan = plan_tiling(48, 56, 4, 32, 4, icfg.overlap_factor)
        predictor = make_tiled_predictor(TINY_M, icfg, plan,
                                         apply_fn=self._identity_apply)
        pred, counts = predictor({}, jnp.asarray(field), jax.random.key(0))
        pred = np.asarray(pred)
        counts = np.asarray(counts)
        assert pred.shape == (4, 48, 56, 2)
        # Normalize the field the same way (per-channel over stacked
        # patches == over each patch's pixels since identical stats).
        origins = plan.patch_origins()
        stack = np.stack([
            field[k * 4:(k + 1) * 4, sy:sy + 32, sx:sx + 32, :]
            for sx, sy, k in origins])
        mean = stack.mean(axis=(0, 1, 2, 3))
        std = stack.std(axis=(0, 1, 2, 3))
        want = (field[..., :2] - mean[:2]) / std[:2]
        covered = counts > 0
        np.testing.assert_allclose(pred[covered], want[covered], atol=1e-4)
        # Border crop: corner pixels are never covered.
        assert counts[0, 0, 0] == 0
        assert counts[0, 1, 1] == 0
        assert counts[0, 2, 2] > 0
        assert np.isnan(pred[0, 0, 0, 0])

    def test_field_longer_than_plan_window(self):
        """A field with more time steps than the plan covers: rows beyond
        the covered window are NaN with zero counts (the static coverage
        map is padded to the field's length)."""
        icfg = dataclasses.replace(TINY_I,
                                   replicate_normalization_quirk=False)
        plan = plan_tiling(48, 48, 4, 32, 4, icfg.overlap_factor)
        predictor = make_tiled_predictor(TINY_M, icfg, plan,
                                         apply_fn=self._identity_apply)
        field = np.random.RandomState(1).standard_normal(
            (7, 48, 48, 3)).astype(np.float32)
        pred, counts = predictor({}, jnp.asarray(field), jax.random.key(0))
        pred, counts = np.asarray(pred), np.asarray(counts)
        assert pred.shape == (7, 48, 48, 2)
        assert (counts[4:] == 0).all()
        assert np.isnan(pred[4:]).all()
        assert np.isfinite(pred[:4][counts[:4] > 0]).all()

    def test_overlap_counts(self):
        icfg = dataclasses.replace(TINY_I,
                                   replicate_normalization_quirk=False)
        field = np.zeros((4, 48, 48, 3), np.float32)
        plan = plan_tiling(48, 48, 4, 32, 4, 0.5)
        predictor = make_tiled_predictor(TINY_M, icfg, plan,
                                         apply_fn=self._identity_apply)
        _, counts = predictor({}, jnp.asarray(field), jax.random.key(0))
        counts = np.asarray(counts)
        # Oracle: brute-force coverage count of cropped patches.
        want = np.zeros((4, 48, 48), np.float32)
        for sx, sy, k in plan.patch_origins():
            want[k * 4:(k + 1) * 4, sy + 2:sy + 30, sx + 2:sx + 30] += 1
        np.testing.assert_array_equal(counts, want)
        assert counts.min() == 0  # cropped borders never covered

    def test_quirk_normalization_stats_shape(self):
        """Quirk mode normalizes per (lon, channel); an identity generator
        then reproduces per-lon normalized values."""
        icfg = dataclasses.replace(TINY_I, overlap_factor=0.0)
        rng = np.random.RandomState(1)
        field = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        plan = plan_tiling(32, 32, 4, 32, 4, 0.0)
        predictor = make_tiled_predictor(TINY_M, icfg, plan,
                                         apply_fn=self._identity_apply)
        pred, counts = predictor({}, jnp.asarray(field), jax.random.key(0))
        pred = np.asarray(pred)
        mean = field.mean(axis=(0, 1))   # (lon, C)
        std = field.std(axis=(0, 1))
        want = (field[..., :2] - mean[..., :2]) / std[..., :2]
        covered = np.asarray(counts) > 0
        np.testing.assert_allclose(pred[covered], want[covered], atol=1e-4)

    def test_real_generator_runs(self):
        from windtpu.models.generator import init_generator

        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = np.random.RandomState(0).standard_normal(
            (4, 48, 48, 3)).astype(np.float32)
        pred, plan = downscale_field(g_vars, jnp.asarray(field), TINY_M,
                                     TINY_I, key=jax.random.key(1))
        assert pred.shape == (4, 48, 48, 2)
        covered = ~np.isnan(np.asarray(pred))
        assert covered.any()
        assert np.isfinite(np.asarray(pred)[covered]).all()

    def test_ensemble_members_differ(self):
        from windtpu.models.generator import init_generator

        g_vars = init_generator(TINY_M, jax.random.key(0))
        field = np.random.RandomState(0).standard_normal(
            (4, 48, 48, 3)).astype(np.float32)
        keys = jax.random.split(jax.random.key(5), 3)
        preds, _ = downscale_field(g_vars, jnp.asarray(field), TINY_M,
                                   TINY_I, ensemble_keys=keys)
        assert preds.shape == (3, 4, 48, 48, 2)
        p = np.asarray(preds)
        m = ~np.isnan(p[0])
        assert not np.allclose(p[0][m], p[1][m])


def _fake_era5(nt=4, nlat=6, nlon=7):
    time = np.arange("2016-04-01T00", "2016-04-05T00",
                     dtype="datetime64[h]")[:nt]
    lat = np.linspace(48.0, 46.0, nlat)   # descending, ERA5 style
    lon = np.linspace(5.0, 8.0, nlon)
    rng = np.random.RandomState(0)
    shape = (nt, nlat, nlon)
    return Dataset(
        {"u10": DataArray(("time", "latitude", "longitude"),
                          rng.standard_normal(shape).astype(np.float32)),
         "v10": DataArray(("time", "latitude", "longitude"),
                          rng.standard_normal(shape).astype(np.float32))},
        {"time": DataArray(("time",), time),
         "latitude": DataArray(("latitude",), lat),
         "longitude": DataArray(("longitude",), lon)},
    )


def _fake_dem(ny=80, nx=90):
    x = np.linspace(4.9, 8.1, nx)
    y = np.linspace(48.1, 45.9, ny)
    rng = np.random.RandomState(2)
    dem = rng.uniform(200, 3000, (1, ny, nx)).astype(np.float32)
    return Dataset(
        {"band_data": DataArray(("band", "y", "x"), dem)},
        {"band": DataArray(("band",), np.array([1])),
         "y": DataArray(("y",), y), "x": DataArray(("x",), x)},
    )


class TestTemplate:
    def test_template_upsampling_factors(self):
        era5 = _fake_era5()
        tpl = build_high_res_template_from_era5(era5)
        assert tpl.sizes["lon_1"] == 18 * 7
        assert tpl.sizes["lat_1"] == 26 * 6
        lons = tpl.coords["lon_1"].values
        assert lons[0] == 5.0 and lons[-1] == 8.0

    def test_template_bbox_subset(self):
        era5 = _fake_era5()
        tpl = build_high_res_template_from_era5(
            era5, range_lon=(5.5, 7.5), range_lat=(46.5, 47.5))
        lons = tpl.coords["lon_1"].values
        lats = tpl.coords["lat_1"].values
        assert lons.min() >= 5.5 and lons.max() <= 7.5
        assert lats.min() >= 46.5 and lats.max() <= 47.5

    def test_process_era5_and_topo(self):
        era5 = _fake_era5()
        tpl = build_high_res_template_from_era5(era5)
        regridded = process_era5(era5, tpl)
        assert regridded["u10"].dims == ("time", "lat_1", "lon_1")
        assert regridded["u10"].shape == (4, 26 * 6, 18 * 7)
        topo = process_topo(_fake_dem(), tpl)
        assert topo["elevation"].dims == ("lat_1", "lon_1")
        assert topo["elevation"].shape == (26 * 6, 18 * 7)


class TestEndToEnd:
    def test_predict_tiny_network(self):
        """Full API path with a tiny network: template -> regrid ->
        tiled inference -> dataset."""
        from windtpu import api
        from windtpu.network import WindDownscalingGAN

        cfg = GANConfig(model=TINY_M, train=TrainConfig(batch_size=2))
        network = WindDownscalingGAN(cfg)
        era5 = _fake_era5(nt=4)
        tpl = build_high_res_template_from_era5(era5)
        inputs_era5 = process_era5(era5, tpl)
        inputs_topo = process_topo(_fake_dem(), tpl)
        result = api.predict(inputs_era5, inputs_topo, tpl,
                             overlap_factor=0.01, network=network,
                             key=jax.random.key(0))
        assert set(result.data_vars) == {"u10", "v10"}
        assert result["u10"].dims == ("time", "lat_1", "lon_1")
        assert result.sizes["time"] == 4
        # The outer 2-px rim (never covered once patch borders are
        # cropped) is dropped from the output grid, exactly like the
        # reference's groupby output omits those coordinates.
        assert result.sizes["lat_1"] == tpl.sizes["lat_1"] - 4
        assert result.sizes["lon_1"] == tpl.sizes["lon_1"] - 4
        vals = result["u10"].values
        assert np.isfinite(vals[~np.isnan(vals)]).all()
        # Inside the cropped grid, NaN exactly where no cropped patch
        # covers (interior seams the reference also leaves empty).
        from windtpu.infer.tiling import plan_tiling

        plan = plan_tiling(tpl.sizes["lat_1"], tpl.sizes["lon_1"],
                           4, 32, 4, 0.01)
        cov = np.zeros((tpl.sizes["lat_1"], tpl.sizes["lon_1"]), bool)
        for sy in plan.starts_y:
            for sx in plan.starts_x:
                cov[sy + 2:sy + 30, sx + 2:sx + 30] = True
        np.testing.assert_array_equal(np.isnan(vals[0]), ~cov[2:-2, 2:-2])


class TestCompilePayload:
    """The compiled program must not grow with the domain.

    Plan tensors (origins, weights, coverage map) are threaded through
    jit as ARGUMENTS; a closed-over array would become a jaxpr const
    serialized with the program — at a 2048² T=24 domain the coverage
    map alone is 400 MB of HLO, measured to overflow the remote-compile
    transport long before HBM filled (ARCHITECTURE.md, 'plan tensors as
    arguments').  This lowers the core predict function at two domain
    sizes and bounds the program-text growth: shapes may appear in dims,
    but a 16x bigger coverage map must not mean 16x more HLO."""

    def test_lowered_text_is_domain_independent(self):
        import jax

        from windtpu.infer.engine import (_build_predict, _coverage_counts,
                                          _grouped_origins)
        from windtpu.infer.tiling import plan_tiling

        def identity_apply(v, patches, noise):
            return patches[..., :2]

        sizes = {}
        for edge in (48, 192):
            plan = plan_tiling(edge, edge, 4, 32, 4, 0.2)
            origins, weights = _grouped_origins(plan, TINY_I.group_size)
            counts = _coverage_counts(plan, origins, weights,
                                      TINY_I.border_crop)
            predict = _build_predict(TINY_M, TINY_I, plan, identity_apply)
            field = jnp.zeros((4, edge, edge, 3), jnp.float32)
            lowered = jax.jit(predict).lower(
                {}, field, jax.random.key(0), jnp.asarray(origins),
                jnp.asarray(weights), jnp.asarray(counts))
            sizes[edge] = len(lowered.as_text())
        # 48 -> 192 is a 16x coverage map; allow shape-dim noise only.
        assert sizes[192] < 2.0 * sizes[48], sizes
