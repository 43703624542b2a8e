"""Tiled inference engine — the "render" path, fully on-device.

The reference's predict (api.py:89-152) is host-bound: it materializes every
patch as numpy, calls Keras predict per group of 16 (device round-trip per
group), then stitches overlaps by exploding every pixel into a pandas
DataFrame row and group-by-averaging.  Here the whole thing is ONE jitted
XLA program over the full (T, H, W, C) field held in HBM:

  pass 1  scan over patch groups: accumulate normalization statistics
          (nan-aware sum / sum-of-squares), matching the reference's
          normalization over the stacked patch tensor;
  pass 2  scan over patch groups: gather patches with dynamic_slice,
          normalize, run the generator with fresh per-group noise, crop the
          2-px border, and scatter-add predictions into a canvas; finally
          divide by the static host-precomputed coverage map -> overlap
          mean (coverage depends only on the tiling plan, so it is never
          accumulated on device).

No pandas, no per-patch host sync; patch extraction is a strided gather and
stitching is a dynamic-update-slice accumulation that XLA fuses.

Parallel modes:

* ensemble members — vmapped over PRNG keys; on a mesh with an ``ensemble``
  axis each member lands on its own device (BASELINE config 4);
* spatial-tile parallelism — the patch-group list is sharded over a mesh
  axis with ``shard_map``; stat accumulators and the (canvas, counts) pair
  are psum'ed over ICI, so arbitrarily large domains scale across chips
  (BASELINE config 5).

Quirks handled:

* ``replicate_normalization_quirk`` (InferenceConfig): the reference
  normalizes the 5-D stacked patch tensor over axes (0, 1, 2) =
  (patch, time, lat), i.e. per-(lon, channel) statistics (api.py:128-129).
  True replicates; False uses per-channel stats over all patch pixels.
* Patch rows are fed to the model in reversed (descending-index) order and
  un-reversed on output, matching the reference's lat-reversed slices
  (api.py:119).  The reference's ``sy == 0`` branch is off by one (it takes
  rows 1..96 instead of 0..95); we use the correct rows and document the
  divergence — row 0 of the domain is covered here, dropped there.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from windtpu.core.config import InferenceConfig, ModelConfig
from windtpu.infer.tiling import TilingPlan, plan_tiling
from windtpu.models.generator import Generator


def _pad_to_multiple(arr: np.ndarray, multiple: int):
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
    weights = np.concatenate([np.ones(n, np.float32),
                              np.zeros(pad, np.float32)])
    return arr, weights


def _coverage_counts(
    plan: TilingPlan,
    origins_g: np.ndarray,
    weights_g: np.ndarray,
    crop: int,
) -> np.ndarray:
    """Static (T, H, W, 1) patch-coverage map for the overlap mean.

    Coverage depends only on the tiling plan, never on the data, so it is
    computed once on the host instead of being accumulated patch by patch
    on device — that removes half the tiny serial dynamic-update-slice ops
    from the stitch loop (and, tile-parallel, the counts psum)."""
    img = plan.image_size
    seq = plan.sequence_length
    counts = np.zeros(
        (plan.time_window, plan.pixels_lat, plan.pixels_lon, 1), np.float32)
    for (sx, sy, k), w in zip(origins_g.reshape(-1, 3).tolist(),
                              weights_g.ravel().tolist()):
        if w:
            counts[k * seq:(k + 1) * seq, sy + crop:sy + img - crop,
                   sx + crop:sx + img - crop] += w
    return counts


def _grouped_origins(plan: TilingPlan, group: int, group_multiple: int = 1):
    """(G, group, 3) int32 origins + (G, group) validity weights, with the
    group count padded to a multiple of ``group_multiple``."""
    origins_np, weights_np = _pad_to_multiple(
        plan.patch_origins().astype(np.int32), group)
    origins_g = origins_np.reshape(-1, group, 3)
    weights_g = weights_np.reshape(-1, group)
    if group_multiple > 1:
        pad = (-origins_g.shape[0]) % group_multiple
        if pad:
            origins_g = np.concatenate(
                [origins_g, np.repeat(origins_g[-1:], pad, axis=0)], axis=0)
            weights_g = np.concatenate(
                [weights_g, np.zeros((pad, group), np.float32)], axis=0)
    return origins_g, weights_g


def _build_predict(
    mcfg: ModelConfig,
    icfg: InferenceConfig,
    plan: TilingPlan,
    apply_fn=None,
    psum_axis: Optional[str] = None,
):
    """Core (g_vars, field, key, origins_g, weights_g, counts) ->
    (pred, counts).

    ``origins_g``/``weights_g`` are traced arguments so callers can shard
    them over a mesh axis; with ``psum_axis`` set, normalization-stat
    accumulators and the final canvas are psum'ed across it (global
    statistics + cross-shard overlap mean — seam-free).  ``counts`` is
    the GLOBAL coverage map from :func:`_coverage_counts` (computed from
    the unsharded origin list even when the traced origins are a
    per-device shard).  It is a traced ARGUMENT, not a closed-over
    constant: baked in, a (T, H, W, 1) fp32 literal grows the compiled
    program linearly with the domain (400 MB of HLO at a 2048² T=24
    domain — measured to overflow the remote-compile transport before
    HBM was anywhere near full), while as an argument the program size
    is domain-independent and the map is transferred once at build time.
    """
    img = plan.image_size
    seq = plan.sequence_length
    crop = icfg.border_crop
    group = icfg.group_size

    def _scan_unroll(n_groups: int) -> int:
        u = getattr(icfg, "scan_unroll", 4)  # match the dataclass default
        return n_groups if u <= 0 else min(u, n_groups)
    if apply_fn is None:
        model = Generator(mcfg)
        apply_fn = lambda v, x, n: model.apply(v, x, n, train=False)  # noqa: E731

    def gather_patch(field, origin):
        sx, sy, k = origin[0], origin[1], origin[2]
        patch = jax.lax.dynamic_slice(
            field, (k * seq, sy, sx, 0),
            (seq, img, img, field.shape[-1]))
        return patch[:, ::-1, :, :]  # lat-reversed rows (api.py:119)

    def stats_pass(field, origins_g, weights_g):
        """nan-aware mean/std of the stacked patch tensor."""
        # Group tensor axes: (patch, time, lat, lon, channel).  The quirk
        # reduces over (patch, time, lat) -> per-(lon, channel) stats
        # (api.py:128-129); the fixed mode also reduces lon.
        reduce_axes = (0, 1, 2) if icfg.replicate_normalization_quirk \
            else (0, 1, 2, 3)

        def body(carry, grp):
            origins, w = grp
            patches = jax.vmap(lambda o: gather_patch(field, o))(origins)
            # (G, T, img, img, C); mask padded patches out of the stats.
            mask = (~jnp.isnan(patches)).astype(jnp.float32)
            mask = mask * w[:, None, None, None, None]
            vals = jnp.where(jnp.isnan(patches), 0.0, patches)
            s, s2, n = carry
            s = s + jnp.sum(vals * mask, axis=reduce_axes)
            s2 = s2 + jnp.sum(vals * vals * mask, axis=reduce_axes)
            n = n + jnp.sum(mask, axis=reduce_axes)
            return (s, s2, n), None

        c = field.shape[-1]
        stat_shape = (img, c) if icfg.replicate_normalization_quirk else (c,)
        init = (jnp.zeros(stat_shape), jnp.zeros(stat_shape),
                jnp.zeros(stat_shape))
        (s, s2, n), _ = jax.lax.scan(
            body, init, (origins_g, weights_g),
            unroll=_scan_unroll(origins_g.shape[0]))
        if psum_axis is not None:
            s = jax.lax.psum(s, psum_axis)
            s2 = jax.lax.psum(s2, psum_axis)
            n = jax.lax.psum(n, psum_axis)
        mean = s / jnp.maximum(n, 1.0)
        var = jnp.maximum(s2 / jnp.maximum(n, 1.0) - mean**2, 0.0)
        return mean, jnp.sqrt(var)

    def predict(g_vars, field, key, origins_g, weights_g, counts):
        t_total, h, w_pix, _ = field.shape
        mean, std = stats_pass(field, origins_g, weights_g)
        std = jnp.where(std == 0, 1.0, std)

        canvas = jnp.zeros((t_total, h, w_pix, mcfg.out_channels))
        # Coverage is plan-determined, not data-dependent; pad/trim it to
        # this field's time length (patches never extend past the plan's
        # covered window anyway).  Shapes are static under jit, so this
        # costs a slice or a concat-with-zeros, not a recompile knob.
        if counts.shape[0] < t_total:
            counts = jnp.concatenate(
                [counts,
                 jnp.zeros((t_total - counts.shape[0],) + counts.shape[1:],
                           counts.dtype)], axis=0)
        elif counts.shape[0] > t_total:
            counts = counts[:t_total]

        def group_body(canvas, inp):
            g_idx, origins, w = inp
            patches = jax.vmap(lambda o: gather_patch(field, o))(origins)
            normalized = (patches - mean) / std
            noise = icfg.noise_std * jax.random.normal(
                jax.random.fold_in(key, g_idx),
                (group, seq, img, img, mcfg.noise_channels))
            preds = apply_fn(g_vars, normalized, noise)
            # Crop borders, un-reverse rows, weight out padded patches.
            preds = preds[:, :, ::-1, :, :]  # back to ascending rows
            preds = preds[:, :, crop:img - crop, crop:img - crop, :]
            preds = preds * w[:, None, None, None, None]

            # Static per-patch stitch loop (group_size patches): each
            # iteration is a pair of tiny dynamic slice/update ops, so a
            # rolled fori_loop serializes on launch overhead.
            size = (seq, img - 2 * crop, img - 2 * crop, mcfg.out_channels)
            for i in range(group):
                sx, sy, k = origins[i, 0], origins[i, 1], origins[i, 2]
                at = (k * seq, sy + crop, sx + crop, 0)
                cur = jax.lax.dynamic_slice(canvas, at, size)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, cur + preds[i], at)
            return canvas, None

        num_groups = origins_g.shape[0]
        # Global group index for the noise PRNG: under tile-parallel
        # shard_map, origins_g is the LOCAL shard and every device would
        # otherwise fold the key by 0..G/n-1, drawing identical noise on
        # all shards (and diverging from the single-device predictor,
        # which folds by the global index).  P(axis) shards axis 0 into
        # contiguous blocks in device order, so the offset restores
        # exactly the single-device numbering.  (The train step handles
        # the same hazard via fold_in(rng, axis_index), wgan_gp.py.)
        base = (jax.lax.axis_index(psum_axis) * num_groups
                if psum_axis is not None else 0)
        xs = (base + jnp.arange(num_groups, dtype=jnp.int32),
              origins_g, weights_g)
        canvas, _ = jax.lax.scan(
            group_body, canvas, xs,
            unroll=_scan_unroll(num_groups))
        if psum_axis is not None:
            canvas = jax.lax.psum(canvas, psum_axis)
        out = jnp.where(counts > 0, canvas / jnp.maximum(counts, 1.0),
                        jnp.nan)
        return out, counts[..., 0]

    return predict


def make_tiled_predictor(
    mcfg: ModelConfig,
    icfg: InferenceConfig,
    plan: TilingPlan,
    apply_fn=None,
):
    """Build a jitted (g_vars, field, key) -> (prediction, counts) function.

    ``field``: (T, H, W, in_channels) float32, already merged
    (u10, v10, elevation/1e3) on the high-res grid.
    ``prediction``: (T, H, W, out_channels) with NaN where no patch
    contributed (after border cropping).
    ``apply_fn(g_vars, patches, noise) -> preds`` defaults to the Generator
    forward; injectable for testing the tiling/stitch path in isolation.

    Default-``apply_fn`` predictors are memoized on the (model, inference,
    plan) config triple — all frozen/hashable — so repeated ``predict``
    calls over same-shaped domains reuse the compiled XLA program instead
    of re-tracing (jit caches are per function object; without this every
    API call paid full compilation).
    """
    if apply_fn is None:
        return _cached_tiled_predictor(mcfg, icfg, plan)
    return _build_tiled_predictor(mcfg, icfg, plan, apply_fn)


@functools.lru_cache(maxsize=32)
def _cached_tiled_predictor(mcfg, icfg, plan):
    return _build_tiled_predictor(mcfg, icfg, plan, None)


def clear_predictor_caches() -> None:
    """Drop all memoized predictors and their device-resident plan
    tensors.

    Each cached predictor closure holds its coverage map on device —
    (T, H, W, 1) fp32, i.e. 400 MB for a 2048² T=24 domain — so cycling
    through many large, differently-shaped domains in one process can
    pin gigabytes of HBM invisibly (measured: the capacity probe's seven
    cached plans held ~4 GiB, enough to OOM the O(group)-memory
    streaming engine afterwards).  Call this between unrelated large
    workloads; steady-shape production never needs it."""
    _cached_tiled_predictor.cache_clear()
    _cached_tile_parallel_predictor.cache_clear()
    _cached_ens_tile_predictor.cache_clear()


def _build_tiled_predictor(mcfg, icfg, plan, apply_fn):
    origins_np, weights_np = _grouped_origins(plan, icfg.group_size)
    counts_np = _coverage_counts(plan, origins_np, weights_np,
                                 icfg.border_crop)
    predict = _build_predict(mcfg, icfg, plan, apply_fn)
    origins_g = jnp.asarray(origins_np)
    weights_g = jnp.asarray(weights_np)
    counts_g = jnp.asarray(counts_np)

    # The plan tensors must reach the jitted program as ARGUMENTS.
    # Closed-over arrays (numpy or device) become jaxpr consts that are
    # serialized with the program — measured 413-overflowing the remote
    # compile transport at a 2048² T=24 domain's 400 MB coverage map.
    predict_jit = jax.jit(predict)

    def run(g_vars, field, key):
        return predict_jit(g_vars, field, key, origins_g, weights_g,
                           counts_g)

    return run


def make_tile_parallel_predictor(
    mcfg: ModelConfig,
    icfg: InferenceConfig,
    plan: TilingPlan,
    mesh,
    axis: str = "data",
    apply_fn=None,
):
    """Spatial-tile parallel inference: the patch-group list is sharded over
    the mesh's ``axis`` via shard_map; every device generates its share into
    a local canvas and one psum of (canvas, counts) over ICI completes the
    overlap mean (BASELINE config 5: Alps-wide tiled runs).

    Same (g_vars, field, key) -> (pred, counts) contract; the field is
    replicated (small next to generator compute), only work is sharded.

    Default-``apply_fn`` predictors are memoized on (configs, plan, mesh,
    axis) — all hashable — for the same reason as ``make_tiled_predictor``:
    repeated ``downscale_field(mesh=...)`` calls over same-shaped domains
    must reuse the compiled shard_map program, not re-trace it.
    """
    if apply_fn is None:
        return _cached_tile_parallel_predictor(mcfg, icfg, plan, mesh, axis)
    return _build_tile_parallel_predictor(mcfg, icfg, plan, mesh, axis,
                                          apply_fn)


@functools.lru_cache(maxsize=16)
def _cached_tile_parallel_predictor(mcfg, icfg, plan, mesh, axis):
    return _build_tile_parallel_predictor(mcfg, icfg, plan, mesh, axis, None)


def _build_tile_parallel_predictor(mcfg, icfg, plan, mesh, axis, apply_fn):
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    origins_g, weights_g = _grouped_origins(
        plan, icfg.group_size, group_multiple=n_dev)
    # The coverage map is built from the GLOBAL origin list; inside the
    # shard_map body each device sees only its origin shard, but coverage
    # (like the psum'ed canvas) is a whole-domain quantity.
    counts_np = _coverage_counts(plan, origins_g, weights_g,
                                 icfg.border_crop)
    predict = _build_predict(mcfg, icfg, plan, apply_fn, psum_axis=axis)

    body = shard_map(
        predict, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    origins_sh = jax.device_put(
        origins_g, NamedSharding(mesh, P(axis)))
    weights_sh = jax.device_put(
        weights_g, NamedSharding(mesh, P(axis)))
    counts_sh = jax.device_put(
        jnp.asarray(counts_np), NamedSharding(mesh, P()))

    # Arguments, not closures: see make_tiled_predictor — closed-over
    # arrays are serialized with the program.
    body_jit = jax.jit(body)

    def run(g_vars, field, key):
        return body_jit(g_vars, field, key, origins_sh, weights_sh,
                        counts_sh)

    return run


def make_ensemble_tile_parallel_predictor(
    mcfg: ModelConfig,
    icfg: InferenceConfig,
    plan: TilingPlan,
    mesh,
    tile_axis: str = "data",
    ensemble_axis: str = "ensemble",
    apply_fn=None,
):
    """Combined ensemble + spatial-tile parallelism in ONE shard_map.

    Member keys shard over ``ensemble_axis`` (each device group computes
    only its own members) while patch groups shard over ``tile_axis``
    (each member's tiles split across its group, psum-stitched).  This is
    NOT ``vmap(tile_parallel_predictor)`` over sharded keys: there the
    shard_map treats the key as replicated, so every ensemble group
    redundantly computes ALL members over its tile shard — measured ~3x
    slower than tile-only parallelism for identical output on an 8-device
    mesh.  Here total generator work is exactly ``members x patches``,
    split over the full mesh.

    Contract: ``run(g_vars, field, keys)`` with ``keys`` of shape (M,),
    M divisible by ``mesh.shape[ensemble_axis]``; returns
    ``(preds, counts)`` with ``preds`` (M, T, H, W, out_channels) sharded
    ``P(ensemble_axis)`` over the member axis.
    """
    if apply_fn is None:
        return _cached_ens_tile_predictor(mcfg, icfg, plan, mesh,
                                          tile_axis, ensemble_axis)
    return _build_ens_tile_predictor(mcfg, icfg, plan, mesh, tile_axis,
                                     ensemble_axis, apply_fn)


@functools.lru_cache(maxsize=16)
def _cached_ens_tile_predictor(mcfg, icfg, plan, mesh, tile_axis,
                               ensemble_axis):
    return _build_ens_tile_predictor(mcfg, icfg, plan, mesh, tile_axis,
                                     ensemble_axis, None)


def _build_ens_tile_predictor(mcfg, icfg, plan, mesh, tile_axis,
                              ensemble_axis, apply_fn):
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_tile = mesh.shape[tile_axis]
    origins_g, weights_g = _grouped_origins(
        plan, icfg.group_size, group_multiple=n_tile)
    counts_np = _coverage_counts(plan, origins_g, weights_g,
                                 icfg.border_crop)
    predict = _build_predict(mcfg, icfg, plan, apply_fn,
                             psum_axis=tile_axis)

    def member_body(g_vars, field, keys, origins, weights, counts_in):
        # keys: this ensemble group's (M_local,) shard; each member runs
        # the tile-sharded predict (psum over tile_axis inside).
        preds, counts = jax.vmap(
            predict, in_axes=(None, None, 0, None, None, None))(
                g_vars, field, keys, origins, weights, counts_in)
        # Coverage is plan-determined and member-independent.
        return preds, counts[0]

    body = shard_map(
        member_body, mesh=mesh,
        in_specs=(P(), P(), P(ensemble_axis), P(tile_axis), P(tile_axis),
                  P()),
        out_specs=(P(ensemble_axis), P()),
        check_vma=False,
    )
    origins_sh = jax.device_put(origins_g, NamedSharding(mesh, P(tile_axis)))
    weights_sh = jax.device_put(weights_g, NamedSharding(mesh, P(tile_axis)))
    counts_sh = jax.device_put(
        jnp.asarray(counts_np), NamedSharding(mesh, P()))

    # Arguments, not closures: see make_tiled_predictor — closed-over
    # arrays are serialized with the program.
    body_jit = jax.jit(body)

    def run(g_vars, field, keys):
        return body_jit(g_vars, field, keys, origins_sh, weights_sh,
                        counts_sh)

    return run


def downscale_field(
    g_vars,
    field: jax.Array,                # (T, H, W, in_channels)
    mcfg: ModelConfig,
    icfg: Optional[InferenceConfig] = None,
    key: Optional[jax.Array] = None,
    plan: Optional[TilingPlan] = None,
    ensemble_keys: Optional[jax.Array] = None,
    mesh=None,
    tile_axis: str = "data",
) -> Tuple[jax.Array, TilingPlan]:
    """Tile + predict + stitch a full field.  Returns (prediction, plan).

    With ``ensemble_keys`` (shape (M,)) the result gains a leading member
    axis — one stochastic downscaling per key, vmapped so an ``ensemble``
    mesh axis can place one member per device.  With ``mesh`` the patch
    work is sharded over ``tile_axis`` (see make_tile_parallel_predictor).
    """
    icfg = icfg or InferenceConfig(
        sequence_length=mcfg.sequence_length, image_size=mcfg.image_size,
        noise_channels=mcfg.noise_channels)
    t, h, w, _ = field.shape
    if plan is None:
        plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                           icfg.overlap_factor)
    ens_axis = "ensemble"
    if (mesh is not None and ensemble_keys is not None
            and ens_axis in mesh.axis_names
            and tile_axis in mesh.axis_names
            and ensemble_keys.shape[0] % mesh.shape[ens_axis] == 0):
        predictor = make_ensemble_tile_parallel_predictor(
            mcfg, icfg, plan, mesh, tile_axis, ens_axis)
        preds, _ = predictor(g_vars, field, ensemble_keys)
        return preds, plan
    if mesh is not None:
        predictor = make_tile_parallel_predictor(
            mcfg, icfg, plan, mesh, tile_axis)
    else:
        predictor = make_tiled_predictor(mcfg, icfg, plan)
    if ensemble_keys is not None:
        preds, _ = jax.vmap(predictor, in_axes=(None, None, 0))(
            g_vars, field, ensemble_keys)
        return preds, plan
    key = key if key is not None else jax.random.key(0)
    pred, _ = predictor(g_vars, field, key)
    return pred, plan
