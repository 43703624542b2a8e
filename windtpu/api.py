"""Inference API: ERA5 + DEM -> downscaled 1-km wind fields.

Same surface as the reference (api.py:31-160): ``downscale`` /
``predict`` / ``process_era5`` / ``process_topo`` /
``build_high_res_template_from_era5`` / ``get_network`` — operating on
:mod:`windtpu.io` datasets, with the compute re-designed as the on-device
tiled engine (windtpu.infer.engine).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from windtpu.core.config import GANConfig, InferenceConfig, ModelConfig, TrainConfig
from windtpu.core.mesh import make_mesh
from windtpu.infer.engine import (make_ensemble_tile_parallel_predictor,
                                  make_tile_parallel_predictor,
                                  make_tiled_predictor)
from windtpu.infer.template import (
    build_high_res_template_from_era5,
    process_era5,
    process_topo,
)
from windtpu.infer.tiling import plan_tiling
from windtpu.io.dataset import DataArray, Dataset

# Shipped-model constants (reference api.py:22-28).
SEQUENCE_LENGTH = 24
IMG_SIZE = 96
BATCH_SIZE = 8
NOISE_CHANNELS = 20
NOISE_STD = 0.1
NB_INPUTS = 3
NB_OUTPUTS = 2

# Environment override for pretrained weights (the reference bundles
# weights-55.ckpt with the wheel, api.py:21; our equivalent is an Orbax
# checkpoint directory).
WEIGHTS_ENV = "WINDTPU_WEIGHTS"


def flagship_config() -> GANConfig:
    """Shipped-model configuration.  Convs run in bfloat16 (MXU-native;
    parameters stay float32) — set compute_dtype="float32" for bit-level
    reference comparisons."""
    return GANConfig(
        model=ModelConfig(
            image_size=IMG_SIZE, in_channels=NB_INPUTS,
            noise_channels=NOISE_CHANNELS, out_channels=NB_OUTPUTS,
            sequence_length=SEQUENCE_LENGTH, compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=BATCH_SIZE, noise_std=NOISE_STD),
    )


def get_network(weights_path: Optional[str] = None):
    """Build the flagship GAN and load pretrained weights if available.

    Weight resolution order: explicit argument, $WINDTPU_WEIGHTS, none
    (random init, with a warning — the reference's bundled weights-55
    checkpoint ships only index files in this environment)."""
    from windtpu.network import WindDownscalingGAN

    print("Loading network...")
    gan = WindDownscalingGAN(flagship_config())
    bundled = os.path.join(os.path.dirname(__file__), "assets", "weights",
                           "generator-synth.npz")
    weights = weights_path or os.environ.get(WEIGHTS_ENV) or (
        bundled if os.path.exists(bundled) else None)
    if weights:
        print(f"loading weights from {weights}")
        gan.load_weights(weights)
    else:
        print("warning: no pretrained weights found (set $WINDTPU_WEIGHTS); "
              "using random initialization")
    gate_path = os.path.join(os.path.dirname(__file__), "assets", "weights",
                             "texture-gate.npz")
    if os.path.exists(gate_path):
        from windtpu.models.texture_gate import load_gate_npz

        gan.texture_gate = load_gate_npz(gate_path)
    return gan


def inference_mesh(ensemble_members: int = 1, devices=None):
    """Auto-build the inference mesh for whatever devices exist.

    The ``ensemble`` axis gets the largest divisor of the member count that
    fits the device count (one stochastic member per device, BASELINE
    config 4); any leftover device factor becomes a ``data`` axis that the
    engine shards patch groups over (tile parallelism, BASELINE config 5).
    Returns None on a single device — the plain jitted path needs no mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n <= 1:
        return None
    e = 1
    if ensemble_members > 1:
        divisors = [d for d in range(1, n + 1) if ensemble_members % d == 0]
        # Prefer factorizations that use every device (data x ensemble = n);
        # among those take the largest ensemble axis (one member per device,
        # BASELINE config 4).  d=1 always qualifies, so no device is ever
        # silently stranded — e.g. 8 devices x 3 members used to build
        # 2x3=6 and idle two devices; now it builds data=8.
        e = max(d for d in divisors if n % d == 0)
    axes = {}
    if n // e > 1:
        axes["data"] = n // e
    if e > 1:
        axes["ensemble"] = e
    if not axes:
        return None
    # e divides n by construction, so data x ensemble always equals n —
    # every device is used.
    return make_mesh(axes, devices=devices)


# Diagnostics of the most recent predict() device placement — written on
# every call so tests (and curious users) can verify that ensemble members
# / patch tiles actually landed on distinct devices.
_LAST_RUN = {}


def last_run_info() -> dict:
    """Device-placement diagnostics of the most recent :func:`predict`."""
    return dict(_LAST_RUN)


def _engine_hbm_bytes(t: int, h: int, w: int, in_ch: int,
                      out_ch: int, members_per_device: int = 1) -> int:
    """Rough per-chip HBM footprint of the monolithic engine: replicated
    field + canvas + static coverage map + one psum-sized canvas buffer,
    all fp32 (infer/engine.py keeps the whole domain resident).  Ensemble
    members multiply the canvas term — the vmapped/sharded ensemble paths
    hold one canvas (and stitched output) per member resident on each
    device, so the estimate takes the PER-DEVICE member count."""
    px = t * h * w
    return 4 * (px * in_ch + members_per_device * 2 * px * out_ch + px)


# Streaming kicks in when the monolithic engine's resident domain tensors
# would exceed this many bytes.  Default 3.2 GiB, set from the MEASURED
# v5e ceiling (tools/capacity_probe.py -> docs/capacity_measured.json):
# a 2048-square T=24 domain (estimate 3.00 GiB) stitches monolithically,
# a 2208-square one (3.49 GiB) is RESOURCE_EXHAUSTED — XLA's working set
# during the scan-carried scatter-add stitch multiplies the nominal
# canvas bytes, so the naive "half of 16 GiB HBM" guess (the previous
# 8 GiB default) admitted domains that in fact OOM.  3.2 GiB sits
# between the largest proven-fit estimate and the smallest measured
# failure.  Override with WINDTPU_STREAMING_BYTES.
#
# Probe-shape caveat: the ceiling was bisected on SQUARE domains at
# T=24 with 1 ensemble member (capacity_probe's default sweep), so the
# ~2.5x stitch working-set multiplier it encodes is calibrated at that
# shape; at very different T or aspect ratios the multiplier may shift,
# and an estimate just under the threshold could still OOM (the
# conservative direction — streaming a domain that would have fit — is
# safe).  tools/capacity_probe.py --t/--aspect re-derives the edge
# for other shapes; pair any such run with a WINDTPU_STREAMING_BYTES
# override rather than editing this constant.
_STREAMING_DEFAULT_BYTES = (32 << 30) // 10


def _streaming_threshold() -> int:
    import os

    return int(os.environ.get("WINDTPU_STREAMING_BYTES",
                              _STREAMING_DEFAULT_BYTES))


_TEXTURE_GATE_JIT = None


def _gate_on_device(target, floor, preds):
    """Jitted band-rescale on the stitched canvas already resident in
    HBM (models/texture_gate.apply_gate_targeted).  One shared jit —
    XLA's cache keys on shapes, so repeat calls at a domain size
    compile once; ``floor`` rides as a traced scalar, not a constant."""
    global _TEXTURE_GATE_JIT
    if _TEXTURE_GATE_JIT is None:
        from windtpu.models.texture_gate import apply_gate_targeted

        _TEXTURE_GATE_JIT = jax.jit(apply_gate_targeted)
    return _TEXTURE_GATE_JIT(target, floor, preds)


def predict(
    inputs_era5: Dataset,
    inputs_topo: Dataset,
    high_res_template: Dataset,
    overlap_factor: float = 0.05,
    network=None,
    key: Optional[jax.Array] = None,
    ensemble_members: int = 1,
    noise_std: Optional[float] = None,
    mesh="auto",
    streaming="auto",
    texture_gate="auto",
) -> Dataset:
    """Tile the merged (u10, v10, elevation) field into
    24 x 96 x 96 cubes, run the generator with fresh noise, stitch with
    overlap averaging — all in one jitted program on device
    (replaces reference api.py:89-152).

    ``noise_std`` overrides the shipped model's 0.1 (api.py:28); 0.0 makes
    the downscaling deterministic, used for cross-framework parity checks.

    ``mesh``: "auto" (default) builds :func:`inference_mesh` over all
    visible devices — ensemble members shard one-per-device over an
    ``ensemble`` axis and patch groups shard over a ``data`` axis; pass an
    explicit :class:`jax.sharding.Mesh` with those axis names to control
    placement, or None to force the single-device path.

    ``streaming``: "auto" (default) switches to the host-streaming engine
    (infer/streaming.py — O(patch-group) device memory, field/canvas in
    host RAM) when the monolithic engine's resident tensors would exceed
    the per-chip HBM budget (see ``_engine_hbm_bytes``); True forces it,
    False forbids it.  Streamed output is seam-identical to the
    monolithic engine — same tiling, statistics, and noise streams.

    ``texture_gate``: "auto" (default) applies the flow-conditional
    texture gate (models/texture_gate.py) when the network carries one
    (get_network loads the bundled calibration) — rescaling each output
    channel's high-pass band to the truth energy predicted from the
    input flow, the fix for the per-day sharpness tail on near-calm /
    axis-pinned days (docs/texture_gate_fit.json).  False disables it
    (bit-parity comparisons against the ungated reference pipeline);
    a params dict or .npz path overrides the bundled calibration.  The
    prediction runs on host from a dozen intensive statistics of the
    input field; the band rescale runs where the stitched canvas lives
    (on device for the monolithic engine, in host RAM for streaming).
    """
    network = network if network is not None else get_network()
    gate_params = None
    if texture_gate == "auto" or texture_gate is True:
        gate_params = getattr(network, "texture_gate", None)
    elif isinstance(texture_gate, str):
        from windtpu.models.texture_gate import load_gate_npz

        gate_params = load_gate_npz(texture_gate)
    elif texture_gate:
        gate_params = texture_gate
    mcfg = network.cfg.model
    icfg = InferenceConfig(
        sequence_length=mcfg.sequence_length, image_size=mcfg.image_size,
        noise_channels=mcfg.noise_channels,
        noise_std=NOISE_STD if noise_std is None else noise_std,
        overlap_factor=overlap_factor)

    time_vals = inputs_era5.coords["time"].values
    lat = inputs_era5.coords["lat_1"].values
    lon = inputs_era5.coords["lon_1"].values

    u10 = np.asarray(inputs_era5["u10"].values, np.float32)
    v10 = np.asarray(inputs_era5["v10"].values, np.float32)
    elev = np.asarray(inputs_topo["elevation"].values, np.float32) / 1e3
    elev_t = np.broadcast_to(elev, u10.shape)
    field = np.stack([u10, v10, elev_t], axis=-1)  # (T, lat, lon, 3)

    gate_target = gate_floor = None
    if gate_params is not None:
        from windtpu.models.texture_gate import predict_log_energy_np

        # Host-side: a dozen intensive reductions + per-frame power
        # spectra of the (already host-resident) input — never re-ships
        # the field over the device link just to compute 2 scalars.
        gate_target = np.exp(predict_log_energy_np(
            gate_params, field)).astype(np.float32)
        gate_floor = np.asarray(gate_params["floor"], np.float32)

    t_total, h, w = field.shape[:3]
    plan = plan_tiling(h, w, t_total, icfg.image_size, icfg.sequence_length,
                       overlap_factor)
    print(f"Applying model to {plan.num_patches} patches")
    if isinstance(mesh, str) and mesh == "auto":
        mesh = inference_mesh(ensemble_members)
    if streaming == "auto":
        # Per-device member count: with an ensemble mesh axis each device
        # holds only its member shard's canvases.
        m_loc = ensemble_members
        if (mesh is not None and "ensemble" in mesh.axis_names
                and ensemble_members % mesh.shape["ensemble"] == 0):
            m_loc = ensemble_members // mesh.shape["ensemble"]
        streaming = (_engine_hbm_bytes(t_total, h, w, mcfg.in_channels,
                                       mcfg.out_channels,
                                       members_per_device=m_loc)
                     > _streaming_threshold())
        if streaming:
            print("# domain exceeds the on-device engine's HBM budget; "
                  "using the host-streaming engine")
    if streaming:
        from windtpu.infer.streaming import downscale_field_streaming

        key = key if key is not None else jax.random.key(0)
        if ensemble_members > 1:
            keys = jax.random.split(key, ensemble_members)
            pred, _ = downscale_field_streaming(
                network.generator_variables, field, mcfg, icfg,
                plan=plan, ensemble_keys=keys)
            member_axis = True
        else:
            pred, _ = downscale_field_streaming(
                network.generator_variables, field, mcfg, icfg,
                key=key, plan=plan)
            member_axis = False
        pred = _trim_canvas(pred, member_axis, plan, icfg)
        if gate_params is not None:
            from windtpu.models.texture_gate import apply_gate_targeted_np

            # The streamed canvas lives in host RAM because it does NOT
            # fit on device — gate it there, frame at a time.
            pred = apply_gate_targeted_np(gate_target, gate_floor, pred)
        _LAST_RUN.update(mode="streaming", mesh_axes=None,
                         ensemble_sharded=False, n_devices=1,
                         texture_gate=gate_params is not None)
        return _assemble_output(pred, member_axis, plan, icfg, time_vals,
                                lat, lon, ensemble_members)
    tile_parallel = (mesh is not None and "data" in mesh.axis_names
                     and mesh.shape["data"] > 1)
    key = key if key is not None else jax.random.key(0)
    if ensemble_members > 1:
        keys = jax.random.split(key, ensemble_members)
        ensemble_sharded = (mesh is not None
                            and "ensemble" in mesh.axis_names
                            and ensemble_members % mesh.shape["ensemble"]
                            == 0)
        if ensemble_sharded and tile_parallel:
            # One shard_map program: members over the ensemble axis, each
            # member's patch groups over the data axis.  vmap over the
            # tile-parallel predictor would instead replicate every member
            # on every ensemble group (~3x slower, same output).
            predictor = make_ensemble_tile_parallel_predictor(
                mcfg, icfg, plan, mesh, "data", "ensemble")
            preds, _ = predictor(network.generator_variables, field, keys)
        else:
            if tile_parallel:
                predictor = make_tile_parallel_predictor(
                    mcfg, icfg, plan, mesh, "data")
            else:
                predictor = make_tiled_predictor(mcfg, icfg, plan)
            if ensemble_sharded:
                from jax.sharding import NamedSharding, PartitionSpec as P

                keys = jax.device_put(
                    keys, NamedSharding(mesh, P("ensemble")))
            preds, _ = jax.vmap(predictor, in_axes=(None, None, 0))(
                network.generator_variables, field, keys)
        _LAST_RUN.update(
            mode="ensemble" + ("+tile" if tile_parallel else ""),
            mesh_axes=dict(zip(mesh.axis_names, mesh.devices.shape))
            if mesh is not None else None,
            ensemble_sharded=ensemble_sharded,
            n_devices=len(preds.sharding.device_set),
            texture_gate=gate_params is not None,
        )
        preds = _trim_canvas(preds, True, plan, icfg)
        if gate_params is not None:
            preds = _gate_on_device(gate_target, gate_floor, preds)
        pred = np.asarray(jax.device_get(preds))
        member_axis = True
    else:
        if tile_parallel:
            predictor = make_tile_parallel_predictor(mcfg, icfg, plan,
                                                     mesh, "data")
        else:
            predictor = make_tiled_predictor(mcfg, icfg, plan)
        pred, _ = predictor(network.generator_variables, field, key)
        _LAST_RUN.update(
            mode="tile" if tile_parallel else "single",
            mesh_axes=dict(zip(mesh.axis_names, mesh.devices.shape))
            if mesh is not None else None,
            ensemble_sharded=False,
            n_devices=len(mesh.devices.ravel()) if tile_parallel else 1,
            texture_gate=gate_params is not None,
        )
        pred = _trim_canvas(pred, False, plan, icfg)
        if gate_params is not None:
            pred = _gate_on_device(gate_target, gate_floor, pred)
        pred = np.asarray(jax.device_get(pred))
        member_axis = False

    return _assemble_output(pred, member_axis, plan, icfg, time_vals,
                            lat, lon, ensemble_members)


def _trim_canvas(pred, member_axis, plan, icfg):
    """Slice the stitched canvas to the covered time window and drop the
    border-cropped rim (reference api.py:150-152 isel(2,-2) +
    groupby-mean drops those coordinates from its grid entirely; same
    here rather than returning a NaN frame).  Pure slicing — lazy and
    free on device arrays, so the texture gate can run on device on a
    NaN-free field before anything is fetched to host."""
    covered_t = plan.num_time_chunks * icfg.sequence_length
    pred = pred[..., :covered_t, :, :, :] if member_axis \
        else pred[:covered_t]
    b = icfg.border_crop
    if b:
        pred = pred[..., b:-b, b:-b, :]
    return pred


def _assemble_output(pred, member_axis, plan, icfg, time_vals, lat, lon,
                     ensemble_members):
    """Already-trimmed canvas (_trim_canvas) -> output Dataset."""
    covered_t = plan.num_time_chunks * icfg.sequence_length
    b = icfg.border_crop
    if b:
        lat = lat[b:-b]
        lon = lon[b:-b]
    coords = {
        "time": DataArray(("time",), time_vals[:covered_t]),
        "lat_1": DataArray(("lat_1",), lat),
        "lon_1": DataArray(("lon_1",), lon),
    }
    dims = ("time", "lat_1", "lon_1")
    if member_axis:
        coords["member"] = DataArray(
            ("member",), np.arange(ensemble_members))
        dims = ("member",) + dims
    data_vars = {
        "u10": DataArray(dims, pred[..., 0]),
        "v10": DataArray(dims, pred[..., 1]),
    }
    return Dataset(data_vars, coords)


def downscale(
    era5: Dataset,
    raster_topo: Dataset,
    range_lon: Optional[Tuple[float, float]] = None,
    range_lat: Optional[Tuple[float, float]] = None,
    overlap_factor: float = 0.05,
    network=None,
    **predict_kwargs,
) -> Dataset:
    """ERA5 dataset + DEM raster + bbox -> downscaled NetCDF-ready dataset
    (reference api.py:155-160).

    Extra keyword arguments reach :func:`predict` — notably
    ``ensemble_members`` (one stochastic member per device on a multi-chip
    mesh) and ``mesh`` ("auto" shards members over an ``ensemble`` axis and
    patch tiles over a ``data`` axis whenever >1 device is visible)."""
    template = build_high_res_template_from_era5(
        era5, range_lon=range_lon, range_lat=range_lat)
    inputs_era5 = process_era5(era5, template)
    inputs_topo = process_topo(raster_topo, template)
    return predict(inputs_era5, inputs_topo, template,
                   overlap_factor=overlap_factor, network=network,
                   **predict_kwargs)
