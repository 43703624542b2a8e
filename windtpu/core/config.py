"""Typed configuration for the whole framework.

The reference scatters its configuration across module constants
(src/downscaling/api.py:22-28), constructor kwargs
(src/downscaling/data/data_generator.py:97-112) and env vars
(src/downscaling/autoencoder/features_encoding.py:6).  Here it is one set of
frozen dataclasses so a jitted program's static arguments hash cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the generator/discriminator pair.

    Defaults reproduce the shipped inference network
    (reference api.py:22-28: T=24, 96 px, 3 inputs, 20 noise channels,
    2 outputs) at generator feature width 128 / discriminator width 16
    (reference gan/models.py:16,83).
    """

    image_size: int = 96
    in_channels: int = 3
    noise_channels: int = 20
    out_channels: int = 2
    sequence_length: int = 24
    generator_features: int = 128
    discriminator_features: int = 16
    # Minimum second-pyramid depth that triggers the strided shortcut
    # residual in the discriminator.  The reference CODE requires > 1
    # iteration (gan/models.py:127), but the shipped weights-55 checkpoint
    # contains the shortcut conv for the 96px graph where the pyramid runs
    # exactly once (6x6x128->256 kernel in discriminator.index) — set 1 to
    # reproduce that trained topology.
    discriminator_shortcut_min_iters: int = 2
    # Computation dtype for the conv stack.  Parameters are always float32;
    # bfloat16 here feeds the MXU at double rate.
    compute_dtype: str = "float32"
    # Compute the entry stem as conv(img) + conv(noise) with one sliced
    # kernel tensor instead of one conv over the concat buffer — the same
    # function in exact arithmetic (linear in channels; checkpoints
    # unaffected, tests/test_models.py::TestSplitStem).  ~14% faster on
    # the ISOLATED inference stem (no (B*T,I,I,30) concat buffer in HBM,
    # tools/ablate_noise_fusion.py) but within noise at the full train
    # step and forward (the stem is ~1% of the generator), and in
    # bfloat16 the two partial sums round once more than the fused conv.
    # Off by default: not worth a bit-level divergence.
    split_stem: bool = False
    # lax.scan unroll factor for the CRITIC's ConvLSTM recurrences.  The
    # critic's narrow-channel scans (F=2/16) are kernel-launch-bound, and
    # they sit inside the twice-differentiated gradient-penalty path, so
    # unrolling them lets XLA fuse across timesteps: 2x on the GP
    # double-grad, 1.6x on the whole train step at T=6
    # (tools/ablate_step.py).  0 = unroll fully (sequence_length).  The
    # generator's wide (128-ch) scan gains nothing from unrolling and is
    # left rolled to keep compile time down.
    critic_scan_unroll: int = 0
    # Run the critic's two branch ConvLSTMs (2- and 16-feature) as ONE
    # block-diagonal recurrence instead of two scans: same math exactly
    # (zero blocks in the fused kernels; layers.fused_dual_convlstm), same
    # checkpoint tree, half the serial recurrent convs.  Measured on the
    # v5e at the primary bench shape it is 25% SLOWER (1.84 vs 2.30
    # steps/s): with critic_scan_unroll=0 the scans are fully unrolled, so
    # XLA already interleaves the two branches' ops, and the fused
    # recurrent conv does ~25% more MACs (the (fa+fb)^2 feature block vs
    # fa^2+fb^2).  Kept as an option because it wins when the scans stay
    # rolled (serial-launch-bound); equivalence is asserted by
    # tests/test_models.py::TestFusedCriticBranches.
    critic_fused_branches: bool = False

    def __post_init__(self):
        if self.image_size % 4 != 0:
            raise ValueError("image_size must be a multiple of 4")
        if self.generator_features % 8 != 0:
            raise ValueError("generator_features must be a multiple of 8")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """WGAN-GP optimization schedule (reference gan/ganbase.py:9-61,
    gan/train.py:34-59)."""

    batch_size: int = 8
    n_critic: int = 3
    gp_weight: float = 100.0
    noise_std: float = 0.1
    # Adam hyperparameters as compiled in the reference (train.py:35,58).
    g_learning_rate: float = 1e-4
    d_learning_rate: float = 4e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    adam_eps: float = 0.1
    # RMSprop(5e-5) is the commented-out alternative the shipped weights-55
    # checkpoint was actually trained with (train.py:36,59 + ckpt index).
    optimizer: str = "adam"
    rmsprop_learning_rate: float = 5e-5
    # Optional perceptual reconstruction loss coefficient (train.py:19-26).
    reconstruction_coefficient: float = 0.0
    # Weight of the generator's adversarial term (reference ganbase.py:54
    # is implicitly 1.0).  0.0 drops the critic score from the generator
    # loss AND (with n_critic=0) removes the critic from the compiled
    # program entirely — the supervised-polish mode used to sculpt the
    # bundled checkpoint's texture amplitude against the reconstruction
    # anchor + sharpness objective without the WGAN equilibrium fighting
    # the per-channel gain (tools/train_shipped_ckpt.py --adv 0).
    adversarial_coefficient: float = 1.0
    # Replicate the reference quirk where the gradient penalty is computed
    # outside the parameter tape and therefore never trains the critic
    # (ganbase.py:32-45).  False = real WGAN-GP.
    detach_gp: bool = False
    # Whether to compute the domain metric suite inside the train step
    # (reference recomputes with training=False, ganbase.py:63-72).
    compute_metrics: bool = True
    # Rematerialize network forwards in the loss functions
    # (jax.checkpoint): trades recompute FLOPs for HBM.  False = off,
    # "d_only" = critic only, True = both networks, "save_scans" = both
    # EXCEPT the serial ConvLSTM outputs.  History: before fused_scoring
    # and the critic scan unroll, batch 64 OOM'd without critic remat;
    # with them the primary (batch 64/64px/T=6) AND flagship (batch
    # 2/96px/T=24) shapes fit un-remat'd, and False is fastest (2.30
    # steps/s vs d_only 2.24 vs save_scans ~1.8 on v5e) with less than
    # half the compile time.  OOM escalation ladder: remat="d_only",
    # then remat_gp=True (the GP double-grad call is exempted from every
    # remat policy by default — see below), then remat=True.  All modes
    # are semantics-preserving
    # (tests/test_train.py::test_remat_modes_are_semantics_preserving).
    remat: "bool | str" = False
    # Apply the remat policy inside the gradient-penalty double-grad too.
    # The GP path is differentiated twice, so rematerialization recomputes
    # its forwards twice over; False exempts it from the policy, trading
    # HBM for a large cut of the dominant cost (+17% steps/s on the
    # primary bench shape; the GP is ~half the step, tools/ablate_step.py).
    remat_gp: bool = False
    # Score real+noise and fake+noise in ONE critic call on the doubled
    # batch instead of two calls (LayerNorm is per-sample and the critic
    # has no BatchNorm, so the math is identical; the only drift is the
    # spectral-norm u advancing once instead of twice per critic iter —
    # bounded by tests/test_train.py::test_fused_scoring_step_close_to_
    # unfused).  +8% steps/s on the primary bench shape.
    fused_scoring: bool = True
    # Compute the (expensive) spatial KS metric in-step.
    compute_spatial_ks: bool = False
    # Per-sample high-pass energy-ratio penalty on the generator
    # (losses.highpass_energy_ratio_loss): ties each sample's fine-scale
    # texture amplitude to its truth.  0 disables (reference parity — the
    # reference has no sharpness objective).  Used when fine-tuning the
    # bundled checkpoint to pull the calm-day overshoot tail in.
    sharpness_coefficient: float = 0.0
    # Gaussian cutoff (px) defining the "fine-scale" band for the penalty;
    # matches the self-downscaling pipeline's blur sigma
    # (reference data_processing.py:190).
    sharpness_sigma: float = 7.0
    # Optimizer steps executed per device call in the train loop — the
    # reference's Keras ``_steps_per_execution`` concept (ganbase.py:15).
    # K>1 runs K steps inside one program; the PRNG folds by state.step,
    # so the step/noise sequence is identical to K=1.  Measured at K=4 on
    # the primary bench shape: rolled scan +1% (dispatch is already
    # pipelined), with steps_per_call_unroll also set, +6% at ~2.8x
    # compile time (XLA optimizes across step boundaries).  Default 1 =
    # reference parity (per-step logging granularity).
    steps_per_call: int = 1
    steps_per_call_unroll: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Training data pipeline (reference data_generator.py:97-112)."""

    sequence_length: int = 6
    # The reference defaults to 30 (data_generator.py:104) but windtpu's
    # generator requires image_size % 4 == 0 (two 2x upsampling stages with
    # exact shape round-trips, ModelConfig.__post_init__) — 32 is the
    # nearest valid patch, so defaults compose without a crash.
    patch_size: int = 32
    batch_size: int = 16
    transform: bool = True
    input_variables: Tuple[str, ...] = (
        "u10", "v10", "blh", "fsr", "sp", "z", "vo", "d",
        "tpi_500", "ridge_index_norm",
    )
    output_variables: Tuple[str, ...] = ("U_10M", "V_10M")
    num_workers: int = 1


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Tiled inference (reference api.py:89-152)."""

    sequence_length: int = 24
    image_size: int = 96
    batch_size: int = 8
    noise_channels: int = 20
    noise_std: float = 0.1
    overlap_factor: float = 0.05
    border_crop: int = 2
    group_size: int = 16  # BATCH_SIZE * 2, reference api.py:132
    # The reference normalizes the stacked 5-D (patch, time, lat, lon,
    # channel) tensor over axes (0, 1, 2) = (patch, time, lat), keeping
    # per-(lon, channel) statistics — NOT per-channel (api.py:128-129).
    # True replicates that quirk bit-for-bit; False normalizes per-channel
    # over (patch, time, lat, lon), which is almost surely the intent.
    replicate_normalization_quirk: bool = True
    # Ensemble members for stochastic inference (one per device when the
    # mesh has an 'ensemble' axis).
    ensemble_members: int = 1
    # lax.scan unroll factor for the engine's patch-group loops (stats
    # pass and generate-stitch pass).  The per-group work ends in many
    # small serial ops (patch gathers, scatter-add stitching); unrolling
    # lets XLA overlap them with the next group's generator compute:
    # 215 -> 158 ms on the flagship 24h 546x756 domain (4 groups, v5e).
    # 0 = unroll fully; the default 4 bounds compile time on very large
    # domains.  The per-patch stitch loop inside each group is always
    # unrolled (group_size is static).
    scan_unroll: int = 4
    # Host<->device transfer precision for the STREAMING engine only
    # (infer/streaming.py).  The streaming path is transfer-bound on
    # remote-attached links (measured v5e-via-tunnel: ~1.9 s per group of
    # which compute is milliseconds — 17 MB of fp32 patches+preds at
    # ~9 MB/s), so "bfloat16" halves the bytes for ~2x throughput.
    # Inputs are near-lossless (the flagship model computes in bf16
    # anyway); downloaded predictions get rounded to bf16 (~0.4%
    # relative), so the default stays "float32", which is seam-identical
    # to the monolithic engine.
    streaming_transfer_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class GANConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    inference: InferenceConfig = dataclasses.field(default_factory=InferenceConfig)
    seed: int = 0
    checkpoint_dir: Optional[str] = None
