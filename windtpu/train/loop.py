"""Training driver: batches -> jitted step -> logging/checkpoints.

The reference has no training driver in-tree (training goes through
``keras.Model.fit``, SURVEY.md §3.2); this is the equivalent loop for the
jitted WGAN-GP step, with step timing, periodic checkpoints and optional
jax.profiler traces (the reference has no profiling at all, SURVEY.md §5).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from windtpu.core.config import GANConfig
from windtpu.train import checkpoint as ckpt
from windtpu.train.state import GANTrainState, create_train_state
from windtpu.train.wgan_gp import make_multi_train_step, make_train_step


def train(
    cfg: GANConfig,
    batches: Iterable,
    num_steps: int,
    state: Optional[GANTrainState] = None,
    log_every: int = 10,
    checkpoint_every: Optional[int] = None,
    log_fn: Callable[[int, dict], None] = None,
    profile_dir: Optional[str] = None,
    mesh=None,
):
    """Run ``num_steps`` WGAN-GP updates over ``batches`` of
    (low_res, high_res) arrays.  Returns (state, history).

    With ``mesh`` the train state is replicated over every device of the
    (possibly multi-host) mesh before the first step and the step PRNG is
    built on-mesh — the batches iterator is expected to yield globally
    sharded arrays (``BatchGenerator.as_device_iterator(mesh)``).  In
    multi-process runs every process executes the loop; checkpoint writes
    and metrics logging happen on process 0 only (restores happen
    everywhere so resumed state stays identical across hosts).

    Note on very long runs under the axon remote-TPU client: its
    host->device transfers leak host RSS (up to ~100% of bytes moved), so
    a multi-day run streaming fresh batches should either keep its data
    device-resident and crop on-device (tools/train_shipped_ckpt.py shows
    the pattern) or rely on ``checkpoint_every`` + resume across process
    restarts.  Native TPU runtimes don't need this."""
    multi_host = mesh is not None and jax.process_count() > 1
    if multi_host:
        # FIRST, before any compilation: establish the cross-process
        # collective context while all hosts are still aligned (they just
        # returned from jax.distributed.initialize).  The context
        # rendezvous has a hard 30 s KV-exchange window (Gloo on CPU) —
        # shorter than the per-host variance of compiling even the state
        # initializer — but once the context exists, later collectives
        # block on it without that window.
        from jax.experimental import multihost_utils

        print(f"[windtpu p{jax.process_index()}] t={time.time():.1f} "
              "sync: collective-context rendezvous", flush=True)
        multihost_utils.sync_global_devices("windtpu/train/join")
        print(f"[windtpu p{jax.process_index()}] t={time.time():.1f} "
              "sync done", flush=True)
    if state is None:
        state = create_train_state(cfg)
    lead = jax.process_index() == 0
    metrics_logger = None
    if cfg.checkpoint_dir:
        latest = ckpt.latest_checkpoint(cfg.checkpoint_dir)
        if multi_host:
            # Every process must restore the SAME step (or none): each host
            # scans its local filesystem, and an unshared checkpoint dir (or
            # a host that lags a save) would make some hosts restore and
            # others not — replicate_to_mesh would then assemble a
            # "replicated" state whose per-process shards silently differ,
            # and gradients would psum over divergent parameters with no
            # detection.  Broadcast process 0's view and fail loudly on
            # disagreement.
            import numpy as np

            def _step_of(path):
                return int(path.rsplit("step_", 1)[1]) if path else -1

            lead_step = int(multihost_utils.broadcast_one_to_all(
                np.int64(_step_of(latest))))
            if _step_of(latest) != lead_step:
                raise RuntimeError(
                    f"checkpoint disagreement: process "
                    f"{jax.process_index()} sees step {_step_of(latest)} "
                    f"in {cfg.checkpoint_dir} but process 0 sees "
                    f"{lead_step}; the checkpoint directory must be shared "
                    f"(or equally replicated) across hosts")
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} (step {int(state.step)})")
        if lead:
            from windtpu.utils.logging import MetricsLogger

            metrics_logger = MetricsLogger(
                f"{cfg.checkpoint_dir}/metrics.jsonl")

    # K steps per device call (TrainConfig.steps_per_call): K batches are
    # stacked host-side and scanned inside one program; the noise/step
    # sequence is bit-identical to K single calls (the step folds the
    # PRNG by state.step).  A remainder of num_steps % K runs through a
    # separately-jitted single step.
    # Perceptual reconstruction loss: resolve the bundled/checkpointed
    # encoder automatically when the coefficient asks for it (the
    # reference wires this through features_encoding's singleton,
    # gan/train.py:19-26) — without this, reconstruction_coefficient
    # would silently be a no-op from the driver.
    feature_fn = None
    if cfg.train.reconstruction_coefficient > 0:
        from windtpu.features import get_encoder_fn

        feature_fn = get_encoder_fn(cfg.model.image_size,
                                    cfg.model.sequence_length)

    k = max(1, getattr(cfg.train, "steps_per_call", 1))
    step_fn = (make_multi_train_step(
        cfg, k, feature_fn=feature_fn,
        unroll=getattr(cfg.train, "steps_per_call_unroll", False))
        if k > 1 else make_train_step(cfg, feature_fn=feature_fn))
    single_fn = (make_train_step(cfg, feature_fn=feature_fn)
                 if (k > 1 and num_steps % k) else None)
    if mesh is not None:
        from windtpu.parallel.distributed import key_on_mesh, replicate_to_mesh

        state = replicate_to_mesh(mesh, state)
        rng = key_on_mesh(mesh, cfg.seed + 1)
    else:
        rng = jax.random.key(cfg.seed + 1)
    history = []
    it = iter(batches)
    if mesh is not None and jax.process_count() > 1 and num_steps > 0:
        # Multi-host alignment: the step's gradient psums are the first
        # cross-process collectives, and the collective-context rendezvous
        # has a short timeout (Gloo on CPU: 30 s) — shorter than the
        # per-host compile-time skew of a big program.  So compile the
        # step(s) ahead of time on EVERY host, barrier, and only then
        # execute: the first collective fires aligned to within data-load
        # jitter.  The peeked batches are replayed through the iterator.
        import itertools

        from jax.experimental import multihost_utils

        peek_n = k if num_steps >= k else 1
        peeked = [next(it) for _ in range(peek_n)]
        if peek_n > 1:
            step_fn.lower(state, tuple(p[0] for p in peeked),
                          tuple(p[1] for p in peeked), rng).compile()
        if peek_n == 1 or (single_fn is not None):
            (single_fn or step_fn).lower(
                state, peeked[0][0], peeked[0][1], rng).compile()
        print(f"[windtpu p{jax.process_index()}] t={time.time():.1f} "
              "step compiled; waiting for peers", flush=True)
        multihost_utils.sync_global_devices("windtpu/train/compiled")
        it = itertools.chain(peeked, it)
    t_last = time.perf_counter()
    steps_since_log = 0
    local_step = 0
    call_idx = 0
    profiling = False
    while local_step < num_steps:
        this_k = k if (num_steps - local_step) >= k else 1
        if this_k > 1:
            # Tuples of K batches; stacked inside the jitted multi-step so
            # device-sharded batches never round-trip through the host.
            pairs = [next(it) for _ in range(k)]
            low_res = tuple(p[0] for p in pairs)
            high_res = tuple(p[1] for p in pairs)
            fn = step_fn
        else:
            low_res, high_res = next(it)
            fn = single_fn or step_fn
        # Profile device calls 2..3 (past compilation), counted in CALLS —
        # a call is the unit the profiler sees regardless of stride.
        if profile_dir and call_idx == 2:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        state, metrics = fn(state, low_res, high_res, rng)
        if profiling and call_idx == 3:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            profiling = False
        prev = local_step
        local_step += this_k
        steps_since_log += this_k
        call_idx += 1
        # Stride-aware cadences: fire when a multiple was CROSSED, not
        # only when it is landed on exactly (k need not divide the
        # cadence).  steps_per_sec uses the actual steps since last log.
        if (prev // log_every != local_step // log_every
                or local_step == this_k):
            metrics = {key: float(v) for key, v in metrics.items()}
            now = time.perf_counter()
            metrics["steps_per_sec"] = (
                1.0 if local_step == this_k
                else steps_since_log / (now - t_last))
            t_last = now
            steps_since_log = 0
            history.append((int(state.step), metrics))
            if metrics_logger:
                metrics_logger(int(state.step), metrics)
            if log_fn:
                log_fn(int(state.step), metrics)
            else:
                msg = " ".join(f"{key}={v:.4g}"
                               for key, v in metrics.items())
                print(f"step {int(state.step)}: {msg}")
        # NOTE: in multi-process runs EVERY process must call
        # save_checkpoint — Orbax's save is a collective (it barriers
        # across jax.distributed internally); a lead-only save deadlocks
        # the lead against peers that have moved on.
        if (cfg.checkpoint_dir and checkpoint_every
                and prev // checkpoint_every != local_step // checkpoint_every):
            ckpt.save_checkpoint(cfg.checkpoint_dir, state)
    if profiling:  # num_steps ended inside the trace window
        jax.profiler.stop_trace()
    if cfg.checkpoint_dir:
        ckpt.save_checkpoint(cfg.checkpoint_dir, state)
    if metrics_logger:
        metrics_logger.close()
    return state, history
