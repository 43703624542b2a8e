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
from windtpu.train.wgan_gp import make_train_step


def train(
    cfg: GANConfig,
    batches: Iterable,
    num_steps: int,
    state: Optional[GANTrainState] = None,
    log_every: int = 10,
    checkpoint_every: Optional[int] = None,
    log_fn: Callable[[int, dict], None] = None,
    profile_dir: Optional[str] = None,
):
    """Run ``num_steps`` WGAN-GP updates over ``batches`` of
    (low_res, high_res) arrays.  Returns (state, history)."""
    if state is None:
        state = create_train_state(cfg)
    metrics_logger = None
    if cfg.checkpoint_dir:
        latest = ckpt.latest_checkpoint(cfg.checkpoint_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} (step {int(state.step)})")
        from windtpu.utils.logging import MetricsLogger

        metrics_logger = MetricsLogger(
            f"{cfg.checkpoint_dir}/metrics.jsonl")

    step_fn = make_train_step(cfg)
    rng = jax.random.key(cfg.seed + 1)
    history = []
    it = iter(batches)
    t_last = time.perf_counter()
    for local_step in range(num_steps):
        low_res, high_res = next(it)
        if profile_dir and local_step == 2:
            jax.profiler.start_trace(profile_dir)
        state, metrics = step_fn(state, low_res, high_res, rng)
        if profile_dir and local_step == 4:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
        if (local_step + 1) % log_every == 0 or local_step == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            metrics["steps_per_sec"] = (
                1.0 if local_step == 0 else log_every / (now - t_last))
            t_last = now
            history.append((int(state.step), metrics))
            if metrics_logger:
                metrics_logger(int(state.step), metrics)
            if log_fn:
                log_fn(int(state.step), metrics)
            else:
                msg = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
                print(f"step {int(state.step)}: {msg}")
        if (cfg.checkpoint_dir and checkpoint_every
                and (local_step + 1) % checkpoint_every == 0):
            ckpt.save_checkpoint(cfg.checkpoint_dir, state)
    if cfg.checkpoint_dir:
        ckpt.save_checkpoint(cfg.checkpoint_dir, state)
    if metrics_logger:
        metrics_logger.close()
    return state, history
