"""Observability: step-metric logging and profiler traces.

The reference has no tracing/profiling at all (SURVEY.md §5: tensorboard is
pinned but never used; progress is bare prints).  windtpu provides:

* :class:`MetricsLogger` — append-only JSONL of per-step scalar metrics
  (one object per line: step, wall time, metrics), cheap enough to leave on;
* :func:`profile_region` — context manager around ``jax.profiler`` traces
  for TensorBoard/Perfetto;
* NaN debugging — ``enable_nan_checks()`` flips jax's debug_nans for
  development runs (the closest reference analogue is nothing).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append per-step metric dicts to a JSONL file."""

    def __init__(self, path, flush_every: int = 20):
        self.path = os.fspath(path)
        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        self._fh = open(self.path, "a")
        self._since_flush = 0
        self.flush_every = flush_every
        self._t0 = time.time()

    def __call__(self, step: int, metrics: dict):
        record = {"step": int(step),
                  "wall_time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._fh.write(json.dumps(record) + "\n")
        self._since_flush += 1
        if self._since_flush >= self.flush_every:
            self._fh.flush()
            self._since_flush = 0

    def close(self):
        self._fh.flush()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def profile_region(log_dir: Optional[str]):
    """jax.profiler trace around a code region (no-op when log_dir is
    None).  View with TensorBoard or ui.perfetto.dev."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks():
    """Dev-mode NaN detection inside jitted code (jax debug_nans)."""
    import jax

    jax.config.update("jax_debug_nans", True)
