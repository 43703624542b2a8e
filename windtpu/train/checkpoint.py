"""Checkpointing — one composite Orbax checkpoint per step.

The reference saves generator and discriminator as two separate TF object
checkpoints under one directory (ganbase.py:132-140).  Here the whole
:class:`GANTrainState` (both networks, mutable collections, optimizer
states, step) is one atomic Orbax checkpoint, with helpers to load the
generator alone for inference-only use.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from windtpu.train.state import GANTrainState


def save_checkpoint(directory, state: GANTrainState, step: Optional[int] = None):
    directory = os.fspath(directory)
    step = int(state.step) if step is None else int(step)
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory) -> Optional[str]:
    directory = os.fspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(os.path.abspath(directory), steps[-1]) if steps else None


def restore_checkpoint(path, template: GANTrainState) -> GANTrainState:
    """Restore into the structure of ``template`` (an initialized state)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.fspath(path)),
                         jax.device_get(template))


def restore_generator(path, template_vars):
    """Inference-only restore of the generator variables
    {'params','batch_stats','spectral_stats'} from a full train checkpoint."""
    full = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.fspath(path)))
    return {
        "params": full["g_params"],
        "batch_stats": full["g_batch_stats"],
        "spectral_stats": full["g_spectral"],
    }
