"""Checkpointing — one composite Orbax checkpoint per step.

The reference saves generator and discriminator as two separate TF object
checkpoints under one directory (ganbase.py:132-140).  Here the whole
:class:`GANTrainState` (both networks, mutable collections, optimizer
states, step) is one atomic Orbax checkpoint, with helpers to load the
generator alone for inference-only use.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from windtpu.train.state import GANTrainState


def save_checkpoint(directory, state: GANTrainState, step: Optional[int] = None):
    directory = os.fspath(directory)
    step = int(state.step) if step is None else int(step)
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    if os.path.exists(path):
        # Same step == same state: the in-loop cadence save and the
        # final save can both land on num_steps (Orbax raises on an
        # existing destination; a completed dir here is a finished save
        # — partial writes live under tmp names until renamed).
        return path
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory) -> Optional[str]:
    directory = os.fspath(directory)
    if not os.path.isdir(directory):
        return None
    # Full-match step_<digits> only: a save interrupted mid-write leaves an
    # Orbax "step_NNN.orbax-checkpoint-tmp-<ts>" sibling that sorts AFTER
    # the finished checkpoint — a prefix match would resume from the
    # half-written directory.
    steps = sorted(d for d in os.listdir(directory)
                   if re.fullmatch(r"step_\d+", d))
    return os.path.join(os.path.abspath(directory), steps[-1]) if steps else None


def restore_checkpoint(path, template: GANTrainState) -> GANTrainState:
    """Restore into the structure of ``template`` (an initialized state)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.fspath(path)),
                         jax.device_get(template))


def restore_generator(path, template_vars=None):
    """Inference-only restore of the generator variables
    {'params','batch_stats','spectral_stats'} from a full train checkpoint.

    With ``template_vars`` (an initialized generator's variables) the
    restored tree is validated leaf-by-leaf, so a checkpoint from a
    different ModelConfig fails here with a clear message instead of an
    opaque shape error deep inside apply()."""
    full = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.fspath(path)))
    got = {
        "params": full["g_params"],
        "batch_stats": full["g_batch_stats"],
        "spectral_stats": full["g_spectral"],
    }
    if template_vars is None:
        return got
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(template_vars)[0])
    if flat_got.keys() != flat_want.keys():
        missing = sorted(map(str, flat_want.keys() - flat_got.keys()))
        extra = sorted(map(str, flat_got.keys() - flat_want.keys()))
        raise ValueError(
            f"checkpoint {path} does not match the generator: "
            f"missing={missing[:5]} extra={extra[:5]}")
    for key, want in flat_want.items():
        have = flat_got[key]
        if tuple(have.shape) != tuple(want.shape):
            raise ValueError(
                f"checkpoint {path} leaf {jax.tree_util.keystr(key)}: "
                f"shape {tuple(have.shape)} != expected {tuple(want.shape)}"
                " (different ModelConfig?)")
    return got


# -- single-file generator weights (bundled-checkpoint format) ---------------
#
# The reference ships its pretrained generator as a TF object checkpoint
# (api.py:21, weights-55.ckpt).  windtpu's bundled equivalent is ONE
# compressed .npz whose keys are '/'-joined paths into the generator
# variables tree — trivially inspectable, diff-able, and small enough to
# live in the repo, unlike a multi-file Orbax directory.

def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = value
    return out


def save_generator_npz(path, g_variables) -> str:
    import numpy as np

    flat = {k: np.asarray(v)
            for k, v in _flatten(jax.device_get(g_variables)).items()}
    path = os.fspath(path)
    with open(path, "wb") as fp:
        np.savez_compressed(fp, **flat)
    return path


def load_generator_npz(path, template_vars):
    """Load a save_generator_npz file into the structure (and shapes) of
    ``template_vars``; raises on any missing/extra/mismatched entry."""
    import numpy as np

    with np.load(os.fspath(path)) as data:
        flat = {k: data[k] for k in data.files}
    want = _flatten(template_vars)
    missing = sorted(set(want) - set(flat))
    extra = sorted(set(flat) - set(want))
    if missing or extra:
        raise ValueError(
            f"npz weights do not match the generator tree: "
            f"missing={missing[:5]} extra={extra[:5]}")

    def rebuild(tree, prefix=""):
        out = {}
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else str(key)
            if isinstance(value, dict):
                out[key] = rebuild(value, path)
            else:
                loaded = flat[path]
                if loaded.shape != value.shape:
                    raise ValueError(
                        f"{path}: shape {loaded.shape} != {value.shape}")
                out[key] = loaded.astype(value.dtype)
        return out

    return rebuild(template_vars)
