"""Device mesh and sharding helpers.

The reference is single-process / single-device TF (SURVEY.md §2: no
tf.distribute, no MPI).  This module supplies the scale-out layer the TPU
build adds: a named :class:`jax.sharding.Mesh` with

* ``data``     — data parallelism over the batch axis (grad sync is a psum
  XLA inserts automatically under jit once inputs are sharded),
* ``ensemble`` — one stochastic ensemble member per device at inference
  (keys split per member; see windtpu.infer.engine).

TP/PP/SP/EP have no counterpart in this convolutional T<=24 workload and are
intentionally N/A (SURVEY.md §5 "Long-context / sequence parallelism").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[dict] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh.  Default: all devices on a single ``data`` axis.

    ``axis_shapes`` maps axis name -> size; sizes must multiply to the device
    count (one size may be -1 to infer).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = {"data": len(devices)}
    names = tuple(axis_shapes)
    sizes = list(axis_shapes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    need = int(np.prod(sizes))
    if need > len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {need} devices, "
            f"only {len(devices)} available")
    dev_array = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
