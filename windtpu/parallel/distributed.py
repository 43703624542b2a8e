"""Multi-host initialization (DCN) and mesh construction.

The reference has no distributed backend at all (SURVEY.md §2: single-device
TF, mpi4py pinned but never imported).  On TPU pods, multi-host execution
is: initialize the JAX distributed runtime once per process, then build a
global mesh whose ``data`` axis spans all hosts — DP gradient psums ride
ICI within a slice and DCN across slices, inserted by XLA from the sharded
jit; no NCCL/MPI plumbing exists or is needed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from windtpu.core.mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    No-op (returns False) in single-process runs.  Arguments default to the
    standard JAX env vars / TPU metadata, so on Cloud TPU pods calling this
    with no arguments is enough.
    """
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # Pod auto-detection must mean MULTI-host: single-chip environments
    # (e.g. the axon tunnel) export TPU_WORKER_HOSTNAMES=localhost, and
    # initializing jax.distributed there is at best useless, at worst a
    # crash when the backend is already up.
    workers = [h for h in os.environ.get(
        "TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()]
    in_pod = (len(workers) > 1
              or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not in_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_data_mesh(ensemble: int = 1):
    """All-device mesh: ('data',) or ('data', 'ensemble')."""
    n = jax.device_count()
    if ensemble > 1:
        return make_mesh({"data": n // ensemble, "ensemble": ensemble})
    return make_mesh({"data": n})


def replicate_to_mesh(mesh, tree):
    """Replicate a pytree of host arrays over every device of ``mesh``,
    multi-process safe.

    Single-process: a plain replicated ``device_put``.  Multi-process
    (jax.distributed initialized): ``device_put`` of a non-addressable
    global sharding is disallowed, so each process contributes its
    identical local copy via ``make_array_from_process_local_data`` —
    the pattern every host on a TPU pod uses to materialize replicated
    train state.  Callers must ensure the host values are identical on
    all processes (same seed / same restored checkpoint).
    """
    rep = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), tree)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
        tree)


def key_on_mesh(mesh, seed: int):
    """A PRNG key replicated over ``mesh``, multi-process safe.

    Key-dtype arrays cannot go through ``make_array_from_process_local_data``
    (no numpy representation), so the key is CONSTRUCTED inside a jitted
    program with a replicated output sharding — every process runs the same
    program and receives the same global array.
    """
    rep = NamedSharding(mesh, P())
    build = jax.jit(lambda s: jax.random.key(s[0]), out_shardings=rep)
    return build(np.asarray([seed], np.int32))
