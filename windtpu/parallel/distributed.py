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
    in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
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
