"""Virtual-CPU subprocess helpers (re-exec recipe, shared).

Two platform facts (verified on the target box) shape how any windtpu
tool provisions a multi-device virtual CPU mesh:

* The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var once the
  plugin is importable in-process, and ``XLA_FLAGS`` is read once at
  backend init — so a process cannot switch itself to the virtual CPU
  platform after (or even shortly before) its first JAX use.  The only
  reliable recipe is a FRESH interpreter that calls
  ``jax.config.update("jax_platforms", "cpu")`` before first JAX use,
  with ``--xla_force_host_platform_device_count=<n>`` in ``XLA_FLAGS``
  (the same recipe tests/conftest.py uses).
* The TPU is single-client: a subprocess that merely calls
  ``jax.devices()`` while its parent holds the chip blocks forever —
  so a parent that holds (or might hold) the TPU must hand its
  children this env rather than letting them probe.

These helpers never initialize JAX in the calling process.
"""

import os
import socket

# Paste before any JAX-using code in a child interpreter: the config
# flag is the part the env var cannot replace (see module docstring).
FORCE_CPU_PREAMBLE = "import jax; jax.config.update('jax_platforms', 'cpu'); "


def virtual_cpu_env(n_devices: int, repo_root: str, base_env=None) -> dict:
    """Env for a child interpreter that must see ``n_devices`` CPU devices.

    Belt (env vars) for well-behaved platforms; the suspenders — the
    in-child ``jax.config.update`` — is the caller's job via
    :data:`FORCE_CPU_PREAMBLE` or an explicit config.update at the top
    of the child's main.
    """
    env = dict(base_env if base_env is not None else os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count="
                 f"{n_devices}").strip()
    env["XLA_FLAGS"] = flags
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def free_tcp_port() -> int:
    """An OS-assigned free TCP port (for jax.distributed coordinators).

    Racy in principle (released before the child binds) but eliminates
    collisions with fixed/pid-derived ports in concurrent test runs.
    """
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
