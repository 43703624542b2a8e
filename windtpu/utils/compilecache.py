"""Persistent XLA compilation cache setup.

On the axon remote-TPU platform every compile is an RPC to the tunnel
server; observed first-compile latency for even a trivial program is
tens of seconds (measured 2026-08-17: 13.8 s for a 2048x512 matmul,
~10 min for the smoke train step).  JAX's persistent compilation cache
eliminates this entirely on repeat runs — the same matmul drops to
0.84 s from a warm cache — so every process-level entry point (bench,
CLI, driver entry, trainers) opts in by default.

TPU entries are keyed by HLO + compile options + backend version, so a
stale entry can never produce wrong results, only a miss.  XLA:CPU
entries are additionally host-specific (AOT-compiled for the build
machine's CPU features — loading them elsewhere risks SIGILL), so on a
CPU backend the cache lives in a per-machine subdirectory.

Environment:

* ``WINDTPU_COMPILE_CACHE``   — cache directory (default:
  ``<repo>/.jax_cache`` when running from a checkout, else
  ``~/.cache/windtpu/xla``).
* ``WINDTPU_COMPILE_CACHE=0`` — disable.
"""

from __future__ import annotations

import os

_ACTIVE_DIR = None


def enable_persistent_cache() -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Must run before the first compilation (any time after import is
    fine — the cache config is read per-compile).  Returns the ACTIVE
    cache directory: once enabled, later calls return the directory
    actually configured, even if the environment has changed since —
    they never silently report a dir that isn't the live cache.
    Returns None when disabled.
    """
    global _ACTIVE_DIR
    if _ACTIVE_DIR is not None:
        return _ACTIVE_DIR
    env = os.environ.get("WINDTPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    if env:
        cache_dir = env
    else:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if os.path.isdir(os.path.join(repo, ".git")):
            cache_dir = os.path.join(repo, ".jax_cache")
        else:
            cache_dir = os.path.expanduser("~/.cache/windtpu/xla")

    import jax

    # XLA:CPU cache entries are AOT-compiled for the *build* machine's CPU
    # feature set; loading one on a host with fewer features warns and can
    # SIGILL.  The cache key does not include host features, so partition
    # CPU entries into a per-machine subdirectory.  (TPU entries are safe:
    # keyed by HLO + backend version, executed remotely.)
    if jax.default_backend() == "cpu":
        cache_dir = os.path.join(cache_dir, "cpu-" + _host_fingerprint())

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Remote-platform RPC latency makes even sub-second compiles worth
    # caching; disable the size/time thresholds that would skip them.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _ACTIVE_DIR = cache_dir
    return cache_dir


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU identity.

    Includes the model name as well as the feature flags: XLA:CPU AOT
    entries embed model-derived tuning attributes (e.g.
    ``prefer-no-scatter``/``prefer-no-gather``) that differ between CPU
    models even when the ISA flag sets are identical, and a mismatch
    makes every cache load warn about possible SIGILL.
    """
    import hashlib
    import platform

    # One line per identity field, first occurrence wins.  x86 cpuinfo
    # names the model via "model name"; arm64 has no such line and
    # identifies the core by "CPU implementer" / "CPU part" instead.
    # (Key order fixes the concatenation order, so x86 fingerprints are
    # stable across this change: model name + flags, as before.)
    id_keys = ("model name", "flags", "Features", "CPU implementer",
               "CPU part")
    text = platform.machine()
    try:
        found: dict[str, str] = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                for key in id_keys:
                    if key not in found and line.startswith(key):
                        found[key] = line
                        break
                if len(found) == len(id_keys):
                    break
        text += "".join(found[k] for k in id_keys if k in found)
    except OSError:
        text += platform.processor()
    return hashlib.sha256(text.encode()).hexdigest()[:12]
