"""Persistent-compile-cache setup (windtpu/utils/compilecache.py).

The cache exists to absorb the axon platform's compile-RPC latency
(measured: 13.8 s cold vs 0.84 s warm for a trivial program); these
tests only cover the host-side config plumbing, which is backend
independent.  jax.config mutations are restored afterwards so the rest
of the suite keeps its own cache configuration.
"""

import os

import jax
import pytest


@pytest.fixture
def restore_jax_cache_config(monkeypatch):
    import windtpu.utils.compilecache as cc

    saved = {k: getattr(jax.config, k) for k in (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_entry_size_bytes",
        "jax_persistent_cache_min_compile_time_secs")}
    monkeypatch.setattr(cc, "_ACTIVE_DIR", None)
    yield cc
    for k, v in saved.items():
        jax.config.update(k, v)


def test_enable_sets_jax_config(tmp_path, monkeypatch,
                                restore_jax_cache_config):
    cc = restore_jax_cache_config
    monkeypatch.setenv("WINDTPU_COMPILE_CACHE", str(tmp_path / "cache"))
    got = cc.enable_persistent_cache()
    # On a CPU backend the cache is partitioned per machine: XLA:CPU
    # entries are AOT artifacts for the build host's CPU features.
    expect = str(tmp_path / "cache")
    if jax.default_backend() == "cpu":
        expect = os.path.join(expect, "cpu-" + cc._host_fingerprint())
        assert len(cc._host_fingerprint()) == 12
        assert cc._host_fingerprint() == cc._host_fingerprint()
    assert got == expect
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
    # Idempotent, and the return value is the ACTIVE dir even if the
    # environment names a different one afterwards.
    monkeypatch.setenv("WINDTPU_COMPILE_CACHE", str(tmp_path / "other"))
    assert cc.enable_persistent_cache() == got
    assert jax.config.jax_compilation_cache_dir == got


def test_env_zero_disables(monkeypatch, restore_jax_cache_config):
    cc = restore_jax_cache_config
    monkeypatch.setenv("WINDTPU_COMPILE_CACHE", "0")
    assert cc.enable_persistent_cache() is None
    assert cc._ACTIVE_DIR is None
