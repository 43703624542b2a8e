"""Persistent-compile-cache setup (windtpu/utils/compilecache.py).

The cache exists to absorb the axon platform's compile-RPC latency
(measured: 13.8 s cold vs 0.84 s warm for a trivial program); these
tests only cover the host-side config plumbing, which is backend
independent.
"""

import os

import jax


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    import windtpu.utils.compilecache as cc

    monkeypatch.setattr(cc, "_ENABLED", False)
    monkeypatch.setenv("WINDTPU_COMPILE_CACHE", str(tmp_path / "cache"))
    got = cc.enable_persistent_cache()
    assert got == str(tmp_path / "cache")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
    # Idempotent: second call returns the same dir without re-configuring.
    assert cc.enable_persistent_cache() == got


def test_env_zero_disables(monkeypatch):
    import windtpu.utils.compilecache as cc

    monkeypatch.setattr(cc, "_ENABLED", False)
    monkeypatch.setenv("WINDTPU_COMPILE_CACHE", "0")
    assert cc.enable_persistent_cache() is None
    assert cc._ENABLED is False
