"""Persistent production jit cache (utils/jit_cache.py).

The sweep supervisor recovers from tunneled-TPU stalls by relaunching the
training process; the cache makes those relaunches replay compiles from
disk instead of re-paying them (and keeps stall watchdogs fast, since a
resumed attempt has no multi-minute silent compile window).
"""

import os

import jax
import jax.numpy as jnp

from mcpilco_tpu.utils.jit_cache import enable_persistent_cache


def test_respects_existing_configuration():
    # tests/conftest.py already configured the suite's cache dir; enabling
    # again must return that dir untouched rather than repointing it
    configured = jax.config.jax_compilation_cache_dir
    assert configured
    assert enable_persistent_cache("/tmp/should_not_be_used") == configured
    assert jax.config.jax_compilation_cache_dir == configured


def test_env_optout(monkeypatch):
    monkeypatch.setenv("MCPILCO_JIT_CACHE", "0")
    assert enable_persistent_cache() is None


def test_populates_cache_dir(tmp_path, monkeypatch):
    # simulate a fresh process: temporarily clear the configured dir
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = str(tmp_path / "jit")
        assert enable_persistent_cache(d) == d
        # a warm in-process compile can beat enable()'s 0.1 s persistence
        # threshold; force every compile to persist for this check
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.jit(lambda x: (x @ x).sum())(jnp.ones((32, 32))).block_until_ready()
        assert os.listdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
