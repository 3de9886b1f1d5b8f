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
    from jax._src import compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = str(tmp_path / "jit")
        assert enable_persistent_cache(d) == d
        # JAX freezes the cache backend object at first use; once the suite
        # has compiled anything under conftest's dir, repointing the config
        # alone is a no-op — drop the frozen instance so the next compile
        # picks up the new dir
        compilation_cache.reset_cache()
        # a warm in-process compile can beat enable()'s 0.1 s persistence
        # threshold; force every compile to persist for this check
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # the computation must be unique to this test: an HLO already
        # compiled earlier in the suite is served from the in-process cache
        # and never written to the fresh dir
        jax.jit(lambda x: (x @ x.T * 1.00042).sum())(
            jnp.ones((37, 29))
        ).block_until_ready()
        assert os.listdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        compilation_cache.reset_cache()
