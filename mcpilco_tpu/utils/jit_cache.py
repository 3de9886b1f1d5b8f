"""Persistent XLA compilation cache for production entry points.

The test suite has used a persistent jit cache since round 3
(tests/conftest.py) to keep the fast gate under 5 minutes.  Production
runs want the same for a different reason: the sweep supervisor
(scripts/repeat.py --supervise) recovers from tunneled-TPU stalls by
relaunching the training process, and every relaunch is a fresh process
that would otherwise re-pay all compiles (3s-10min each, erratic on the
tunneled runtime — the silent compile window is also what forces stall
watchdogs to be slow).  With the cache, a resumed attempt replays its
compiles from disk and the watchdog can detect real stalls quickly.

Enabled by every scripts/ entry point; opt out with MCPILCO_JIT_CACHE=0
or point MCPILCO_JIT_CACHE_DIR somewhere else.  Backends that cannot
serialize executables just log a warning and compile normally — enabling
this is never worse than the status quo.
"""

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the cache dir, or None when disabled via MCPILCO_JIT_CACHE=0.
    Must be called before the first jit compilation to be effective.
    """
    if os.environ.get("MCPILCO_JIT_CACHE", "1") == "0":
        return None
    import jax

    configured = getattr(jax.config, "jax_compilation_cache_dir", None)
    if configured:  # e.g. tests/conftest.py already picked a cache
        return configured

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MCPILCO_JIT_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_prod"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: even "fast" compiles are slow over the tunnel
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return cache_dir
