"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first jax import anywhere in the test
process (the driver's multi-chip dry-run uses the same mechanism).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The fast gate is compile-dominated (hundreds of small jits on one core);
# a persistent compilation cache makes repeat gate runs reuse every compile
# whose HLO is unchanged.  Keyed by HLO hash, so edits invalidate exactly
# the programs they touch.  Opt out with MCPILCO_NO_TEST_CACHE=1.
if not os.environ.get("MCPILCO_NO_TEST_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

# Keep the default f32 so tests exercise TPU-realistic numerics; individual
# golden-math tests opt into f64 via jax.experimental.enable_x64.
import pytest  # noqa: E402


@pytest.fixture
def x64():
    with jax.enable_x64():
        yield


@pytest.fixture
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
