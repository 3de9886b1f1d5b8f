"""Deterministic PRNG-key threading helpers.

The reference implementation relies on global NumPy / torch RNG state
(reference: test_mcpilco_cartpole.py:35-36).  Here every source of randomness
receives an explicit ``jax.random`` key derived by folding structured integers
into a root key, so runs are reproducible per (seed, trial, opt-step,
time-step, head) regardless of device count or execution order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable tags for the independent random streams of the algorithm.  Folding a
# stream tag before the per-step counters keeps streams independent even when
# step counters collide.
STREAM_INIT_PARTICLES = 0x1A
STREAM_ROLLOUT = 0x2B
STREAM_DROPOUT = 0x3C
STREAM_POLICY_INIT = 0x4D
STREAM_EXPLORATION = 0x5E
STREAM_MEAS_NOISE = 0x6F
STREAM_MODEL_FIT = 0x70
STREAM_SYSTEM = 0x81
STREAM_RESTARTS = 0x92


def use_fast_prng() -> None:
    """Switch jax's default PRNG to the TPU-native ``rbg`` generator.

    Threefry (the default) costs ~5% of the flagship policy-opt step in
    per-scan-step dropout/sampling bits; ``rbg`` lowers to the hardware
    RngBitGenerator.  Draws differ from threefry (and across backends), so
    call this at process start (scripts/bench do) — never mid-run — and
    expect seed-level, not bit-level, reproducibility.
    """
    jax.config.update("jax_default_prng_impl", "rbg")


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(key: jax.Array, tag: int) -> jax.Array:
    """Derive the sub-key for one named random stream."""
    return jax.random.fold_in(key, tag)


def fold(key: jax.Array, *indices) -> jax.Array:
    """Fold a sequence of integer counters into ``key``."""
    for ix in indices:
        key = jax.random.fold_in(key, ix)
    return key


def normal_like(key: jax.Array, x: jax.Array) -> jax.Array:
    return jax.random.normal(key, x.shape, x.dtype)


def uniform_like(key: jax.Array, x: jax.Array, lo=0.0, hi=1.0) -> jax.Array:
    return jax.random.uniform(key, x.shape, x.dtype, lo, hi)


def per_particle_key(key: jax.Array, axis_index: jax.Array) -> jax.Array:
    """Key for one shard of the particle axis (multi-chip determinism).

    When particles are sharded over a mesh axis, each shard folds in its
    ``jax.lax.axis_index`` so shards draw independent randomness while the
    overall draw remains a pure function of the root key.
    """
    return jax.random.fold_in(key, axis_index)


def split_tree(key: jax.Array, tree):
    """Split ``key`` into one key per leaf of ``tree`` (as a matching pytree)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def bernoulli_mask(key: jax.Array, p_keep: jax.Array, shape, dtype=jnp.float32):
    """Inverted-dropout mask: scale by 1/p_keep where kept, 0 where dropped."""
    keep = jax.random.bernoulli(key, p_keep, shape)
    return keep.astype(dtype) / jnp.maximum(p_keep, 1e-12).astype(dtype)
