"""Device mesh helpers: particle-axis data parallelism.

The reference has no distributed backend at all (SURVEY §2.6); its only batch
axis is the particle axis on a single device.  The TPU-native scaling story:

- **particles** shard across the mesh axis ``"p"`` (pure data parallelism —
  every particle is independent given the policy + posterior),
- policy/GP parameters and the posterior cache are replicated,
- the only cross-chip communication is the psum of the per-particle cost mean
  and of the policy gradient, which XLA emits automatically from the sharding
  constraints and lowers onto ICI.

Per-shard randomness stays deterministic because every random draw is a pure
function of (root key, step, time, stream) — see utils/prng.py — and draws are
made on the full logical shapes, which XLA partitions.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = "p"
SEED_AXIS = "s"
RESTART_AXIS = "r"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (PARTICLE_AXIS,))


def make_seed_particle_mesh(
    n_seed_groups: int, n_particle_shards: int, devices=None
) -> Mesh:
    """2D pod mesh: axis ``"s"`` shards whole seeds (independent trainings,
    zero cross-group communication), axis ``"p"`` shards each seed's particle
    batch (per-group data parallelism whose cost/gradient psums ride ICI).
    Adjacent devices land in the same seed group, so the chatty particle
    collectives stay on the shortest links."""
    devs = devices if devices is not None else jax.devices()
    n = n_seed_groups * n_particle_shards
    return Mesh(
        np.asarray(devs[:n]).reshape(n_seed_groups, n_particle_shards),
        (SEED_AXIS, PARTICLE_AXIS),
    )


def make_restart_particle_mesh(
    n_restart_shards: int, n_particle_shards: int, devices=None
) -> Mesh:
    """2D mesh for multi-restart policy optimization: axis ``"r"`` shards the
    restart lanes (independent optimizations within one trial — zero
    cross-lane communication until the final winner argmin), axis ``"p"``
    shards each lane's particle batch.  Same layout logic as the seed x
    particle mesh: adjacent devices share a lane so the per-lane
    cost/gradient psums ride the shortest ICI links."""
    devs = devices if devices is not None else jax.devices()
    n = n_restart_shards * n_particle_shards
    return Mesh(
        np.asarray(devs[:n]).reshape(n_restart_shards, n_particle_shards),
        (RESTART_AXIS, PARTICLE_AXIS),
    )


def shard_restarts(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Constrain dim 0 (the restart-lane axis) onto ``"r"``, leaving every
    trailing dim UNCONSTRAINED so the in-rollout particle constraint (which
    vmap lifts to dim 1) stays free to shard particles on ``"p"`` without a
    resharding round-trip at the carry boundary."""
    spec = P(RESTART_AXIS, *([P.UNCONSTRAINED] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def seed_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for the seed axis: ``"s"`` on a 2D
    seed x particle mesh, else the mesh's first axis (the 1D farm case,
    which historically reuses the ``"p"`` axis name)."""
    axis = SEED_AXIS if SEED_AXIS in mesh.axis_names else mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def shard_seeds(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, seed_sharding(mesh))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (particle) axis."""
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_particles(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, particle_sharding(mesh))


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.lax.with_sharding_constraint(a, sh), tree)
