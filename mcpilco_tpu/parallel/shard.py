"""Sharded training over a device mesh.

Two surfaces:

- ``sharded_training_round`` — the PRODUCTION multi-chip path: the real GP
  MLL fit (``MultiGP.fit``) followed by the real policy optimizer
  (``PolicyOptimizer.optimize`` — the compiled while_loop with convergence
  monitor, NaN guard and host chunking) with the particle axis sharded over
  the mesh (``PolicyOptimizer.mesh``).  This is what
  ``__graft_entry__.dryrun_multichip`` compiles and runs.
- ``make_sharded_train_step`` — a minimal single fused step (one GP MLL
  gradient step + one policy-gradient step), kept as a fast sharding
  unit-test surface.

XLA inserts the ICI collectives (gradient psum, cost-mean psum) from the
sharding constraints; nothing here issues an explicit collective.  The
reference has no distributed analog (SURVEY §2.6).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..control.trainer import AdamState, OptResult, PolicyOptimizer, adam_init, adam_update
from ..models.gp import GPData, GPParams
from ..utils import prng
from . import mesh as mesh_mod


class TrainingRoundOut(NamedTuple):
    gp_params: GPParams
    mll_history: jax.Array  # [num_gp_epochs]
    opt: OptResult


def sharded_training_round(
    optimizer: PolicyOptimizer,
    gp_params: GPParams,
    data: GPData,
    policy_params,
    key: jax.Array,
    num_gp_epochs: int = 5,
    gp_lr: float = 0.01,
    num_opt_steps: int = 6,
    lr0: float = 0.01,
    p_dropout0: float = 0.0,
) -> TrainingRoundOut:
    """One full MC-PILCO training round through the production code path,
    multi-chip: fit GP hyperparameters (replicated data, vmapped heads),
    rebuild the posterior cache, then run the real compiled policy-opt
    while_loop with particles sharded over ``optimizer.mesh``."""
    if optimizer.mesh is None:
        raise ValueError("sharded_training_round needs a PolicyOptimizer with a mesh")
    gp = optimizer.engine.gp
    gp_params, mll_hist = gp.fit(
        gp_params, data, num_epochs=num_gp_epochs, learning_rate=gp_lr
    )
    posterior = gp.fit_posterior(gp_params, data)
    opt = optimizer.optimize(
        key, policy_params, gp_params, posterior,
        num_opt_steps=num_opt_steps, lr0=lr0, p_dropout0=p_dropout0,
    )
    return TrainingRoundOut(gp_params=gp_params, mll_history=mll_hist, opt=opt)


class ShardedStepOut(NamedTuple):
    policy_params: object
    adam: AdamState
    gp_params: GPParams
    cost: jax.Array
    mll: jax.Array


def make_sharded_train_step(optimizer: PolicyOptimizer, mesh, gp_lr: float = 0.01):
    """Returns a jitted ``step(policy_params, adam, gp_params, gp_adam, data,
    posterior, key, lr, p_drop) -> ShardedStepOut`` with particles sharded over
    the mesh's particle axis."""
    engine = optimizer.engine
    gp = engine.gp

    def policy_loss(policy_params, gp_params, posterior, key, p_drop):
        s0 = optimizer.init_dist.sample(
            prng.stream(key, prng.STREAM_INIT_PARTICLES), optimizer.num_particles
        )
        s0 = mesh_mod.shard_particles(mesh, s0)
        res = engine.simulate(
            key, policy_params, gp_params, posterior, s0, optimizer.horizon, p_dropout=p_drop
        )
        c, _ = optimizer.cost(res.states, res.inputs, 0)
        return c

    @jax.jit
    def step(policy_params, adam, gp_params, gp_adam, data: GPData, posterior, key, lr, p_drop):
        policy_params = mesh_mod.replicate(mesh, policy_params)
        gp_params = mesh_mod.replicate(mesh, gp_params)

        # --- GP MLL step (heads vmapped; data replicated)
        mll, gp_grads = jax.value_and_grad(lambda p: gp.mll(p, data))(gp_params)
        new_gp, gp_adam = adam_update(gp_grads, gp_adam, gp_params, gp_lr)

        # --- policy-gradient step through the sharded particle rollout
        cost, grads = jax.value_and_grad(policy_loss)(
            policy_params, gp_params, posterior, key, p_drop
        )
        mask = engine.policy.param_mask(policy_params)
        grads = jax.tree_util.tree_map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
        new_policy, adam = adam_update(grads, adam, policy_params, lr)
        return ShardedStepOut(
            policy_params=new_policy, adam=adam, gp_params=new_gp, cost=cost, mll=mll
        )

    return step
