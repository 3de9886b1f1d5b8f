"""Sharded training steps over a device mesh.

``make_sharded_train_step`` builds the full MC-PILCO training step — a GP
marginal-likelihood gradient step on all heads plus a policy-gradient step
through the particle rollout — with the particle axis sharded across the mesh
and parameters replicated.  XLA inserts the ICI collectives (gradient psum,
cost-mean psum) from the sharding constraints; nothing here issues an explicit
collective.

This is both the multi-chip execution path and the driver's compile-check
surface (``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..control.trainer import AdamState, PolicyOptimizer, adam_init, adam_update
from ..models.gp import GPData, GPParams
from ..utils import prng
from . import mesh as mesh_mod


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
