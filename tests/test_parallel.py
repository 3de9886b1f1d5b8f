"""Mesh sharding: the sharded train step must match single-device math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from mcpilco_tpu.control.trainer import adam_init
from mcpilco_tpu.parallel import mesh as mesh_mod
from mcpilco_tpu.parallel.shard import make_sharded_train_step


class TestShardedTrainStep:
    def _run(self, n_devices):
        optimizer, policy_params, gp_params, gp, data, posterior, key = graft._tiny_setup(
            num_particles=16
        )
        mesh = mesh_mod.make_mesh(n_devices)
        step = make_sharded_train_step(optimizer, mesh)
        with mesh:
            out = step(
                policy_params, adam_init(policy_params), gp_params, adam_init(gp_params),
                data, posterior, key, jnp.float32(0.01), jnp.float32(0.0),
            )
            jax.block_until_ready(out.cost)
        return out

    def test_cost_identical_across_mesh_sizes(self, devices8):
        outs = {n: self._run(n) for n in (1, 2, 4, 8)}
        costs = {n: float(o.cost) for n, o in outs.items()}
        for n in (2, 4, 8):
            np.testing.assert_allclose(costs[n], costs[1], rtol=1e-4)
        # updated policy params agree across shardings
        p1 = jax.tree_util.tree_leaves(outs[1].policy_params)
        p8 = jax.tree_util.tree_leaves(outs[8].policy_params)
        for a, b in zip(p1, p8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_mll_finite_and_gp_updates(self, devices8):
        out = self._run(8)
        assert np.isfinite(float(out.mll))
        assert np.isfinite(float(out.cost))

    def test_graft_entry_compiles(self):
        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out))

    def test_dryrun_multichip(self, devices8):
        graft.dryrun_multichip(8)
        graft.dryrun_multichip(2)
