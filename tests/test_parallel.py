"""Mesh sharding: the sharded PRODUCTION paths must match single-device math.

The particle axis is pure data parallelism (every particle independent given
policy + posterior), and all RNG draws are made on full logical shapes, so
results must agree across mesh sizes up to reduction order.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from mcpilco_tpu.control.trainer import adam_init
from mcpilco_tpu.parallel import mesh as mesh_mod
from mcpilco_tpu.parallel.shard import make_sharded_train_step, sharded_training_round


@pytest.mark.slow
class TestShardedOptimizer:
    """The real PolicyOptimizer.optimize (compiled while_loop: convergence
    monitor, NaN guard, chunking) with particles sharded over the mesh."""

    def _run(self, n_devices, num_steps=10):
        optimizer, policy_params, gp_params, gp, data, posterior, key = graft._tiny_setup(
            num_particles=16
        )
        if n_devices is not None:
            mesh = mesh_mod.make_mesh(n_devices)
            optimizer = dataclasses.replace(optimizer, mesh=mesh, chunk_steps=4)
        res = optimizer.optimize(
            key, policy_params, gp_params, posterior,
            num_opt_steps=num_steps, lr0=0.01, p_dropout0=0.0,
        )
        jax.block_until_ready(res.cost_history)
        return res

    def test_cost_history_parity_across_mesh_sizes(self, devices8):
        base = self._run(None)  # no mesh: the single-device production path
        for n in (1, 2, 4, 8):
            res = self._run(n)
            np.testing.assert_allclose(
                np.asarray(res.cost_history), np.asarray(base.cost_history),
                rtol=2e-4, atol=1e-5,
                err_msg=f"cost history diverges on {n}-device mesh",
            )
            assert int(res.steps_done) == int(base.steps_done)

    def test_final_params_parity(self, devices8):
        base = self._run(None)
        res = self._run(8)
        for a, b in zip(
            jax.tree_util.tree_leaves(base.policy_params),
            jax.tree_util.tree_leaves(res.policy_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_states_actually_sharded(self, devices8):
        res = self._run(8)
        spec = tuple(res.states.sharding.spec)
        assert mesh_mod.PARTICLE_AXIS in spec, spec

    def test_training_round_production_path(self, devices8):
        optimizer, policy_params, gp_params, gp, data, posterior, key = graft._tiny_setup(
            num_particles=16
        )
        optimizer = dataclasses.replace(optimizer, mesh=mesh_mod.make_mesh(8))
        out = sharded_training_round(
            optimizer, gp_params, data, policy_params, key,
            num_gp_epochs=5, num_opt_steps=6,
        )
        assert np.all(np.isfinite(np.asarray(out.mll_history)))
        steps = int(out.opt.steps_done)
        assert steps == 6
        assert np.all(np.isfinite(np.asarray(out.opt.cost_history[:steps])))


class TestRestartMesh:
    """Multi-restart lanes sharded over the 2D ('r', 'p') mesh: lanes are
    independent optimizations, so the sharded run must reproduce the
    single-device multi-restart run up to reduction order."""

    def _run(self, mesh, num_steps=8):
        optimizer, policy_params, gp_params, gp, data, posterior, key = graft._tiny_setup(
            num_particles=16
        )
        optimizer = dataclasses.replace(
            optimizer, num_restarts=4, mesh=mesh, chunk_steps=4
        )
        res = optimizer.optimize(
            key, policy_params, gp_params, posterior,
            num_opt_steps=num_steps, lr0=0.01, p_dropout0=0.0,
        )
        jax.block_until_ready(res.cost_history)
        return res

    @pytest.mark.slow  # compile-heavy parity; the fast gate keeps the validation test
    def test_parity_and_lane_sharding(self, devices8):
        base = self._run(None)
        res = self._run(mesh_mod.make_restart_particle_mesh(4, 2))
        # the per-lane cost vector is produced BEFORE the winner gather, so
        # it must still carry the lane sharding
        assert mesh_mod.RESTART_AXIS in tuple(res.restart_costs.sharding.spec)
        assert int(res.restart_winner) == int(base.restart_winner)
        np.testing.assert_allclose(
            np.asarray(res.restart_costs), np.asarray(base.restart_costs),
            rtol=2e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res.cost_history), np.asarray(base.cost_history),
            rtol=2e-4, atol=1e-5,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(base.policy_params),
            jax.tree_util.tree_leaves(res.policy_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_restart_mesh_validation(self, devices8):
        optimizer, policy_params, gp_params, gp, data, posterior, key = graft._tiny_setup(
            num_particles=16
        )
        mesh = mesh_mod.make_restart_particle_mesh(4, 2)
        for bad_r in (1, 6):  # no lanes to shard / lanes don't tile the axis
            opt = dataclasses.replace(optimizer, num_restarts=bad_r, mesh=mesh)
            with pytest.raises(ValueError, match="restart"):
                opt.optimize(
                    key, policy_params, gp_params, posterior,
                    num_opt_steps=2, lr0=0.01, p_dropout0=0.0,
                )


@pytest.mark.slow
class TestShardedEndToEnd:
    """Flagship cartpole smoke config trained END TO END through the sharded
    path (explore -> GP fit -> sharded policy opt -> apply), vs no mesh."""

    def _train(self, mesh):
        from mcpilco_tpu.scenarios import cartpole as scen

        cfg = dataclasses.replace(
            scen.CartpoleConfig(seed=3).smoke(), num_particles=48, opt_steps=(12,),
            gp_epochs=60,
        )
        agent, kwargs = scen.build(cfg, mesh=mesh)
        logs = agent.reinforce(**kwargs, verbose=False)
        return agent, logs

    def test_flagship_smoke_mesh_parity(self, devices8):
        a1, l1 = self._train(None)
        a8, l8 = self._train(mesh_mod.make_mesh(8))
        # identical plant interactions (collection does not touch the mesh)
        np.testing.assert_allclose(a8.trials[0].measured, a1.trials[0].measured)
        # policy-opt cost trajectories agree through the sharded BPTT
        np.testing.assert_allclose(
            l8[-1].cost_history, l1[-1].cost_history, rtol=5e-4, atol=1e-4
        )
        # ... and so does the resulting on-plant behavior
        np.testing.assert_allclose(
            a8.trials[-1].true, a1.trials[-1].true, rtol=1e-3, atol=5e-3
        )


class TestShardedTrainStep:
    """The minimal fused step (kept as a fast sharding unit surface)."""

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

    @pytest.mark.slow  # mesh-size parity also exercised by the driver's dryrun_multichip every round
    def test_cost_identical_across_mesh_sizes(self, devices8):
        outs = {n: self._run(n) for n in (1, 8)}
        np.testing.assert_allclose(float(outs[8].cost), float(outs[1].cost), rtol=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(outs[1].policy_params),
            jax.tree_util.tree_leaves(outs[8].policy_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
class TestGraftEntry:
    def test_graft_entry_compiles(self):
        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out))

    def test_dryrun_worker_inprocess(self, devices8):
        # the worker body (the subprocess wrapper is exercised separately —
        # here jax already sees the 8 virtual CPU devices)
        graft._dryrun_worker(8)
        graft._dryrun_worker(2)

    def test_dryrun_multichip_subprocess(self):
        # the DRIVER surface: must succeed regardless of this process's
        # platform because it isolates itself in a fresh subprocess
        graft.dryrun_multichip(4)
