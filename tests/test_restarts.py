"""Multi-restart policy optimization (PolicyOptimizer.num_restarts).

Beyond-parity feature: R vmapped policy-init lanes in one compiled loop,
winner by best in-model cost.  Lane 0 runs the incoming params on the exact
single-restart key schedule, so R = 1 results are a strict slice of any R.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.control.rollout import InitialStateDistribution
from mcpilco_tpu.control.trainer import PolicyOptimizer
from mcpilco_tpu.models.costs import SaturatedDistance

from test_rollout_trainer import _toy_setup

_CACHE = {}


def _toy_setup_cached():
    """One GP fit for the whole module (tests never mutate the params)."""
    if "setup" not in _CACHE:
        _CACHE["setup"] = _toy_setup()
    return _CACHE["setup"]


def _opt(max_steps=60, **kw):
    engine, gp_params, post, pol_params = _toy_setup_cached()
    cost = SaturatedDistance(target_state=(0.0, 0.0), lengthscales=(1.0, 1.0))
    init = InitialStateDistribution(kind="gaussian", mean=[0.8, -0.8], var=[0.01, 0.01])
    opt = PolicyOptimizer(
        engine=engine, cost=cost, init_dist=init,
        num_particles=32, horizon=15, max_opt_steps=max_steps,
        min_step=float("inf"),  # no early exit: lanes advance to max steps
        **kw,
    )
    return opt, gp_params, post, pol_params


class TestRestarts:
    @pytest.mark.slow  # full R=1-slice identity; the fast gate keeps the winner/selection tests
    def test_lane0_matches_single_restart(self):
        """Restart lane 0 preserves the single-restart key schedule exactly:
        its best in-model cost equals the R=1 run's."""
        opt1, gp_params, post, pol_params = _opt()
        opt3 = dataclasses.replace(opt1, num_restarts=3)
        r1 = opt1.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                           num_opt_steps=40, lr0=0.02, p_dropout0=0.0)
        r3 = opt3.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                           num_opt_steps=40, lr0=0.02, p_dropout0=0.0)
        assert r1.restart_costs is None
        assert r3.restart_costs.shape == (3,)
        best1 = float(np.min(np.asarray(r1.cost_history)[: int(r1.steps_done)]))
        np.testing.assert_allclose(float(r3.restart_costs[0]), best1, rtol=1e-6)

    def test_sequential_mode_matches_vmapped_lanes(self):
        """restart_vmap=False runs the same lanes through the compiled R=1
        program (identical key schedule per lane via rid); lane costs and the
        winner must match the vmapped mode to f32 refusion tolerance."""
        optv, gp_params, post, pol_params = _opt()
        optv = dataclasses.replace(optv, num_restarts=3)
        opts = dataclasses.replace(optv, restart_vmap=False)
        rv = optv.optimize(jax.random.PRNGKey(4), pol_params, gp_params, post,
                           num_opt_steps=30, lr0=0.02, p_dropout0=0.0)
        rs = opts.optimize(jax.random.PRNGKey(4), pol_params, gp_params, post,
                           num_opt_steps=30, lr0=0.02, p_dropout0=0.0)
        np.testing.assert_allclose(np.asarray(rs.restart_costs),
                                   np.asarray(rv.restart_costs), rtol=1e-4)
        assert int(rs.restart_winner) == int(rv.restart_winner)
        np.testing.assert_allclose(np.asarray(rs.cost_history),
                                   np.asarray(rv.cost_history), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(rs.policy_params),
                        jax.tree_util.tree_leaves(rv.policy_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_sequential_mode_rejects_restart_mesh(self):
        from mcpilco_tpu.parallel import mesh as mesh_mod

        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        optv, gp_params, post, pol_params = _opt()
        m = mesh_mod.make_restart_particle_mesh(2, 1)
        opt = dataclasses.replace(optv, num_restarts=2, mesh=m, restart_vmap=False)
        with pytest.raises(ValueError, match="restart_vmap"):
            opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                         num_opt_steps=4, lr0=0.02, p_dropout0=0.0)

    def test_winner_is_argmin_and_histories_consistent(self):
        opt, gp_params, post, pol_params = _opt()
        opt = dataclasses.replace(opt, num_restarts=3)
        r = opt.optimize(jax.random.PRNGKey(1), pol_params, gp_params, post,
                         num_opt_steps=40, lr0=0.02, p_dropout0=0.0)
        costs = np.asarray(r.restart_costs)
        w = int(r.restart_winner)
        assert w == int(np.argmin(costs))
        # the returned history is the WINNER's: its min equals the winning cost
        hist = np.asarray(r.cost_history)[: int(r.steps_done)]
        np.testing.assert_allclose(float(np.min(hist)), float(costs[w]), rtol=1e-6)
        # lanes genuinely differ (policy.reinit randomizes + distinct noise)
        assert len(np.unique(np.round(costs, 5))) > 1

    @pytest.mark.slow
    def test_multi_restart_never_worse_than_single(self):
        opt1, gp_params, post, pol_params = _opt()
        opt4 = dataclasses.replace(opt1, num_restarts=4)
        r1 = opt1.optimize(jax.random.PRNGKey(2), pol_params, gp_params, post,
                           num_opt_steps=40, lr0=0.02, p_dropout0=0.0)
        r4 = opt4.optimize(jax.random.PRNGKey(2), pol_params, gp_params, post,
                           num_opt_steps=40, lr0=0.02, p_dropout0=0.0)
        best1 = float(np.min(np.asarray(r1.cost_history)[: int(r1.steps_done)]))
        best4 = float(np.min(np.asarray(r4.restart_costs)))
        assert best4 <= best1 + 1e-6  # lane 0 IS the single run; min can only improve

    @pytest.mark.slow
    def test_chunked_multi_restart_matches_single_chunk(self):
        opt, gp_params, post, pol_params = _opt()
        opt_big = dataclasses.replace(opt, num_restarts=2, chunk_steps=500,
                                      chunk_target_s=0.0)
        opt_small = dataclasses.replace(opt, num_restarts=2, chunk_steps=7,
                                        chunk_target_s=0.0)
        r1 = opt_big.optimize(jax.random.PRNGKey(3), pol_params, gp_params, post,
                              num_opt_steps=25, lr0=0.02, p_dropout0=0.0)
        r2 = opt_small.optimize(jax.random.PRNGKey(3), pol_params, gp_params, post,
                                num_opt_steps=25, lr0=0.02, p_dropout0=0.0)
        np.testing.assert_allclose(np.asarray(r1.cost_history)[:25],
                                   np.asarray(r2.cost_history)[:25], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(r1.restart_costs),
                                   np.asarray(r2.restart_costs), rtol=1e-5)

    def test_farm_accepts_restarts(self):
        # round 5 lifted the farm's num_restarts==1 restriction: restarts
        # run as sequential lanes through the compiled R=1 program
        # (multiseed.SeedFarm.optimize); construction must succeed
        from mcpilco_tpu.parallel.multiseed import SeedFarm
        from mcpilco_tpu.scenarios import cartpole as scen

        cfg = scen.CartpoleConfig(seed=1).smoke()
        agent, _ = scen.build(cfg)
        agent.optimizer = dataclasses.replace(agent.optimizer, num_restarts=2)
        SeedFarm(agent, [1, 2])


class TestFirstChunkBudget:
    """The first chunk of an optimize() call must shrink with restart lanes
    and reuse a previously measured throughput: an oversized first chunk is
    an uninterrupted >1 min device execution, the tunneled-TPU hang class
    (a MuJoCo restarts=4 sweep futex-hung in its trial-2 first chunk)."""

    def test_scales_down_with_restart_lanes(self):
        opt, *_ = _opt()
        opt1 = dataclasses.replace(opt, chunk_steps=500, num_restarts=1)
        opt4 = dataclasses.replace(opt, chunk_steps=500, num_restarts=4)
        assert opt1._first_chunk_budget(1) == 500
        assert opt4._first_chunk_budget(4) == 125
        # sequential restart lanes are single-lane programs: full budget
        assert opt4._first_chunk_budget(1) == 500

    def test_reuses_measured_rate_across_calls(self):
        opt, *_ = _opt()
        opt = dataclasses.replace(opt, chunk_steps=500, chunk_target_s=15.0)
        object.__setattr__(opt, "_measured_rate", 2.0)  # 2 steps/s measured
        assert opt._first_chunk_budget(1) == 30  # 15 s * 2 steps/s
        # a fast program is still capped by the static budget
        object.__setattr__(opt, "_measured_rate", 1e6)
        assert opt._first_chunk_budget(1) == 500

    def test_floor_of_25_steps(self):
        opt, *_ = _opt()
        opt = dataclasses.replace(opt, chunk_steps=40, num_restarts=8)
        assert opt._first_chunk_budget(8) == 25
