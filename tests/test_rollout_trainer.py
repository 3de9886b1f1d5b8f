"""Rollout engine, jitted policy optimizer, plants, SOD, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.control.rollout import (
    InitialStateDistribution,
    PMSSensors,
    RolloutEngine,
)
from mcpilco_tpu.control.trainer import PolicyOptimizer, adam_init, adam_update
from mcpilco_tpu.envs import ode as ode_mod
from mcpilco_tpu.envs.plants import ODEPlant, PMSODEPlant
from mcpilco_tpu.models import kernels as K
from mcpilco_tpu.models import sod as sod_mod
from mcpilco_tpu.models.costs import SaturatedDistance
from mcpilco_tpu.models.dynamics import DeltaState, SpeedIntegration
from mcpilco_tpu.models.gp import GPData, MultiGP
from mcpilco_tpu.models.policies import RandomExploration, SumOfGaussians
from mcpilco_tpu.ops import linalg


def _toy_setup(state_dim=2, key=0):
    """GP trained on a stable linear system ds = -0.1*s + 0.05*u."""
    model = DeltaState(state_dim=state_dim, input_dim=1)
    gp = MultiGP(kernel=K.SEArd(active_dims=tuple(range(state_dim + 1))), num_heads=state_dim)
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    n, cap = 50, 64
    s = jax.random.normal(ks[0], (n, state_dim))
    u = jax.random.normal(ks[1], (n, 1))
    delta = -0.1 * s + 0.05 * u
    x = jnp.concatenate([s, u], axis=-1)
    y = delta.T
    data = GPData(
        x=linalg.pad_axis(x, cap),
        y=linalg.pad_axis(y, cap, axis=1),
        mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]),
    )
    params = gp.init_params(sigma_n=0.1)
    params, _ = gp.fit(params, data, num_epochs=300, learning_rate=0.05)
    post = gp.fit_posterior(params, data)
    policy = SumOfGaussians(feature_dim=state_dim, input_dim=1, num_basis=8, u_max=1.0)
    pol_params = policy.init_params(jax.random.PRNGKey(7))
    engine = RolloutEngine(model=model, gp=gp, policy=policy)
    return engine, params, post, pol_params


class TestRollout:
    def test_shapes_and_finiteness(self):
        engine, gp_params, post, pol_params = _toy_setup()
        s0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (32, 2))
        res = engine.simulate(jax.random.PRNGKey(2), pol_params, gp_params, post, s0, 20)
        assert res.states.shape == (20, 32, 2)
        assert res.inputs.shape == (20, 32, 1)
        assert np.isfinite(np.asarray(res.states)).all()
        np.testing.assert_allclose(np.asarray(res.states[0]), np.asarray(s0))

    def test_delta_cap_requires_output_normalization(self):
        """delta_cap is in Posterior.norm units; without output normalization
        it would bind in absolute units (advisor r2 finding #2)."""
        model = DeltaState(state_dim=2, input_dim=1)
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        policy = SumOfGaussians(feature_dim=2, input_dim=1, num_basis=4, u_max=1.0)
        with pytest.raises(ValueError, match="delta_cap"):
            RolloutEngine(model=model, gp=gp, policy=policy, delta_cap=3.0)
        # with normalization on it constructs fine
        gp_n = MultiGP(
            kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2, normalize_outputs=True
        )
        RolloutEngine(model=model, gp=gp_n, policy=policy, delta_cap=3.0)

    def test_particles_contract_toward_zero(self):
        # learned dynamics are stable: particle spread should not explode
        engine, gp_params, post, pol_params = _toy_setup()
        s0 = jnp.ones((64, 2))
        res = engine.simulate(jax.random.PRNGKey(3), pol_params, gp_params, post, s0, 30)
        assert float(jnp.mean(jnp.abs(res.states[-1]))) < float(jnp.mean(jnp.abs(res.states[0])))

    def test_deterministic_given_key(self):
        engine, gp_params, post, pol_params = _toy_setup()
        s0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 2))
        r1 = engine.simulate(jax.random.PRNGKey(5), pol_params, gp_params, post, s0, 10)
        r2 = engine.simulate(jax.random.PRNGKey(5), pol_params, gp_params, post, s0, 10)
        np.testing.assert_array_equal(np.asarray(r1.states), np.asarray(r2.states))
        r3 = engine.simulate(jax.random.PRNGKey(6), pol_params, gp_params, post, s0, 10)
        assert not np.allclose(np.asarray(r1.states), np.asarray(r3.states))

    def test_grad_through_rollout(self):
        engine, gp_params, post, pol_params = _toy_setup()
        cost = SaturatedDistance(target_state=(0.0, 0.0), lengthscales=(1.0, 1.0))
        s0 = 0.5 * jnp.ones((16, 2))

        def loss(p):
            res = engine.simulate(jax.random.PRNGKey(2), p, gp_params, post, s0, 15)
            c, _ = cost(res.states, res.inputs)
            return c

        g = jax.grad(loss)(pol_params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert max(float(jnp.max(jnp.abs(l))) for l in leaves) > 0

    def test_remat_matches_plain(self):
        engine, gp_params, post, pol_params = _toy_setup()
        import dataclasses

        engine_r = dataclasses.replace(engine, remat=True)
        s0 = 0.1 * jnp.ones((8, 2))
        r1 = engine.simulate(jax.random.PRNGKey(2), pol_params, gp_params, post, s0, 12)
        r2 = engine_r.simulate(jax.random.PRNGKey(2), pol_params, gp_params, post, s0, 12)
        np.testing.assert_allclose(np.asarray(r1.states), np.asarray(r2.states), rtol=1e-5)

    def test_pms_rollout_runs_and_differs(self):
        import dataclasses

        engine, gp_params, post, pol_params = _toy_setup()
        sens = PMSSensors(
            pos_indices=(0,), vel_indices=(1,), std_pos_noise=(0.05,), fc=0.5, dt=0.05
        )
        engine_pms = dataclasses.replace(engine, sensors=sens)
        s0 = 0.3 * jnp.ones((16, 2))
        r_std = engine.simulate(jax.random.PRNGKey(2), pol_params, gp_params, post, s0, 15)
        r_pms = engine_pms.simulate(jax.random.PRNGKey(2), pol_params, gp_params, post, s0, 15)
        assert np.isfinite(np.asarray(r_pms.states)).all()
        # the sensor chain changes the policy inputs hence the trajectory
        assert not np.allclose(np.asarray(r_std.states[1:]), np.asarray(r_pms.states[1:]))

        # and gradients still flow through the filter chain
        cost = SaturatedDistance(target_state=(0.0, 0.0), lengthscales=(1.0, 1.0))

        def loss(p):
            res = engine_pms.simulate(jax.random.PRNGKey(2), p, gp_params, post, s0, 15)
            return cost(res.states, res.inputs)[0]

        g = jax.tree_util.tree_leaves(jax.grad(loss)(pol_params))
        assert all(np.isfinite(np.asarray(l)).all() for l in g)

    def test_replay_open_loop(self):
        engine, gp_params, post, pol_params = _toy_setup()
        s0 = jnp.array([0.5, -0.5])
        inputs = jnp.zeros((10, 1))
        traj = engine.replay(gp_params, post, s0, inputs)
        assert traj.shape == (10, 2)
        # mean prediction of the stable system decays
        assert float(jnp.abs(traj[-1]).mean()) < 0.5


class TestInitialDistributions:
    def test_gaussian(self):
        d = InitialStateDistribution(kind="gaussian", mean=[1.0, 2.0], var=[0.01, 0.04])
        s = d.sample(jax.random.PRNGKey(0), 4000)
        np.testing.assert_allclose(np.asarray(s.mean(0)), [1.0, 2.0], atol=0.02)
        np.testing.assert_allclose(np.asarray(s.std(0)), [0.1, 0.2], rtol=0.1)

    def test_uniform(self):
        d = InitialStateDistribution(kind="uniform", low=[-1.0, 0.0], high=[1.0, 2.0])
        s = np.asarray(d.sample(jax.random.PRNGKey(0), 2000))
        assert s[:, 0].min() >= -1 and s[:, 0].max() <= 1
        assert s[:, 1].min() >= 0 and s[:, 1].max() <= 2

    def test_multi_gauss_bimodal(self):
        d = InitialStateDistribution(
            kind="multi_gauss", mean=[[-1.0, 0.0], [1.0, 0.0]], var=[[1e-4, 1e-4]] * 2
        )
        s = np.asarray(d.sample(jax.random.PRNGKey(0), 1000))
        frac_neg = (s[:, 0] < 0).mean()
        assert 0.35 < frac_neg < 0.65


class TestAdam:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        w0 = np.random.RandomState(0).randn(5).astype(np.float32)
        tw = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.Adam([tw], lr=0.01)
        jw = {"w": jnp.asarray(w0)}
        st = adam_init(jw)
        for i in range(20):
            g_np = (2 * (np.arange(5) + 1) * np.asarray(tw.detach()) - i).astype(np.float32)
            opt.zero_grad()
            tw.grad = torch.tensor(g_np)
            opt.step()
            jw, st = adam_update({"w": jnp.asarray(g_np)}, st, jw, 0.01)
        np.testing.assert_allclose(np.asarray(jw["w"]), np.asarray(tw.detach()), rtol=1e-4, atol=1e-6)


class TestPolicyOptimizer:
    def _opt(self, max_steps=80, **kw):
        engine, gp_params, post, pol_params = _toy_setup()
        cost = SaturatedDistance(target_state=(0.0, 0.0), lengthscales=(1.0, 1.0))
        init = InitialStateDistribution(kind="gaussian", mean=[0.8, -0.8], var=[0.01, 0.01])
        opt = PolicyOptimizer(
            engine=engine,
            cost=cost,
            init_dist=init,
            num_particles=32,
            horizon=15,
            max_opt_steps=max_steps,
            min_step=5.0,
            num_min_diff_cost=10,
            min_diff_cost=0.05,
            lr_min=0.0025,
            **kw,
        )
        return opt, gp_params, post, pol_params

    @pytest.mark.slow
    def test_cost_decreases(self):
        opt, gp_params, post, pol_params = self._opt()
        res = opt.optimize(
            jax.random.PRNGKey(0), pol_params, gp_params, post,
            num_opt_steps=80, lr0=0.02, p_dropout0=0.0,
        )
        steps = int(res.steps_done)
        assert steps > 5
        c = np.asarray(res.cost_history)[:steps]
        assert c[-1] < c[0]
        assert np.isfinite(c).all()
        assert res.states.shape == (15, 32, 2)

    def test_early_exit_fires(self):
        # tiny thresholds + converged problem -> exit before max steps
        opt, gp_params, post, pol_params = self._opt(max_steps=600)
        res = opt.optimize(
            jax.random.PRNGKey(0), pol_params, gp_params, post,
            num_opt_steps=600, lr0=0.02, p_dropout0=0.0,
        )
        assert int(res.steps_done) < 600
        assert float(res.final_lr) <= 0.0025 * 1.01

    def test_dynamic_args_no_recompile(self):
        opt, gp_params, post, pol_params = self._opt()
        r1 = opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                          num_opt_steps=10, lr0=0.02, p_dropout0=0.0)
        n1 = opt._optimize_chunk._cache_size()
        r2 = opt.optimize(jax.random.PRNGKey(1), r1.policy_params, gp_params, post,
                          num_opt_steps=20, lr0=0.01, p_dropout0=0.25)
        assert opt._optimize_chunk._cache_size() == n1  # lr/steps/dropout dynamic
        assert int(r2.steps_done) == 20

    def test_chunked_execution_matches_single_chunk(self):
        import dataclasses

        opt, gp_params, post, pol_params = self._opt()
        opt_small = dataclasses.replace(opt, chunk_steps=7)
        r1 = opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                          num_opt_steps=30, lr0=0.02, p_dropout0=0.0)
        r2 = opt_small.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                                num_opt_steps=30, lr0=0.02, p_dropout0=0.0)
        np.testing.assert_allclose(
            np.asarray(r1.cost_history)[:30], np.asarray(r2.cost_history)[:30], rtol=1e-5
        )

    @pytest.mark.slow  # chunk-boundary invariance also covered by test_chunked_execution_matches_single_chunk
    def test_adaptive_chunking_matches_static(self):
        # chunk_target_s resizes chunks from measured throughput; boundaries
        # must not affect results (the while_loop carry is exact)
        import dataclasses

        opt, gp_params, post, pol_params = self._opt()
        opt_static = dataclasses.replace(opt, chunk_target_s=0.0)
        opt_adapt = dataclasses.replace(opt, chunk_steps=5, chunk_target_s=1e-4)
        r1 = opt_static.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                                 num_opt_steps=60, lr0=0.02, p_dropout0=0.0)
        r2 = opt_adapt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                                num_opt_steps=60, lr0=0.02, p_dropout0=0.0)
        assert int(r1.steps_done) == int(r2.steps_done)
        np.testing.assert_allclose(
            np.asarray(r1.cost_history), np.asarray(r2.cost_history), rtol=1e-5
        )

    def test_iteration_cap_splits_without_changing_results(self):
        # The per-chunk iteration cap bounds each device execution's wall
        # time under NaN-retry storms (iterations/step can inflate 11x — the
        # tunnel-crash class on real TPU).  A chunk that hits the cap must
        # return early, and resuming from its carry must reproduce the
        # uncapped trajectory exactly.
        opt, gp_params, post, pol_params = self._opt()
        key = jax.random.PRNGKey(0)
        c0 = opt._optimize_init(
            key, pol_params, gp_params, post,
            jnp.float32(0.02), jnp.float32(0.0), jnp.int32(0), jnp.int32(0),
        )
        big = jnp.int32(1 << 30)
        full = opt._optimize_chunk(c0, key, gp_params, post, jnp.int32(20), big, jnp.int32(0))
        part = opt._optimize_chunk(c0, key, gp_params, post, jnp.int32(20), jnp.int32(8), jnp.int32(0))
        # healthy run: 1 iteration per step, so the cap stops it at step 8
        assert int(part.step) == 8
        assert int(part.iters) == 8
        resumed = opt._optimize_chunk(part, key, gp_params, post, jnp.int32(20), big, jnp.int32(0))
        assert int(resumed.step) == int(full.step)
        np.testing.assert_allclose(
            np.asarray(full.cost_hist), np.asarray(resumed.cost_hist), rtol=1e-6
        )

    def test_nan_branch_styles_identical_healthy(self):
        """The "cond" NaN-branch style (healthy carry update inside lax.cond,
        the fast unvmapped path) must reproduce the round-3 "where" style
        bit-for-bit on a healthy run — keep_old() elides selects whose
        predicate is False, which is a bitwise identity.  The "off"
        measurement ablation (no guard at all) must agree too: on a NaN-free
        run all three bodies compute the same update."""
        import dataclasses

        opt, gp_params, post, pol_params = self._opt()
        assert opt.nan_branch_style == "cond"
        r1 = opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                          num_opt_steps=25, lr0=0.02, p_dropout0=0.0)
        for style in ("where", "off"):
            o2 = dataclasses.replace(opt, nan_branch_style=style)
            r2 = o2.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                             num_opt_steps=25, lr0=0.02, p_dropout0=0.0)
            assert int(r1.steps_done) == int(r2.steps_done), style
            np.testing.assert_allclose(np.asarray(r1.cost_history),
                                       np.asarray(r2.cost_history), rtol=1e-4)
            for a, b in zip(jax.tree_util.tree_leaves(r1.policy_params),
                            jax.tree_util.tree_leaves(r2.policy_params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=1e-5)

    def test_measured_rate_not_stored_from_first_chunk(self):
        """The cross-call `_measured_rate` memory must never be written by a
        call's FIRST chunk (it can include a fresh compile, and a poisoned
        rate shrinks the next call's first chunk to the 25-step floor —
        bench.py's 300-step capture then splits into extra tunneled host
        round-trips).  A single-chunk call therefore stores nothing; a
        multi-chunk call stores the steady-state rate from chunk 2 on."""
        opt, gp_params, post, pol_params = self._opt()
        # single chunk: 10 steps inside the default 500-step first budget
        opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                     num_opt_steps=10, lr0=0.02, p_dropout0=0.0)
        assert getattr(opt, "_measured_rate", None) is None
        # multi chunk: the first budget clamps to the 25-step floor, so a
        # 30-step run forces a second chunk
        import dataclasses

        opt2 = dataclasses.replace(self._opt()[0], chunk_steps=5)
        opt2.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                      num_opt_steps=30, lr0=0.02, p_dropout0=0.0)
        assert getattr(opt2, "_measured_rate", None) is not None

    def test_nan_branch_styles_identical_under_nans(self):
        """Stochastic NaN injection exercises all three paths (advance, retry
        with fresh noise, reinit on budget exhaustion); both styles must walk
        the identical retry/reinit/key schedule."""
        import dataclasses

        opt, gp_params, post, pol_params = self._opt()

        class FlakyCost:
            """NaN on a pseudo-random ~40% of rollouts; retries draw fresh
            rollout noise, so the trigger re-rolls.  The trigger hashes the
            INITIAL particles (a pure function of the rollout key, identical
            across both styles) via their exponent bits, so the NaN schedule
            is invariant to the ~1-ulp param drift XLA refusion introduces."""

            def __init__(self, base):
                self.base = base

            def __call__(self, states, inputs, trial_index):
                c, s = self.base(states, inputs, trial_index)
                bits = jax.lax.bitcast_convert_type(states[0, 0, 0], jnp.uint32)
                h = (bits >> jnp.uint32(8)) % jnp.uint32(10)
                return jnp.where(h < 4, jnp.float32(jnp.nan), c), s

        flaky = dataclasses.replace(opt, cost=FlakyCost(opt.cost),
                                    max_nan_retries=2)
        flaky_where = dataclasses.replace(flaky, nan_branch_style="where")
        r1 = flaky.optimize(jax.random.PRNGKey(3), pol_params, gp_params, post,
                            num_opt_steps=20, lr0=0.02, p_dropout0=0.0)
        r2 = flaky_where.optimize(jax.random.PRNGKey(3), pol_params, gp_params, post,
                                  num_opt_steps=20, lr0=0.02, p_dropout0=0.0)
        # the injection must actually have fired at least one retry or reinit
        assert int(r1.reinit_count) > 0 or not np.array_equal(
            np.asarray(r1.cost_history), np.zeros_like(np.asarray(r1.cost_history))
        )
        assert int(r1.steps_done) == int(r2.steps_done)
        assert int(r1.reinit_count) == int(r2.reinit_count)
        np.testing.assert_allclose(np.asarray(r1.cost_history),
                                   np.asarray(r2.cost_history), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(r1.policy_params),
                        jax.tree_util.tree_leaves(r2.policy_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_nan_branch_cond_style_under_vmap(self):
        """The farm vmaps the compiled loop; the "cond" style must stay
        correct there (cond lowers to a select over both carry-sized
        branches) and match the "where" style per lane."""
        import dataclasses

        opt, gp_params, post, pol_params = self._opt()
        opt_where = dataclasses.replace(opt, nan_branch_style="where")
        keys = jax.random.split(jax.random.PRNGKey(5), 3)
        args = (jnp.float32(0.02), jnp.float32(0.0), jnp.int32(0), jnp.int32(0))
        c0 = jax.vmap(lambda k: opt._optimize_init(k, pol_params, gp_params, post, *args))(keys)
        big = jnp.int32(1 << 30)

        def run(o, c, k):
            return o._optimize_chunk(c, k, gp_params, post, jnp.int32(12), big, jnp.int32(0))

        r_cond = jax.vmap(lambda c, k: run(opt, c, k))(c0, keys)
        r_where = jax.vmap(lambda c, k: run(opt_where, c, k))(c0, keys)
        np.testing.assert_allclose(np.asarray(r_cond.cost_hist),
                                    np.asarray(r_where.cost_hist), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(r_cond.step), np.asarray(r_where.step))

    def test_dropout_active_path(self):
        opt, gp_params, post, pol_params = self._opt(p_drop_reduction=0.125)
        res = opt.optimize(jax.random.PRNGKey(0), pol_params, gp_params, post,
                           num_opt_steps=30, lr0=0.02, p_dropout0=0.25)
        assert np.isfinite(np.asarray(res.cost_history)[: int(res.steps_done)]).all()


class TestPlants:
    def test_rk4_matches_scipy_lsoda(self, x64):
        scipy_int = pytest.importorskip("scipy.integrate")
        x0 = np.array([0.0, 0.0, 0.1, 0.0])
        u = np.array([1.0])
        x_jax = np.asarray(
            ode_mod.integrate(ode_mod.cartpole, jnp.asarray(x0, jnp.float64),
                              jnp.asarray(u, jnp.float64), 0.05, 20)
        )

        def np_cartpole(y, t, uu):
            return np.asarray(ode_mod.cartpole(jnp.asarray(y), t, jnp.asarray([uu])))

        x_ref = scipy_int.odeint(np_cartpole, x0, [0.0, 0.05], args=(1.0,))[1]
        np.testing.assert_allclose(x_jax, x_ref, rtol=1e-5, atol=1e-7)

    def test_ode_plant_rollout(self):
        plant = ODEPlant(ode_name="cartpole", noise_std=(0.01,) * 4)
        pol = RandomExploration(state_dim=4, input_dim=1, u_max=10.0)
        trial = plant.rollout(jax.random.PRNGKey(0), np.zeros(4), pol, {}, T=1.0, dt=0.05)
        assert trial.measured.shape == (21, 4)
        assert trial.inputs.shape == (21, 1)
        assert np.abs(trial.inputs).max() <= 10.0
        # noise is present but small
        err = np.abs(trial.measured - trial.true)
        assert 0 < err.mean() < 0.05
        # the cart actually moves under random forcing
        assert np.abs(trial.true[:, 0]).max() > 0.01

    def test_pms_plant_rollout(self):
        plant = PMSODEPlant(
            ode_name="cartpole", noise_std=(3e-3,) * 4,
            pos_indices=(0, 2), vel_indices=(1, 3), fc=0.5,
        )
        pol = RandomExploration(state_dim=4, input_dim=1, u_max=10.0)
        trial = plant.rollout(jax.random.PRNGKey(0), np.zeros(4), pol, {}, T=1.0, dt=1 / 30)
        n = trial.measured.shape[0]
        assert n == 31
        # measured velocities are filtered finite differences, not the true ones
        assert not np.allclose(trial.measured[:, 1], trial.true[:, 1])
        assert np.isfinite(trial.measured).all()


class TestSOD:
    def test_selects_subset_preserving_accuracy(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1)
        n, cap = 60, 64
        # several noisy passes over the same range: SOD's posterior-std floor
        # is ~sigma/sqrt(#near-duplicates), so repeated coverage (as in real
        # trajectory data) is what makes the greedy pass reject points
        base = jnp.linspace(-3, 3, 10)
        x = (jnp.tile(base, 6) + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (n,)))[:, None]
        y = jnp.sin(x[:, 0])[None, :]
        data = GPData(
            x=linalg.pad_axis(x, cap), y=linalg.pad_axis(y, cap, axis=1),
            mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]),
        )
        params = gp.init_params(sigma_n=0.1)  # fixed noise: threshold = 0.5*0.1
        cfg = sod_mod.SODConfig(threshold_mode="relative", threshold=(0.5,))
        sel = sod_mod.select(gp, cfg, params, data.x, data.y, data.mask)
        m = int(jnp.sum(sel))
        assert 1 < m < n  # a strict subset
        # posterior on the subset still fits the data
        x_tr = jnp.broadcast_to(data.x, (1,) + data.x.shape)
        post = gp.posterior(params, x_tr, sel, data.y)
        mean, _ = gp.predict(params, post, x)
        assert float(jnp.mean((mean[0] - y[0]) ** 2)) < 1e-2

    def test_absolute_threshold_and_padding(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=2)
        n, cap = 30, 64
        x = jnp.linspace(-3, 3, n)[:, None]
        y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 0])])
        data = GPData(
            x=linalg.pad_axis(x, cap), y=linalg.pad_axis(y, cap, axis=1),
            mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]),
        )
        params = gp.init_params(sigma_n=0.1)
        cfg = sod_mod.SODConfig(threshold_mode="absolute", threshold=(0.05, 0.05))
        sel = np.asarray(sod_mod.select(gp, cfg, params, data.x, data.y, data.mask))
        assert sel.shape == (2, cap)
        assert sel[:, n:].sum() == 0  # padding never selected


class TestHeartbeat:
    """First-chunk compile heartbeat (trainer._heartbeat): keeps output-based
    stall watchdogs fed during legitimate long device compiles, bounded so a
    truly hung call still goes silent and gets killed."""

    def test_prints_while_in_flight_then_stops(self, capsys):
        import time as _time

        stop = PolicyOptimizer._heartbeat("unit", every_s=0.02, budget_s=10)
        _time.sleep(0.15)
        stop()
        out = capsys.readouterr().out
        assert "device call in flight" in out
        _time.sleep(0.1)
        assert "device call in flight" not in capsys.readouterr().out

    def test_budget_expiry_goes_silent(self, capsys):
        import time as _time

        stop = PolicyOptimizer._heartbeat("unit", every_s=0.02, budget_s=0.0)
        _time.sleep(0.15)
        stop()
        assert "device call in flight" not in capsys.readouterr().out
