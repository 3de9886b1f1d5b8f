"""Policies, costs, dynamics models, filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.models import costs as C
from mcpilco_tpu.models import dynamics as D
from mcpilco_tpu.models import filters as F
from mcpilco_tpu.models import policies as P


class TestSquash:
    def test_bounds_and_slope(self):
        u = jnp.linspace(-100, 100, 41)
        s = P.squash(u, 10.0)
        assert float(jnp.max(jnp.abs(s))) <= 10.0  # f32 tanh saturates exactly
        np.testing.assert_allclose(float(P.squash(jnp.array(0.1), 10.0)), 0.1, rtol=1e-3)


class TestSumOfGaussians:
    def _mk(self, **kw):
        pol = P.SumOfGaussians(feature_dim=4, input_dim=1, num_basis=16, u_max=10.0, **kw)
        params = pol.init_params(jax.random.PRNGKey(0))
        return pol, params

    def test_shapes_and_bounds(self):
        pol, params = self._mk()
        s = jax.random.normal(jax.random.PRNGKey(1), (400, 4))
        u = pol.apply(params, s, 0)
        assert u.shape == (400, 1)
        assert float(jnp.max(jnp.abs(u))) < 10.0

    def test_rbf_feature_values(self):
        pol, params = self._mk()
        # a state equal to a center gives feature 1 there
        s = params["centers"][3:4]
        feats = pol.features(params, s)
        np.testing.assert_allclose(float(feats[0, 3]), 1.0, rtol=1e-5)

    def test_dropout_zero_is_identity(self):
        pol, params = self._mk()
        s = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
        u0 = pol.apply(params, s, 0, key=None, p_dropout=0.0)
        u1 = pol.apply(params, s, 0, key=jax.random.PRNGKey(3), p_dropout=0.0)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), rtol=1e-6)

    def test_dropout_changes_output_and_keeps_scale(self):
        pol, params = self._mk()
        s = jax.random.normal(jax.random.PRNGKey(2), (2000, 4))
        u0 = pol.apply(params, s, 0, p_dropout=0.0)
        u1 = pol.apply(params, s, 0, key=jax.random.PRNGKey(3), p_dropout=0.25)
        assert not np.allclose(np.asarray(u0), np.asarray(u1))
        # inverted dropout keeps the mean magnitude comparable
        assert 0.5 < float(jnp.mean(jnp.abs(u1)) / jnp.mean(jnp.abs(u0))) < 2.0

    def test_grad_wrt_params(self):
        pol, params = self._mk()
        s = jax.random.normal(jax.random.PRNGKey(4), (32, 4))
        g = jax.grad(lambda p: jnp.sum(pol.apply(p, s, 0) ** 2))(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.max(jnp.abs(g["weight"]))) > 0

    def test_reinit_respects_magnitudes(self):
        pol = P.SumOfGaussians(
            feature_dim=4, input_dim=1, num_basis=16, u_max=10.0,
            reinit_lengthscales=(1.0, 1.0, 1.0, 1.0),
            reinit_centers=(np.pi, np.pi, 1.0, 1.0), reinit_weight=10.0,
        )
        params = pol.init_params(jax.random.PRNGKey(0))
        new = pol.reinit(params, jax.random.PRNGKey(7))
        assert not np.allclose(np.asarray(new["centers"]), np.asarray(params["centers"]))
        assert float(jnp.max(jnp.abs(new["centers"][:, 0]))) <= np.pi
        assert float(jnp.max(jnp.abs(new["weight"]))) <= 5.0
        np.testing.assert_allclose(np.asarray(new["log_lengthscales"]), 0.0, atol=1e-6)


class TestAngleAndTrackingPolicies:
    def test_angles_extension(self):
        pol = P.SumOfGaussiansWithAngles(
            feature_dim=5, input_dim=1, num_basis=8, u_max=10.0,
            angle_indices=(2,), non_angle_indices=(0, 1, 3),
        )
        params = pol.init_params(jax.random.PRNGKey(0))
        s = jax.random.normal(jax.random.PRNGKey(1), (10, 4))
        u = pol.apply(params, s, 0)
        assert u.shape == (10, 1)
        # theta and theta + 2pi give identical actions
        s2 = s.at[:, 2].add(2 * jnp.pi)
        np.testing.assert_allclose(
            np.asarray(pol.apply(params, s2, 0)), np.asarray(u), rtol=1e-4, atol=1e-5
        )

    def test_tracking_policy_input(self):
        traj = np.linspace(0, 1, 20)[:, None] * np.ones((1, 4))
        pol = P.SumOfGaussiansTracking(
            feature_dim=8, input_dim=2, num_basis=8, u_max=1.0, target_traj=traj
        )
        params = pol.init_params(jax.random.PRNGKey(0))
        s = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        u5 = pol.apply(params, s, 5)
        u6 = pol.apply(params, s, 6)
        assert u5.shape == (5, 2)
        assert not np.allclose(np.asarray(u5), np.asarray(u6))
        # t beyond trajectory end clamps instead of crashing
        u99 = pol.apply(params, s, 99)
        assert np.isfinite(np.asarray(u99)).all()

    def test_pd_controller(self):
        traj = np.zeros((10, 4))
        pol = P.PDController(state_dim=4, input_dim=2, target_traj=traj, u_max=100.0)
        params = pol.init_params(jax.random.PRNGKey(0), sqrt_kp=np.array([2.0, 2.0]),
                                 sqrt_kd=np.array([1.0, 1.0]))
        s = jnp.array([[1.0, -1.0, 0.5, 0.25]])
        u = pol.apply(params, s, 0)
        # u = Kp^2 * (0 - pos) + Kd^2 * (0 - vel) = 4*(-1,1) + 1*(-0.5,-0.25)
        np.testing.assert_allclose(np.asarray(u[0]), [-4.5, 3.75], rtol=1e-3)


class TestExplorationPolicies:
    def test_random_exploration_bounds(self):
        pol = P.RandomExploration(state_dim=4, input_dim=1, u_max=10.0)
        s = jnp.zeros((3, 4))
        us = [pol.apply({}, s, t, key=jax.random.PRNGKey(0)) for t in range(5)]
        assert all(float(jnp.max(jnp.abs(u))) < 10.0 for u in us)
        assert not np.allclose(np.asarray(us[0]), np.asarray(us[1]))

    def test_sum_of_sinusoids_deterministic_given_params(self):
        pol = P.SumOfSinusoids(
            state_dim=4, input_dim=1, num_sin=3, omega_min=0.5, omega_max=2.0,
            amplitude_min=0.5, amplitude_max=1.5, squash_output=True, u_max=3.0,
        )
        params = pol.init_params(jax.random.PRNGKey(0))
        s = jnp.zeros((2, 4))
        u1 = pol.apply(params, s, 3)
        u2 = pol.apply(params, s, 3)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2))
        assert float(jnp.max(jnp.abs(u1))) < 3.0


class TestCosts:
    def test_cartpole_cost_values(self):
        cost = C.CartPoleCost(target_state=(np.pi, 0.0), lengthscales=(3.0, 1.0))
        # state [x, xd, theta, thd]; at swing-up (theta=+-pi, x=0) cost = 0
        up_pos = jnp.zeros((1, 1, 4)).at[..., 2].set(np.pi)
        up_neg = jnp.zeros((1, 1, 4)).at[..., 2].set(-np.pi)
        down = jnp.zeros((1, 1, 4))
        u = jnp.zeros((1, 1, 1))
        assert float(cost.stage_costs(up_pos, u)[0, 0]) < 1e-6
        assert float(cost.stage_costs(up_neg, u)[0, 0]) < 1e-6  # |theta| symmetry
        expected_down = 1 - np.exp(-((np.pi / 3.0) ** 2))
        np.testing.assert_allclose(float(cost.stage_costs(down, u)[0, 0]), expected_down, rtol=1e-4)

    def test_cartpole_cost_per_trial_curriculum(self):
        # per-trial rows: wide trial 0, reference trial 1+; out-of-range
        # trial_index clamps to the last row (jnp gather clamp — the
        # 2-row-curriculum idiom shared with the UR5 scenario)
        ls = np.array([[6.0, 2.0], [3.0, 1.0]])
        cost = C.CartPoleCost(
            target_state=(np.pi, 0.0), lengthscales=ls, angle_index=2, per_trial=True
        )
        fixed = C.CartPoleCost(target_state=(np.pi, 0.0), lengthscales=(3.0, 1.0), angle_index=2)
        down, u = jnp.zeros((1, 1, 4)), jnp.zeros((1, 1, 1))
        c0 = float(cost.stage_costs(down, u, 0)[0, 0])
        c1 = float(cost.stage_costs(down, u, 1)[0, 0])
        c4 = float(cost.stage_costs(down, u, 4)[0, 0])  # clamps to row 1
        cf = float(fixed.stage_costs(down, u)[0, 0])
        assert c0 < c1  # wider lengthscales -> smaller saturated cost
        np.testing.assert_allclose(c1, cf, rtol=1e-6)
        np.testing.assert_allclose(c4, cf, rtol=1e-6)
        np.testing.assert_allclose(c0, 1 - np.exp(-((np.pi / 6.0) ** 2)), rtol=1e-4)

    def test_expected_cost_reduction(self):
        stage = jnp.array([[1.0, 3.0], [2.0, 2.0]])  # [T=2, P=2]
        total, spread = C.expected_cost(stage)
        np.testing.assert_allclose(float(total), 2.0 + 2.0)
        np.testing.assert_allclose(float(spread), np.std([1, 3], ddof=1) + 0.0, rtol=1e-5)

    def test_saturated_distance(self):
        cost = C.SaturatedDistance(target_state=(1.0, 0.0), lengthscales=(1.0, 2.0),
                                   active_dims=(0, 2))
        s = jnp.zeros((1, 1, 3))
        got = float(cost.stage_costs(s, None)[0, 0])
        np.testing.assert_allclose(got, 1 - np.exp(-1.0), rtol=1e-5)

    def test_trajectory_tracking_cost(self):
        traj = np.stack([np.linspace(0, 1, 5)] * 3, axis=1)
        cost = C.SaturatedTrajectoryTracking(target_traj=traj, lengthscales=(1.0, 1.0, 1.0))
        states = jnp.asarray(traj)[:, None, :]  # exactly on the trajectory
        np.testing.assert_allclose(np.asarray(cost.stage_costs(states, None)), 0.0, atol=1e-6)

    def test_per_trial_lengthscales(self):
        traj = np.zeros((4, 2))
        ls = np.array([[0.5, 0.5], [5.0, 5.0]])
        cost = C.SaturatedTrajectoryTracking(target_traj=traj, lengthscales=ls, per_trial=True)
        states = jnp.ones((4, 1, 2))
        c0 = float(jnp.sum(cost.stage_costs(states, None, 0)))
        c1 = float(jnp.sum(cost.stage_costs(states, None, 1)))
        assert c0 > c1  # tighter lengthscales -> larger cost

    def test_trial_cumulative_cost_resolves_control_ordinal(self):
        """Per-trial cost schedules index by CONTROL-trial ordinal, so
        trial_cumulative_cost(-1) after 1 exploration + 2 control trials must
        evaluate with schedule row 1, not row 2 (advisor r2 finding #1)."""
        from mcpilco_tpu.scenarios import cartpole as cp

        agent, _ = cp.build(cp.CartpoleConfig(seed=1).smoke())
        traj = np.zeros((200, 4))
        ls = np.array([[0.5] * 4, [50.0] * 4])  # wildly different rows
        agent.cost = C.SaturatedTrajectoryTracking(
            target_traj=traj, lengthscales=ls, per_trial=True
        )
        from mcpilco_tpu.envs.plants import TrialData

        t = TrialData(
            measured=np.ones((5, 4), np.float32),
            inputs=np.zeros((5, 1), np.float32),
            true=np.ones((5, 4), np.float32),
            noisy=np.ones((5, 4), np.float32),
        )
        agent.trials = [t, t, t]  # exploration + control 0 + control 1
        agent.num_exploration_trials = 1
        got = agent.trial_cumulative_cost(-1)
        want_row1 = float(
            jnp.sum(agent.cost.stage_costs(jnp.asarray(t.true[:, None, :]), None, 1))
        )
        want_row0 = float(
            jnp.sum(agent.cost.stage_costs(jnp.asarray(t.true[:, None, :]), None, 0))
        )
        assert abs(got - want_row1) < 1e-6 and abs(got - want_row0) > 1e-3


class TestDynamicsModels:
    def test_delta_state_roundtrip(self):
        m = D.DeltaState(state_dim=3, input_dim=1)
        states = jnp.cumsum(jnp.ones((5, 3)), axis=0)
        inputs = jnp.zeros((5, 1))
        x, y = m.training_pairs(states, inputs)
        assert x.shape == (4, 4) and y.shape == (3, 4)
        np.testing.assert_allclose(np.asarray(y), 1.0)
        nxt = m.next_state(states[0], inputs[0], jnp.ones(3))
        np.testing.assert_allclose(np.asarray(nxt), np.asarray(states[1]))

    def test_speed_integration_trapezoid(self):
        m = D.SpeedIntegration(
            state_dim=4, input_dim=1, dt=0.05,
            vel_indices=(1, 3), pos_indices=(0, 2),
            angle_indices=(2,), not_angle_indices=(0, 1, 3),
        )
        assert m.num_heads == 2 and m.gp_input_dim == 6
        s = jnp.array([1.0, 2.0, 0.5, -1.0])
        dv = jnp.array([0.2, 0.4])
        nxt = m.next_state(s, jnp.zeros(1), dv)
        # v' = v + dv; p' = p + dt*v + dt/2*dv
        np.testing.assert_allclose(
            np.asarray(nxt),
            [1.0 + 0.05 * 2.0 + 0.025 * 0.2, 2.2, 0.5 + 0.05 * (-1.0) + 0.025 * 0.4, -0.6],
            rtol=1e-5,
        )

    def test_speed_integration_gp_io(self):
        m = D.SpeedIntegration(
            state_dim=4, input_dim=1, dt=0.05,
            vel_indices=(1, 3), pos_indices=(0, 2),
            angle_indices=(2,), not_angle_indices=(0, 1, 3),
        )
        states = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
        inputs = jax.random.normal(jax.random.PRNGKey(1), (6, 1))
        x, y = m.training_pairs(states, inputs)
        assert x.shape == (5, 6) and y.shape == (2, 5)
        np.testing.assert_allclose(
            np.asarray(y[0]), np.asarray(states[1:, 1] - states[:-1, 1]), rtol=1e-5
        )
        # gp input layout: [x, xd, thd, sin(th), cos(th), u]
        np.testing.assert_allclose(np.asarray(x[0, 3]), np.sin(float(states[0, 2])), rtol=1e-5)

    def test_furuta_features(self):
        m = D.FurutaSemiparametric(
            state_dim=4, input_dim=1, dt=0.02, vel_indices=(2, 3), pos_indices=(0, 1)
        )
        assert m.gp_input_dim == 12
        s = jax.random.normal(jax.random.PRNGKey(2), (3, 4))
        u = jax.random.normal(jax.random.PRNGKey(3), (3, 1))
        x = m.gp_inputs(s, u)
        assert x.shape == (3, 12)
        np.testing.assert_allclose(
            np.asarray(x[:, 5]), np.asarray(jnp.sin(s[:, 1]) * s[:, 3] ** 2), rtol=1e-5
        )


class TestFilters:
    def test_butter_matches_scipy(self):
        scipy_signal = pytest.importorskip("scipy.signal")
        for wn in (0.1, 0.3, 0.5, 0.8):
            b1, a1 = F.butter1(wn)
            bs, as_ = scipy_signal.butter(1, wn)
            np.testing.assert_allclose(b1, bs, rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(a1, as_, rtol=1e-10, atol=1e-12)
            b2, a2 = F.butter2(wn)
            bs2, as2 = scipy_signal.butter(2, wn)
            np.testing.assert_allclose(b2, bs2, rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(a2, as2, rtol=1e-10, atol=1e-12)

    def test_lfilter_matches_scipy(self, x64):
        scipy_signal = pytest.importorskip("scipy.signal")
        b, a = F.butter2(0.5)
        x = np.random.RandomState(0).randn(50)
        got = np.asarray(F.lfilter(b, a, jnp.asarray(x)))
        want = scipy_signal.lfilter(b, a, x)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    def test_filtfilt_matches_scipy(self, x64):
        scipy_signal = pytest.importorskip("scipy.signal")
        b, a = F.butter2(0.5)
        x = np.cumsum(np.random.RandomState(1).randn(80))
        got = np.asarray(F.filtfilt(b, a, jnp.asarray(x)))
        want = scipy_signal.filtfilt(b, a, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_iir_step_equals_lfilter(self):
        b, a = F.butter1(0.5)
        x = np.random.RandomState(2).randn(30)
        y = np.zeros(30)
        for t in range(1, 30):
            y[t] = float(F.iir_step(b, a, x[t], x[t - 1], y[t - 1]))
        # compare against the recursion defined in the reference
        # (simulation_class/model.py:132-136)
        y_ref = np.zeros(30)
        for t in range(1, 30):
            y_ref[t] = (b[0] * x[t] + b[1] * x[t - 1] - a[1] * y_ref[t - 1]) / a[0]
        np.testing.assert_allclose(y, y_ref, rtol=1e-6)
