"""Subset-of-Regressors approximation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.models import kernels as K
from mcpilco_tpu.models import sod as sod_mod
from mcpilco_tpu.models.gp import GPData, MultiGP
from mcpilco_tpu.ops import linalg


def _data(n=50, cap=64, key=0, dtype=jnp.float32, repeated=False):
    if repeated:
        base = jnp.linspace(-3, 3, 10)
        x = (jnp.tile(base, n // 10) + 0.01 * jax.random.normal(jax.random.PRNGKey(key), (n,)))[:, None]
    else:
        x = jnp.linspace(-3, 3, n)[:, None]
    x = x.astype(dtype)
    y = jnp.sin(x[:, 0])[None, :] + 0.02 * jax.random.normal(jax.random.PRNGKey(key), (1, n)).astype(dtype)
    return GPData(
        x=linalg.pad_axis(x, cap),
        y=linalg.pad_axis(y, cap, axis=1),
        mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]).astype(dtype),
    ), x, y


class TestSOR:
    def test_full_inducing_set_matches_exact_gp(self, x64):
        """With U = all training points, SOR equals the exact posterior mean
        (the defining property of the approximation).  Needs f64: with a
        dense U the information matrix K + s^-2 K^2 shares K's near-null
        space, so the full-U case is only well-posed at high precision
        (the reference runs it in f64 too — Sparse_GP.py:112-145)."""
        data, x, y = _data(dtype=jnp.float64)
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor", jitter=1e-12)
        params = gp.init_params(sigma_n=0.1, dtype=jnp.float64)
        sel = data.mask[None, :]
        post_sor = gp.sor_posterior(params, data, sel)
        mean_sor, var_sor = gp.predict(params, post_sor, x)

        gp_exact = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, jitter=1e-12)
        post_ex = gp_exact.fit_posterior(params, data)
        mean_ex, var_ex = gp_exact.predict(params, post_ex, x)
        np.testing.assert_allclose(np.asarray(mean_sor), np.asarray(mean_ex), atol=5e-3)
        assert float(jnp.max(var_sor)) < 1.5

    def test_subset_inducing_accuracy(self):
        # repeated coverage so the greedy pass actually rejects points
        data, x, y = _data(repeated=True)
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor")
        params = gp.init_params(sigma_n=0.1)
        cfg = sod_mod.SODConfig(threshold_mode="absolute", threshold=(0.05,))
        sel = sod_mod.select(gp, cfg, params, data.x, data.y, data.mask)
        m = int(jnp.sum(sel))
        assert 1 < m < 50
        post = gp.sor_posterior(params, data, sel)
        mean, var = gp.predict(params, post, x)
        assert float(jnp.mean((mean[0] - y[0]) ** 2)) < 5e-3
        assert float(var.min()) >= 0

    def test_sor_mll_equals_exact_mll_with_full_inducing(self, x64):
        """K_sor = K_XU K_UU^-1 K_UX + s2 I reduces to the exact K + s2 I
        when U = X, so the Nystrom MLL must match the exact MLL
        (the corrected SOR_forward, Sparse_GP.py:196-232)."""
        data, x, y = _data(dtype=jnp.float64)
        # jitter 1e-8: the dense 50-point SE Gram itself (no noise on the
        # diagonal) must be factorized for the whitening, and it is
        # numerically rank-deficient below that even in f64
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor", jitter=1e-8)
        params = gp.init_params(sigma_n=0.1, dtype=jnp.float64)
        sel = data.mask[None, :]
        mll_sor = float(gp.sor_mll(params, data, sel))
        gp_exact = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, jitter=1e-12)
        mll_exact = float(gp_exact.mll(params, data))
        np.testing.assert_allclose(mll_sor, mll_exact, rtol=1e-5)

    def test_fit_sor_decreases_mll(self):
        data, x, y = _data(repeated=True)
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor")
        params = gp.init_params(sigma_n=0.3)
        cfg = sod_mod.SODConfig(threshold_mode="absolute", threshold=(0.05,))
        sel = sod_mod.select(gp, cfg, params, data.x, data.y, data.mask)
        new_params, u, losses = gp.fit_sor(params, data, sel, num_epochs=150, learning_rate=0.02)
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])
        # hyperparameters actually moved; inducing inputs did NOT (frozen)
        assert float(jnp.abs(new_params.log_sigma_n - params.log_sigma_n).max()) > 1e-3
        np.testing.assert_allclose(np.asarray(u[0]), np.asarray(data.x))
        # the refined model still predicts well through the SOR posterior
        post = gp.sor_posterior(new_params, data, sel)
        mean, _ = gp.predict(new_params, post, x)
        assert float(jnp.mean((mean[0] - y[0]) ** 2)) < 5e-3

    def test_fit_sor_trainable_inducing_inputs(self):
        """flg_train_inducing_inputs analog (Sparse_GP.py:68-77): selected
        inducing rows move under the SOR MLL gradient, unselected stay."""
        data, x, y = _data(repeated=True)
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor")
        params = gp.init_params(sigma_n=0.3)
        cfg = sod_mod.SODConfig(threshold_mode="absolute", threshold=(0.05,))
        sel = sod_mod.select(gp, cfg, params, data.x, data.y, data.mask)
        new_params, u, losses = gp.fit_sor(
            params, data, sel, num_epochs=150, learning_rate=0.02, train_inducing=True
        )
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses)) and losses[-1] < losses[0] - 1.0
        moved = np.abs(np.asarray(u[0]) - np.asarray(data.x)).max(axis=-1)
        sel_np = np.asarray(sel[0]) > 0.5
        assert moved[sel_np].max() > 1e-4, "selected inducing inputs did not train"
        assert moved[~sel_np].max() == 0.0, "unselected rows must not move"
        # posterior built on the trained inducing set stays accurate
        post = gp.sor_posterior(new_params, data, sel, u=u)
        mean, _ = gp.predict(new_params, post, x)
        assert float(jnp.mean((mean[0] - y[0]) ** 2)) < 5e-3

    @pytest.mark.slow
    def test_sor_config_routes_through_orchestrator(self):
        """MCPilco with SORConfig(refine_epochs>0) runs select -> fit_sor ->
        sor_posterior and records the refinement in fit info."""
        import dataclasses

        from mcpilco_tpu.scenarios import cartpole as scen

        cfg = dataclasses.replace(
            scen.CartpoleConfig(seed=5).smoke(), num_particles=16, opt_steps=(4,), gp_epochs=40
        )
        agent, kwargs = scen.build(cfg)
        agent.sod = None
        agent.sor = sod_mod.SORConfig(
            threshold_mode="absolute", threshold=(0.01, 0.01),
            refine_epochs=30, train_inducing=True,
        )
        agent.gp = dataclasses.replace(agent.gp, approx="sor")
        agent.optimizer = dataclasses.replace(
            agent.optimizer,
            engine=dataclasses.replace(agent.optimizer.engine, gp=agent.gp),
        )
        agent.collect(1.0, trial_index=0, exploration=True)
        info = agent.fit_model(scen.ModelFitOptions(num_epochs=cfg.gp_epochs))
        assert "sor_mll_first" in info and "sor_mll_last" in info
        assert info["sor_mll_last"] <= info["sor_mll_first"]
        assert np.all(np.isfinite(agent.one_step_mse()))

    def test_grad_through_sor_predict(self):
        data, x, y = _data()
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1, approx="sor")
        params = gp.init_params(sigma_n=0.1)
        sel = data.mask[None, :]
        post = gp.sor_posterior(params, data, sel)

        def f(xs):
            mean, var = gp.predict(params, post, xs[None, :])
            return jnp.sum(mean) + jnp.sum(var)

        g = jax.grad(f)(jnp.ones(1))
        assert np.isfinite(np.asarray(g)).all()
