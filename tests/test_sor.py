"""Subset-of-Regressors approximation tests."""

import jax
import jax.numpy as jnp
import numpy as np

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
