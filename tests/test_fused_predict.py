"""Pallas fused predict kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.ops import fused_predict as fp


def _inputs(G=2, P=50, M=64, D=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    se_w = jnp.exp(jax.random.normal(ks[0], (G, D)) * 0.3)
    se_lam = jnp.exp(jax.random.normal(ks[1], (G,)) * 0.2)
    poly1 = 0.1 * jnp.exp(jax.random.normal(ks[2], (G, D + 1)) * 0.3)
    poly2a = 0.1 * jnp.exp(jax.random.normal(ks[3], (G, D)) * 0.3)
    poly2b = 0.1 * jnp.exp(jax.random.normal(ks[4], (G, D)) * 0.3)
    x_star = jax.random.normal(ks[5], (P, D))
    x_tr = jax.random.normal(ks[6], (M, D))
    alpha = jax.random.normal(ks[7], (G, M))
    k_inv = jax.random.normal(ks[8], (G, M, M)) * 0.05
    mask = (jax.random.uniform(ks[9], (G, M)) > 0.2).astype(jnp.float32)
    return se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr, alpha, k_inv, mask


class TestFusedPredict:
    @pytest.mark.parametrize("use_poly", [False, True])
    def test_matches_reference(self, use_poly):
        args = _inputs()
        ka, qd = fp.gram_contract(*args, use_poly, True)  # interpret mode
        ka_ref, qd_ref = fp._reference_gram_contract(*args, use_poly)
        np.testing.assert_allclose(np.asarray(ka), np.asarray(ka_ref), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qd), np.asarray(qd_ref), rtol=2e-5, atol=1e-5)

    def test_nondivisible_particle_count(self):
        args = _inputs(P=37)
        ka, qd = fp.gram_contract(*args, True, True)
        ka_ref, qd_ref = fp._reference_gram_contract(*args, True)
        assert ka.shape == (2, 37)
        np.testing.assert_allclose(np.asarray(ka), np.asarray(ka_ref), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qd), np.asarray(qd_ref), rtol=2e-5, atol=1e-5)

    @pytest.mark.parametrize("use_poly", [False, True])
    @pytest.mark.parametrize("P", [16, 37])
    def test_custom_vjp_matches_reference_grad(self, use_poly, P):
        """x_star's cotangent comes from the hand-written Pallas backward
        kernel (interpret mode) — must match autodiff of the jnp twin,
        with weighted (non-uniform) output cotangents."""
        args = _inputs(P=P, M=32)
        wk = jnp.linspace(0.5, 1.5, 2 * P).reshape(2, P)
        wq = jnp.linspace(-1.0, 1.0, 2 * P).reshape(2, P)

        def loss_fused(xs):
            a = list(args); a[5] = xs
            ka, qd = fp.gram_contract(*a, use_poly, True)
            return jnp.sum(wk * ka) + jnp.sum(wq * qd)

        def loss_ref(xs):
            a = list(args); a[5] = xs
            ka, qd = fp._reference_gram_contract(*a, use_poly)
            return jnp.sum(wk * ka) + jnp.sum(wq * qd)

        g1 = jax.grad(loss_fused)(args[5])
        g2 = jax.grad(loss_ref)(args[5])
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)

    def test_grad_wrt_other_inputs_still_correct(self):
        """Cotangents for non-x_star inputs route through the twin subgraph
        and must stay exact (they are DCE'd in the opt loop but live in
        model-diagnostic contexts)."""
        args = _inputs(P=12, M=32)

        def loss_fused(alpha, f):
            a = list(args); a[7] = alpha; a[8] = f
            ka, qd = fp.gram_contract(*a, True, True)
            return jnp.sum(ka * qd)

        def loss_ref(alpha, f):
            a = list(args); a[7] = alpha; a[8] = f
            ka, qd = fp._reference_gram_contract(*a, True)
            return jnp.sum(ka * qd)

        g1 = jax.grad(loss_fused, argnums=(0, 1))(args[7], args[8])
        g2 = jax.grad(loss_ref, argnums=(0, 1))(args[7], args[8])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestMultiGPFusedPath:
    def _setup(self, kernel_kind):
        import dataclasses

        from mcpilco_tpu.models import kernels as K
        from mcpilco_tpu.models.gp import GPData, MultiGP
        from mcpilco_tpu.ops import linalg

        kern = (
            K.se_plus_volterra(active_dims=tuple(range(6)), degree=2)
            if kernel_kind == "se+p2"
            else K.SEArd(active_dims=tuple(range(6)))
        )
        gp = MultiGP(kernel=kern, num_heads=2)
        params = gp.init_params(sigma_n=0.2)
        n, cap = 50, 64
        x = jax.random.normal(jax.random.PRNGKey(0), (n, 6))
        y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 1])])
        data = GPData(
            x=linalg.pad_axis(x, cap), y=linalg.pad_axis(y, cap, axis=1),
            mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]),
        )
        post = gp.fit_posterior(params, data)
        return gp, params, post

    @pytest.mark.parametrize("kind", ["se", "se+p2"])
    def test_fused_matches_xla_path(self, kind):
        import dataclasses

        gp, params, post = self._setup(kind)
        gp_f = dataclasses.replace(gp, use_pallas=True)
        assert gp_f._fused_structure() == kind
        xs = jax.random.normal(jax.random.PRNGKey(5), (33, 6))
        m0, v0 = gp.predict(params, post, xs)
        m1, v1 = gp_f.predict(params, post, xs)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-4, atol=1e-5)

    def test_fused_grad_flows(self):
        import dataclasses

        gp, params, post = self._setup("se+p2")
        gp_f = dataclasses.replace(gp, use_pallas=True)

        def f(xs):
            m, v = gp_f.predict(params, post, xs)
            return jnp.sum(m) + jnp.sum(v)

        g = jax.grad(f)(jnp.ones((4, 6)))
        assert np.isfinite(np.asarray(g)).all()
