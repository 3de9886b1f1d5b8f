"""Kernel algebra unit tests: closed-form values, composition, PSD-ness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.models import kernels as K


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


class TestSEArd:
    def test_closed_form(self):
        k = K.SEArd(active_dims=(0, 1))
        p = k.init_params(lengthscales=np.array([2.0, 0.5]), outputscale=np.array(3.0))
        x1 = jnp.array([[1.0, 2.0]])
        x2 = jnp.array([[0.0, 1.0]])
        # dist = (1/2)^2 + (1/0.5)^2 = 0.25 + 4 = 4.25
        expected = 3.0 * np.exp(-4.25)
        g = k.gram(p, x1, x2)
        np.testing.assert_allclose(np.asarray(g), [[expected]], rtol=1e-4)

    def test_diag_matches_gram(self):
        k = K.SEArd(active_dims=(0, 1, 2))
        p = k.init_params(lengthscales=np.array([1.0, 2.0, 3.0]))
        X = _rand(0, 7, 3)
        np.testing.assert_allclose(
            np.asarray(k.diag(p, X)), np.diag(np.asarray(k.gram(p, X, X))), rtol=1e-5, atol=1e-6
        )

    def test_active_dims_slice(self):
        k_full = K.SEArd(active_dims=(0, 1))
        k_sub = K.SEArd(active_dims=(2, 3))
        p = k_full.init_params()
        X = _rand(1, 5, 4)
        g_sub = k_sub.gram(p, X, X)
        g_manual = k_full.gram(p, X[:, 2:4], X[:, 2:4])
        np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_manual), rtol=1e-5)

    def test_psd(self):
        k = K.SEArd(active_dims=tuple(range(6)))
        p = k.init_params()
        X = _rand(2, 30, 6)
        evals = np.linalg.eigvalsh(np.asarray(k.gram(p, X, X)))
        assert evals.min() > -1e-4

    def test_constant_mean(self):
        k = K.SEArd(active_dims=(0,), train_mean=True)
        p = k.init_params(mean=np.array(1.5))
        X = _rand(3, 4, 1)
        np.testing.assert_allclose(np.asarray(k.mean(p, X)), 1.5 * np.ones(4), rtol=1e-6)


class TestLinearPoly:
    def test_linear_closed_form(self):
        k = K.Linear(active_dims=(0, 1), offset=False)
        p = k.init_params(sigma_diag=np.array([1.0, 2.0]))
        x1 = jnp.array([[1.0, 1.0]])
        x2 = jnp.array([[2.0, 3.0]])
        # k = 1*1*2*1^2? -> sum_d x1_d x2_d sigma_d^2 = 1*2*1 + 1*3*4 = 14
        np.testing.assert_allclose(np.asarray(k.gram(p, x1, x2)), [[14.0]], rtol=1e-6)

    def test_offset_column(self):
        k = K.Linear(active_dims=(0,), offset=True)
        p = k.init_params(sigma_diag=np.array([1.0, 3.0]))
        x = jnp.array([[0.0]])
        # phi = [0, 1]; k(x,x) = 9
        np.testing.assert_allclose(np.asarray(k.gram(p, x, x)), [[9.0]], rtol=1e-6)

    def test_poly_squares_linear(self):
        base = K.Linear(active_dims=(0, 1), offset=True)
        kp = K.Poly(base=base, degree=3)
        p = kp.init_params()
        X = _rand(4, 6, 2)
        np.testing.assert_allclose(
            np.asarray(kp.gram(p, X, X)), np.asarray(base.gram(p, X, X)) ** 3, rtol=1e-5
        )

    def test_semi_def_sigma_golden(self):
        """semi_def_dims matches the reference's diagonal_covariance_semi_def
        (Parameters_covariance_functions.py:35-43): Sigma =
        diag(cat([free_par, pos_par])**2) with the FREE block first, so the
        corresponding diagonal entries are unconstrained and can reach 0."""
        k = K.Linear(active_dims=(0, 1, 2), offset=False, semi_def_dims=2)
        sd = np.array([0.7, -0.0, 1.5])  # free block stored raw, incl. 0
        p = k.init_params(sigma_diag=np.array([0.7, 1.0, 1.5]))
        p = {**p, "sigma_free_diag": jnp.asarray(sd[:2], jnp.float32)}
        X1, X2 = _rand(7, 4, 3), _rand(8, 5, 3)
        # reference formula: phi Sigma phi^T with Sigma = diag(cat(free,pos)^2)
        sigma = np.diag(np.concatenate([sd[:2], [1.5]]) ** 2)
        want = np.asarray(X1) @ sigma @ np.asarray(X2).T
        np.testing.assert_allclose(np.asarray(k.gram(p, X1, X2)), want, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(k.diag(p, X1)), np.diag(np.asarray(X1) @ sigma @ np.asarray(X1).T),
            rtol=1e-5,
        )
        # a zeroed free entry switches its feature off exactly
        assert np.allclose(
            np.asarray(k.gram(p, X1, X2)),
            np.asarray(X1)[:, [0, 2]] @ np.diag([0.7**2, 1.5**2]) @ np.asarray(X2)[:, [0, 2]].T,
            rtol=1e-5,
        )
        # trainable mask covers the free block; full_sigma combination refused
        assert k.param_mask(p)["sigma_free_diag"] is True
        with pytest.raises(ValueError):
            K.Linear(active_dims=(0,), full_sigma=True, semi_def_dims=1)

    def test_weight_posterior_recovers_linear_fn(self):
        # y = 2*x0 - 3*x1, no noise -> posterior weights converge to truth
        k = K.Linear(active_dims=(0, 1), offset=False)
        p = k.init_params(sigma_diag=np.array([10.0, 10.0]))
        X = _rand(5, 50, 2)
        w_true = jnp.array([2.0, -3.0])
        Y = X @ w_true
        w = k.weight_posterior(p, 1e-6, X, Y)
        np.testing.assert_allclose(np.asarray(w), [2.0, -3.0], rtol=1e-2)


class TestMPK:
    def test_degree1_equals_linear(self):
        mpk = K.MPK(active_dims=(0, 1), degree=1, offset=True)
        lin = K.Linear(active_dims=(0, 1), offset=True)
        pm = mpk.init_params(sigma_diag=np.array([[1.0, 2.0, 0.5]]))
        pl = lin.init_params(sigma_diag=np.array([1.0, 2.0, 0.5]))
        X = _rand(6, 5, 2)
        np.testing.assert_allclose(
            np.asarray(mpk.gram(pm, X, X)), np.asarray(lin.gram(pl, X, X)), rtol=1e-5
        )

    def test_degree2_is_product_of_linears(self):
        mpk = K.MPK(active_dims=(0, 1), degree=2, offset=False)
        sd = np.array([[1.0, 2.0], [0.5, 1.5]])
        pm = mpk.init_params(sigma_diag=sd)
        lin = K.Linear(active_dims=(0, 1), offset=False)
        X = _rand(7, 5, 2)
        g1 = lin.gram(lin.init_params(sigma_diag=sd[0]), X, X)
        g2 = lin.gram(lin.init_params(sigma_diag=sd[1]), X, X)
        np.testing.assert_allclose(
            np.asarray(mpk.gram(pm, X, X)), np.asarray(g1 * g2), rtol=1e-5
        )

    def test_diag_matches_gram(self):
        mpk = K.MPK(active_dims=(0, 1, 2), degree=2, offset=True)
        p = mpk.init_params()
        X = _rand(8, 6, 3)
        np.testing.assert_allclose(
            np.asarray(mpk.diag(p, X)), np.diag(np.asarray(mpk.gram(p, X, X))), rtol=1e-4
        )


class TestCombinators:
    def test_sum_and_product(self):
        k1 = K.SEArd(active_dims=(0, 1))
        k2 = K.Linear(active_dims=(0, 1), offset=True)
        ks, kp = K.Sum(members=(k1, k2)), K.Product(members=(k1, k2))
        ps, pp = ks.init_params(), kp.init_params()
        X = _rand(9, 5, 2)
        g1 = np.asarray(k1.gram(ps[0], X, X))
        g2 = np.asarray(k2.gram(ps[1], X, X))
        np.testing.assert_allclose(np.asarray(ks.gram(ps, X, X)), g1 + g2, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(kp.gram(pp, X, X)), g1 * g2, rtol=1e-5)

    def test_sum_mean_adds_all_members(self):
        # The reference returns only the first member's mean (GP_prior.py:306-312).
        k1 = K.SEArd(active_dims=(0,), train_mean=True)
        k2 = K.SEArd(active_dims=(0,), train_mean=True)
        ks = K.Sum(members=(k1, k2))
        p = ks.init_params(member_overrides=[{"mean": np.array(1.0)}, {"mean": np.array(2.0)}])
        X = _rand(10, 3, 1)
        np.testing.assert_allclose(np.asarray(ks.mean(p, X)), 3.0 * np.ones(3), rtol=1e-6)

    def test_volterra_structure(self):
        v = K.volterra_mpk(active_dims=tuple(range(6)), degree=2)
        assert len(v.members) == 2
        assert v.members[0].offset and v.members[0].degree == 1
        assert not v.members[1].offset and v.members[1].degree == 2
        p = v.init_params()
        # cartpole SE+P(2) shapes: deg1 has D+1 params, deg2 has 2*D
        assert p[0]["log_sigma_diag"].shape == (1, 7)
        assert p[1]["log_sigma_diag"].shape == (2, 6)

    def test_se_plus_volterra_psd(self):
        k = K.se_plus_volterra(active_dims=tuple(range(4)), degree=2)
        p = k.init_params()
        X = _rand(11, 20, 4)
        evals = np.linalg.eigvalsh(np.asarray(k.gram(p, X, X)))
        assert evals.min() > -1e-3

    def test_scaled_kernel(self):
        base = K.SEArd(active_dims=(0,))
        f_scale = lambda pos, free, Xa: pos[0] * jnp.sign(Xa[..., 0])
        sk = K.Scaled(base=base, f_scale=f_scale, active_dims_scale=(0,), n_pos_par=1)
        p = sk.init_params(pos_par=np.array([2.0]))
        X = jnp.array([[1.0], [-1.0]])
        g = np.asarray(sk.gram(p, X, X))
        gb = np.asarray(base.gram(p["base"], X, X))
        np.testing.assert_allclose(g, 4.0 * np.outer([1, -1], [1, -1]) * gb, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sk.diag(p, X)), 4.0 * np.diag(gb), rtol=1e-5)

    def test_scale_sign_functions(self):
        """The concrete indicator scalings (Scaling_functions.py:21-43)."""
        X = jnp.array([[1.0, 2.0], [-1.0, 2.0], [0.5, -0.1]])
        np.testing.assert_allclose(
            np.asarray(K.scale_sign(None, None, X)), [1.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(K.scale_sign(None, None, X, positive=False)), [0.0, 0.0, 0.0]
        )
        # offset via free_par shifts the comparison point
        np.testing.assert_allclose(
            np.asarray(K.scale_sign(None, jnp.array([-2.0, -2.0]), X)), [1.0, 1.0, 1.0]
        )
        np.testing.assert_allclose(
            np.asarray(K.scale_sign_abs(jnp.array([0.4, 0.4]), None, X)), [1.0, 1.0, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(K.scale_sign_abs(jnp.array([3.0, 3.0]), None, X, positive=False)),
            [1.0, 1.0, 1.0],
        )

    def test_scale_sign_in_scaled_kernel(self):
        """scale_sign plugged into Scaled zeroes covariance across the sign
        boundary — the Scale_GP_prior use case (GP_prior.py:404-515)."""
        from functools import partial

        base = K.SEArd(active_dims=(0,))
        sk = K.Scaled(base=base, f_scale=K.scale_sign, active_dims_scale=(0,))
        p = sk.init_params()
        X = jnp.array([[1.0], [0.5], [-1.0]])
        g = np.asarray(sk.gram(p, X, X))
        assert g[0, 1] > 0  # both positive: base covariance survives
        np.testing.assert_allclose(g[:, 2], 0.0)  # negative point decouples
        np.testing.assert_allclose(g[2, :], 0.0)


class TestJittability:
    def test_jit_and_vmap_over_heads(self):
        k = K.se_plus_volterra(active_dims=tuple(range(6)), degree=2)
        heads = [k.init_params() for _ in range(2)]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *heads)
        X = _rand(12, 10, 6)

        @jax.jit
        def run(params):
            return jax.vmap(lambda p: k.gram(p, X, X))(params)

        out = run(stacked)
        assert out.shape == (2, 10, 10)
        single = k.gram(heads[0], X, X)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), rtol=1e-5)

    def test_param_mask_structure_matches(self):
        k = K.se_plus_volterra(active_dims=tuple(range(6)), degree=2)
        p = k.init_params()
        m = k.param_mask(p)
        s1 = jax.tree_util.tree_structure(p)
        s2 = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda b: np.array(0.0), m,
                                   is_leaf=lambda v: isinstance(v, bool))
        )
        assert s1 == s2
