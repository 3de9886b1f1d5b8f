"""MultiGP: masked MLL against closed form, fit convergence, posterior math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu.models import kernels as K
from mcpilco_tpu.models.gp import GPData, MultiGP
from mcpilco_tpu.ops import linalg


def _make_dataset(key=0, n=40, d=3, g=2, cap=64, noise=0.05):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (n, d))
    f = jnp.stack(
        [jnp.sin(x[:, 0]) + 0.5 * x[:, 1], jnp.cos(x[:, 2]) - x[:, 0] * 0.3][:g]
    )
    y = f + noise * jax.random.normal(ks[1], (g, n))
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)])
    return (
        GPData(x=linalg.pad_axis(x, cap), y=linalg.pad_axis(y, cap, axis=1), mask=mask),
        x,
        y,
    )


def _ref_mll(Kmat, y):
    """Unmasked closed-form 0.5(y^T K^-1 y + log|K|)."""
    sign, logdet = np.linalg.slogdet(Kmat)
    return 0.5 * (y @ np.linalg.solve(Kmat, y) + logdet)


class TestMaskedMLL:
    def test_matches_unpadded_closed_form(self, x64):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2, jitter=1e-10)
        params = gp.init_params(sigma_n=0.3, dtype=jnp.float64)
        data, x, y = _make_dataset()
        data = GPData(
            x=data.x.astype(jnp.float64), y=data.y.astype(jnp.float64), mask=data.mask.astype(jnp.float64)
        )
        got = float(gp.mll(params, data))

        kp = jax.tree_util.tree_map(lambda v: np.asarray(v[0], np.float64), params.kernel)
        Kmat = np.asarray(gp.kernel.gram(kp, x.astype(jnp.float64), x.astype(jnp.float64)))
        Kmat = Kmat + (0.09 + 1e-10) * np.eye(len(x))
        want = sum(_ref_mll(Kmat, np.asarray(y[i], np.float64)) for i in range(2))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_padding_invariance(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        params = gp.init_params(sigma_n=0.3)
        d64, _, _ = _make_dataset(cap=64)
        d128, _, _ = _make_dataset(cap=128)
        np.testing.assert_allclose(
            float(gp.mll(params, d64)), float(gp.mll(params, d128)), rtol=1e-5
        )


class TestFit:
    def test_loss_decreases_all_heads(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        params = gp.init_params(sigma_n=1.0)
        data, _, _ = _make_dataset()
        new_params, losses = jax.jit(
            lambda p: gp.fit(p, data, num_epochs=200, learning_rate=0.05)
        )(params)
        assert float(losses[-1]) < float(losses[0]) - 1.0
        # noise std should shrink toward the true 0.05
        assert float(jnp.exp(new_params.log_sigma_n).max()) < 0.5

    def test_nan_guard_backtracks_instead_of_freezing(self):
        """A non-finite step must be reverted and retried smaller — the old
        guard kept the FIRST BAD iterate, so every remaining epoch
        re-evaluated the same NaN and the fit silently stopped (the MuJoCo
        shallow-MLL failure signature).  Fault-inject one NaN update mid-fit
        and require convergence to continue past it."""
        import optax

        def spike_at(step_idx, size, inner):
            """Add a huge finite update at one step — the iterate lands past
            an exp-overflow cliff where the NEXT loss is NaN, exactly the
            f32 Cholesky cliff shape.  On backtrack the optimizer state
            (incl. this counter) reverts, so the spike replays at the halved
            scale and decays away, like a real cliff shrinking under
            backtracking."""

            def init(params):
                return (jnp.zeros((), jnp.int32), inner.init(params))

            def update(updates, state, params=None):
                count, istate = state
                upd, istate = inner.update(updates, istate, params)
                upd = jax.tree_util.tree_map(
                    lambda u: jnp.where(count == step_idx, u + size, u), upd
                )
                return upd, (count + 1, istate)

            return optax.GradientTransformation(init, update)

        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        params = gp.init_params(sigma_n=1.0)
        data, _, _ = _make_dataset()
        new_params, losses = gp.fit(
            params, data, num_epochs=300,
            optimizer=spike_at(10, 80.0, optax.adam(0.05)),
        )
        leaves = jax.tree_util.tree_leaves(new_params)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        # Old guard: the spiked iterate is accepted (its PREVIOUS loss was
        # finite), the next epoch's loss is NaN, and the scan freezes there —
        # returned params sit past the cliff (their MLL evaluates NaN) and the
        # loss history flatlines.  New guard: backtracks, accepts a reduced
        # step, and keeps descending to the end.
        final_mll = float(gp.mll(new_params, data, gp.output_norms(data)))
        assert np.isfinite(final_mll)
        assert float(losses[-1]) < float(losses[-100]) - 1.0

    def test_frozen_params_stay_fixed(self):
        kern = K.SEArd(active_dims=(0, 1, 2), train_outputscale=False)
        gp = MultiGP(kernel=kern, num_heads=2)
        params = gp.init_params(sigma_n=1.0)
        data, _, _ = _make_dataset()
        new_params, _ = gp.fit(params, data, num_epochs=50, learning_rate=0.05)
        np.testing.assert_array_equal(
            np.asarray(new_params.kernel["log_lambda"]), np.asarray(params.kernel["log_lambda"])
        )
        assert not np.allclose(
            np.asarray(new_params.kernel["log_lengthscales"]),
            np.asarray(params.kernel["log_lengthscales"]),
        )


class TestPosteriorPredict:
    def test_interpolates_training_data(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        params = gp.init_params(sigma_n=1.0)
        data, x, y = _make_dataset(noise=0.01)
        params, _ = gp.fit(params, data, num_epochs=400, learning_rate=0.05)
        post = gp.fit_posterior(params, data)
        mean, var = gp.predict(params, post, x)
        mse = float(jnp.mean((mean - y) ** 2))
        assert mse < 5e-3
        assert float(var.min()) >= 0.0

    def test_posterior_variance_shrinks_near_data(self):
        gp = MultiGP(kernel=K.SEArd(active_dims=(0,)), num_heads=1)
        params = gp.init_params(sigma_n=0.1)
        n, cap = 20, 32
        x = jnp.linspace(-2, 2, n)[:, None]
        y = jnp.sin(x[:, 0])[None, :]
        data = GPData(
            x=linalg.pad_axis(x, cap),
            y=linalg.pad_axis(y, cap, axis=1),
            mask=jnp.concatenate([jnp.ones(n), jnp.zeros(cap - n)]),
        )
        post = gp.fit_posterior(params, data)
        _, var_at_data = gp.predict(params, post, x)
        _, var_far = gp.predict(params, post, jnp.array([[10.0]]))
        assert float(var_at_data.mean()) < float(var_far[0, 0])

    def test_normalization_consistency(self):
        """Predictions with normalize_outputs must match unnormalized ones."""
        data, x, y = _make_dataset(noise=0.01)
        big = GPData(x=data.x, y=data.y * 1000.0, mask=data.mask)
        gp_n = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2, normalize_outputs=True)
        params = gp_n.init_params(sigma_n=0.05)
        post = gp_n.fit_posterior(params, big)
        mean_n, var_n = gp_n.predict(params, post, x)
        # normalized-fit posterior should still interpolate the scaled data
        assert float(jnp.mean((mean_n - 1000 * y) ** 2) / 1e6) < 1e-2
        assert float(var_n.min()) >= 0.0

    def test_predict_batch_shapes(self):
        gp = MultiGP(kernel=K.se_plus_volterra(active_dims=tuple(range(3)), degree=2), num_heads=2)
        params = gp.init_params()
        data, _, _ = _make_dataset()
        post = gp.fit_posterior(params, data)
        xs = jax.random.normal(jax.random.PRNGKey(5), (400, 3))
        mean, var = jax.jit(lambda s: gp.predict(params, post, s))(xs)
        assert mean.shape == (2, 400) and var.shape == (2, 400)

    def test_gram_chunk_matches_unchunked(self):
        """gram_chunk bounds the [P, chunk, D] VMEM intermediate; values and
        BPTT gradients must match the unchunked path exactly (same math
        at the same precision, but chunked dots contract in a different
        order, so agreement is to f32 reduction-reorder tolerance), including
        a chunk size that does not divide the padded capacity (the dividing
        case is a strict subset of the same code path, so only the
        non-dividing chunk is compiled — this test is compile-dominated)."""
        import dataclasses

        data, x, y = _make_dataset()  # n=40 live rows, cap=64
        gp = MultiGP(kernel=K.se_plus_volterra(active_dims=tuple(range(3)), degree=2), num_heads=2)
        params = gp.init_params(sigma_n=0.2)
        post = gp.fit_posterior(params, data)
        xs = jax.random.normal(jax.random.PRNGKey(5), (37, 3))
        mean0, var0 = gp.predict(params, post, xs)
        g0 = jax.grad(lambda s: jnp.sum(gp.predict(params, post, s)[0]))(xs)
        for chunk in (24,):  # 24 does not divide cap=64 -> exercises padding
            gpc = dataclasses.replace(gp, gram_chunk=chunk)
            mean1, var1 = gpc.predict(params, post, xs)
            g1 = jax.grad(lambda s: jnp.sum(gpc.predict(params, post, s)[0]))(xs)
            np.testing.assert_allclose(np.asarray(mean0), np.asarray(mean1), rtol=2e-5, atol=1e-5)
            # var = diag - quad is a cancelling difference: reduction
            # reordering amplifies the relative error (~1e-4 observed)
            np.testing.assert_allclose(np.asarray(var0), np.asarray(var1), rtol=5e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5)

    def test_posterior_log_likelihood(self):
        """Diagonal-Gaussian posterior NLL (Gaussian_likelihood.py:27-37):
        matches the hand-computed value and is minimized at y_hat = y."""
        from mcpilco_tpu.models.gp import posterior_log_likelihood

        y = jnp.array([1.0, 2.0, -1.0])
        y_hat = jnp.array([0.5, 2.0, -2.0])
        var = jnp.array([0.25, 1.0, 4.0])
        expected = np.sum((np.asarray(y - y_hat)) ** 2 / (2 * np.asarray(var))) + 0.5 * np.sum(
            np.log(np.asarray(var))
        )
        np.testing.assert_allclose(float(posterior_log_likelihood(y, y_hat, var)), expected, rtol=1e-6)
        assert float(posterior_log_likelihood(y, y, var)) < float(
            posterior_log_likelihood(y, y_hat, var)
        )

    def test_grad_flows_through_predict(self):
        """d(prediction)/d(x_star) must exist — BPTT through rollouts needs it."""
        gp = MultiGP(kernel=K.SEArd(active_dims=(0, 1, 2)), num_heads=2)
        params = gp.init_params()
        data, _, _ = _make_dataset()
        post = gp.fit_posterior(params, data)

        def f(xs):
            mean, var = gp.predict(params, post, xs[None, :])
            return jnp.sum(mean) + jnp.sum(var)

        g = jax.grad(f)(jnp.ones(3))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0
