"""Stacked multi-head exact GP regression for TPU.

The reference keeps ``num_gp`` independent torch GP objects in a ModuleList
and trains / queries them in Python loops (model_learning/Model_learning.py:
100-105, 157-161, 277-289).  Here all heads share one kernel *structure*; their
hyperparameters are stacked under a leading head axis ``G`` and every
operation — MLL training epoch, posterior build, prediction — is ``vmap``-ed
over that axis, so a single XLA program does the work of all heads at once.

Datasets are padded to bucketed capacity with a validity mask (see
ops/linalg.py) so the per-trial dataset growth of MC-PILCO almost never
re-compiles.

Math parity (citations into /root/reference):
- MLL loss = 0.5 (y^T K^-1 y + log|K|), the N log 2pi constant dropped, same
  as Likelihood/Gaussian_likelihood.py:12-24.
- Posterior cache {alpha, K^-1, m_X, X_tr} and the mean/variance formulas
  follow GP_prior.py:130-155:  mean = m* + K*^T alpha,
  var = k**_diag - sum((K* K^-1) ∘ K*, -1).
- Per-head output max-abs normalization is the ``flg_norm`` analog
  (Model_learning.py:406-409), applied *consistently* to both hyperparameter
  training and the posterior cache (the reference only normalizes during
  hyperparameter training), which is essential for f32/TPU numerics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops import linalg
from .kernels import Kernel

# A/B switch for the posterior variance operator (round-3 bisect of the
# round-2 behavioral shift).  Default (False): store the factor F = L^-T and
# compute quad = sum((k F)^2) — the round-2 form.  Legacy (True): store
# K^-1 = chol_inverse(L) and compute quad = sum((k K^-1) * k) — the round-1
# form, matching the reference's cached-K^-1 algebra (GP_prior.py:137-155)
# bit-pattern-for-bit-pattern.  The two are mathematically identical; only
# float rounding differs.  Set MCPILCO_LEGACY_VAR=1 (or call
# use_legacy_variance_op()) at process start, before any trace.
import os as _os

_LEGACY_VAR = _os.environ.get("MCPILCO_LEGACY_VAR", "0") == "1"


def use_legacy_variance_op(enable: bool = True) -> None:
    global _LEGACY_VAR
    _LEGACY_VAR = enable


def posterior_log_likelihood(y, y_hat, var):
    """Diagonal-Gaussian posterior negative log-likelihood: each sample
    treated as independent Gaussian with predicted mean/variance
    (gpr_lib/Likelihood/Gaussian_likelihood.py:27-37; constants dropped,
    matching the reference).  Usable as an alternative GP training loss on
    held-out predictions."""
    return jnp.sum((y - y_hat) ** 2 / (2.0 * var) + 0.5 * jnp.log(var))


class GPData(NamedTuple):
    """Padded training set shared across heads.

    x: [N_cap, D] inputs; y: [G, N_cap] per-head targets; mask: [N_cap].
    """

    x: jax.Array
    y: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.x.shape[0]


class Posterior(NamedTuple):
    """Cached posterior for fast rollout-time prediction.

    ``x_tr`` is [M, D] when all heads share the same training inputs (the
    usual case — per-head subsets are expressed via per-head ``mask``), or
    [G, M, D] for genuinely distinct per-head inputs.  Keeping x_tr shared
    lets XLA hoist the head-independent pairwise-difference tensor out of
    the vmapped Gram in the rollout hot loop (~25% faster predict).
    ``norm`` rescales the normalized-target posterior back to output units.

    ``var_factor`` is the variance-operator FACTOR F: the predictive quad
    term is ``sum((k* @ F)^2, -1)``.  Exact path: F = L^-T (K^-1 = F F^T,
    reference caches K^-1 itself — GP_prior.py:137-155); SOR path:
    F = chol-factor of Sigma.  Factored form halves the hot matmul of the
    rollout (one P x M x M contraction instead of two) and the squared sum
    is cancellation-free.
    """

    x_tr: jax.Array  # [M, D] (shared) or [G, M, D]
    mask: jax.Array  # [G, M]
    alpha: jax.Array  # [G, M]
    var_factor: jax.Array  # [G, M, M]
    norm: jax.Array  # [G]


class GPParams(NamedTuple):
    kernel: object  # pytree, leading axis G on every leaf
    log_sigma_n: jax.Array  # [G]


@dataclasses.dataclass(frozen=True)
class MultiGP:
    """Static config for a stack of ``num_heads`` GPs with a shared kernel
    structure and per-head measurement noise (GP_prior.py:59-67)."""

    kernel: Kernel
    num_heads: int
    # inference mode: 'exact' (incl. SOD subsets) or 'sor'
    approx: str = "exact"
    # Fuse the rollout-time posterior prediction (gram + both contractions)
    # into one Pallas kernel (ops/fused_predict.py).  Only takes effect for
    # the SEArd / Sum(SEArd, MPK, MPK) kernel structures with a shared x_tr;
    # everything else silently uses the XLA path.
    use_pallas: bool = False
    # Relative diagonal jitter: the TPU's blocked f32 Cholesky needs ~1e-5 at
    # N~64 and ~1e-4 at N~384 to survive 1500 MLL epochs on near-noiseless
    # SE+P(2) fits (roundoff grows with N); 1e-4 costs no measurable accuracy
    # (one-step MSE unchanged in bench).  CPU f64 golden tests can lower it.
    jitter: float = 1e-4
    train_sigma_n: bool = True
    normalize_outputs: bool = False
    # Compute the rollout-time cross-gram k(x*, X) in chunks of this many
    # training points.  The gram's [P, chunk, D] difference intermediate is
    # the dominant VMEM tensor of the particle rollout; bounding it lets
    # configurations whose full [P, M, D] tensor exceeds VMEM (large farm
    # batches, big datasets) avoid the spill-to-HBM cliff measured at farm
    # batch 8 (RESULTS.md).  None = unchunked (optimal at flagship sizes).
    gram_chunk: Optional[int] = None

    # ---------------- parameter init ----------------

    def init_params(self, sigma_n=1.0, per_head_overrides=None, dtype=jnp.float32) -> GPParams:
        """Stack per-head kernel params. ``per_head_overrides`` is an optional
        list (len num_heads) of kwargs for ``kernel.init_params``."""
        ov = per_head_overrides or [{}] * self.num_heads
        per_head = [self.kernel.init_params(dtype=dtype, **o) for o in ov]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_head)
        sn = jnp.asarray(sigma_n, dtype) * jnp.ones(self.num_heads, dtype)
        return GPParams(kernel=stacked, log_sigma_n=jnp.log(sn))

    def param_mask(self, params: GPParams) -> GPParams:
        one_head = jax.tree_util.tree_map(lambda x: x[0], params.kernel)
        return GPParams(
            kernel=self.kernel.param_mask(one_head),
            log_sigma_n=self.train_sigma_n,
        )

    # ---------------- core math (single head) ----------------

    def _noise_var(self, log_sigma_n):
        return jnp.exp(2.0 * log_sigma_n) + self.jitter

    def _noisy_gram(self, kparams, log_sigma_n, x, mask):
        """K(x,x) + (sigma_n^2 + jitter) I with scale-adaptive jitter —
        f32 Cholesky on TPU needs the diagonal boost to track the Gram
        magnitude (the ``sigma_n_num`` analog, GP_prior.py:64-67)."""
        K = self.kernel.gram(kparams, x, x)
        jit = linalg.adaptive_jitter(K, mask, rel=self.jitter, floor=self.jitter)
        noise = jnp.exp(2.0 * log_sigma_n) + jit
        return K + noise * jnp.eye(x.shape[0], dtype=x.dtype)

    def _mll_head(self, kparams, log_sigma_n, x, y, mask):
        """Negative MLL of one head on masked data."""
        K = self._noisy_gram(kparams, log_sigma_n, x, mask)
        L = linalg.masked_cholesky(K, mask)
        resid = (y - self.kernel.mean(kparams, x)) * mask
        alpha = linalg.chol_solve(L, resid[:, None])[:, 0]
        logdet = linalg.masked_logdet_from_chol(L, mask)
        return 0.5 * (jnp.dot(resid, alpha) + logdet)

    def _posterior_head(self, kparams, log_sigma_n, x, y, mask, norm):
        K = self._noisy_gram(kparams, log_sigma_n, x, mask)
        L = linalg.masked_cholesky(K, mask)
        resid = (y / norm - self.kernel.mean(kparams, x)) * mask
        alpha = linalg.chol_solve(L, resid[:, None])[:, 0]
        if _LEGACY_VAR:
            op = linalg.chol_inverse(L)  # K^-1 (round-1 / reference form)
        else:
            # variance factor F = L^-T: K^-1 = F F^T (see Posterior.var_factor)
            eye = jnp.eye(L.shape[-1], dtype=L.dtype)
            op = jax.scipy.linalg.solve_triangular(L, eye, lower=True).T
        op = op * (mask[:, None] * mask[None, :])
        return alpha * mask, op

    def _cross_gram(self, kparams, x_star, x_tr, mask):
        """k(x*, X) * mask, optionally computed in ``gram_chunk``-sized
        column blocks via a sequential lax.map so the [P, chunk, D]
        difference intermediate (not [P, M, D]) bounds the working set."""
        c = self.gram_chunk
        M = x_tr.shape[0]
        if c is None or M <= c or x_star.ndim != 2:
            return self.kernel.gram(kparams, x_star, x_tr) * mask
        pad = (-M) % c
        if pad:
            x_tr = jnp.concatenate(
                [x_tr, jnp.zeros((pad,) + x_tr.shape[1:], x_tr.dtype)]
            )
            mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
        xc = x_tr.reshape(-1, c, x_tr.shape[-1])
        mc = mask.reshape(-1, c)
        ks = jax.lax.map(
            lambda arg: self.kernel.gram(kparams, x_star, arg[0]) * arg[1], (xc, mc)
        )  # [n_chunks, P, c]
        return jnp.moveaxis(ks, 0, 1).reshape(x_star.shape[0], -1)[:, :M]

    def _predict_head(self, kparams, x_tr, mask, alpha, var_factor, norm, x_star):
        # HIGHEST precision is load-bearing: the variance is a difference of
        # nearly-equal terms, and the TPU's default bf16 matmuls corrupt it
        # enough to drown the rollout in spurious sampling noise.
        hp = jax.lax.Precision.HIGHEST
        k_star = self._cross_gram(kparams, x_star, x_tr, mask)  # [P, M]
        mean = self.kernel.mean(kparams, x_star) + jnp.matmul(k_star, alpha, precision=hp)
        if _LEGACY_VAR:
            quad = jnp.sum(jnp.matmul(k_star, var_factor, precision=hp) * k_star, axis=-1)
        else:
            kf = jnp.matmul(k_star, var_factor, precision=hp)
            quad = jnp.sum(kf * kf, axis=-1)
        diag = self.kernel.diag(kparams, x_star)
        var = diag - quad
        # Floor at jitter * prior-diag instead of 0: near-interpolation the
        # true variance is ~0 and d(sqrt(var))/d(var) = 1/(2 sd) would amplify
        # f32 roundoff in var's backward by ~1/(2e-6) — measured to corrupt
        # BPTT policy gradients by 2-3 orders of magnitude on TPU.  A floor of
        # jitter*diag (the resolution limit of the factorization anyway) caps
        # the amplification at ~1/(2 sqrt(jitter)).
        var = jnp.maximum(var, self.jitter * diag)
        return mean * norm, var * norm * norm

    # ---------------- public stacked API ----------------

    def mll(self, params: GPParams, data: GPData, norm: Optional[jax.Array] = None) -> jax.Array:
        """Sum over heads of the negative marginal log-likelihood."""
        if norm is None:
            norm = jnp.ones(self.num_heads, data.x.dtype)
        losses = jax.vmap(
            lambda kp, lsn, y, nm: self._mll_head(kp, lsn, data.x, y / nm, data.mask)
        )(params.kernel, params.log_sigma_n, data.y, norm)
        return jnp.sum(losses)

    def output_norms(self, data: GPData) -> jax.Array:
        """Per-head max-abs output normalizers (Model_learning.py:406-409)."""
        if not self.normalize_outputs:
            return jnp.ones(self.num_heads, data.x.dtype)
        m = jnp.max(jnp.abs(data.y) * data.mask[None, :], axis=-1)
        return jnp.maximum(m, jnp.finfo(data.x.dtype).tiny)

    def fit(
        self,
        params: GPParams,
        data: GPData,
        num_epochs: int,
        learning_rate: float = 0.01,
        optimizer: Optional[optax.GradientTransformation] = None,
        unroll: int = 1,
    ):
        """Train hyperparameters of all heads jointly: one jitted
        ``lax.scan`` of full-batch Adam MLL steps (the reference loops
        N_epoch x num_gp torch steps — GP_prior.py:179-230).

        Returns (params, loss_history [num_epochs]).
        """
        norm = self.output_norms(data)
        opt = optimizer or optax.adam(learning_rate)
        mask_tree = self.param_mask(params)
        # Broadcast boolean mask over stacked leaves.
        label = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask_tree,
            is_leaf=lambda v: isinstance(v, bool),
        )
        tx = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, param_labels=label
        )
        opt_state = tx.init(params)

        def loss_fn(p):
            return self.mll(p, data, norm)

        # Backtracking NaN guard.  If the f32 Cholesky tips over at the new
        # iterate, the guard must NOT keep those params: freezing at the
        # first-bad point re-evaluates the same non-finite loss every
        # remaining epoch and the fit silently stops (observed on MuJoCo
        # cartpole: trial-0 MLL stuck at -15 instead of -170, cascading into
        # policy-opt NaN-reinit storms).  Instead revert to the last iterate
        # whose loss evaluated finite, halve the step scale, and keep going —
        # the scale recovers ~1.4%/finite epoch, so a single cliff costs ~50
        # shortened epochs, and a healthy fit (scale pinned at 1.0, updates
        # multiplied by exactly 1.0) is bit-identical to the unguarded scan.
        f32 = data.x.dtype
        recover = jnp.asarray(2.0 ** (1.0 / 50.0), f32)

        def step(carry, _):
            p, s, good_p, good_s, lr_scale, last_loss = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s_new = tx.update(g, s, p)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            p_new = optax.apply_updates(p, updates)
            # "good" needs loss AND updates finite: a cliff iterate can have a
            # finite loss with a NaN gradient (plateau past an exp overflow) —
            # accepting it as last-good would pin the backtrack loop there.
            finite = jnp.isfinite(loss) & jnp.all(
                jnp.stack([jnp.all(jnp.isfinite(u))
                           for u in jax.tree_util.tree_leaves(updates)])
            )
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            # finite: advance, current iterate becomes last-good.  non-finite:
            # backtrack params AND optimizer state to last-good, halve scale.
            carry_new = (
                sel(p_new, good_p), sel(s_new, good_s), sel(p, good_p), sel(s, good_s),
                jnp.where(finite, jnp.minimum(jnp.asarray(1.0, f32), lr_scale * recover),
                          lr_scale * 0.5),
                jnp.where(finite, loss, last_loss),
            )
            return carry_new, carry_new[-1]

        (params, _, _, _, _, _), losses = jax.lax.scan(
            step,
            (params, opt_state, params, opt_state, jnp.asarray(1.0, f32),
             jnp.asarray(jnp.inf, f32)),
            None, length=num_epochs, unroll=unroll,
        )
        return params, losses

    def posterior(self, params: GPParams, x_tr, mask, y) -> Posterior:
        """Build the cached posterior (the ``pretrain_gp`` analog,
        Model_learning.py:163-208).  ``x_tr``: [M, D] (shared across heads)
        or [G, M, D]; ``mask``: [G, M]; ``y``: [G, M]."""
        norm = (
            jnp.maximum(jnp.max(jnp.abs(y) * mask, axis=-1), jnp.finfo(y.dtype).tiny)
            if self.normalize_outputs
            else jnp.ones(self.num_heads, y.dtype)
        )
        x_axis = None if x_tr.ndim == 2 else 0
        alpha, var_factor = jax.vmap(self._posterior_head, in_axes=(0, 0, x_axis, 0, 0, 0))(
            params.kernel, params.log_sigma_n, x_tr, y, mask, norm
        )
        return Posterior(x_tr=x_tr, mask=mask, alpha=alpha, var_factor=var_factor, norm=norm)

    def predict(self, params: GPParams, post: Posterior, x_star: jax.Array):
        """Posterior mean/variance at ``x_star`` [..., D] for all heads.

        Returns (mean, var) of shape [G, ...]; the hot op of the particle
        rollout (reference MC_PILCO.py:662-671 -> GP_prior.py:137-155).
        """
        if self.approx == "sor":
            return self.sor_predict(params, post, x_star)
        if self.use_pallas and post.x_tr.ndim == 2:
            fused = self._predict_fused(params, post, x_star)
            if fused is not None:
                return fused
        # Broadcast shared x_tr to the head axis: the per-head VPU reduce in
        # the Gram is measurably faster in-scan than the K=D matmul the
        # unbatched form lowers to on the MXU.
        x_tr = post.x_tr
        if x_tr.ndim == 2:
            x_tr = jnp.broadcast_to(x_tr, (self.num_heads,) + x_tr.shape)
        return jax.vmap(
            lambda kp, xt, m, a, ki, nm: self._predict_head(kp, xt, m, a, ki, nm, x_star)
        )(params.kernel, x_tr, post.mask, post.alpha, post.var_factor, post.norm)

    def _fused_structure(self):
        """Returns ('se' | 'se+p2' | None) if the kernel matches a fused
        Pallas predict structure (full active_dims, identity order)."""
        from . import kernels as _k

        def full_dims(kk, d_expect=None):
            return kk.active_dims is not None and list(kk.active_dims) == list(
                range(len(kk.active_dims))
            )

        k = self.kernel
        if isinstance(k, _k.SEArd) and full_dims(k):
            return "se"
        if (
            isinstance(k, _k.Sum)
            and len(k.members) == 3
            and isinstance(k.members[0], _k.SEArd)
            and isinstance(k.members[1], _k.MPK)
            and isinstance(k.members[2], _k.MPK)
            and k.members[1].degree == 1
            and k.members[1].offset
            and k.members[2].degree == 2
            and not k.members[2].offset
            and all(full_dims(m) for m in k.members)
        ):
            return "se+p2"
        return None

    def _predict_fused(self, params: GPParams, post: Posterior, x_star):
        structure = self._fused_structure()
        if structure is None or x_star.ndim != 2 or _LEGACY_VAR:
            # the Pallas kernel consumes the FACTOR form of var_factor
            return None
        from ..ops import fused_predict as fp

        kp = params.kernel
        if structure == "se":
            se = kp
            d = se["log_lengthscales"].shape[-1]
            poly1 = jnp.zeros((self.num_heads, d + 1), x_star.dtype)
            poly2a = jnp.zeros((self.num_heads, d), x_star.dtype)
            poly2b = jnp.zeros((self.num_heads, d), x_star.dtype)
            use_poly = False
        else:
            se = kp[0]
            poly1 = jnp.exp(2.0 * kp[1]["log_sigma_diag"][:, 0, :])
            poly2a = jnp.exp(2.0 * kp[2]["log_sigma_diag"][:, 0, :])
            poly2b = jnp.exp(2.0 * kp[2]["log_sigma_diag"][:, 1, :])
            use_poly = True
        se_w = jnp.exp(-2.0 * se["log_lengthscales"])
        se_lam = jnp.exp(se["log_lambda"]).reshape(self.num_heads)
        interpret = jax.default_backend() != "tpu"
        kalpha, quad = fp.gram_contract(
            se_w, se_lam, poly1, poly2a, poly2b, x_star, post.x_tr,
            post.alpha, post.var_factor, post.mask, use_poly, interpret,
        )
        mean_prior = jax.vmap(lambda p: self.kernel.mean(p, x_star))(params.kernel)
        diag = jax.vmap(lambda p: self.kernel.diag(p, x_star))(params.kernel)
        mean = mean_prior + kalpha
        var = jnp.maximum(diag - quad, self.jitter * diag)
        return mean * post.norm[:, None], var * (post.norm**2)[:, None]

    def fit_posterior(self, params: GPParams, data: GPData) -> Posterior:
        """Posterior over the full (shared) dataset — exact inference path."""
        mask = jnp.broadcast_to(data.mask, (self.num_heads,) + data.mask.shape)
        return self.posterior(params, data.x, mask, data.y)

    # ---------------- Subset-of-Regressors approximation ----------------
    # SOR replaces k(x,x') by k(x,U) K_UU^-1 k(U,x') for an inducing set U
    # (gpr_lib/GP_prior/Sparse_GP.py:33-232).  The posterior cache reuses the
    # Posterior tuple with x_tr = U (padded by a selection mask), alpha = the
    # SOR coefficients, and var_factor = the Cholesky-style factor of Sigma,
    #     Sigma = (K_UU + sigma_n^-2 K_UX K_XU)^-1        (:112-145)
    #     mean* = m* + k(*,U) alpha
    #     var*  = sum((k(*,U) F)^2),  Sigma = F F^T       (:147-169)
    # Unlike the exact path the SOR variance is the quad term itself (no
    # diag - quad), so SOR keeps its own small predict path.
    #
    # Inducing inputs can be (a) a masked subset of the training data
    # (``u=None``, ``sel`` marks rows of data.x — the reference's
    # set_inducing_inputs_from_data, :79-102) or (b) a free per-head array
    # ``u`` [G, M, D] with validity mask ``sel`` [G, M], optionally TRAINED
    # against the Nystrom MLL (the flg_train_inducing_inputs option, :68-77).

    def _sor_posterior_head(self, kparams, log_sigma_n, x, y, mask, u, u_mask, norm):
        """One head: x/y/mask = full padded data; u/u_mask = inducing set."""
        noise = self._noise_var(log_sigma_n)
        K_uu = self.kernel.gram(kparams, u, u)
        K_xu = self.kernel.gram(kparams, x, u) * (mask[:, None] * u_mask[None, :])
        hp = jax.lax.Precision.HIGHEST
        sigma_inv = K_uu * (u_mask[:, None] * u_mask[None, :]) + (1.0 / noise) * jnp.matmul(
            K_xu.T, K_xu, precision=hp
        )
        # jitter must track sigma_inv's own scale (~ sigma_n^-2 N k^2), which
        # dwarfs K_uu's; the kernel matrix itself is usually near-singular
        jit = linalg.adaptive_jitter(sigma_inv, u_mask, rel=self.jitter, floor=self.jitter)
        sigma_inv = sigma_inv + jit * jnp.diag(u_mask)
        L = linalg.masked_cholesky(sigma_inv, u_mask)
        if _LEGACY_VAR:
            f = linalg.chol_inverse(L)  # Sigma itself (round-1 form)
        else:
            # factor of Sigma: Sigma = F F^T with F = L^-T (see Posterior)
            eye = jnp.eye(L.shape[-1], dtype=L.dtype)
            f = jax.scipy.linalg.solve_triangular(L, eye, lower=True).T
        f = f * (u_mask[:, None] * u_mask[None, :])
        resid = (y / norm - self.kernel.mean(kparams, x)) * mask
        alpha = (1.0 / noise) * linalg.chol_solve(
            L, jnp.matmul(K_xu.T, resid, precision=hp)[:, None]
        )[:, 0]
        return alpha * u_mask, f

    def sor_posterior(
        self, params: GPParams, data: GPData, sel: jax.Array, u: Optional[jax.Array] = None
    ) -> Posterior:
        """Build the SOR posterior.  ``sel`` [G, M] marks valid inducing
        rows; ``u`` [G, M, D] overrides the inducing inputs (default: rows
        of ``data.x``, M = N)."""
        norm = self.output_norms(data)
        u_axis = 0 if u is not None else None
        u_arr = u if u is not None else data.x
        alpha, factor = jax.vmap(
            lambda kp, lsn, yy, uu, ss, nm: self._sor_posterior_head(
                kp, lsn, data.x, yy, data.mask, uu, ss, nm
            ),
            in_axes=(0, 0, 0, u_axis, 0, 0),
        )(params.kernel, params.log_sigma_n, data.y, u_arr, sel, norm)
        return Posterior(
            x_tr=u if u is not None else data.x, mask=sel, alpha=alpha,
            var_factor=factor, norm=norm,
        )

    def _sor_mll_head(self, kparams, log_sigma_n, x, y, mask, u, u_mask, norm):
        """Negative Nystrom marginal log-likelihood of one head:
        K_sor = K_XU K_UU^-1 K_UX + s2 I, evaluated in whitened form without
        ever forming the N x N matrix (the corrected ``SOR_forward``,
        Sparse_GP.py:196-232 — the reference's version crashes on an
        undefined ``U_Sigma`` at :226, and its -log|K_UU| + log|Sigma^-1|
        difference of two huge logdets is numerically fragile anyway).

        With B = L_UU^-1 K_UX (K_UU = L L^T) and A = I + B B^T / s2:

            log|K_sor|     = N log s2 + log|A|          (Sylvester)
            y^T K_sor^-1 y = |y|^2/s2 - (By)^T A^-1 (By) / s2^2   (Woodbury)

        A has unit diagonal on masked rows and condition ~ 1 + |B|^2/s2, so
        a single well-posed Cholesky replaces two ill-posed ones.
        """
        noise = self._noise_var(log_sigma_n)
        hp = jax.lax.Precision.HIGHEST
        m = u.shape[0]
        K_uu = self.kernel.gram(kparams, u, u)
        jit = linalg.adaptive_jitter(K_uu, u_mask, rel=self.jitter, floor=self.jitter)
        K_uu = K_uu + jit * jnp.eye(m, dtype=u.dtype)
        L_uu = linalg.masked_cholesky(K_uu, u_mask)

        K_xu = self.kernel.gram(kparams, x, u) * (mask[:, None] * u_mask[None, :])
        B = jax.scipy.linalg.solve_triangular(L_uu, K_xu.T, lower=True)  # [M, N]
        A = jnp.eye(m, dtype=u.dtype) + jnp.matmul(B, B.T, precision=hp) / noise
        L_a = jnp.linalg.cholesky(A)
        logdet_a = linalg.masked_logdet_from_chol(L_a, u_mask)

        resid = (y / norm - self.kernel.mean(kparams, x)) * mask
        b = jnp.matmul(B, resid, precision=hp)
        w = linalg.chol_solve(L_a, b[:, None])[:, 0]
        quad = jnp.dot(resid, resid) / noise - jnp.dot(b, w) / (noise * noise)
        n_valid = jnp.sum(mask)
        logdet = n_valid * jnp.log(noise) + logdet_a
        return 0.5 * (quad + logdet)

    def sor_mll(
        self,
        params: GPParams,
        data: GPData,
        sel: jax.Array,
        u: Optional[jax.Array] = None,
        norm: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Sum over heads of the negative SOR (Nystrom) MLL.  Converges to
        :meth:`mll` when the inducing set is the full dataset (sel = mask)."""
        if norm is None:
            norm = self.output_norms(data)
        u_axis = 0 if u is not None else None
        u_arr = u if u is not None else data.x
        losses = jax.vmap(
            lambda kp, lsn, yy, uu, ss, nm: self._sor_mll_head(
                kp, lsn, data.x, yy, data.mask, uu, ss, nm
            ),
            in_axes=(0, 0, 0, u_axis, 0, 0),
        )(params.kernel, params.log_sigma_n, data.y, u_arr, sel, norm)
        return jnp.sum(losses)

    def fit_sor(
        self,
        params: GPParams,
        data: GPData,
        sel: jax.Array,
        num_epochs: int,
        learning_rate: float = 0.01,
        train_inducing: bool = False,
        u: Optional[jax.Array] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
    ):
        """Train hyperparameters (and optionally the inducing inputs) against
        the SOR MLL — the fixed ``fit_SOR_model`` path
        (Sparse_GP.py:234-289, inducing-input training :68-77).

        Returns (params, u [G, M, D], loss_history).  ``u`` defaults to the
        training inputs; rows with ``sel = 0`` never enter the loss, so their
        gradients vanish and only selected inducing points move.
        """
        norm = self.output_norms(data)
        if u is None:
            u = jnp.broadcast_to(data.x, (self.num_heads,) + data.x.shape) + 0.0
        opt = optimizer or optax.adam(learning_rate)
        mask_tree = self.param_mask(params)
        label = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask_tree,
            is_leaf=lambda v: isinstance(v, bool),
        )
        labels = (label, "train" if train_inducing else "freeze")
        tx = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, param_labels=labels
        )
        state0 = tx.init((params, u))

        def loss_fn(pu):
            p, uu = pu
            return self.sor_mll(p, data, sel, u=uu, norm=norm)

        def step(carry, _):
            pu, s, last_loss = carry
            loss, g = jax.value_and_grad(loss_fn)(pu)
            finite = jnp.isfinite(loss)
            updates, s_new = tx.update(g, s, pu)
            pu_new = optax.apply_updates(pu, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            logged = jnp.where(finite, loss, last_loss)
            return (keep(pu_new, pu), keep(s_new, s), logged), logged

        ((params, u), _, _), losses = jax.lax.scan(
            step, ((params, u), state0, jnp.asarray(jnp.inf, data.x.dtype)),
            None, length=num_epochs,
        )
        return params, u, losses

    def _sor_predict_head(self, kparams, u, sel, alpha, factor, norm, x_star):
        hp = jax.lax.Precision.HIGHEST
        k_star = self.kernel.gram(kparams, x_star, u) * sel
        mean = self.kernel.mean(kparams, x_star) + jnp.matmul(k_star, alpha, precision=hp)
        if _LEGACY_VAR:
            var = jnp.sum(jnp.matmul(k_star, factor, precision=hp) * k_star, axis=-1)
        else:
            kf = jnp.matmul(k_star, factor, precision=hp)
            var = jnp.sum(kf * kf, axis=-1)
        var = jnp.maximum(var, self.jitter * self.kernel.diag(kparams, x_star))
        return mean * norm, var * norm * norm

    def sor_predict(self, params: GPParams, post: Posterior, x_star: jax.Array):
        x_axis = None if post.x_tr.ndim == 2 else 0
        return jax.vmap(
            lambda kp, u, ss, a, sg, nm: self._sor_predict_head(kp, u, ss, a, sg, nm, x_star),
            in_axes=(0, x_axis, 0, 0, 0, 0),
        )(params.kernel, post.x_tr, post.mask, post.alpha, post.var_factor, post.norm)
