"""Composable GP kernel algebra, functional style.

Design
------
A kernel is a *static, hashable config object* (safe to close over in ``jit``)
paired with a *parameter pytree* created by :meth:`Kernel.init_params`.  All
math lives in pure functions of ``(params, X)``; positivity is enforced by
log-parameterization.  Kernels compose by :class:`Sum` / :class:`Product`
whose params are tuples of member params — so a stacked multi-head GP can hold
``num_gp`` copies of any composite kernel's params under one leading axis and
evaluate them with ``vmap``.

Capability parity with the reference kernel zoo (citations into
/root/reference):

- :class:`SEArd`        <- gpr_lib/GP_prior/Stationary_GP.py:112-181 (RBF, ARD
  lengthscales, trainable scalar outputscale ``lambda``, constant mean)
- :class:`Linear`       <- gpr_lib/GP_prior/Sparse_GP.py:295-490 (dot-product
  kernel ``phi(X) Sigma phi(X)^T`` with diagonal/full Sigma, optional offset)
- :class:`Poly`         <- gpr_lib/GP_prior/Sparse_GP.py:493-556
- :class:`MPK`          <- gpr_lib/GP_prior/Sparse_GP.py:559-668 (Multiplicative
  Polynomial Kernel: elementwise product over degrees of linear kernels with
  per-degree diagonal Sigma)
- :func:`volterra_mpk`  <- gpr_lib/GP_prior/Sparse_GP.py:671-737 (sum over
  degrees d=1..P of MPK(d); degree 1 carries the offset column)
- :class:`Sum`/:class:`Product` <- gpr_lib/GP_prior/GP_prior.py:299-401.
  NOTE: the reference ``Sum_Independent_GP.get_mean`` returns inside its loop
  so only the first member's mean counts (GP_prior.py:306-312); here the sum
  is computed correctly.
- :class:`Scaled`       <- gpr_lib/GP_prior/GP_prior.py:404-515 (a(x)K a(x)^T;
  the reference's ``get_diag_covariance`` references an undefined name — fixed).

Unlike the reference, measurement noise is NOT owned by the kernel: the GP
layer (models/gp.py) owns a single ``log_sigma_n`` per head, which matches how
the reference *uses* its composites (only the first member carries noise).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _as_tuple(x) -> Tuple[int, ...]:
    if x is None:
        return None
    return tuple(int(i) for i in np.asarray(x).reshape(-1))


def _take_dims(X: jax.Array, dims: Optional[Tuple[int, ...]]) -> jax.Array:
    if dims is None:
        return X
    return X[..., jnp.array(dims)]


# Gram matrices feed Cholesky factorizations: on TPU the MXU's default
# (bf16-ish) matmul precision is NOT positive-definite-safe, so every kernel
# matmul requests full float32 accumulation.  The matrices are small (N <= a
# few hundred), so this costs nothing relative to HBM traffic.
HIGHEST = jax.lax.Precision.HIGHEST


def sq_dist(A: jax.Array, B: jax.Array) -> jax.Array:
    """Pairwise squared distances by direct elementwise differences.

    The reference uses the ||a||^2+||b||^2-2ab matmul expansion
    (gpr_lib/GP_prior/Stationary_GP.py:65-109).  On TPU that form is a
    numerical trap: the cancellation amplifies the MXU's product roundoff
    (~3.5e-6 absolute in the Gram entries even at HIGHEST precision vs 7e-8
    for the direct form), and the GP posterior multiplies Gram errors by
    |alpha| ~ 1e2 — measured to destabilize BPTT through long rollouts.
    MC-PILCO's feature dims are tiny (6-24), so the O(N*M*D) broadcasted
    difference is cheap and exact-to-eps; the VPU handles it easily.
    """
    d = A[..., :, None, :] - B[..., None, :, :]
    return jnp.sum(d * d, axis=-1)


class Kernel:
    """Base class: static config; params are pytrees from :meth:`init_params`."""

    def init_params(self, **overrides) -> dict:
        raise NotImplementedError

    def param_mask(self, params) -> dict:
        """Pytree of booleans (matching ``params``) marking trainable leaves."""
        raise NotImplementedError

    def gram(self, params, X1: jax.Array, X2: jax.Array) -> jax.Array:
        """Noise-free covariance matrix k(X1, X2): [..., N1, N2]."""
        raise NotImplementedError

    def diag(self, params, X: jax.Array) -> jax.Array:
        """Diagonal of k(X, X): [..., N]."""
        raise NotImplementedError

    def mean(self, params, X: jax.Array) -> jax.Array:
        """Prior mean m(X): [..., N]."""
        return jnp.zeros(X.shape[:-1], X.dtype)


@dataclasses.dataclass(frozen=True)
class SEArd(Kernel):
    """Squared-exponential kernel with ARD lengthscales and constant mean.

    k(x, x') = exp(log_lambda) * exp(-sum_d ((x_d - x'_d)/l_d)^2)

    Matches the reference RBF convention (no 1/2 factor in the exponent,
    lengthscales divide linearly — Stationary_GP.py:86-101,162-170).
    """

    active_dims: Optional[Tuple[int, ...]] = None
    num_features: Optional[int] = None
    train_lengthscales: bool = True
    train_outputscale: bool = False
    train_mean: bool = False

    def __post_init__(self):
        object.__setattr__(self, "active_dims", _as_tuple(self.active_dims))

    def _nfeat(self) -> int:
        if self.active_dims is not None:
            return len(self.active_dims)
        if self.num_features is None:
            raise ValueError("SEArd needs active_dims or num_features")
        return self.num_features

    def init_params(self, lengthscales=None, outputscale=None, mean=None, dtype=jnp.float32) -> dict:
        nf = self._nfeat()
        ls = jnp.ones(nf, dtype) if lengthscales is None else jnp.asarray(lengthscales, dtype) * jnp.ones(nf, dtype)
        lam = jnp.ones((), dtype) if outputscale is None else jnp.asarray(outputscale, dtype)
        mu = jnp.zeros((), dtype) if mean is None else jnp.asarray(mean, dtype)
        return {
            "log_lengthscales": jnp.log(ls),
            "log_lambda": jnp.log(lam),
            "mean": mu,
        }

    def param_mask(self, params) -> dict:
        return {
            "log_lengthscales": self.train_lengthscales,
            "log_lambda": self.train_outputscale,
            "mean": self.train_mean,
        }

    def _scaled(self, params, X):
        ls = jnp.exp(params["log_lengthscales"])
        return _take_dims(X, self.active_dims) / ls

    def gram(self, params, X1, X2):
        # Weighted direct differences: diff^2 is computed on the UNSCALED
        # inputs (head-independent, so XLA hoists it out of a vmap over
        # stacked head params) and the per-head inverse-lengthscales enter
        # as a positive-weighted reduce — cancellation-free (see sq_dist)
        # and shared across GP heads in the rollout hot loop.
        a = _take_dims(X1, self.active_dims)
        b = _take_dims(X2, self.active_dims)
        diff = a[..., :, None, :] - b[..., None, :, :]
        w = jnp.exp(-2.0 * params["log_lengthscales"])
        d = jnp.einsum("...nmd,...d->...nm", diff * diff, w, precision=HIGHEST)
        return jnp.exp(params["log_lambda"]) * jnp.exp(-d)

    def diag(self, params, X):
        return jnp.exp(params["log_lambda"]) * jnp.ones(X.shape[:-1], X.dtype)

    def mean(self, params, X):
        return params["mean"] * jnp.ones(X.shape[:-1], X.dtype)


@dataclasses.dataclass(frozen=True)
class Linear(Kernel):
    """Dot-product kernel k(x,x') = phi(x)^T Sigma phi(x') with diagonal Sigma.

    phi(x) = x[active_dims] (+ constant 1 column when ``offset``), Sigma =
    diag(exp(log_sigma_diag)^2).  Mirrors Linear_GP with the
    ``diagonal_covariance`` Sigma-parameterization the shipped configs use
    (Sparse_GP.py:295-453, Utils/Parameters_covariance_functions.py:18-32).
    A full-covariance Sigma (Cholesky-parameterized, reference
    Parameters_covariance_functions.py:46-65) is available via ``full_sigma``.
    A semi-definite diagonal Sigma (reference ``diagonal_covariance_semi_def``,
    Parameters_covariance_functions.py:35-43: the first ``semi_def_dims``
    diagonal entries are squares of UNCONSTRAINED parameters, so training can
    drive them exactly to zero and switch features off; the rest stay
    positivity-constrained via the log transform) via ``semi_def_dims``.
    """

    active_dims: Optional[Tuple[int, ...]] = None
    num_features: Optional[int] = None
    offset: bool = False
    full_sigma: bool = False
    semi_def_dims: int = 0
    train_sigma: bool = True
    train_mean: bool = False

    def __post_init__(self):
        object.__setattr__(self, "active_dims", _as_tuple(self.active_dims))
        if self.full_sigma and self.semi_def_dims:
            raise ValueError("full_sigma and semi_def_dims are mutually exclusive")

    def _nfeat(self) -> int:
        base = len(self.active_dims) if self.active_dims is not None else self.num_features
        if base is None:
            raise ValueError("Linear needs active_dims or num_features")
        return base + (1 if self.offset else 0)

    def phi(self, X):
        Xa = _take_dims(X, self.active_dims)
        if self.offset:
            ones = jnp.ones(Xa.shape[:-1] + (1,), Xa.dtype)
            Xa = jnp.concatenate([Xa, ones], axis=-1)
        return Xa

    def init_params(self, sigma_diag=None, mean_w=None, free_chol=None, dtype=jnp.float32) -> dict:
        nf = self._nfeat()
        sd = jnp.ones(nf, dtype) if sigma_diag is None else jnp.asarray(sigma_diag, dtype) * jnp.ones(nf, dtype)
        if self.semi_def_dims:
            # first semi_def_dims entries free (stored raw), rest log-positive
            p = {
                "sigma_free_diag": sd[: self.semi_def_dims],
                "log_sigma_diag": jnp.log(sd[self.semi_def_dims :]),
            }
            if mean_w is not None:
                p["mean_w"] = jnp.asarray(mean_w, dtype)
            return p
        p = {"log_sigma_diag": jnp.log(sd)}
        if self.full_sigma:
            n_off = nf * (nf - 1) // 2
            p["sigma_offdiag"] = (
                jnp.zeros(n_off, dtype) if free_chol is None else jnp.asarray(free_chol, dtype)
            )
        if mean_w is not None:
            p["mean_w"] = jnp.asarray(mean_w, dtype)
        return p

    def param_mask(self, params) -> dict:
        m = {"log_sigma_diag": self.train_sigma}
        if self.full_sigma:
            m["sigma_offdiag"] = self.train_sigma
        if self.semi_def_dims:
            m["sigma_free_diag"] = self.train_sigma
        if "mean_w" in params:
            m["mean_w"] = self.train_mean
        return m

    def _sigma(self, params):
        d = jnp.exp(params["log_sigma_diag"])
        if self.semi_def_dims:
            d = jnp.concatenate([params["sigma_free_diag"], d])
        if not self.full_sigma:
            return None, d * d  # diagonal fast path
        nf = d.shape[-1]
        U = jnp.zeros((nf, nf), d.dtype)
        iu = jnp.triu_indices(nf, k=1)
        U = U.at[iu].set(params["sigma_offdiag"])
        U = U + jnp.diag(d)
        return U.T @ U, None

    def gram(self, params, X1, X2):
        p1, p2 = self.phi(X1), self.phi(X2)
        S, diag = self._sigma(params)
        if S is None:
            return jnp.matmul(p1 * diag, jnp.swapaxes(p2, -1, -2), precision=HIGHEST)
        return jnp.matmul(p1, jnp.matmul(S, jnp.swapaxes(p2, -1, -2), precision=HIGHEST), precision=HIGHEST)

    def diag(self, params, X):
        p = self.phi(X)
        S, diag = self._sigma(params)
        if S is None:
            return jnp.sum(p * p * diag, axis=-1)
        return jnp.sum(jnp.matmul(p, S) * p, axis=-1)

    def mean(self, params, X):
        if "mean_w" in params:
            return jnp.matmul(self.phi(X), params["mean_w"])
        return jnp.zeros(X.shape[:-1], X.dtype)

    def weight_posterior(self, params, noise_var, X, Y, mask=None):
        """Posterior mean of the regression weights w (reference
        ``get_parameters_inv_lemma`` — Sparse_GP.py:471-490, with the matrix
        inversion lemma and correct sigma_n^-2 scaling)."""
        p = self.phi(X)
        if mask is not None:
            p = p * mask[..., None]
            Y = Y * mask
        S, diag = self._sigma(params)
        Sigma = jnp.diag(diag) if S is None else S
        A = jnp.linalg.inv(Sigma) + (1.0 / noise_var) * p.T @ p
        return (1.0 / noise_var) * jnp.linalg.solve(A, p.T @ Y)


@dataclasses.dataclass(frozen=True)
class Poly(Kernel):
    """Polynomial kernel: (linear covariance)^degree (Sparse_GP.py:493-556)."""

    base: Linear = None
    degree: int = 2

    def init_params(self, **kw) -> dict:
        return self.base.init_params(**kw)

    def param_mask(self, params) -> dict:
        return self.base.param_mask(params)

    def gram(self, params, X1, X2):
        return self.base.gram(params, X1, X2) ** self.degree

    def diag(self, params, X):
        return self.base.diag(params, X) ** self.degree


@dataclasses.dataclass(frozen=True)
class MPK(Kernel):
    """Multiplicative Polynomial Kernel of a given degree.

    k(x,x') = prod_{d=1..degree} phi(x)^T diag(exp(log_sigma[d])^2) phi(x')

    Per-degree diagonal Sigmas are held in one [degree, nfeat] parameter
    (the reference slices one flat vector statefully — Sparse_GP.py:613-646).
    """

    active_dims: Optional[Tuple[int, ...]] = None
    num_features: Optional[int] = None
    degree: int = 1
    offset: bool = True
    train_sigma: bool = True

    def __post_init__(self):
        object.__setattr__(self, "active_dims", _as_tuple(self.active_dims))

    def _nfeat(self) -> int:
        base = len(self.active_dims) if self.active_dims is not None else self.num_features
        if base is None:
            raise ValueError("MPK needs active_dims or num_features")
        return base + (1 if self.offset else 0)

    def phi(self, X):
        Xa = _take_dims(X, self.active_dims)
        if self.offset:
            ones = jnp.ones(Xa.shape[:-1] + (1,), Xa.dtype)
            Xa = jnp.concatenate([Xa, ones], axis=-1)
        return Xa

    def init_params(self, sigma_diag=None, dtype=jnp.float32) -> dict:
        nf = self._nfeat()
        if sigma_diag is None:
            sd = jnp.ones((self.degree, nf), dtype)
        else:
            sd = jnp.asarray(sigma_diag, dtype)
            sd = (
                sd * jnp.ones((self.degree, nf), dtype)
                if sd.ndim < 2
                else sd.reshape(self.degree, nf)
            )
        return {"log_sigma_diag": jnp.log(sd)}

    def param_mask(self, params) -> dict:
        return {"log_sigma_diag": self.train_sigma}

    def gram(self, params, X1, X2):
        p1, p2 = self.phi(X1), self.phi(X2)
        diag = jnp.exp(2.0 * params["log_sigma_diag"])  # [degree, nf]
        # One batched MXU matmul over degrees, then a product-reduce.
        g = jnp.einsum("...nd,kd,...md->k...nm", p1, diag, p2, precision=HIGHEST)
        return jnp.prod(g, axis=0)

    def diag(self, params, X):
        p = self.phi(X)
        diag = jnp.exp(2.0 * params["log_sigma_diag"])
        g = jnp.einsum("...nd,kd->k...n", p * p, diag)
        return jnp.prod(g, axis=0)


@dataclasses.dataclass(frozen=True)
class Sum(Kernel):
    """Sum of kernels; params are a tuple of member params
    (fixes the reference's first-member-only mean bug, GP_prior.py:306-312)."""

    members: Tuple[Kernel, ...] = ()

    def init_params(self, member_overrides=None, dtype=jnp.float32) -> tuple:
        ov = member_overrides or [{}] * len(self.members)
        return tuple(k.init_params(dtype=dtype, **o) for k, o in zip(self.members, ov))

    def param_mask(self, params) -> tuple:
        return tuple(k.param_mask(p) for k, p in zip(self.members, params))

    def gram(self, params, X1, X2):
        out = self.members[0].gram(params[0], X1, X2)
        for k, p in zip(self.members[1:], params[1:]):
            out = out + k.gram(p, X1, X2)
        return out

    def diag(self, params, X):
        out = self.members[0].diag(params[0], X)
        for k, p in zip(self.members[1:], params[1:]):
            out = out + k.diag(p, X)
        return out

    def mean(self, params, X):
        out = self.members[0].mean(params[0], X)
        for k, p in zip(self.members[1:], params[1:]):
            out = out + k.mean(p, X)
        return out


@dataclasses.dataclass(frozen=True)
class Product(Kernel):
    """Elementwise product of kernels (GP_prior.py:350-401)."""

    members: Tuple[Kernel, ...] = ()

    def init_params(self, member_overrides=None, dtype=jnp.float32) -> tuple:
        ov = member_overrides or [{}] * len(self.members)
        return tuple(k.init_params(dtype=dtype, **o) for k, o in zip(self.members, ov))

    def param_mask(self, params) -> tuple:
        return tuple(k.param_mask(p) for k, p in zip(self.members, params))

    def gram(self, params, X1, X2):
        out = self.members[0].gram(params[0], X1, X2)
        for k, p in zip(self.members[1:], params[1:]):
            out = out * k.gram(p, X1, X2)
        return out

    def diag(self, params, X):
        out = self.members[0].diag(params[0], X)
        for k, p in zip(self.members[1:], params[1:]):
            out = out * k.diag(p, X)
        return out

    def mean(self, params, X):
        out = self.members[0].mean(params[0], X)
        for k, p in zip(self.members[1:], params[1:]):
            out = out * k.mean(p, X)
        return out


@dataclasses.dataclass(frozen=True)
class Scaled(Kernel):
    """y(x) = a(x) f(x):  k(x,x') = a(x) k_f(x,x') a(x')  (GP_prior.py:404-515).

    ``f_scale(params_scale, X_active)`` must be a pure function; trainable
    positive/free parameters live in the params dict.
    """

    base: Kernel = None
    f_scale: Callable = None
    active_dims_scale: Optional[Tuple[int, ...]] = None
    n_pos_par: int = 0
    n_free_par: int = 0
    train_scale: bool = True

    def __post_init__(self):
        object.__setattr__(self, "active_dims_scale", _as_tuple(self.active_dims_scale))

    def init_params(self, pos_par=None, free_par=None, dtype=jnp.float32, **base_kw) -> dict:
        p = {"base": self.base.init_params(dtype=dtype, **base_kw)}
        if self.n_pos_par:
            pp = jnp.ones(self.n_pos_par, dtype) if pos_par is None else jnp.asarray(pos_par, dtype)
            p["log_pos_par"] = jnp.log(pp)
        if self.n_free_par:
            p["free_par"] = (
                jnp.zeros(self.n_free_par, dtype) if free_par is None else jnp.asarray(free_par, dtype)
            )
        return p

    def param_mask(self, params) -> dict:
        m = {"base": self.base.param_mask(params["base"])}
        if self.n_pos_par:
            m["log_pos_par"] = self.train_scale
        if self.n_free_par:
            m["free_par"] = self.train_scale
        return m

    def _a(self, params, X):
        pos = jnp.exp(params["log_pos_par"]) if self.n_pos_par else None
        free = params.get("free_par")
        return self.f_scale(pos, free, _take_dims(X, self.active_dims_scale))

    def gram(self, params, X1, X2):
        a1, a2 = self._a(params, X1), self._a(params, X2)
        return a1[..., :, None] * self.base.gram(params["base"], X1, X2) * a2[..., None, :]

    def diag(self, params, X):
        a = self._a(params, X)
        return a * a * self.base.diag(params["base"], X)

    def mean(self, params, X):
        return self._a(params, X) * self.base.mean(params["base"], X)


# ------------------------------------------------------------------
# Concrete scaling functions for :class:`Scaled`
# (gpr_lib/Utils/Scaling_functions.py:21-43).  Signature matches the
# Scaled.f_scale contract: (pos_par, free_par, X_active) -> [N].


def scale_sign(pos_par, free_par, X_active, positive: bool = True):
    """Indicator scaling: 1 where EVERY active dim is > offset (free_par,
    default 0), else 0; ``positive=False`` flips the comparison
    (``f_get_sign``, Scaling_functions.py:21-33)."""
    offset = free_par if free_par is not None else 0.0
    cmp = (X_active > offset) if positive else (X_active < offset)
    return jnp.prod(cmp.astype(X_active.dtype), axis=-1)


def scale_sign_abs(pos_par, free_par, X_active, positive: bool = True):
    """Indicator scaling on magnitudes: 1 where every |active dim| is above
    (below) the positive threshold ``pos_par``
    (``f_get_sign_abs``, Scaling_functions.py:36-43)."""
    cmp = (jnp.abs(X_active) > pos_par) if positive else (jnp.abs(X_active) < pos_par)
    return jnp.prod(cmp.astype(X_active.dtype), axis=-1)


def volterra_mpk(
    active_dims,
    degree: int,
    train_sigma: bool = True,
) -> Sum:
    """Volterra-series kernel: sum over d = 1..degree of MPK(d).

    Degree 1 carries the offset column; higher degrees do not
    (Sparse_GP.py:671-737).
    """
    members = [MPK(active_dims=active_dims, degree=1, offset=True, train_sigma=train_sigma)]
    for d in range(2, degree + 1):
        members.append(MPK(active_dims=active_dims, degree=d, offset=False, train_sigma=train_sigma))
    return Sum(members=tuple(members))


def se_plus_volterra(active_dims, degree: int = 2, train_outputscale: bool = False) -> Sum:
    """The SE+P(degree) kernel used by the flagship cartpole/UR5 configs
    (reference test_mcpilco_cartpole.py:86-110)."""
    return Sum(
        members=(
            SEArd(active_dims=active_dims, train_outputscale=train_outputscale),
            *volterra_mpk(active_dims, degree).members,
        )
    )
