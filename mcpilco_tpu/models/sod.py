"""Subset-of-Data (SOD) greedy inducing-point selection, on device.

The reference selects points one at a time on the host: keep sample i if the
posterior std at x_i, given the points kept so far, exceeds a threshold
(gpr_lib/GP_prior/GP_prior.py:232-257).  That loop is inherently sequential,
so here it is a ``lax.scan`` over candidates whose carry is the selection
mask; each step evaluates the masked-Cholesky posterior variance of the
candidate against the currently-selected subset.  All heads run under ``vmap``
(each head selects its own subset — Model_learning.py:176-199).

Complexity is O(N) steps x O(N^3) masked Cholesky; for MC-PILCO's dataset
sizes (N <= a few hundred) this is sub-second on a TPU core and runs once per
trial.  (An incremental-Cholesky carry would be O(N^3) total; revisit if
profiles ever show this matters.)

Threshold modes (Model_learning.py:176-182):
- 'relative': threshold = value * sigma_n (per head)
- 'absolute': threshold = value[head]
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from .gp import GPParams, MultiGP


@dataclasses.dataclass(frozen=True)
class SODConfig:
    threshold_mode: str = "relative"  # 'relative' | 'absolute'
    threshold: Tuple[float, ...] = (0.5,)
    permutation: bool = False

    def __post_init__(self):
        import numpy as np

        object.__setattr__(
            self, "threshold", tuple(float(v) for v in np.asarray(self.threshold).reshape(-1))
        )

    def thresholds(self, gp: MultiGP, params: GPParams) -> jax.Array:
        t = jnp.asarray(self.threshold, jnp.float32)
        if self.threshold_mode == "relative":
            sigma_n = jnp.exp(params.log_sigma_n)
            return t[0] * sigma_n  # [G]
        return t * jnp.ones(gp.num_heads, jnp.float32)


@dataclasses.dataclass(frozen=True)
class SORConfig(SODConfig):
    """SOD selection options plus the SOR refinement stage: after the exact
    MLL fit and greedy inducing selection, optionally re-train the
    hyperparameters (and the inducing inputs themselves) against the Nystrom
    SOR MLL — the reference's ``fit_SOR_model`` path with its math fixed
    (gpr_lib/GP_prior/Sparse_GP.py:196-289; trainable inducing :68-77)."""

    refine_epochs: int = 0
    refine_lr: float = 0.01
    train_inducing: bool = False


def _select_head(gp: MultiGP, kparams, log_sigma_n, x, y, valid_mask, threshold, order):
    """Greedy SOD for one head. Returns the selection mask [N]."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    noise = jnp.exp(2.0 * log_sigma_n)

    first = order[0]
    sel0 = jnp.zeros(n, x.dtype).at[first].set(valid_mask[first])

    def step(sel, idx):
        K = gp.kernel.gram(kparams, x, x)
        jit = linalg.adaptive_jitter(K, sel, rel=gp.jitter, floor=gp.jitter)
        Kn = K + (noise + jit) * eye
        L = linalg.masked_cholesky(Kn, sel)
        k_vec = K[:, idx] * sel  # k(x_sel, x_idx)
        w = linalg.chol_solve(L, k_vec[:, None])[:, 0] * sel
        x_i = x[idx][None, :]  # gather (traced index)
        var = gp.kernel.diag(kparams, x_i)[0] - jnp.dot(k_vec, w)
        keep = (jnp.sqrt(jnp.maximum(var, 0.0)) > threshold) & (valid_mask[idx] > 0)
        return sel.at[idx].set(jnp.where(keep, 1.0, sel[idx])), keep

    sel, _ = jax.lax.scan(step, sel0, order[1:])
    return sel


@partial(jax.jit, static_argnums=(0, 1))
def select(
    gp: MultiGP,
    config: SODConfig,
    params: GPParams,
    x: jax.Array,
    y: jax.Array,
    valid_mask: jax.Array,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-head SOD selection masks [G, N] over the shared dataset.

    ``x``: [N, D] padded inputs; ``y``: [G, N]; ``valid_mask``: [N].
    """
    n = x.shape[0]
    order = jnp.arange(n)
    if config.permutation:
        if key is None:
            key = jax.random.PRNGKey(0)
        # keep index 0 first (the reference always seeds with sample 0)
        perm = jax.random.permutation(key, jnp.arange(1, n))
        order = jnp.concatenate([jnp.zeros(1, perm.dtype), perm])
    thresholds = config.thresholds(gp, params)
    return jax.vmap(
        lambda kp, lsn, yy, th: _select_head(gp, kp, lsn, x, yy, valid_mask, th, order)
    )(params.kernel, params.log_sigma_n, y, thresholds)
