"""Masked dense linear algebra for growing GP datasets on TPU.

The reference re-allocates exact-size tensors every trial and re-traces
nothing because it is eager torch (reference: gpr_lib/GP_prior/GP_prior.py:91-115).
Under XLA all shapes must be static, so datasets are stored padded to a
*bucketed* capacity with a validity mask.  The helpers here make a padded
Gram matrix behave exactly like its valid sub-block:

- masked rows/cols are replaced by identity rows, so the Cholesky factor of
  the padded matrix embeds the factor of the valid block, contributes zero to
  the log-determinant, and produces zero ``alpha`` entries for padded targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bucket_size(n: int, bucket: int = 64, minimum: int = 64) -> int:
    """Round ``n`` up to a shape bucket so trial growth rarely re-compiles."""
    if n <= minimum:
        return minimum
    return ((n + bucket - 1) // bucket) * bucket


def pad_axis(x, capacity: int, axis: int = 0, fill=0.0):
    """Pad ``x`` with ``fill`` along ``axis`` up to ``capacity`` rows."""
    n = x.shape[axis]
    if n > capacity:
        raise ValueError(f"cannot pad axis of size {n} to smaller capacity {capacity}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, capacity - n)
    return jnp.pad(x, widths, constant_values=fill)


def mask_gram(K: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace masked rows/cols of a square Gram matrix with identity rows.

    ``mask`` is 1.0 for valid entries. The result is positive definite whenever
    the valid block is, and its Cholesky diagonal is 1 on masked rows.
    """
    m2 = mask[:, None] * mask[None, :]
    return K * m2 + jnp.diag((1.0 - mask).astype(K.dtype))


def masked_cholesky(K: jax.Array, mask: jax.Array) -> jax.Array:
    """Cholesky factor (lower) of the masked Gram matrix."""
    return jnp.linalg.cholesky(mask_gram(K, mask))


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``K x = B`` given lower Cholesky factor ``L`` of K."""
    y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def chol_inverse(L: jax.Array) -> jax.Array:
    """Dense inverse of ``K`` from its lower Cholesky factor.

    The posterior cache stores ``K^-1`` explicitly so the per-rollout-step
    variance is a pure batched matmul on the MXU (reference computes the same
    quantity from a cached inverse — gpr_lib/GP_prior/GP_prior.py:137-155).
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return chol_solve(L, eye)


def masked_logdet_from_chol(L: jax.Array, mask: jax.Array) -> jax.Array:
    """log|K_valid| from the masked Cholesky factor (masked rows give log 1)."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.maximum(d, jnp.finfo(L.dtype).tiny)) * mask, axis=-1)


def default_jitter(dtype) -> float:
    """Numerical-noise floor analog of the reference's ``sigma_n_num``
    (gpr_lib/GP_prior/GP_prior.py:64-67), scaled for the working precision."""
    if dtype in (jnp.float64,):
        return 1e-10
    return 1e-6


def adaptive_jitter(K: jax.Array, mask: jax.Array, rel: float = 1e-6, floor: float = 1e-6) -> jax.Array:
    """Jitter scaled to the Gram magnitude: f32 Cholesky on TPU needs the
    diagonal boost to track the matrix scale, not an absolute constant."""
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    tr = jnp.sum(jnp.diagonal(K, axis1=-2, axis2=-1) * mask, axis=-1) / n_valid
    return jnp.maximum(rel * tr, floor)
