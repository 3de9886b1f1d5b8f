"""Pallas TPU kernel: fused multi-head GP posterior prediction.

The rollout hot loop evaluates, per scan step and per GP head,

    k* = k(x*, X_tr)            (SE-ARD, optionally + Volterra-MPK(2))
    mean = k* @ alpha
    var  = k_diag - sum((k* @ K^-1) * k*, -1)

XLA runs this as several kernels with k* round-tripping through HBM.  This
module fuses the whole chain into one Pallas kernel per head-grid cell:
distances, exp, the optional polynomial terms, and both contractions happen
on a VMEM-resident k* tile, so HBM sees only the inputs (X_tr, alpha, K^-1)
and the [G, P] outputs.

Gradients: the op is wrapped in ``jax.custom_vjp`` whose backward re-expresses
the forward in plain jnp and differentiates that — bitwise-equivalent math
(same formulas), XLA-compiled, so correctness never depends on hand-written
kernel adjoints.

Supported kernel structures (the two shipped model families):
- 'se':       SEArd alone
- 'se+p2':    Sum(SEArd, MPK(deg1, offset), MPK(deg2, no offset))
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel_body(se_w_ref, se_lam_ref, p1_ref, p2a_ref, p2b_ref,
                 xs_ref, xt_ref, alpha_ref, kinv_ref, mask_ref,
                 mean_ref, var_ref, *, use_poly: bool):
    """One (head, particle-tile) grid cell.

    Shapes in VMEM:
      xs [TP, D], xt [M, D], alpha [1, M], kinv [M, M], mask [1, M]
      se_w [1, D], se_lam [1, 1]; poly diag weights p1 [1, D+1],
      p2a/p2b [1, D] (degree-2 MPK factors, no offset)
    Outputs: mean [1, TP], var [1, TP].
    """
    xs = xs_ref[:]  # [TP, D]
    xt = xt_ref[:]  # [M, D]
    w = se_w_ref[0, :]  # [D]
    # weighted squared distances without cancellation: loop D (static, small)
    d = jnp.zeros((xs.shape[0], xt.shape[0]), jnp.float32)
    for dim in range(xs.shape[1]):
        diff = xs[:, dim][:, None] - xt[:, dim][None, :]
        d += w[dim] * diff * diff
    k = se_lam_ref[0, 0] * jnp.exp(-d)  # [TP, M]
    if use_poly:
        p1 = p1_ref[0, :]  # [D+1] (last entry = offset weight)
        lin1 = jax.lax.dot_general(
            xs * p1[:-1][None, :], xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + p1[-1]
        a2 = jax.lax.dot_general(
            xs * p2a_ref[0, :][None, :], xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b2 = jax.lax.dot_general(
            xs * p2b_ref[0, :][None, :], xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k = k + lin1 + a2 * b2
    k = k * mask_ref[0, :][None, :]
    mean_ref[0, :] = jax.lax.dot_general(
        k, alpha_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )[:, 0]
    q = jax.lax.dot_general(
        k, kinv_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    var_ref[0, :] = jnp.sum(q * k, axis=1)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fused_gram_contract(se_w, se_lam, poly1, poly2a, poly2b,
                        x_star, x_tr, alpha, k_inv, mask,
                        *, use_poly: bool, interpret: bool = False):
    """Raw fused contraction (no mean offset / diag / floor — caller adds).

    se_w [G, D] inverse-sq lengthscales; se_lam [G] outputscales;
    poly1 [G, D+1], poly2a/b [G, D]; x_star [P, D]; x_tr [M, D];
    alpha [G, M]; k_inv [G, M, M]; mask [G, M].
    Returns (kalpha [G, P], quad [G, P]).
    """
    G, D = se_w.shape
    P = x_star.shape[0]
    M = x_tr.shape[0]
    TP = min(256, max(8, P))
    P_pad = ((P + TP - 1) // TP) * TP
    x_star = _pad_to(x_star.astype(jnp.float32), P_pad, 0)

    grid = (G, P_pad // TP)
    kw = dict(memory_space=_VMEM) if _VMEM is not None and not interpret else {}
    out_shape = (
        jax.ShapeDtypeStruct((G, P_pad), jnp.float32),
        jax.ShapeDtypeStruct((G, P_pad), jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, D), lambda g, p: (g, 0), **kw),          # se_w
        pl.BlockSpec((1, 1), lambda g, p: (g, 0), **kw),          # se_lam
        pl.BlockSpec((1, D + 1), lambda g, p: (g, 0), **kw),      # poly1
        pl.BlockSpec((1, D), lambda g, p: (g, 0), **kw),          # poly2a
        pl.BlockSpec((1, D), lambda g, p: (g, 0), **kw),          # poly2b
        pl.BlockSpec((TP, D), lambda g, p: (p, 0), **kw),         # x_star tile
        pl.BlockSpec((M, D), lambda g, p: (0, 0), **kw),          # x_tr
        pl.BlockSpec((1, M), lambda g, p: (g, 0), **kw),          # alpha
        pl.BlockSpec((1, M, M), lambda g, p: (g, 0, 0), **kw),    # k_inv
        pl.BlockSpec((1, M), lambda g, p: (g, 0), **kw),          # mask
    ]
    out_specs = (
        pl.BlockSpec((1, TP), lambda g, p: (g, p), **kw),
        pl.BlockSpec((1, TP), lambda g, p: (g, p), **kw),
    )

    body = partial(_kernel_body, use_poly=use_poly)

    kalpha, quad = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        se_w.astype(jnp.float32),
        se_lam.reshape(G, 1).astype(jnp.float32),
        poly1.astype(jnp.float32),
        poly2a.astype(jnp.float32),
        poly2b.astype(jnp.float32),
        x_star,
        x_tr.astype(jnp.float32),
        alpha.astype(jnp.float32),
        k_inv.astype(jnp.float32),
        mask.astype(jnp.float32),
    )
    return kalpha[:, :P], quad[:, :P]


def _reference_gram_contract(se_w, se_lam, poly1, poly2a, poly2b,
                             x_star, x_tr, alpha, k_inv, mask, use_poly):
    """Plain-jnp twin of the kernel (same formulas) for the backward pass."""
    diff = x_star[:, None, :] - x_tr[None, :, :]  # [P, M, D]
    d = jnp.einsum("pmd,gd->gpm", diff * diff, se_w)
    k = se_lam[:, None, None] * jnp.exp(-d)
    if use_poly:
        lin1 = jnp.einsum("pd,gd,md->gpm", x_star, poly1[:, :-1], x_tr) + poly1[:, -1:, None]
        a2 = jnp.einsum("pd,gd,md->gpm", x_star, poly2a, x_tr)
        b2 = jnp.einsum("pd,gd,md->gpm", x_star, poly2b, x_tr)
        k = k + lin1 + a2 * b2
    k = k * mask[:, None, :]
    hp = jax.lax.Precision.HIGHEST
    kalpha = jnp.einsum("gpm,gm->gp", k, alpha, precision=hp)
    quad = jnp.einsum("gpm,gmn,gpn->gp", k, k_inv, k, precision=hp)
    return kalpha, quad


@partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def gram_contract(se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr, alpha,
                  k_inv, mask, use_poly, interpret):
    return fused_gram_contract(
        se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr, alpha, k_inv, mask,
        use_poly=use_poly, interpret=interpret,
    )


def _fwd(se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr, alpha, k_inv, mask,
         use_poly, interpret):
    out = gram_contract(se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr,
                        alpha, k_inv, mask, use_poly, interpret)
    return out, (se_w, se_lam, poly1, poly2a, poly2b, x_star, x_tr, alpha, k_inv, mask)


def _bwd(use_poly, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_gram_contract(*a, use_poly), *res
    )
    return vjp(g)


gram_contract.defvjp(_fwd, _bwd)
