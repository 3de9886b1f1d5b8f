"""Pallas TPU kernel: fused multi-head GP posterior prediction.

The rollout hot loop evaluates, per scan step and per GP head,

    k* = k(x*, X_tr)            (SE-ARD, optionally + Volterra-MPK(2))
    mean = k* @ alpha
    var  = k_diag - sum((k* @ F)^2, -1)       (F = Posterior.var_factor)

XLA runs this as several kernels with k* round-tripping through HBM.  This
module fuses the whole chain into one Pallas kernel per particle tile:
distances, exp, the optional polynomial terms, and both contractions happen
on a VMEM-resident k* tile for every head (heads unrolled statically — G is
2-6), so HBM sees only the inputs (X_tr, alpha, F) and the [P, G] outputs.

Gradients: the op is wrapped in ``jax.custom_vjp`` whose backward re-expresses
the forward in plain jnp and differentiates that — same formulas, XLA-
compiled, so correctness never depends on hand-written kernel adjoints.

Supported kernel structures (the two shipped model families):
- 'se':       SEArd alone
- 'se+p2':    Sum(SEArd, MPK(deg1, offset), MPK(deg2, no offset))

STATUS: experimental, off by default.  Values and gradients are verified in
interpret mode (tests/test_fused_predict.py), but the measured end-to-end
A/B on a TPU v5e (flagship cartpole optimize loop) is 8.3 ms/step fused vs
6.2 ms/step XLA: the custom-vjp backward re-runs the XLA twin anyway, and
XLA's own fusion of the forward leaves little HBM traffic to save at these
sizes (M<=384).  Kept as the scaffold for a future fully-fused rollout-step
kernel (the real win is keeping K^-1 VMEM-resident ACROSS scan steps, which
needs the whole step in one kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _make_body(G: int, use_poly: bool):
    def body(se_w_ref, se_lam_ref, p1_ref, p2a_ref, p2b_ref,
             xs_ref, xt_ref, alpha_ref, kinv_ref, mask_ref,
             mean_ref, var_ref):
        """One particle-tile grid cell; heads unrolled statically.

        VMEM blocks: xs [TP, D], xt [M, D], alpha [G, M], kinv [G, M, M],
        mask [G, M], se_w [G, D], se_lam [G, 1], p1 [G, D+1], p2a/b [G, D].
        Outputs: mean [TP, G], var [TP, G].
        """
        xs = xs_ref[:]  # [TP, D]
        xt = xt_ref[:]  # [M, D]
        D = xs.shape[1]
        for g in range(G):
            w = se_w_ref[g, :]
            d = jnp.zeros((xs.shape[0], xt.shape[0]), jnp.float32)
            for dim in range(D):
                diff = xs[:, dim][:, None] - xt[:, dim][None, :]
                d += w[dim] * diff * diff
            k = se_lam_ref[g, 0] * jnp.exp(-d)  # [TP, M]
            if use_poly:
                p1w = p1_ref[g, 0:D]  # static slice: feature weights
                p1off = p1_ref[g, D]  # static scalar: offset weight
                lin1 = jax.lax.dot_general(
                    xs * p1w[None, :], xt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + p1off
                a2 = jax.lax.dot_general(
                    xs * p2a_ref[g, :][None, :], xt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                b2 = jax.lax.dot_general(
                    xs * p2b_ref[g, :][None, :], xt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                k = k + lin1 + a2 * b2
            k = k * mask_ref[g, :][None, :]
            mean_ref[:, g] = jax.lax.dot_general(
                k, alpha_ref[g, :][:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, 0]
            q = jax.lax.dot_general(
                k, kinv_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            var_ref[:, g] = jnp.sum(q * q, axis=1)

    return body


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
    alpha [G, M]; k_inv [G, M, M] (the variance FACTOR F); mask [G, M].
    Returns (kalpha [G, P], quad [G, P]).
    """
    G, D = se_w.shape
    P = x_star.shape[0]
    M = x_tr.shape[0]
    TP = min(256, max(8, ((P + 7) // 8) * 8))
    P_pad = ((P + TP - 1) // TP) * TP
    x_star = _pad_to(x_star.astype(jnp.float32), P_pad, 0)

    grid = (P_pad // TP,)
    kw = dict(memory_space=_VMEM) if _VMEM is not None and not interpret else {}
    out_shape = (
        jax.ShapeDtypeStruct((P_pad, G), jnp.float32),
        jax.ShapeDtypeStruct((P_pad, G), jnp.float32),
    )
    full = lambda *shape: pl.BlockSpec(shape, lambda p: tuple(0 for _ in shape), **kw)
    in_specs = [
        full(G, D),          # se_w
        full(G, 1),          # se_lam
        full(G, D + 1),      # poly1
        full(G, D),          # poly2a
        full(G, D),          # poly2b
        pl.BlockSpec((TP, D), lambda p: (p, 0), **kw),  # x_star tile
        full(M, D),          # x_tr
        full(G, M),          # alpha
        full(G, M, M),       # k_inv
        full(G, M),          # mask
    ]
    out_specs = (
        pl.BlockSpec((TP, G), lambda p: (p, 0), **kw),
        pl.BlockSpec((TP, G), lambda p: (p, 0), **kw),
    )

    kalpha, quad = pl.pallas_call(
        _make_body(G, use_poly),
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
    return kalpha[:P].T, quad[:P].T


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
    kf = jnp.einsum("gpm,gmn->gpn", k, k_inv, precision=hp)
    quad = jnp.sum(kf * kf, axis=-1)
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
