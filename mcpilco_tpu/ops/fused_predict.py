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

STATUS: experimental, off by default.  Round-2 investigation (with the
hand-written Pallas BACKWARD kernel for x_star below, fixing round 1's
twin-re-run): at 1-pass bf16 MXU precision the fused path hits 3.9 ms/step
(vs 5.7 XLA) but the posterior contractions' cancellation corrupts the
rollout (see _dot_f32) and learning flatlines; a 3-pass bf16 hi/lo split is
still insufficient; at the required 6-pass HIGHEST precision the fused path
is 6.8 ms/step — SLOWER than XLA, whose own fusion already keeps the
intermediates local at these sizes (M<=384).  Conclusion: the numerics
requirement (RESULTS.md finding 1) caps the MXU shortcut, and XLA-native is
the production path; the kernel pair stays as verified infrastructure for
shapes where the tradeoff could flip (M >> 384).
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



def _dot_f32(a, b, dims):
    """Full-f32 MXU matmul (6-pass HIGHEST) — mandatory for every posterior
    contraction in this kernel.

    Measured on the flagship TPU A/B (round 2): the posterior algebra is
    heavily cancelling — alpha entries are O(1e2) summing to O(0.1) means,
    and the variance factor's O(1e2) entries contract k* to O(1e-2) — so
    1-pass bf16 (~1e-2 rel) AND a manual 3-pass bf16 hi/lo split (~1e-5 rel,
    half the HIGHEST cost) both corrupt the rollout beyond learning (probe
    cost shifts 51.2 -> 53.6 and the optimizer flatlines), in both the
    forward and the BPTT cotangent chain.  Only HIGHEST reproduces the XLA
    path's learning curve.
    """
    return jax.lax.dot_general(
        a, b, dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


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
                lin1 = _dot_f32(
                    xs * p1w[None, :], xt, (((1,), (1,)), ((), ()))
                ) + p1off
                a2 = _dot_f32(
                    xs * p2a_ref[g, :][None, :], xt, (((1,), (1,)), ((), ()))
                )
                b2 = _dot_f32(
                    xs * p2b_ref[g, :][None, :], xt, (((1,), (1,)), ((), ()))
                )
                k = k + lin1 + a2 * b2
            k = k * mask_ref[g, :][None, :]
            mean_ref[:, g] = _dot_f32(
                k, alpha_ref[g, :][:, None], (((1,), (0,)), ((), ()))
            )[:, 0]
            q = _dot_f32(k, kinv_ref[g], (((1,), (0,)), ((), ())))
            var_ref[:, g] = jnp.sum(q * q, axis=1)

    return body


def _make_bwd_body(G: int, use_poly: bool):
    def body(se_w_ref, se_lam_ref, p1_ref, p2a_ref, p2b_ref,
             xs_ref, xt_ref, alpha_ref, f_ref, mask_ref,
             g1_ref, g2_ref, dxs_ref):
        """Backward w.r.t. x_star only (the BPTT-critical cotangent): one
        particle tile, heads unrolled.  Recomputes the [TP, M] kernel tile in
        VMEM (cheaper than saving it) and runs the two M x M contractions
        (k F and (kF) F^T) on the MXU.

        g1/g2: [TP, G] cotangents of (kalpha, quad); dxs: [TP, D].
        """
        xs = xs_ref[:]  # [TP, D]
        xt = xt_ref[:]  # [M, D]
        D = xs.shape[1]
        acc = jnp.zeros(xs.shape, jnp.float32)
        dims_pm = (((1,), (0,)), ((), ()))  # [TP,M] @ [M,X]
        for g in range(G):
            w = se_w_ref[g, :]
            d = jnp.zeros((xs.shape[0], xt.shape[0]), jnp.float32)
            for dim in range(D):
                diff = xs[:, dim][:, None] - xt[:, dim][None, :]
                d += w[dim] * diff * diff
            k_se = se_lam_ref[g, 0] * jnp.exp(-d)  # [TP, M]
            k = k_se
            if use_poly:
                p1w = p1_ref[g, 0:D]
                lin1 = _dot_f32(
                    xs * p1w[None, :], xt, (((1,), (1,)), ((), ()))
                ) + p1_ref[g, D]
                a2 = _dot_f32(
                    xs * p2a_ref[g, :][None, :], xt, (((1,), (1,)), ((), ()))
                )
                b2 = _dot_f32(
                    xs * p2b_ref[g, :][None, :], xt, (((1,), (1,)), ((), ()))
                )
                k = k + lin1 + a2 * b2
            mask = mask_ref[g, :][None, :]
            k = k * mask
            kf = _dot_f32(k, f_ref[g], dims_pm)  # [TP, M]
            kf_ft = _dot_f32(kf, f_ref[g], (((1,), (1,)), ((), ())))  # [TP, M]
            kbar = (
                g1_ref[:, g][:, None] * alpha_ref[g, :][None, :]
                + 2.0 * g2_ref[:, g][:, None] * kf_ft
            ) * mask
            dbar = -kbar * k_se  # cotangent of the squared distance d
            s = jnp.sum(dbar, axis=1)  # [TP]
            dbar_t = _dot_f32(dbar, xt, dims_pm)  # [TP, D]
            acc += 2.0 * w[None, :] * (xs * s[:, None] - dbar_t)
            if use_poly:
                kbar_t = _dot_f32(kbar, xt, dims_pm)
                acc += p1_ref[g, 0:D][None, :] * kbar_t
                acc += p2a_ref[g, :][None, :] * _dot_f32(kbar * b2, xt, dims_pm)
                acc += p2b_ref[g, :][None, :] * _dot_f32(kbar * a2, xt, dims_pm)
        dxs_ref[:] = acc

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


def fused_gram_contract_bwd_xstar(se_w, se_lam, poly1, poly2a, poly2b,
                                  x_star, x_tr, alpha, f, mask, g1, g2,
                                  *, use_poly: bool, interpret: bool = False):
    """d(loss)/d(x_star) [P, D] for cotangents g1/g2 [G, P] of
    (kalpha, quad)."""
    G, D = se_w.shape
    P = x_star.shape[0]
    M = x_tr.shape[0]
    TP = min(256, max(8, ((P + 7) // 8) * 8))
    P_pad = ((P + TP - 1) // TP) * TP
    x_star = _pad_to(x_star.astype(jnp.float32), P_pad, 0)
    g1 = _pad_to(g1.T.astype(jnp.float32), P_pad, 0)  # [P_pad, G]
    g2 = _pad_to(g2.T.astype(jnp.float32), P_pad, 0)

    grid = (P_pad // TP,)
    kw = dict(memory_space=_VMEM) if _VMEM is not None and not interpret else {}
    full = lambda *shape: pl.BlockSpec(shape, lambda p: tuple(0 for _ in shape), **kw)
    in_specs = [
        full(G, D), full(G, 1), full(G, D + 1), full(G, D), full(G, D),
        pl.BlockSpec((TP, D), lambda p: (p, 0), **kw),  # x_star tile
        full(M, D), full(G, M), full(G, M, M), full(G, M),
        pl.BlockSpec((TP, G), lambda p: (p, 0), **kw),  # g1 tile
        pl.BlockSpec((TP, G), lambda p: (p, 0), **kw),  # g2 tile
    ]
    dxs = pl.pallas_call(
        _make_bwd_body(G, use_poly),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TP, D), lambda p: (p, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((P_pad, D), jnp.float32),
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
        f.astype(jnp.float32),
        mask.astype(jnp.float32),
        g1,
        g2,
    )
    return dxs[:P]


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
    """x_star's cotangent — the one BPTT actually needs — comes from the
    hand-written Pallas backward kernel; every other input's cotangent is
    expressed through the plain-jnp twin, a separate subgraph that XLA
    dead-code-eliminates whenever those gradients are not requested (in the
    policy-optimization loop posterior/hyperparameters are constants, so
    only the Pallas kernels run)."""
    dxs = fused_gram_contract_bwd_xstar(
        *res, g[0], g[1], use_poly=use_poly, interpret=interpret
    )
    _, vjp = jax.vjp(
        lambda *a: _reference_gram_contract(*a, use_poly), *res
    )
    full = list(vjp(g))
    full[5] = dxs  # x_star
    return tuple(full)


gram_contract.defvjp(_fwd, _bwd)
