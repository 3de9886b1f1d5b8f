#!/usr/bin/env python
"""RCA probe for the UR5 +-1 weight-init failure (VERDICT r4 item 8).

Question: the reference draws policy weights uniform +-1
(test_mcpilco_ur5_mujoco.py:145, torch float64) and our shipped config keeps
+-0.02 as its one retained deviation — under the otherwise-combined reference
values (poly_deg=1, fixed [0.5x6, 1x6] cost lengthscales) the +-1 init fails
4/5 seeds at the saturated-cost plateau (~200 = horizon x 1.0;
results/repeat_ur5_refjoint_r4.json).  WHY does the reference value break in
this build?  The candidate mechanism is precision: the tracking cost is
1 - exp(-d) with d = sum((err/l)^2); f32 exp underflows to EXACT ZERO at
d > 87.3 (joint RMS error ~1.35 rad at l=0.5) while f64 holds to d > 708
(~3.8 rad) — so a flailing +-1-weight arm can sit in a window where the f32
cost gradient is exactly zero but the reference's f64 gradient is tiny yet
nonzero, and torch-Adam's per-parameter normalization turns tiny-but-nonzero
into full-size steps.

Modes (separate processes because x64 must be set before any jax use):
  prep  collect the trial-0 exploration (PD along the trajectory) and fit the
        GP once, under the combined-reference config, seed 1; checkpoint it.
  grad  load the checkpoint, draw the policy init at --weight-scale, and
        measure loss + gradient at init: value, grad l2/max, EXACT-ZERO
        fraction per leaf, per-step saturation profile (fraction of
        particle-steps past the f32 and f64 exp-underflow cliffs).
  adam  same, then run --steps Adam steps (lr 0.01, the production value) at
        reduced particle count and record the cost trajectory — does this
        precision escape the plateau?

Run each grad/adam leg with and without --x64 and at --weight-scale 1.0/0.02.
Emits one JSON line.  CPU-only (force --platform cpu; the probe must not
contend with chip sweeps).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = "/tmp/ur5_probe_w1/model_trial0"


def log(*a):
    print("[probe-w1]", *a, flush=True)


def build_agent(weight_scale: float):
    from mcpilco_tpu.scenarios import ur5 as scen

    cfg = scen.UR5Config(
        seed=1,
        poly_degree=1,
        cost_lengthscales="fixed",
        weight_init_scale=weight_scale,
        plateau_rescue=False,
        log_dir=os.path.dirname(CKPT),
    )
    agent, kw = scen.build(cfg)
    return agent, kw


def cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    def c(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree_util.tree_map(c, tree)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("prep", "grad", "adam"), required=True)
    p.add_argument("--weight-scale", type=float, default=1.0)
    p.add_argument("--x64", action="store_true")
    p.add_argument("--steps", type=int, default=200, help="adam mode: opt steps")
    p.add_argument("--particles", type=int, default=50, help="adam mode: particle count")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from mcpilco_tpu.control.trainer import adam_init, adam_update
    from mcpilco_tpu.utils import prng

    if args.mode == "prep":
        agent, kw = build_agent(1.0)
        t0 = time.time()
        agent.collect(kw["T_exploration"], trial_index=0, exploration=True)
        info = agent.fit_model(kw["model_fit_options"][0])
        agent.save_checkpoint("model_trial0")
        print(json.dumps({"mode": "prep", "fit": info, "s": round(time.time() - t0, 1)}))
        return

    dtype = jnp.float64 if args.x64 else jnp.float32
    agent, kw = build_agent(args.weight_scale)
    init_params = agent.policy_params  # the fresh draw at --weight-scale
    agent.load_checkpoint(CKPT)  # overwrites policy_params; restore below
    opt = agent.optimizer
    if args.mode == "adam":
        opt = dataclasses.replace(opt, num_particles=args.particles)
    params = cast_tree(init_params, dtype)
    gp_params = cast_tree(agent.gp_params, dtype)
    posterior = cast_tree(agent.posterior, dtype)

    key = prng.fold(prng.stream(agent.key, prng.STREAM_ROLLOUT), 0)

    def loss(p):
        c, aux = opt._rollout_cost(p, gp_params, posterior, key, 0.0, 0)
        return c, aux

    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))
    t0 = time.time()
    (c0, (spread, states, inputs)), g = vg(params)
    t_eval = time.time() - t0

    # saturation geometry: d = sum((err/l)^2) per particle-step
    cost = opt.cost
    traj = jnp.asarray(cost.target_traj, states.dtype)
    T = states.shape[0]
    tr = traj[jnp.clip(jnp.arange(T), 0, traj.shape[0] - 1)]
    ls = jnp.asarray(cost.lengthscales, states.dtype)
    d = jnp.sum(((states - tr[:, None, :]) / ls) ** 2, axis=-1)  # [T, P]
    leaves = {
        k: v
        for k, v in zip(
            [str(i) for i in range(len(jax.tree_util.tree_leaves(g)))],
            jax.tree_util.tree_leaves(g),
        )
    }
    gflat = jnp.concatenate([jnp.ravel(v) for v in leaves.values()])
    out = {
        "mode": args.mode,
        "x64": bool(args.x64),
        "weight_scale": args.weight_scale,
        "cost": float(c0),
        "eval_s": round(t_eval, 1),
        "grad_l2": float(jnp.linalg.norm(gflat)),
        "grad_max": float(jnp.max(jnp.abs(gflat))),
        "grad_zero_frac": float(jnp.mean(gflat == 0.0)),
        "leaf_zero_frac": {k: float(jnp.mean(v == 0.0)) for k, v in leaves.items()},
        "leaf_l2": {k: float(jnp.linalg.norm(v)) for k, v in leaves.items()},
        # fraction of particle-steps past each precision's exp-underflow cliff
        "frac_d_gt_f32cliff": float(jnp.mean(d > 87.3)),
        "frac_d_gt_f64cliff": float(jnp.mean(d > 708.0)),
        "mean_d": float(jnp.mean(d)),
        "steps_saturated_frac": float(jnp.mean(jnp.mean(1.0 - jnp.exp(-d), axis=1) > 0.999)),
    }

    if args.mode == "adam":
        state = adam_init(params)
        hist = [float(c0)]

        @jax.jit
        def step(p, s):
            (c, _), grads = jax.value_and_grad(loss, has_aux=True)(p)
            p2, s2 = adam_update(grads, s, p, 0.01)
            return p2, s2, c

        t0 = time.time()
        for i in range(args.steps):
            params, state, c = step(params, state)
            if (i + 1) % 10 == 0:
                hist.append(float(c))
        out["adam_steps"] = args.steps
        out["adam_particles"] = args.particles
        out["adam_s"] = round(time.time() - t0, 1)
        out["cost_hist"] = [round(h, 4) for h in hist]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
