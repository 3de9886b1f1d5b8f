#!/usr/bin/env python
"""Diagnose the MuJoCo restarts=4 trial-2 first-chunk hang (round-3 incident,
reproduced round 4: the sweep watchdog fired after 900s of silence inside the
trial-2 policy-opt chunk; the TPU claim was NOT held afterwards, pointing at a
client-side dispatch/compile stall rather than a running device program).

Loads the preserved trial-2 model checkpoint and re-runs exactly the stalled
call with compile logging on, in bounded step budgets, printing a heartbeat
around every device interaction so the stall point is attributable.

Usage: python scripts/diag_restarts_hang.py [--ckpt DIR] [--steps N]
       [--restarts R] [--chunk N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[diag {time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="results_tmp/cartpole_mujoco_restarts4_r4_1/model_trial2")
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--restarts", type=int, default=4)
    p.add_argument("--chunk", type=int, default=0, help="override chunk_steps (0 = scenario default)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (the exported JAX_PLATFORMS=axon "
                        "wins over env overrides; use jax.config like conftest)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_log_compiles", True)
    log("devices:", jax.devices())

    import dataclasses

    from mcpilco_tpu.scenarios import cartpole_mujoco as scen

    cfg = scen.CartpoleMujocoConfig(seed=1, num_restarts=args.restarts)
    agent, kwargs = scen.build(cfg)
    log("built agent; loading", args.ckpt)
    agent.load_checkpoint(args.ckpt)
    log(f"checkpoint loaded: N={agent.gp_x.shape[0]}, collections={agent.num_collections}")

    assert agent.posterior is not None  # load_checkpoint rebuilds it

    opt = agent.optimizer
    if args.chunk:
        opt = dataclasses.replace(opt, chunk_steps=args.chunk)
        object.__setattr__(opt, "_measured_rate", None)

    key = jax.random.PRNGKey(42)
    log(f"starting optimize: R={opt.num_restarts}, steps={args.steps}, "
        f"first chunk budget={opt._first_chunk_budget(opt.num_restarts)}")
    t0 = time.time()
    res = opt.optimize(
        key, agent.policy_params, agent.gp_params, agent.posterior,
        num_opt_steps=args.steps, lr0=0.01, p_dropout0=0.25,
    )
    jax.block_until_ready(res.cost_history)
    el = time.time() - t0
    steps = int(res.steps_done)
    log(f"optimize done: {steps} steps in {el:.1f}s ({1e3 * el / max(steps, 1):.1f} ms/step)")
    if res.restart_costs is not None:
        log("restart costs:", [round(float(c), 2) for c in res.restart_costs],
            "winner", int(res.restart_winner))


if __name__ == "__main__":
    main()
