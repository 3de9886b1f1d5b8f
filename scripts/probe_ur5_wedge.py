#!/usr/bin/env python
"""Bisect the UR5 trial-0 policy-opt tunnel wedge (round 4).

Observed: the UR5 trial-0 policy-opt first chunk NEVER returns on the
tunneled TPU runtime — 5+ attempts across rounds 3-4 under 600 s and 1200 s
stall windows, plus one uninterrupted 53-minute no-watchdog window, all
silent at ~0 client CPU.  The exact program (identical checkpoint and
shapes) compiles and executes on a single CPU core in ~10 minutes
(/tmp/ur5_cpu_probe.py evidence, RESULTS.md), and its StableHLO is only
0.33 MB — so the hang is remote-side and program-specific, matching the
MuJoCo restarts=4 vmapped precedent (fine on CPU, deterministic remote
stall).

This script dispatches ONE bounded optimize chunk from the preserved seed-2
checkpoint under named program variants, to find which structural ingredient
triggers the hang:

  base        the shipped program (expected: hangs — run it last, or not at all)
  nan_off     nan_branch_style="off"   (no NaN-guard branches in the loop body)
  nan_where   nan_branch_style="where" (computed merge, the round-3 style)
  horizon100  rollout horizon 200 -> 100 (diagnostic only, not shippable)
  particles100  200 -> 100 particles (diagnostic only)
  nounroll    scan_unroll stays 1 but rollout remat disabled (diagnostic)

Usage: probe_ur5_wedge.py --variant nan_off [--ckpt DIR] [--steps 25]
                          [--budget-s 900]

Each invocation is a fresh process (one TPU client at a time); drive it from
a queue with a `timeout` bound.  Exit 0 = chunk returned (variant runs),
124/143 via timeout = variant hangs too.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print("[probe-ur5]", *a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True,
                   choices=("base", "nan_off", "nan_where", "horizon100",
                            "particles100", "nounroll"))
    p.add_argument("--ckpt", default="/tmp/ur5_cpu_check/model_trial0")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache
    from mcpilco_tpu.utils.tpu_health import wait_for_chip, probe_env_window

    enable_persistent_cache()
    if not args.platform and not wait_for_chip(probe_env_window(), log=log):
        log("chip unreachable; exiting 4")
        sys.exit(4)

    import jax.numpy as jnp

    from mcpilco_tpu.scenarios import ur5 as scen

    cfg = scen.UR5Config(seed=2)
    agent, kw = scen.build(cfg)
    agent.load_checkpoint(args.ckpt)
    opt = agent.optimizer
    eng = opt.engine

    if args.variant == "nan_off":
        opt = dataclasses.replace(opt, nan_branch_style="off")
    elif args.variant == "nan_where":
        opt = dataclasses.replace(opt, nan_branch_style="where")
    elif args.variant == "horizon100":
        opt = dataclasses.replace(opt, horizon=100)
    elif args.variant == "particles100":
        opt = dataclasses.replace(opt, num_particles=100)
    elif args.variant == "nounroll":
        opt = dataclasses.replace(opt, engine=dataclasses.replace(eng, remat=False))

    log(f"variant={args.variant} devices={jax.devices()}")
    key = jax.random.PRNGKey(2)
    carry = opt._optimize_init(
        key, agent.policy_params, agent.gp_params, agent.posterior,
        0.01, 0.25, 0, jnp.zeros((), jnp.int32),
    )
    log("init carry built; dispatching one chunk "
        f"({args.steps} steps) — heartbeat follows")
    stop = opt._heartbeat(f"probe {args.variant}", every_s=60.0)
    t0 = time.time()
    try:
        carry = opt._optimize_chunk(
            carry, key, agent.gp_params, agent.posterior,
            jnp.int32(args.steps), jnp.int32(4 * args.steps + 64), 0,
        )
        done = bool(jnp.all(carry.done))
    finally:
        stop()
    dt = time.time() - t0
    out = {
        "variant": args.variant,
        "chunk_s": round(dt, 1),
        "steps": int(jnp.min(carry.step)),
        "done": done,
        "cost": float(jnp.min(carry.cost_prev)),
    }
    log("chunk returned:", json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
