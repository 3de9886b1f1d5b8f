#!/usr/bin/env python
"""Bisect the MuJoCo restarts=4 VMAPPED trial-2 TPU stall (VERDICT r4 item 5).

Observed (rounds 3-4): with ``num_restarts=4, restart_vmap=True`` the MuJoCo
cartpole sweep deterministically never returns from the TRIAL-2 first
optimize chunk on the tunneled TPU (3/3 attempts), while the same checkpoint
+ program runs on CPU and every R=1 program runs on the TPU
(control/trainer.py restart_vmap docstring).  Trial 2 is exactly where the
padded dataset bucket jumps to N=192 (60 -> 64, 120 -> 128, 180 -> 192;
ops/linalg.bucket_size), i.e. the hang is specific to ONE freshly-compiled
program: the R=4-vmapped largest-bucket chunk.

This probe splits compile-stall from execution-stall and bisects the
structural ingredient, one bounded leg per process:

  --mode aot   jit-lower + compile the exact `_optimize_chunk_multi` program
               (no dispatch), print compile seconds + XLA memory_analysis
               (VMEM/HBM).  A hang here = compiler-side; a clean compile
               with sane VMEM = runtime-side.
  --mode run   dispatch ONE bounded chunk (--steps) with the trainer's
               heartbeat, print chunk seconds + min lane cost.

Variants: --restarts N (4 -> 2 bisect), --nan-style off|where|cond,
--particles P, --horizon H.  Checkpoint: a complete_trial1 MuJoCo log dir
(the trial-2 program's incoming state).  Drive each leg under `timeout`;
exit 124/137 = that leg stalls too.  One TPU client at a time.

Round-5 findings (RESULTS.md "compiler exonerated"): the aot leg is CLEAN
on the real chip (compile 6.6 s, temp 2.64 GB, results/
probe_mj_r4_aot_r5.json), so the stall is execution-side in the tunneled
runtime.  Interpretation caveat for the run leg: the tunneled runtime's
sitecustomize claims the chip at INTERPRETER START, so while a previous
client's claim lingers (~250 s after a clean exit, ~25 min after a
SIGTERM) this script blocks BEFORE ITS FIRST PRINT — a silent leg under
timeout means "claim-blocked", not "dispatch hang", unless the
mode=... banner was printed first.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print("[probe-mjr4]", *a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("aot", "run"), required=True)
    p.add_argument("--ckpt", required=True, help="MuJoCo complete_trial1 log dir")
    p.add_argument("--restarts", type=int, default=4)
    p.add_argument("--nan-style", default="cond", choices=("cond", "where", "off"))
    p.add_argument("--particles", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--platform", default=None)
    p.add_argument("--cost-lengthscales", default="fixed")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache
    from mcpilco_tpu.utils.tpu_health import probe_env_window, wait_for_chip

    enable_persistent_cache()
    if not args.platform and not wait_for_chip(probe_env_window(), log=log):
        log("chip unreachable; exiting 4")
        sys.exit(4)

    import jax.numpy as jnp

    from mcpilco_tpu.scenarios import cartpole_mujoco as scen

    cfg = scen.CartpoleMujocoConfig(
        seed=6,
        num_restarts=args.restarts,
        restart_vmap=True,
        cost_lengthscales=args.cost_lengthscales,
    )
    agent, _ = scen.build(cfg)
    agent.load_checkpoint(args.ckpt)
    opt = agent.optimizer
    if args.nan_style != "cond":
        opt = dataclasses.replace(opt, nan_branch_style=args.nan_style)
    if args.particles:
        opt = dataclasses.replace(opt, num_particles=args.particles)
    if args.horizon:
        opt = dataclasses.replace(opt, horizon=args.horizon)

    N = agent.gp_x.shape[0]
    log(
        f"mode={args.mode} R={args.restarts} nan={args.nan_style} "
        f"P={opt.num_particles} H={opt.horizon} dataset N={N} "
        f"devices={jax.devices()}"
    )

    from mcpilco_tpu.utils import prng

    # exact optimize() lane construction: lane 0 = incoming params, lanes
    # 1..R-1 = fresh reinit draws (trainer.optimize multi branch)
    key = jax.random.PRNGKey(6)
    rkeys = jax.random.split(prng.fold(key, prng.STREAM_RESTARTS), args.restarts - 1)
    inits = [agent.policy_params] + [
        opt.engine.policy.reinit(agent.policy_params, k) for k in rkeys
    ]
    params_r = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *inits)
    carry = opt._optimize_init_multi(
        key, params_r, agent.gp_params, agent.posterior, 0.01, 0.25, 2
    )
    chunk_end = jnp.int32(args.steps)
    iter_end = carry.iters + jnp.int32(4 * args.steps + 64)

    if args.mode == "aot":
        t0 = time.time()
        lowered = type(opt)._optimize_chunk_multi.lower(
            opt, carry, key, agent.gp_params, agent.posterior, chunk_end, iter_end, 2
        )
        t_lower = time.time() - t0
        log(f"lowered in {t_lower:.1f}s; compiling...")
        t0 = time.time()
        compiled = lowered.compile()
        t_comp = time.time() - t0
        mem = {}
        try:
            ma = compiled.memory_analysis()
            for f in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "generated_code_size_in_bytes",
                "peak_memory_in_bytes",
            ):
                v = getattr(ma, f, None)
                if v is not None:
                    mem[f] = int(v)
        except Exception as e:  # memory_analysis is backend-dependent
            mem["error"] = str(e)
        out = {
            "mode": "aot",
            "restarts": args.restarts,
            "nan_style": args.nan_style,
            "N": N,
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_comp, 1),
            "memory": mem,
        }
        print(json.dumps(out))
        return

    stop = opt._heartbeat(f"probe R={args.restarts}", every_s=60.0)
    t0 = time.time()
    try:
        carry = opt._optimize_chunk_multi(
            carry, key, agent.gp_params, agent.posterior, chunk_end, iter_end, 2
        )
        steps = int(jnp.min(carry.step))
    finally:
        stop()
    out = {
        "mode": "run",
        "restarts": args.restarts,
        "nan_style": args.nan_style,
        "particles": opt.num_particles,
        "horizon": opt.horizon,
        "N": N,
        "chunk_s": round(time.time() - t0, 1),
        "steps": steps,
        "lane_costs": [float(c) for c in jnp.ravel(carry.cost_prev)],
    }
    log("chunk returned:", json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
