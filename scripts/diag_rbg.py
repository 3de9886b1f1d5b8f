#!/usr/bin/env python
"""Diagnose the hardware-RNG (rbg) 1.7x inversion (VERDICT r3 #7).

Round 2 measured `prng.use_fast_prng` ~5% FASTER than threefry on the
flagship policy-opt step; after the round-3 loop-based NaN-retry restructure
it measured 1.7x SLOWER.  This script localizes the mechanism by timing the
same flagship computation at three granularities under both PRNGs:

  1. bare rollout fwd+bwd (no while_loop)   — is the rollout itself slower?
  2. one compiled optimize chunk (while_loop) — is it the loop interaction?
  3. compiled-HLO structure counts           — what does XLA do differently?

Usage: python scripts/diag_rbg.py [--steps 200] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print("[diag-rbg]", *a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions
    from mcpilco_tpu.scenarios import cartpole as scen
    from mcpilco_tpu.utils import prng

    log("devices:", jax.devices())
    cfg = scen.CartpoleConfig(seed=1)
    agent, _ = scen.build(cfg)
    for i in range(6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=1501))
    log(f"dataset N={agent.gp_x.shape[0]}")
    opt = agent.optimizer
    engine = opt.engine

    def time_rollout(key):
        """Bare rollout grad (the loop body's dominant work), jitted alone."""
        grad_fn = jax.jit(jax.grad(
            lambda p, k: opt._rollout_cost(
                p, agent.gp_params, agent.posterior, k, jnp.float32(0.25), 0)[0]
        ))
        g = grad_fn(agent.policy_params, key)  # compile
        jax.block_until_ready(g)
        n = 50
        t0 = time.perf_counter()
        for i in range(n):
            g = grad_fn(agent.policy_params, jax.random.fold_in(key, i))
        jax.block_until_ready(g)
        return 1e3 * (time.perf_counter() - t0) / n

    def time_chunk(key):
        """One compiled optimize() of args.steps steps (the production path)."""
        r = opt.optimize(key, agent.policy_params, agent.gp_params, agent.posterior,
                         num_opt_steps=20, lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(r.cost_history)
        t0 = time.perf_counter()
        r = opt.optimize(jax.random.fold_in(key, 1), agent.policy_params,
                         agent.gp_params, agent.posterior,
                         num_opt_steps=args.steps, lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(r.cost_history)
        return 1e3 * (time.perf_counter() - t0) / max(int(r.steps_done), 1)

    def hlo_stats(key):
        """Structure counts of the compiled chunk program."""
        carry = opt._optimize_init(key, agent.policy_params, agent.gp_params,
                                   agent.posterior, jnp.float32(0.01),
                                   jnp.float32(0.25), jnp.int32(0), jnp.int32(0))
        txt = type(opt)._optimize_chunk.lower(
            opt, carry, key, agent.gp_params, agent.posterior,
            jnp.int32(100), jnp.int32(1 << 30), jnp.int32(0)
        ).compile().as_text()
        return {
            "hlo_bytes": len(txt),
            "fusions": txt.count(" fusion("),
            "rng_bit_generator": txt.count("rng-bit-generator"),
            "while_ops": txt.count(" while("),
            "copies": txt.count(" copy("),
            "all_reduce": txt.count("all-reduce"),
        }

    out = {}
    for name, setup in [("threefry", lambda: None), ("rbg", prng.use_fast_prng)]:
        setup()
        key = jax.random.PRNGKey(7)
        out[name] = {
            "rollout_grad_ms": round(time_rollout(key), 3),
            "chunk_ms_per_step": round(time_chunk(key), 3),
            "hlo": hlo_stats(key),
        }
        log(name, json.dumps(out[name]))

    t, r = out["threefry"], out["rbg"]
    log(f"rollout-only ratio rbg/threefry: "
        f"{r['rollout_grad_ms'] / t['rollout_grad_ms']:.2f}")
    log(f"in-loop ratio  rbg/threefry: "
        f"{r['chunk_ms_per_step'] / t['chunk_ms_per_step']:.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
