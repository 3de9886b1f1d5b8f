#!/usr/bin/env python
"""Attribute the r2->r3 single-seed step-time regression (VERDICT r3 #2).

bench.py r4 still reads ~6.2 ms/step with the lax.cond NaN-branch style
default, while the compiled-chunk profile at the restructure commit read
5.78 (results/profile_opt_r3.json).  Two candidate components:

  A. loop-BODY cost of the NaN-retry machinery itself — measured here at the
     compiled-chunk level (single device dispatch, no host round-trips) for
     nan_branch_style in {cond, where, off}; "off" is the bare healthy-step
     body (no guard at all), the floor.
  B. HARNESS cost — bench.py times `optimize()`, whose warm-up call used to
     store a compile-poisoned `_measured_rate`, shrinking the timed run's
     first chunk to the 25-step floor and splitting 300 steps into extra
     tunneled host round-trips.  Measured here as optimize()-level ms/step
     with (b1) a deliberately poisoned rate (the old behavior, reproduced by
     force-setting `_measured_rate` low) vs (b2) the fixed default path.

Writes results/bench_attrib_r4.json and prints one JSON line.
Run on the real chip (~5 compiles, ~5 min total).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mcpilco_tpu.utils.tpu_health import wait_for_chip, probe_env_window

    if not wait_for_chip(probe_env_window(), log=log):
        log("[attrib] chip unreachable; exiting 4")
        sys.exit(4)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions
    from mcpilco_tpu.scenarios import cartpole as scen

    log(f"[attrib] devices: {jax.devices()}")
    cfg = scen.CartpoleConfig(seed=1)
    agent, _ = scen.build(cfg)
    for i in range(6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=1501))

    opt = agent.optimizer
    key = jax.random.PRNGKey(7)
    gp_params, post, pol = agent.gp_params, agent.posterior, agent.policy_params
    n = 300
    report = {}

    # --- A: compiled-chunk level, one dispatch, per style -------------------
    for style in ("cond", "where", "off"):
        o = opt if style == opt.nan_branch_style else dataclasses.replace(
            opt, nan_branch_style=style
        )
        carry = o._optimize_init(
            key, pol, gp_params, post,
            jnp.float32(0.01), jnp.float32(0.25), jnp.int32(0), jnp.int32(0),
        )
        big = jnp.int32(1 << 30)
        run = lambda c, m: o._optimize_chunk(
            c, key, gp_params, post, jnp.int32(m), big, jnp.int32(0)
        )
        out = run(carry, 20)  # compile + warmup
        jax.block_until_ready(out.cost_prev)
        t0 = time.time()
        out = run(carry, n)
        jax.block_until_ready(out.cost_prev)
        ms = 1e3 * (time.time() - t0) / max(int(out.step), 1)
        report[f"chunk_ms_{style}"] = round(ms, 3)
        log(f"[attrib] chunk-level {style}: {ms:.3f} ms/step "
            f"(cost {float(out.cost_prev):.2f})")

    # --- B: optimize()-level, cond style ------------------------------------
    def timed_optimize(o, tag):
        # warmup exactly as bench.py does (compile inside the first chunk)
        r = o.optimize(key, pol, gp_params, post,
                       num_opt_steps=20, lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(r.cost_history)
        t0 = time.time()
        r = o.optimize(jax.random.fold_in(key, 1), pol, gp_params, post,
                       num_opt_steps=n, lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(r.cost_history)
        ms = 1e3 * (time.time() - t0) / max(int(r.steps_done), 1)
        log(f"[attrib] optimize-level {tag}: {ms:.3f} ms/step "
            f"(measured_rate={getattr(o, '_measured_rate', None)})")
        return round(ms, 3)

    # b2: the fixed path (first-chunk rates never stored across calls)
    report["optimize_ms_fixed"] = timed_optimize(opt, "fixed")

    # b1: the old poisoned-rate behavior, reproduced by force-storing the
    # compile-inclusive rate a 20-step warm-up chunk used to leave behind
    object.__setattr__(opt, "_measured_rate", 0.7)  # ~20 steps / 30 s compile
    report["optimize_ms_poisoned_rate"] = timed_optimize(opt, "poisoned-rate")
    object.__setattr__(opt, "_measured_rate", None)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "bench_attrib_r4.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    log(f"[attrib] wrote {out_path}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
