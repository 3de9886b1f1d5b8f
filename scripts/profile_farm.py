#!/usr/bin/env python
"""Diagnose the seed farm's batch-size throughput scaling (VERDICT r2 #6).

Measures the vmapped policy-opt chunk at farm batches S in {1,2,4,8} on the
flagship cartpole config with a FIXED chunk size, reporting ms per seed-step
(device execution only, steady state) so host/chunking overhead and device
scaling separate cleanly.  Optionally writes a jax.profiler trace per S.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions, PolicyOptOptions
    from mcpilco_tpu.parallel.multiseed import SeedFarm
    from mcpilco_tpu.scenarios import cartpole as scen

    trace_dir = os.environ.get("FARM_TRACE_DIR")
    print(f"devices: {jax.devices()}", flush=True)

    batches = tuple(
        int(v) for v in os.environ.get("FARM_S", "1,2,4,8").split(",")
    )
    gram_chunk = int(os.environ.get("FARM_GRAM_CHUNK", "0")) or None

    out = {}
    for s_count in batches:
        cfg = scen.CartpoleConfig(seed=1)
        agent, _ = scen.build(cfg)
        if gram_chunk:
            # bound the rollout gram's [S*P, chunk, D] intermediate (the
            # VMEM-cliff experiment; MultiGP.gram_chunk)
            opt = agent.optimizer
            eng = opt.engine
            agent.optimizer = dataclasses.replace(
                opt,
                engine=dataclasses.replace(
                    eng, gp=dataclasses.replace(eng.gp, gram_chunk=gram_chunk)
                ),
            )
        farm = SeedFarm(
            agent, list(range(1, 1 + s_count)),
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
            chunk_steps_override=40,  # fixed across S so chunking overhead separates
        )
        farm.collect(cfg.T_exploration, trial_index=0, exploration=True)
        for i in range(1, 6):  # grow dataset to final-trial size (~360)
            farm.collect(cfg.T_control, trial_index=i, exploration=True)
        farm.fit_model(ModelFitOptions(num_epochs=300))

        opts = PolicyOptOptions(opt_steps=120, learning_rate=0.01, p_dropout=0.25)
        # warmup/compile
        t0 = time.time()
        farm.improve_policy(opts, 0)
        compile_s = time.time() - t0
        # steady state, fresh farm state not needed — timing only
        t0 = time.time()
        if trace_dir:
            with jax.profiler.trace(os.path.join(trace_dir, f"S{s_count}")):
                cost, steps, _ = farm.improve_policy(opts, 1)
        else:
            cost, steps, _ = farm.improve_policy(opts, 1)
        wall = time.time() - t0
        total_steps = int(steps.sum())
        out[s_count] = {
            "ms_per_seed_step": round(1e3 * wall / max(total_steps, 1), 2),
            "ms_per_batched_step": round(1e3 * wall / max(int(steps.max()), 1), 2),
            "compile_s": round(compile_s, 1),
            "steps": int(steps.max()),
        }
        print(f"S={s_count}: {out[s_count]}", flush=True)

    path = "results_tmp/profile_farm.json"
    os.makedirs("results_tmp", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
