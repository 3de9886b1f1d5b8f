#!/usr/bin/env python
"""A/B the rollout-scan unroll factor on the flagship optimize loop.

VERDICT r2 #8: the profiled perf ceiling is per-scan-step fusion overhead
(~30 small kernels per rollout step).  `lax.scan(..., unroll=k)` lets XLA
fuse across consecutive steps.  For each k this measures ms/step AND the
learning-curve gate (cost trajectory over 300 steps, seed key 7 — the only
accepted correctness gate for compute-path changes; see RESULTS.md round-1
Pallas lesson).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions
    from mcpilco_tpu.scenarios import cartpole as scen

    print(f"devices: {jax.devices()}", flush=True)
    cfg = scen.CartpoleConfig(seed=1)
    agent, _ = scen.build(cfg)
    for i in range(6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=1501))
    print(f"dataset N={agent.gp_x.shape[0]}", flush=True)

    results = {}
    unrolls = [int(v) for v in (sys.argv[1:] or ["1", "2", "4", "6", "10"])]
    for k in unrolls:
        opt = dataclasses.replace(
            agent.optimizer, engine=dataclasses.replace(agent.optimizer.engine, scan_unroll=k)
        )
        key = jax.random.PRNGKey(7)
        t0 = time.time()
        res = opt.optimize(
            key, agent.policy_params, agent.gp_params, agent.posterior,
            num_opt_steps=20, lr0=0.01, p_dropout0=0.25,
        )
        jax.block_until_ready(res.cost_history)
        compile_s = time.time() - t0

        t0 = time.time()
        res = opt.optimize(
            jax.random.fold_in(key, 1), agent.policy_params, agent.gp_params,
            agent.posterior, num_opt_steps=300, lr0=0.01, p_dropout0=0.25,
        )
        jax.block_until_ready(res.cost_history)
        steps = int(res.steps_done)
        ms = 1e3 * (time.time() - t0) / max(steps, 1)
        c = np.asarray(res.cost_history)
        results[k] = {
            "ms_per_step": round(ms, 3),
            "compile_s": round(compile_s, 1),
            "cost_first": round(float(c[0]), 2),
            "cost_last": round(float(c[steps - 1]), 2),
            "learns": bool(c[steps - 1] < c[0] - 20.0),  # healthy: ~51 -> ~18
        }
        print(f"unroll={k}: {results[k]}", flush=True)

    # GP-fit epoch-scan unroll (same overhead argument, secondary headline:
    # full-training wall-clock)
    data = agent._padded_data()
    fit_res = {}
    for k in (1, 4, 8):
        params0 = agent.gp.init_params(sigma_n=agent.gp_sigma_n_init,
                                       per_head_overrides=agent.gp_init_overrides)
        p, losses = agent.gp.fit(params0, data, num_epochs=1501, unroll=k)  # compile
        jax.block_until_ready(losses)
        t0 = time.time()
        p, losses = agent.gp.fit(params0, data, num_epochs=1501, unroll=k)
        jax.block_until_ready(losses)
        fit_res[k] = {"fit_s": round(time.time() - t0, 2),
                      "mll_last": round(float(losses[-1]), 2)}
        print(f"fit unroll={k}: {fit_res[k]}", flush=True)
    results["fit"] = fit_res

    out = "results_tmp/bench_unroll.json"
    os.makedirs("results_tmp", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
