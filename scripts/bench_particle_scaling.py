#!/usr/bin/env python
"""Particle-count scaling study: ms/step and per-particle throughput.

The reference runs 400 particles because that is what its GPU budget allowed
(test_mcpilco_cartpole.py:199-216).  On the TPU the rollout step is neither
MXU- nor HBM-bound at 400 particles (RESULTS.md step profile: 3.8% MFU,
ceiling = per-scan-step fusion overhead) — so particle count should scale far
better than linearly in cost until the [P, M] contractions start filling the
MXU.  This measures it: same flagship scenario, same dataset, same policy,
num_particles swept, 100 timed opt steps each (fresh jit per P; static
shapes).

A flat ms/step curve is a capability statement: Monte-Carlo gradient variance
falls as 1/P at nearly zero marginal cost, letting production runs use
thousands of particles where the reference uses hundreds.

Writes results/bench_particles_{MCPILCO_ROUND|latest}.json.
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
    import jax
    import numpy as np

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions
    from mcpilco_tpu.scenarios import cartpole as scen

    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in flags  # CPU plumbing check: tiny fit + few steps
    for f in flags:
        if f.startswith("--platform="):
            # env JAX_PLATFORMS does not reliably take effect on this box;
            # an explicit config update (as tests/conftest.py does) is the
            # only dependable way to force CPU
            jax.config.update("jax_platforms", f.split("=", 1)[1])
    log(f"[particles] devices: {jax.devices()}")
    counts = [int(c) for c in (args[0].split(",") if args
                               else ["400", "800", "1600", "3200"])]

    # one shared dataset + fitted GP so only P varies across arms
    cfg = scen.CartpoleConfig(seed=1)
    if quick:
        cfg = cfg.smoke()
    agent, _ = scen.build(cfg)
    for i in range(2 if quick else 6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=101 if quick else 1501))
    log(f"[particles] dataset N={agent.gp_x.shape[0]}")

    results = {}
    n_steps = 20 if quick else 100
    for p_count in counts:
        a_p, _ = scen.build(dataclasses.replace(cfg, num_particles=p_count))
        opt = a_p.optimizer
        key = jax.random.PRNGKey(7)
        t0 = time.time()
        res = opt.optimize(key, agent.policy_params, agent.gp_params,
                           agent.posterior, num_opt_steps=5 if quick else 20,
                           lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(res.cost_history)
        compile_s = time.time() - t0
        t0 = time.time()
        res = opt.optimize(jax.random.fold_in(key, 1), agent.policy_params,
                           agent.gp_params, agent.posterior,
                           num_opt_steps=n_steps, lr0=0.01, p_dropout0=0.25)
        jax.block_until_ready(res.cost_history)
        steps = int(res.steps_done)
        ms = 1e3 * (time.time() - t0) / max(steps, 1)
        c = np.asarray(res.cost_history)
        results[str(p_count)] = {
            "ms_per_step": round(ms, 3),
            "us_per_particle_step": round(1e3 * ms / p_count, 3),
            "compile_s": round(compile_s, 1),
            "cost_first_last": [round(float(c[0]), 2),
                                round(float(c[steps - 1]), 2)],
        }
        log(f"[particles] P={p_count}: {ms:.2f} ms/step "
            f"({1e3 * ms / p_count:.2f} us/particle-step)")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results",
        f"bench_particles_{os.environ.get('MCPILCO_ROUND', 'latest')}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
