#!/usr/bin/env python
"""Why does the vmapped (farm) policy-opt step cost ~2.7x per seed vs the
plain optimizer at S=1?  Compares XLA's own cost model (bytes accessed /
FLOPs) for the compiled plain chunk vs the vmapped chunk at S in {1, 4},
plus measured execution times.  Compile-only where possible.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions, PolicyOptOptions
    from mcpilco_tpu.parallel.multiseed import SeedFarm
    from mcpilco_tpu.scenarios import cartpole as scen

    print(f"devices: {jax.devices()}", flush=True)
    cfg = scen.CartpoleConfig(seed=1)
    agent, _ = scen.build(cfg)
    for i in range(6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=300))
    opt = agent.optimizer

    def report(tag, compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        byts = ca.get("bytes accessed", float("nan"))
        print(f"[{tag}] flops={flops:.3e} bytes={byts:.3e}", flush=True)
        return flops, byts

    # plain chunk (the production single-seed path)
    key = jax.random.PRNGKey(7)
    carry = opt._optimize_init(key, agent.policy_params, agent.gp_params,
                               agent.posterior, 0.01, 0.25, 0, jnp.int32(0))
    chunk = jax.jit(opt._optimize_chunk)
    lowered = chunk.lower(carry, key, agent.gp_params, agent.posterior,
                          jnp.int32(40), jnp.int32(1 << 30), jnp.int32(0))
    c_plain = lowered.compile()
    f1, b1 = report("plain S=none", c_plain)

    for s_count in (1, 4):
        farm = SeedFarm(
            agent, list(range(1, 1 + s_count)),
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
            chunk_steps_override=40,
        )
        farm.collect(cfg.T_exploration, trial_index=0, exploration=True)
        for i in range(1, 6):
            farm.collect(cfg.T_control, trial_index=i, exploration=True)
        farm.fit_model(ModelFitOptions(num_epochs=300))
        keys = farm.keys
        init = jax.jit(jax.vmap(
            lambda k, pp, gpp, post: opt._optimize_init(
                k, pp, gpp, post, 0.01, 0.25, 0, jnp.int32(0)
            ),
            in_axes=(0, 0, 0, 0),
        ))
        carry_b = init(keys, farm.policy_params, farm.gp_params, farm.posterior)
        vchunk = jax.jit(jax.vmap(
            lambda c, k, gpp, post: opt._optimize_chunk(
                c, k, gpp, post, jnp.int32(40), jnp.int32(1 << 30), jnp.int32(0)
            ),
            in_axes=(0, 0, 0, 0),
        ))
        lowered_v = vchunk.lower(carry_b, keys, farm.gp_params, farm.posterior)
        c_v = lowered_v.compile()
        fv, bv = report(f"vmap S={s_count}", c_v)
        print(
            f"[vmap S={s_count}] per-seed flops ratio vs plain: {fv / s_count / f1:.2f}; "
            f"per-seed bytes ratio: {bv / s_count / b1:.2f}",
            flush=True,
        )
        # measured execution (steady state, 3 reps)
        out = c_v(carry_b, keys, farm.gp_params, farm.posterior)
        jax.block_until_ready(out.step)
        t0 = time.time()
        for _ in range(3):
            out = c_v(carry_b, keys, farm.gp_params, farm.posterior)
            jax.block_until_ready(out.step)
        print(f"[vmap S={s_count}] measured chunk: {(time.time() - t0) / 3:.3f}s", flush=True)

    out = c_plain(carry, key, agent.gp_params, agent.posterior, jnp.int32(40), jnp.int32(1 << 30), jnp.int32(0))
    jax.block_until_ready(out.step)
    t0 = time.time()
    for _ in range(3):
        out = c_plain(carry, key, agent.gp_params, agent.posterior, jnp.int32(40), jnp.int32(1 << 30), jnp.int32(0))
        jax.block_until_ready(out.step)
    print(f"[plain] measured chunk: {(time.time() - t0) / 3:.3f}s", flush=True)


if __name__ == "__main__":
    main()
