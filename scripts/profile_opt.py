#!/usr/bin/env python
"""Profile the flagship policy-optimization step (VERDICT r1 #9).

Measures per-step wall-clock of the compiled optimizer chunk, extracts the
compiler's own FLOP/byte estimates (``compiled.cost_analysis()``), derives
MFU / bandwidth utilization against TPU v5e peaks, and optionally captures a
``jax.profiler`` trace for manual inspection.

Usage:
    python scripts/profile_opt.py [--trace-dir /tmp/jax-trace] [--steps 300]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (one chip) peaks — jax-ml.github.io/scaling-book numbers
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBS = 819.0


def main():
    p = argparse.ArgumentParser("profile policy-opt step")
    p.add_argument("--trace-dir", type=str, default=None)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from mcpilco_tpu.control.mc_pilco import ModelFitOptions
    from mcpilco_tpu.scenarios import cartpole as scen

    print(f"devices: {jax.devices()}")
    cfg = scen.CartpoleConfig(seed=1)
    agent, _ = scen.build(cfg)
    for i in range(6):
        agent.collect(cfg.T_exploration, trial_index=i, exploration=True)
    agent.fit_model(ModelFitOptions(num_epochs=1501))

    opt = agent.optimizer
    key = jax.random.PRNGKey(7)
    carry = opt._optimize_init(
        key, agent.policy_params, agent.gp_params, agent.posterior,
        jnp.float32(0.01), jnp.float32(0.25), 0, jnp.int32(0),
    )
    jax.block_until_ready(carry.cost_prev)

    # one compiled chunk of `--steps` optimizer iterations
    lowered = type(opt)._optimize_chunk.lower(
        opt, carry, key, agent.gp_params, agent.posterior,
        jnp.int32(args.steps), jnp.int32(1 << 30), jnp.int32(0),
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})

    run = lambda c, n: compiled(
        c, key, agent.gp_params, agent.posterior, jnp.int32(n),
        jnp.int32(1 << 30), jnp.int32(0)
    )
    out = run(carry, 20)  # warmup on top of init
    jax.block_until_ready(out.cost_prev)

    t0 = time.time()
    out = run(carry, args.steps)
    jax.block_until_ready(out.cost_prev)
    elapsed = time.time() - t0
    steps = int(out.step)
    s_per_step = elapsed / max(steps, 1)
    print(f"[profile] {steps} steps in {elapsed:.2f}s -> {1e3 * s_per_step:.3f} ms/step")

    # XLA's cost_analysis counts the while_loop BODY once (trip count is
    # dynamic), so its totals approximate ONE optimizer step + init overhead.
    flops_step_xla = float(ca.get("flops", 0.0))
    bytes_step_xla = float(ca.get("bytes accessed", 0.0))

    # Analytic per-step FLOP model from the actual shapes.  Hot op: the GP
    # posterior variance quad term k* @ K^-1 (P x M x M matmul) per head per
    # scan step; backward ~ 2x forward.
    P = opt.num_particles
    H = opt.horizon
    G = agent.gp.num_heads
    M = int(agent.posterior.x_tr.shape[-2])
    D = agent.model.gp_input_dim
    B = agent.policy.num_basis
    gram = 3 * P * M * D  # pairwise diffs + weighting + exp (per head)
    quad = 2 * P * M * M + 2 * P * M  # k @ K^-1 contraction + k.alpha
    policy = 3 * P * B * (D + 1) + 2 * P * B
    fwd = H * (G * (gram + quad) + policy)
    flops_step_model = 3 * fwd  # value_and_grad ~ fwd + 2x bwd
    # per-step HBM floor: K^-1 + x_tr + alpha re-read every scan step
    bytes_step_model = H * 4 * (G * (M * M + 2 * M) + M * D)

    mfu = flops_step_model / s_per_step / V5E_PEAK_BF16_FLOPS
    hbm_util = bytes_step_model / s_per_step / (V5E_PEAK_HBM_GBS * 1e9)
    report = {
        "ms_per_step": round(1e3 * s_per_step, 3),
        "shapes": {"P": P, "H": H, "G": G, "M": M, "D": D, "basis": B},
        "model_flops_per_step": flops_step_model,
        "model_min_bytes_per_step": bytes_step_model,
        "xla_body_flops": flops_step_xla,
        "xla_body_bytes": bytes_step_xla,
        "mfu_vs_bf16_peak": round(mfu, 4),
        "hbm_floor_utilization": round(hbm_util, 4),
        "tflops_achieved": round(flops_step_model / s_per_step / 1e12, 2),
    }
    print(json.dumps(report, indent=1))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        f"profile_opt_{os.environ.get('MCPILCO_ROUND', 'latest')}.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[profile] wrote {out_path}")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            out = run(carry, 50)
            jax.block_until_ready(out.cost_prev)
        print(f"[profile] trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
