#!/usr/bin/env python
"""Classify a scenario's failure mode per seed (round-3; VERDICT r2 #4 asked
for statistics, this asks WHY the failing fraction fails).

For every seed's final checkpoint this script separates the two candidate
failure modes:

- OPTIMIZATION failure: the optimizer never found a swing-up even in its own
  model (in-model particle success fraction low, converged in-model cost
  high).  Fix lever: policy-init restarts (PolicyOptimizer.num_restarts) /
  exploration richness / opt budget.
- MODEL-OPTIMISM failure: the policy swings up the learned model but not the
  real plant (in-model success high, executed trial fails).  Fix lever:
  model capacity / data coverage / rollout stabilizers.

Also reports the one-step prediction RMSE of the final model along the
EXECUTED final trial (the analyze_pms_bias.py methodology) so model quality
is measured, not guessed.

Usage: python scripts/analyze_mujoco_failures.py [--scenario mujoco|furuta]
       [--root results_tmp] [--seeds 1,2,...] [--platform cpu] [--json out.json]
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mujoco_upright_fraction(states):
    """MuJoCo cartpole oracle per particle: angle idx 1 wrapped to 0 upright,
    |x| < 0.5, over the final quarter.  states: [H, P, D]."""
    import numpy as np

    tail = states[-(states.shape[0] // 4):]
    wrapped = np.abs((tail[:, :, 1] + np.pi) % (2 * np.pi) - np.pi)
    ok = np.all(wrapped < 0.25, axis=0) & np.all(np.abs(tail[:, :, 0]) < 0.5, axis=0)
    return float(ok.mean())


def furuta_upright_fraction(states):
    """Furuta oracle per particle: |theta_v| (idx 1) within 0.3 of pi."""
    import numpy as np

    tail = states[-(states.shape[0] // 4):]
    ok = np.all(np.abs(np.abs(tail[:, :, 1]) - np.pi) < 0.3, axis=0)
    return float(ok.mean())


def cartpole_upright_fraction(states):
    """ODE cartpole oracle per particle (incl. 4PMS): |theta| (idx 2) within
    0.25 of pi, |x| (idx 0) < 0.5, over the final quarter."""
    import numpy as np

    tail = states[-(states.shape[0] // 4):]
    ok = np.all(np.abs(np.abs(tail[:, :, 2]) - np.pi) < 0.25, axis=0) & np.all(
        np.abs(tail[:, :, 0]) < 0.5, axis=0
    )
    return float(ok.mean())


def _scenarios():
    from mcpilco_tpu.scenarios import cartpole_mujoco, cartpole_pms, furuta

    return {
        "mujoco": dict(
            mod=cartpole_mujoco, cfg=cartpole_mujoco.CartpoleMujocoConfig,
            prefix="cartpole_mujoco", upright=mujoco_upright_fraction,
            heads=("xd", "thd"),
        ),
        "furuta": dict(
            mod=furuta, cfg=furuta.FurutaConfig,
            prefix="furuta", upright=furuta_upright_fraction,
            heads=("dth_h", "dth_v"),
        ),
        "pms": dict(
            mod=cartpole_pms, cfg=cartpole_pms.CartpolePMSConfig,
            prefix="cartpole_pms", upright=cartpole_upright_fraction,
            heads=("xd", "thd"),
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="mujoco", choices=("mujoco", "furuta", "pms"))
    p.add_argument("--root", default="results_tmp")
    p.add_argument("--seeds", default=None, help="comma list; default: all run dirs")
    p.add_argument("--tag", default=None,
                   help="sweep out-tag infix (repeat.py --out-tag): run dirs "
                        "are <prefix>_<tag>_<seed> instead of <prefix>_<seed>")
    p.add_argument("--platform", default=None)
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    spec = _scenarios()[args.scenario]
    scen, prefix, upright = spec["mod"], spec["prefix"], spec["upright"]
    if args.tag:
        prefix = f"{prefix}_{args.tag}"

    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
    else:
        seeds = sorted(
            int(m.group(1))
            for d in glob.glob(os.path.join(args.root, f"{prefix}_*"))
            if (m := re.fullmatch(rf".*{prefix}_(\d+)", d))
        )

    rows = []
    for seed in seeds:
        run_dir = os.path.join(args.root, f"{prefix}_{seed}")
        ckpts = sorted(glob.glob(os.path.join(run_dir, "complete_trial*")))
        if not ckpts:
            print(f"seed {seed}: no checkpoints under {run_dir}, skipping")
            continue
        ckpt = ckpts[-1]
        agent, _ = scen.build(spec["cfg"](seed=seed))
        agent.load_checkpoint(ckpt)

        final = agent.trials[-1]
        executed_cost = agent.trial_cumulative_cost(-1)
        executed_ok = scen.swingup_success(final.true)

        log = agent.trial_logs[-1]
        cost_hist = log.cost_history[: log.steps_done]
        in_model_cost = float(np.mean(cost_hist[-20:])) if len(cost_hist) else float("nan")
        p_states = np.asarray(log.particles_states)
        if p_states.ndim != 3:
            # pre-round-3 checkpoint without particle snapshots: reconstruct
            # the in-model rollout of the FINAL policy from the restored
            # posterior (same engine, fresh noise — a consistent estimate of
            # the optimizer's own predicted closed loop)
            import jax as _jax

            opt = agent.optimizer
            k = _jax.random.PRNGKey(0)
            s0 = opt.init_dist.sample(k, opt.num_particles)
            sim = opt.engine.simulate(
                k, agent.policy_params, agent.gp_params, agent.posterior,
                s0, opt.horizon, p_dropout=0.0,
            )
            p_states = np.asarray(sim.states)
        in_model_frac = upright(p_states) if p_states.ndim == 3 else float("nan")

        # one-step model error along the executed trial (true plant states)
        x_true, y_true = agent.model.training_pairs(
            jnp.asarray(final.true[: final.inputs.shape[0]]), jnp.asarray(final.inputs)
        )
        mean_true, _ = agent.gp.predict(agent.gp_params, agent.posterior, x_true)
        res = np.asarray(mean_true) - np.asarray(y_true)
        rmse = [float(np.sqrt((res[g] ** 2).mean())) for g in range(res.shape[0])]
        scale = [float(np.abs(np.asarray(y_true)[g]).mean()) for g in range(res.shape[0])]

        if executed_ok:
            mode = "success"
        elif not np.isnan(in_model_frac) and in_model_frac >= 0.5:
            mode = "model-optimism"
        elif not np.isnan(in_model_frac) and in_model_frac < 0.1:
            mode = "optimization"
        else:
            mode = "mixed"
        rows.append(
            dict(
                scenario=args.scenario,
                seed=seed,
                executed_cost=round(executed_cost, 3),
                executed_success=executed_ok,
                in_model_cost=round(in_model_cost, 3),
                in_model_upright_frac=round(in_model_frac, 3),
                onestep_rmse=[round(v, 4) for v in rmse],
                mean_abs_delta=[round(v, 4) for v in scale],
                mode=mode,
            )
        )
        h = spec["heads"]
        print(
            f"seed {seed}: executed cost {executed_cost:7.2f} success={executed_ok} | "
            f"in-model cost {in_model_cost:6.2f} upright-frac {in_model_frac:.2f} | "
            f"1-step rmse ({h[0]}, {h[1]}) {rmse[0]:.3f}/{rmse[1]:.3f} "
            f"(|delta| scale {scale[0]:.2f}/{scale[1]:.2f}) -> {mode}"
        )

    n_fail = sum(1 for r in rows if not r["executed_success"])
    n_opt = sum(1 for r in rows if r["mode"] == "optimization")
    n_bias = sum(1 for r in rows if r["mode"] == "model-optimism")
    print(
        f"\n{len(rows)} seeds, {n_fail} failures: "
        f"{n_opt} optimization-mode, {n_bias} model-optimism, "
        f"{n_fail - n_opt - n_bias} mixed"
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
