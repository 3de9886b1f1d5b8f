#!/usr/bin/env python
"""Classify the MuJoCo cartpole failure mode per seed (round-3 protocol ran
seeds 1-10 at 5/10 success; VERDICT r2 #4 asked for statistics, this asks WHY
the other half fails).

For every seed's final checkpoint this script separates the two candidate
failure modes:

- OPTIMIZATION failure: the optimizer never found a swing-up even in its own
  model (in-model particle success fraction low, converged in-model cost
  high).  Fix lever: exploration richness / policy init / opt budget.
- MODEL-OPTIMISM failure: the policy swings up the learned model but not the
  MuJoCo plant (in-model success high, executed trial fails).  Fix lever:
  model capacity / data coverage / rollout stabilizers (delta_cap arm).

Also reports the one-step prediction RMSE of the final model along the
EXECUTED final trial (the analyze_pms_bias.py methodology) so model quality
is measured, not guessed.

Usage: python scripts/analyze_mujoco_failures.py [--root results_tmp]
       [--seeds 1,2,...] [--platform cpu] [--json out.json]
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tail_upright_fraction(states, angle_idx=1, pos_idx=0):
    """Fraction of particles satisfying the swing-up oracle over the final
    quarter of the horizon.  states: [H, P, D] (model rollout particles)."""
    import numpy as np

    h = states.shape[0]
    tail = states[-(h // 4):]
    wrapped = np.abs((tail[:, :, angle_idx] + np.pi) % (2 * np.pi) - np.pi)
    ok = np.all(wrapped < 0.25, axis=0) & np.all(np.abs(tail[:, :, pos_idx]) < 0.5, axis=0)
    return float(ok.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="results_tmp")
    p.add_argument("--seeds", default=None, help="comma list; default: all cartpole_mujoco_* dirs")
    p.add_argument("--platform", default=None)
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mcpilco_tpu.scenarios import cartpole_mujoco as scen

    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
    else:
        seeds = sorted(
            int(m.group(1))
            for d in glob.glob(os.path.join(args.root, "cartpole_mujoco_*"))
            if (m := re.fullmatch(r".*cartpole_mujoco_(\d+)", d))
        )

    rows = []
    for seed in seeds:
        run_dir = os.path.join(args.root, f"cartpole_mujoco_{seed}")
        ckpts = sorted(glob.glob(os.path.join(run_dir, "complete_trial*")))
        if not ckpts:
            print(f"seed {seed}: no checkpoints under {run_dir}, skipping")
            continue
        ckpt = ckpts[-1]
        agent, _ = scen.build(scen.CartpoleMujocoConfig(seed=seed))
        agent.load_checkpoint(ckpt)

        final = agent.trials[-1]
        executed_cost = agent.trial_cumulative_cost(-1)
        executed_ok = scen.swingup_success(final.true)

        log = agent.trial_logs[-1]
        cost_hist = log.cost_history[: log.steps_done]
        in_model_cost = float(np.mean(cost_hist[-20:])) if len(cost_hist) else float("nan")
        p_states = np.asarray(log.particles_states)
        in_model_frac = (
            tail_upright_fraction(p_states) if p_states.ndim == 3 else float("nan")
        )

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
                seed=seed,
                executed_cost=round(executed_cost, 3),
                executed_success=executed_ok,
                in_model_cost=round(in_model_cost, 3),
                in_model_upright_frac=round(in_model_frac, 3),
                onestep_rmse_xdd=round(rmse[0], 4),
                onestep_rmse_thdd=round(rmse[1], 4),
                mean_abs_delta_xd=round(scale[0], 4),
                mean_abs_delta_thd=round(scale[1], 4),
                mode=mode,
            )
        )
        print(
            f"seed {seed}: executed cost {executed_cost:7.2f} success={executed_ok} | "
            f"in-model cost {in_model_cost:6.2f} upright-frac {in_model_frac:.2f} | "
            f"1-step rmse (xd, thd) {rmse[0]:.3f}/{rmse[1]:.3f} "
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
