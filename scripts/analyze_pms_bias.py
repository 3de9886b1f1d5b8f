#!/usr/bin/env python
"""Quantify the 4PMS 'over-rotates at low in-model cost' failure mode
(VERDICT r2 #2): along the EXECUTED final trial, compare the learned model's
one-step velocity-delta predictions (trained on offline-filtered estimates)
against the deltas of (a) the filtered estimates themselves and (b) the true
plant states.  A systematic |delta| underestimate vs the true plant —
concentrated where accelerations peak — is the model-bias signature of
low-pass-filtered training data.

Usage: python scripts/analyze_pms_bias.py <checkpoint_dir> [--platform cpu]
(e.g. results_tmp/bisect/pms_s1_current/complete_trial4)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mcpilco_tpu.scenarios import cartpole_pms as scen

    agent, _ = scen.build(scen.CartpolePMSConfig(seed=1))
    agent.load_checkpoint(args.ckpt)
    dt = agent.dt

    final = agent.trials[-1]
    # (a) model vs its own training domain: filtered measured states
    x_meas, y_meas = agent.model.training_pairs(
        jnp.asarray(final.measured), jnp.asarray(final.inputs)
    )
    mean_meas, var_meas = agent.gp.predict(agent.gp_params, agent.posterior, x_meas)
    # (b) model vs the true plant: gp IO built from true states
    n = final.true.shape[0] - 1 if final.true.shape[0] == final.inputs.shape[0] else None
    x_true, y_true = agent.model.training_pairs(
        jnp.asarray(final.true[: final.inputs.shape[0]]), jnp.asarray(final.inputs)
    )
    mean_true, _ = agent.gp.predict(agent.gp_params, agent.posterior, x_true)

    mean_meas, y_meas = np.asarray(mean_meas), np.asarray(y_meas)
    mean_true, y_true = np.asarray(mean_true), np.asarray(y_true)
    names = ["xdot", "thdot"]
    print(f"checkpoint: {args.ckpt}; T={final.true.shape[0]} executed samples")
    for g, nm in enumerate(names):
        res_m = mean_meas[g] - y_meas[g]
        res_t = mean_true[g] - y_true[g]
        # signed mean error where the true delta is large (acceleration peaks)
        big = np.abs(y_true[g]) > np.quantile(np.abs(y_true[g]), 0.75)
        print(
            f"[{nm}] vs filtered data: rmse {np.sqrt((res_m ** 2).mean()):.4f} "
            f"bias {res_m.mean():+.4f} | vs TRUE plant: rmse "
            f"{np.sqrt((res_t ** 2).mean()):.4f} bias {res_t.mean():+.4f} | "
            f"top-quartile-|delta| signed err (pred-true) {res_t[big].mean():+.4f} "
            f"/ mean |true delta| {np.abs(y_true[g][big]).mean():.4f}"
        )
    # magnitude ratio: does the model under-predict big velocity changes?
    for g, nm in enumerate(names):
        big = np.abs(y_true[g]) > np.quantile(np.abs(y_true[g]), 0.75)
        ratio = np.abs(mean_true[g][big]).sum() / np.abs(y_true[g][big]).sum()
        ratio_f = np.abs(y_meas[g][big]).sum() / np.abs(y_true[g][big]).sum()
        print(
            f"[{nm}] top-quartile |pred|/|true| = {ratio:.3f}; "
            f"|filtered target|/|true| = {ratio_f:.3f} "
            "(filtering attenuation reaching the training data)"
        )


if __name__ == "__main__":
    main()
