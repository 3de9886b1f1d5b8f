#!/usr/bin/env python
"""Train MC-PILCO on the MuJoCo cart-pole swing-up
(test_mcpilco_cartpole_mujoco.py analog)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("train cartpole mujoco")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--delta-cap", type=float, default=None,
                   help="cap per-step rollout deltas at this multiple of the "
                        "largest training delta (suppresses out-of-support "
                        "NaN storms of the SE+P(2) kernel; default off)")
    p.add_argument("--num-restarts", type=int, default=1,
                   help="vmapped policy-init restarts per trial; the winner "
                        "by in-model cost is kept (default 1 = reference-"
                        "faithful single init)")
    p.add_argument("--sequential-restarts", action="store_true",
                   help="run restart lanes sequentially through the "
                        "compiled R=1 program (tunneled-TPU fallback "
                        "for the vmapped-R stall)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest complete_trial* checkpoint "
                        "in the log dir (watchdog/crash recovery; no-op on "
                        "a fresh dir)")
    p.add_argument("--cost-lengthscales", choices=["fixed", "curriculum"],
                   default="fixed",
                   help="'curriculum' = wide trial-0 cost lengthscales "
                        "(6.0, 2.0) then the reference (3.0, 1.0) — the UR5 "
                        "plateau-rescue lever for optimization-mode seeds")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import numpy as np

    from mcpilco_tpu.scenarios import cartpole_mujoco as scen

    cfg = scen.CartpoleMujocoConfig(
        seed=args.seed, log_dir=args.log_dir or f"results_tmp/mj_{args.seed}",
        delta_cap=args.delta_cap, num_restarts=args.num_restarts,
        restart_vmap=not args.sequential_restarts,
        cost_lengthscales=args.cost_lengthscales,
    )
    if args.smoke:
        cfg = cfg.smoke()
    if args.trials is not None:
        cfg = dataclasses.replace(cfg, num_trials=args.trials)

    import jax

    print(f"devices: {jax.devices()}")
    agent, kwargs = scen.build(cfg)
    if args.auto_resume:
        done = agent.auto_resume()
        if done:
            print(f"[train] auto-resumed {done} completed trials from {agent.log_dir}")
            kwargs = {**kwargs, "num_trials": max(kwargs["num_trials"] - done, 0)}
    t0 = time.time()
    agent.reinforce(**kwargs)
    print(f"\n[train_cartpole_mujoco] total wall-clock {time.time() - t0:.1f}s")
    final = agent.trials[-1]
    ok = scen.swingup_success(final.true)
    print(f"[train_cartpole_mujoco] final-trial swing-up success: {ok}")
    print(f"[train_cartpole_mujoco] final-trial cumulative cost: {agent.trial_cumulative_cost():.4f}")
    print(
        "[train_cartpole_mujoco] tail theta:",
        np.round(final.true[-5:, 1], 3), " x:", np.round(final.true[-5:, 0], 3),
    )
    return 0 if (ok or args.smoke) else 1


if __name__ == "__main__":
    raise SystemExit(main())
