#!/usr/bin/env python
"""Train MC-PILCO-4PMS on the cart-pole with a modeled measurement system
(TPU-native equivalent of the reference's test_mcpilco4pms_cartpole.py)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("train cartpole 4pms")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--vel-est", type=str, default="butter_cd",
                   choices=("butter_cd", "savgol"),
                   help="offline velocity estimator for GP targets: the "
                        "reference's butter+central-difference chain, or the "
                        "opt-in Savitzky-Golay estimator")
    p.add_argument("--num-restarts", type=int, default=1,
                   help="vmapped policy-init restarts per trial; winner by "
                        "in-model cost (default 1 = single init)")
    p.add_argument("--sequential-restarts", action="store_true",
                   help="run restart lanes sequentially through the "
                        "compiled R=1 program (tunneled-TPU fallback "
                        "for the vmapped-R stall)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest complete_trial* checkpoint "
                        "in the log dir (watchdog/crash recovery; no-op on "
                        "a fresh dir)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import numpy as np

    from mcpilco_tpu.scenarios import cartpole_pms as scen

    cfg = scen.CartpolePMSConfig(seed=args.seed, vel_est=args.vel_est,
                                 num_restarts=args.num_restarts,
        restart_vmap=not args.sequential_restarts,
                                 log_dir=args.log_dir or f"results_tmp/pms_{args.seed}")
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
    wall = time.time() - t0

    final = agent.trials[-1]
    ok = scen.swingup_success(final.true)
    print(f"\n[train_cartpole_pms] total wall-clock {wall:.1f}s")
    print(f"[train_cartpole_pms] final-trial swing-up success: {ok}")
    print(f"[train_cartpole_pms] final-trial cumulative cost: {agent.trial_cumulative_cost():.4f}")
    print(
        "[train_cartpole_pms] tail |theta|-pi:",
        np.round(np.abs(np.abs(final.true[-5:, 2]) - np.pi), 3),
        " x:", np.round(final.true[-5:, 0], 3),
    )
    return 0 if (ok or args.smoke) else 1


if __name__ == "__main__":
    raise SystemExit(main())
