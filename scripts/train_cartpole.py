#!/usr/bin/env python
"""Train MC-PILCO on the simulated cart-pole swing-up (flagship scenario).

TPU-native equivalent of the reference's `test_mcpilco_cartpole.py` entry
script.  Variants of the reference's other cartpole configs are flags:

    python scripts/train_cartpole.py --seed 1                  # SE+P(2) + SOD
    python scripts/train_cartpole.py --kernel se --no-sod      # rbf_ker config
    python scripts/train_cartpole.py --multi-init              # bimodal x0
    python scripts/train_cartpole.py --smoke                   # tiny CI config
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("train cartpole")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--kernel", choices=["se+p2", "se"], default="se+p2")
    p.add_argument("--no-sod", action="store_true")
    p.add_argument("--multi-init", action="store_true")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None, help="cpu to force CPU")
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

    from mcpilco_tpu.scenarios import cartpole as scen

    cfg = scen.CartpoleConfig(
        seed=args.seed,
        kernel=args.kernel,
        use_sod=not args.no_sod,
        multi_init=args.multi_init,
        log_dir=args.log_dir or f"results_tmp/{args.seed}",
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
    logs = agent.reinforce(**kwargs)
    wall = time.time() - t0

    # success oracle on the final on-plant trial
    final = agent.trials[-1]
    ok = scen.swingup_success(final.true)
    print(f"\n[train_cartpole] total wall-clock {wall:.1f}s over {len(logs)} trials")
    print(f"[train_cartpole] final-trial swing-up success: {ok}")
    print(f"[train_cartpole] final-trial cumulative cost: {agent.trial_cumulative_cost():.4f}")
    print(
        "[train_cartpole] final trial tail |theta|-pi:",
        np.round(np.abs(np.abs(final.true[-5:, 2]) - np.pi), 3),
        " x:",
        np.round(final.true[-5:, 0], 3),
    )
    return 0 if (ok or args.smoke) else 1


if __name__ == "__main__":
    raise SystemExit(main())
