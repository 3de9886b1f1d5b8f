#!/usr/bin/env python
"""Multi-seed ablation driver (the reference's repeat_test.py analog).

Runs a training script for a range of seeds and aggregates the success rate —
the reference's statistical-validation protocol (repeat_test.py:15-23 runs
seeds 1..50 via os.system).  Seeds run sequentially by default (one TPU);
``--jobs N`` parallelizes on CPU.
"""

import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SCRIPTS = {
    "cartpole": "train_cartpole.py",
    "cartpole_pms": "train_cartpole_pms.py",
    "cartpole_mujoco": "train_cartpole_mujoco.py",
    "ur5": "train_ur5.py",
}


def run_seed(scenario, seed, extra, platform):
    cmd = [sys.executable, "-u", os.path.join(HERE, SCRIPTS[scenario]), "--seed", str(seed),
           "--log-dir", f"results_tmp/{scenario}_{seed}"] + extra
    if platform:
        cmd += ["--platform", platform]
    r = subprocess.run(cmd, capture_output=True, text=True)
    success = "success: True" in r.stdout
    return seed, success, r.returncode, r.stdout[-500:]


def main():
    p = argparse.ArgumentParser("repeat over seeds")
    p.add_argument("--scenario", default="cartpole", choices=sorted(SCRIPTS))
    p.add_argument("--first-seed", type=int, default=1)
    p.add_argument("--num-seeds", type=int, default=50)
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    extra = ["--smoke"] if args.smoke else []
    seeds = range(args.first_seed, args.first_seed + args.num_seeds)
    results = {}
    if args.jobs > 1:
        with cf.ThreadPoolExecutor(args.jobs) as ex:
            futs = [ex.submit(run_seed, args.scenario, s, extra, args.platform) for s in seeds]
            for f in cf.as_completed(futs):
                seed, ok, rc, tail = f.result()
                results[seed] = ok
                print(f"[repeat] seed {seed}: success={ok} rc={rc}")
    else:
        for s in seeds:
            seed, ok, rc, tail = run_seed(args.scenario, s, extra, args.platform)
            results[seed] = ok
            print(f"[repeat] seed {seed}: success={ok} rc={rc}")

    rate = sum(results.values()) / max(len(results), 1)
    summary = {"scenario": args.scenario, "seeds": sorted(results), "success_rate": rate,
               "per_seed": {str(k): bool(v) for k, v in sorted(results.items())}}
    print(json.dumps(summary, indent=1))
    out = f"results_tmp/repeat_{args.scenario}.json"
    os.makedirs("results_tmp", exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
