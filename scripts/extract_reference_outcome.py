#!/usr/bin/env python
"""Extract measured OUTCOMES from a reference run's log.pkl (VERDICT r2 #3).

The reference pickles `state_samples_history` / `noiseless_states_history`
(one entry per data collection; entry 0 = exploration) after every phase
(MC_PILCO.py:160-172, 245-250).  For each executed control trial this
reports the cumulative Cart_pole_cost on the noiseless states (the same
statistic scripts/train_cartpole.py prints for our runs) and the swing-up
oracle our scenarios use (|theta|-pi < 0.25 rad and |x| < 0.5 m over the
final quarter), so reference and repo numbers are apples-to-apples.

Usage: python scripts/extract_reference_outcome.py <log_dir> [<log_dir> ...]
"""

import json
import pickle
import sys

import numpy as np


def cartpole_cost(states, l_theta=3.0, l_x=1.0, target_x=0.0):
    theta, x = states[:, 2], states[:, 0]
    return float(
        np.sum(1.0 - np.exp(-(((np.abs(theta) - np.pi) / l_theta) ** 2) - ((x - target_x) / l_x) ** 2))
    )


def swingup_success(states):
    tail = states[-(len(states) // 4):]
    return bool(
        np.all(np.abs(np.abs(tail[:, 2]) - np.pi) < 0.25) and np.all(np.abs(tail[:, 0]) < 0.5)
    )


def main():
    out = {}
    for log_dir in sys.argv[1:]:
        with open(f"{log_dir}/log.pkl", "rb") as f:
            log = pickle.load(f)
        hist = log["noiseless_states_history"]
        trials = []
        for i, states in enumerate(hist):
            states = np.asarray(states)
            trials.append(
                {
                    "collection": i,
                    "kind": "exploration" if i == 0 else f"control_{i - 1}",
                    "cumulative_cost": round(cartpole_cost(states), 4),
                    "success": swingup_success(states),
                    "tail_theta_err": np.round(
                        np.abs(np.abs(states[-5:, 2]) - np.pi), 3
                    ).tolist(),
                }
            )
        out[log_dir] = {
            "num_collections": len(hist),
            "trials": trials,
            "final_executed": trials[-1] if trials else None,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
