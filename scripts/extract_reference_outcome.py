#!/usr/bin/env python
"""Extract measured OUTCOMES from a reference run's log.pkl (VERDICT r2 #3).

The reference pickles `state_samples_history` / `noiseless_states_history`
(one entry per data collection; entry 0 = exploration) after every phase
(MC_PILCO.py:160-172, 245-250).  For each executed control trial this
reports the cumulative Cart_pole_cost on the noiseless states (the same
statistic scripts/train_cartpole.py prints for our runs) and the swing-up
oracle our scenarios use (|theta|-pi < 0.25 rad and |x| < 0.5 m over the
final quarter), so reference and repo numbers are apples-to-apples.

Usage: python scripts/extract_reference_outcome.py [--layout mujoco] <log_dir> ...

``--layout mujoco`` switches to the MuJoCo cartpole convention
(test_mcpilco_cartpole_mujoco.py:147-148: state [x, theta, xd, thd], upright
target theta = 0) with the matching repo oracle
(mcpilco_tpu/scenarios/cartpole_mujoco.py:swingup_success).
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


def cartpole_cost_mujoco(states, l_theta=3.0, l_x=1.0):
    """MuJoCo layout [x, theta, ...], upright target theta = 0 — the saturated
    cost test_mcpilco_cartpole_mujoco.py:147-148 builds (angle_index=1)."""
    theta, x = states[:, 1], states[:, 0]
    wrapped = np.abs((theta + np.pi) % (2 * np.pi) - np.pi)
    return float(np.sum(1.0 - np.exp(-((wrapped / l_theta) ** 2) - (x / l_x) ** 2)))


def swingup_success_mujoco(states):
    """Same oracle as mcpilco_tpu.scenarios.cartpole_mujoco.swingup_success."""
    tail = states[-(len(states) // 4):]
    wrapped = np.abs((tail[:, 1] + np.pi) % (2 * np.pi) - np.pi)
    return bool(np.all(wrapped < 0.25) and np.all(np.abs(tail[:, 0]) < 0.5))


def main():
    args = sys.argv[1:]
    layout = "ode"
    if args and args[0] == "--layout":
        layout = args[1]
        args = args[2:]
    cost_fn = cartpole_cost_mujoco if layout == "mujoco" else cartpole_cost
    success_fn = swingup_success_mujoco if layout == "mujoco" else swingup_success
    out = {}
    for log_dir in args:
        with open(f"{log_dir}/log.pkl", "rb") as f:
            log = pickle.load(f)
        hist = log["noiseless_states_history"]
        trials = []
        for i, states in enumerate(hist):
            states = np.asarray(states)
            if layout == "mujoco":
                tail_err = np.round(
                    np.abs((states[-5:, 1] + np.pi) % (2 * np.pi) - np.pi), 3
                ).tolist()
            else:
                tail_err = np.round(
                    np.abs(np.abs(states[-5:, 2]) - np.pi), 3
                ).tolist()
            trials.append(
                {
                    "collection": i,
                    "kind": "exploration" if i == 0 else f"control_{i - 1}",
                    "cumulative_cost": round(cost_fn(states), 4),
                    "success": success_fn(states),
                    "tail_theta_err": tail_err,
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
