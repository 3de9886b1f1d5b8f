#!/usr/bin/env python
"""Plot learning curves, particle fans, and tracking errors from checkpoints.

TPU-native equivalent of the reference plotting scripts
(log_plot_cartpole.py, log_plot_cartpole_mujoco.py, log_plot_ur5.py):

- per-trial policy-optimization cost curves,
- the executed on-plant trajectories per trial (theta / x for cartpole),
- particle fans from the last optimization rollout,
- per-joint tracking error in degrees for UR5 (--scenario ur5).

Writes PNGs next to the checkpoint directory.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    p = argparse.ArgumentParser("plot logs")
    p.add_argument("log_dir", help="training log dir containing stage checkpoints")
    p.add_argument("--scenario", default="cartpole",
                   choices=["cartpole", "cartpole_pms", "cartpole_mujoco", "ur5"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    # numeric trial order — lexicographic sort puts complete_trial10 before
    # complete_trial2 and would silently plot a stale checkpoint on 10+ trials
    def _trial_num(d):
        tail = d.rsplit("trial", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    stages = sorted(
        (d for d in os.listdir(args.log_dir) if d.startswith("complete_trial")),
        key=_trial_num,
    )
    if not stages:
        stages = sorted(
            (d for d in os.listdir(args.log_dir) if d.startswith("policy_trial")),
            key=_trial_num,
        )
    if not stages:
        raise SystemExit(f"no checkpoints in {args.log_dir}")
    last = stages[-1]
    with open(os.path.join(args.log_dir, last, "manifest.json")) as f:
        meta = json.load(f)["meta"]
    out_dir = args.out or args.log_dir
    os.makedirs(out_dir, exist_ok=True)

    if "num_trial_logs" in meta:  # round-3 full-fidelity checkpoints
        costs = []
        for i in range(int(meta["num_trial_logs"])):
            data = np.load(os.path.join(args.log_dir, last, f"trial_log_{i}.npz"))
            # dict pytree leaves are saved in sorted-key order:
            # cost, p_inputs, p_states, std
            steps = int(meta["trial_log_scalars"][i]["steps_done"])
            costs.append(np.asarray(data["leaf_0"])[:steps])
    else:  # pre-round-3 checkpoints
        costs = [np.asarray(c) for c in meta["cost_histories"]]
    trials = [np.asarray(t) for t in meta["trial_measured"]]
    true_trials = [np.asarray(t) for t in meta["trial_true"]]

    # ---- learning curves (log_plot_cartpole.py:55-103 analog)
    fig, ax = plt.subplots(1, 1, figsize=(7, 4))
    off = 0
    for i, c in enumerate(costs):
        ax.plot(np.arange(off, off + len(c)), c, label=f"trial {i}")
        off += len(c)
    ax.set_xlabel("policy optimization step")
    ax.set_ylabel("expected cumulative cost")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "learning_curves.png"), dpi=120)
    print(f"wrote {out_dir}/learning_curves.png")

    # ---- executed trajectories per trial
    angle_ix = {"cartpole": 2, "cartpole_pms": 2, "cartpole_mujoco": 1}.get(args.scenario)
    if angle_ix is not None:
        fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        for i, t in enumerate(true_trials):
            tt = np.arange(len(t))
            axes[0].plot(tt, t[:, angle_ix], label=f"trial {i}")
            axes[1].plot(tt, t[:, 0])
        tgt = 0.0 if args.scenario == "cartpole_mujoco" else np.pi
        for sgn in (+1, -1):
            axes[0].axhline(sgn * tgt, color="k", ls="--", lw=0.7)
        axes[0].set_ylabel("theta [rad]")
        axes[1].set_ylabel("x [m]")
        axes[1].set_xlabel("step")
        axes[0].legend(fontsize=7)
        for a in axes:
            a.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "trajectories.png"), dpi=120)
        print(f"wrote {out_dir}/trajectories.png")

    # ---- UR5 per-joint tracking error in degrees (log_plot_ur5.py:122-150)
    if args.scenario == "ur5":
        from mcpilco_tpu.envs.trajectories import ur5_joint_trajectory

        final = true_trials[-1]
        traj = ur5_joint_trajectory(num_steps=len(final), dt=meta.get("dt", 0.02))
        err = (final[:, :6] - traj[: len(final), :6]) * 180.0 / np.pi
        fig, ax = plt.subplots(figsize=(8, 4))
        for j in range(6):
            ax.plot(err[:, j], label=f"joint {j}")
        ax.set_ylabel("tracking error [deg]")
        ax.set_xlabel("step")
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "tracking_error.png"), dpi=120)
        print(f"wrote {out_dir}/tracking_error.png")
        # q_trial CSV export (log_plot_ur5.py:60-63 analog)
        np.savetxt(os.path.join(out_dir, "q_final_trial.csv"), final[:, :6], delimiter=",")
        print(f"wrote {out_dir}/q_final_trial.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
