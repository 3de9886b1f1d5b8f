"""Reference joint trajectories for tracking tasks.

The reference ships a fixed 200x12 CSV (`envs/target_q_trajectory.csv`) for
the UR5 tracking scenario.  Here the equivalent trajectory is *generated*: a
smooth quintic-blended multi-sine in joint space with analytically consistent
velocities, which exercises the same capability (time-indexed [q_r, qd_r]
tracking) without shipping opaque data.
"""

from __future__ import annotations

import os

import numpy as np


def ur5_reference_trajectory(num_steps: int = 200, dt: float = 0.02) -> np.ndarray:
    """The reference task's actual recorded trajectory, loaded AT RUNTIME
    from the reference checkout (it is data, not code; we do not vendor it).

    test_mcpilco_ur5_mujoco.py:113 loads `envs/target_q_trajectory.csv`, a
    200x12 array with the same [q_r(6), qd_r(6)] column layout our generated
    trajectory uses (velocities start at 0).  Set MCPILCO_REFERENCE to the
    checkout root (default /root/reference).  ``num_steps`` beyond the
    recording raises; shorter horizons (smoke configs) take the prefix.
    ``dt`` is accepted for signature parity with the generator — the
    recording is sampled at the scenario's 50 Hz control rate.
    """
    if abs(dt - 0.02) > 1e-9:
        # the recording is a fixed 50 Hz time series; accepting another dt
        # would silently time-rescale it instead of resampling
        raise ValueError(
            f"the reference trajectory is recorded at dt=0.02s (50 Hz); got dt={dt}"
        )
    root = os.environ.get("MCPILCO_REFERENCE", "/root/reference")
    path = os.path.join(root, "envs", "target_q_trajectory.csv")
    traj = np.genfromtxt(path, delimiter=",").astype(np.float32)
    if traj.ndim != 2 or traj.shape[1] != 12:
        raise ValueError(f"expected a [T, 12] trajectory at {path}, got {traj.shape}")
    if num_steps > traj.shape[0]:
        raise ValueError(
            f"reference trajectory has {traj.shape[0]} steps; {num_steps} requested"
        )
    return traj[:num_steps]


def ur5_joint_trajectory(
    num_steps: int = 200,
    dt: float = 0.02,
    num_joints: int = 6,
    amplitude: float = 0.6,
    seed: int = 0,
) -> np.ndarray:
    """Returns [num_steps, 2*num_joints]: columns [q_r(6), qd_r(6)].

    Each joint follows a_j * s(t) * sin(w_j t + p_j) where s(t) is a smooth
    start ramp so the trajectory begins at rest (the reference trajectory also
    starts at its initial configuration with ~zero velocity).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(num_steps) * dt
    T = t[-1] if num_steps > 1 else 1.0
    w = rng.uniform(0.5, 1.5, num_joints) * 2 * np.pi / T  # ~0.5-1.5 periods
    p = rng.uniform(-np.pi, np.pi, num_joints)
    a = amplitude * rng.uniform(0.5, 1.0, num_joints)
    q0 = np.array([0.0, -np.pi / 3, np.pi / 3, -np.pi / 4, np.pi / 4, 0.0])[:num_joints]

    ramp_T = min(0.5, T / 4)
    s = np.clip(t / ramp_T, 0, 1)
    ramp = s**3 * (10 - 15 * s + 6 * s * s)  # quintic smoothstep
    dramp = np.where(s < 1, (30 * s**2 - 60 * s**3 + 30 * s**4) / ramp_T, 0.0)

    q = np.zeros((num_steps, num_joints))
    qd = np.zeros((num_steps, num_joints))
    for j in range(num_joints):
        base = np.sin(w[j] * t + p[j]) - np.sin(p[j])
        dbase = w[j] * np.cos(w[j] * t + p[j])
        q[:, j] = q0[j] + a[j] * ramp * base
        qd[:, j] = a[j] * (dramp * base + ramp * dbase)
    return np.concatenate([q, qd], axis=1)
