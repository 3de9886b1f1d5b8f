"""UR5 joint-space trajectory tracking (test_mcpilco_ur5_mujoco.py analog).

12-dim state [q(6), qd(6)], 6 torque inputs, 6 GP heads over a 24-dim GP
input (sin/cos of the 6 angles + 6 velocities + 6 torques), SE+P(2) kernel,
SOD with absolute threshold 1e-3, PD exploration along the reference
trajectory, 400-basis tracking policy over [s, target(t)-s], saturated
tracking cost, 200 particles x 200-step BPTT.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from ..control.mc_pilco import MCPilco, ModelFitOptions, PolicyOptOptions
from ..control.rollout import InitialStateDistribution, RolloutEngine
from ..control.trainer import PolicyOptimizer
from ..envs.mujoco_plant import MujocoPlant
from ..envs.trajectories import ur5_joint_trajectory, ur5_reference_trajectory
from ..models import kernels as K
from ..models import sod as sod_mod
from ..models.costs import SaturatedTrajectoryTracking
from ..models.dynamics import SpeedIntegration
from ..models.gp import MultiGP
from ..models.policies import PDController, SumOfGaussiansTracking
from ..utils import prng


@dataclasses.dataclass(frozen=True)
class UR5Config:
    seed: int = 1
    dt: float = 0.02
    sim_timestep: float = 0.001
    T_control: float = 4.0
    num_trials: int = 2
    std_noise: float = 1e-3
    num_basis: int = 400
    num_particles: int = 200
    opt_steps: tuple = (5000, 5000)
    gp_epochs: int = 2001
    traj_amplitude: float = 0.6
    # ---- reference-parity knobs (VERDICT r3 #3/#4).  Round-4 A/Bs
    # (RESULTS.md "UR5 deviation A/Bs"): every reference value succeeds
    # ALONE, but the full combination fails 1/5 (the +-1 init starts the
    # policy outside the narrow fixed-lengthscale gradient tube — the
    # deviations were jointly load-bearing).  Shipped defaults = the
    # minimal-deviation winner "C1": poly_deg and cost lengthscales at the
    # reference values (test_mcpilco_ur5_mujoco.py:102,158-162), weight
    # init +-0.02 as the ONE retained deviation (vs the reference's +-1,
    # :145) — C1 tracks ~20x tighter than retaining the curriculum
    # instead (0.149 vs 2.93 final cost, seed 1). ----
    # "generated" = our quintic multi-sine; "reference" = the reference
    # task's recorded 200x12 CSV loaded at runtime from $MCPILCO_REFERENCE
    # (test_mcpilco_ur5_mujoco.py:113).  "generated" stays default only
    # because the reference CSV cannot be vendored.
    trajectory: str = "generated"
    # "approx" = our mesh-free arm (envs/assets/ur5.xml, vendorable);
    # "reference" = the reference task's ACTUAL plant — envs/assets/UR5.xml
    # + 13 STL meshes loaded at runtime from $MCPILCO_REFERENCE (it is data,
    # not code; mujoco 3.x loads it unmodified).  The reference-parity
    # protocol (repeat_ur5_refplant) runs plant="reference" +
    # trajectory="reference": the same robot and the same recording as
    # test_mcpilco_ur5_mujoco.py:57-208.
    plant: str = "approx"
    # reference poly_deg=1; degree 2 (the former default) is what
    # quadratically extrapolates outside one-trial support (see delta_cap)
    poly_degree: int = 1
    # "fixed" = the reference's [0.5 x6, 1.0 x6]; "curriculum" = the former
    # per-trial [2,4] -> [0.5,1] widening
    cost_lengthscales: str = "fixed"
    # reference draws policy weights uniform +-1; +-0.02 is the one
    # retained deviation (see the dataclass comment above)
    weight_init_scale: float = 0.02
    # ---- plateau rescue (shipped ON; round-4 evidence) ----
    # ~2/10 seeds draw an init whose trial-0 policy opt STARTS on the
    # saturated tracking cost's flat region (cost ~= horizon x 1.0) and
    # ES-stops with zero gradient signal (RESULTS.md "UR5 final-config
    # protocol": seeds 8-9 at 197.0/199.1).  When trial 0 ends still
    # saturated (final cost > plateau_rescue_frac x horizon — successes end
    # trial 0 at <= ~20), the training restarts once from scratch with
    # cost_lengthscales="curriculum" (the reference's own per-trial
    # lengthscale feature, Cost_function.py:104-147), which un-flattens the
    # plateau: the targeted A/B flipped BOTH plateau seeds
    # (results/repeat_ur5_rescue89_r4.json).  Orchestrated by
    # scripts/train_ur5.py; fires only on detected plateau seeds.
    plateau_rescue: bool = True
    plateau_rescue_frac: float = 0.9
    # rollout delta clamp in units of the max-abs training delta; no
    # reference equivalent — introduced when the shipped config ran Poly(2)
    # (trial-0 NaN explosion at step 108, RESULTS.md round 4), retained as
    # a pure safety net now that poly_degree=1 removed the known trigger.
    # None disables.
    delta_cap: Optional[float] = 3.0
    log_dir: Optional[str] = None

    def smoke(self) -> "UR5Config":
        return dataclasses.replace(
            self,
            num_trials=1,
            num_basis=60,
            num_particles=30,
            opt_steps=(40,),
            gp_epochs=200,
            T_control=1.0,
        )


STATE_DIM, INPUT_DIM = 12, 6
U_MAX = (1.0,) * 6


def build(cfg: UR5Config):
    key = prng.root_key(cfg.seed)
    num_steps = int(cfg.T_control / cfg.dt)
    if cfg.trajectory == "reference":
        target_traj = ur5_reference_trajectory(num_steps=num_steps, dt=cfg.dt)
    elif cfg.trajectory == "generated":
        target_traj = ur5_joint_trajectory(num_steps=num_steps, dt=cfg.dt)
    else:
        raise ValueError(f"unknown trajectory {cfg.trajectory!r}")

    model = SpeedIntegration(
        state_dim=STATE_DIM, input_dim=INPUT_DIM, dt=cfg.dt,
        vel_indices=tuple(range(6, 12)), pos_indices=tuple(range(6)),
        angle_indices=tuple(range(6)), not_angle_indices=tuple(range(6, 12)),
    )
    assert model.gp_input_dim == 24
    # normalize_outputs: six heads with very different velocity-delta scales
    gp = MultiGP(
        kernel=K.se_plus_volterra(active_dims=tuple(range(24)), degree=cfg.poly_degree),
        num_heads=6,
        normalize_outputs=True,
    )
    policy = SumOfGaussiansTracking(
        feature_dim=2 * STATE_DIM, input_dim=INPUT_DIM, num_basis=cfg.num_basis,
        u_max=U_MAX, target_traj=target_traj,
        reinit_lengthscales=(np.pi,) * 24,
        reinit_centers=tuple([np.pi / 2] * 12 + [0.1] * 12),
        reinit_weight=1.0,
    )
    exploration = PDController(
        state_dim=STATE_DIM, input_dim=INPUT_DIM, target_traj=target_traj, u_max=U_MAX,
        noise_std=0.05,
    )
    # per-trial lengthscale curriculum (the reference's flg_var_lengthscales
    # feature, Cost_function.py:104-147): a wide first-trial cost keeps the
    # saturated tracking objective informative while the policy is far from
    # the tube, then tightens to the reference's 0.5/1.0 scales
    if cfg.cost_lengthscales == "curriculum":
        cost_ls, per_trial = np.array([[2.0] * 6 + [4.0] * 6, [0.5] * 6 + [1.0] * 6]), True
    elif cfg.cost_lengthscales == "fixed":
        # the reference's shipped scales (test_mcpilco_ur5_mujoco.py:158-162)
        cost_ls, per_trial = np.array([0.5] * 6 + [1.0] * 6), False
    else:
        raise ValueError(f"unknown cost_lengthscales {cfg.cost_lengthscales!r}")
    cost = SaturatedTrajectoryTracking(
        target_traj=target_traj,
        lengthscales=cost_ls,
        per_trial=per_trial,
        used_indices=tuple(range(12)),
    )
    if cfg.plant == "reference":
        import os

        xml = os.path.join(
            os.environ.get("MCPILCO_REFERENCE", "/root/reference"), "envs", "assets", "UR5.xml"
        )
    elif cfg.plant == "approx":
        xml = "ur5.xml"
    else:
        raise ValueError(f"unknown plant {cfg.plant!r}")
    plant = MujocoPlant(
        xml=xml, noise_std=(cfg.std_noise,) * STATE_DIM, sim_timestep=cfg.sim_timestep
    )
    init_dist = InitialStateDistribution(
        kind="gaussian", mean=target_traj[0], var=1e-6 * np.ones(STATE_DIM)
    )
    # long-horizon (200-step) BPTT: cap cotangents (see rollout._clip_bptt).
    # delta_cap history: under the former poly_degree=2 default the trial-0
    # dataset covers one PD exploration, and a wandering initial policy took
    # particles far outside that support, where the Poly(2) member
    # extrapolates quadratically — measured on the seed-2 trial-0
    # checkpoint: particle states grow 1 -> 1.4e3 by step 100 and go NaN at
    # step 108, turning the whole first policy-opt chunk into a NaN-retry
    # storm (RESULTS.md round 4).  Same lever and value as the furuta
    # scenario's semiparametric explosion fix; cap in units of the max-abs
    # training delta (Posterior.norm).
    engine = RolloutEngine(
        model=model, gp=gp, policy=policy, remat=True, bptt_clip=1.0,
        delta_cap=cfg.delta_cap,
    )
    optimizer = PolicyOptimizer(
        engine=engine, cost=cost, init_dist=init_dist,
        num_particles=cfg.num_particles, horizon=num_steps,
        max_opt_steps=max(cfg.opt_steps),
        alpha_diff_cost=0.99, min_diff_cost=0.04, num_min_diff_cost=400,
        min_step=400.0, lr_min=0.0025, p_drop_reduction=0.125,
        # trial-1 steps reach ~100 ms (24-dim GP inputs, larger SOD bucket);
        # the default 500-step chunk is a ~1 min uninterrupted device
        # execution, which crashes the tunneled TPU runtime (observed twice
        # at the same trial-1 sync).  100-step chunks keep executions ~10 s.
        chunk_steps=100,
    )
    agent = MCPilco(
        dt=cfg.dt, model=model, gp=gp, policy=policy,
        exploration_policy=exploration, cost=cost, optimizer=optimizer,
        plant=plant, init_dist=init_dist,
        sod=sod_mod.SODConfig(threshold_mode="absolute", threshold=(1e-3,) * 6),
        seed=cfg.seed, log_dir=cfg.log_dir,
    )
    # scripted policy init (test_mcpilco_ur5_mujoco.py:126-147)
    kc = prng.fold(prng.stream(key, prng.STREAM_POLICY_INIT), 0xC0)
    k1, k1b, k2 = jax.random.split(kc, 3)
    centers_init = np.concatenate(
        [
            np.pi / 2 * 2 * (np.asarray(jax.random.uniform(k1, (cfg.num_basis, 12))) - 0.5),
            0.1 * 2 * (np.asarray(jax.random.uniform(k1b, (cfg.num_basis, 12))) - 0.5),
        ],
        axis=1,
    )
    # gentle initial weights: the saturated tracking cost only has gradient
    # while particles stay near the trajectory tube, so the initial policy
    # must not fling the arm (the reference's +-1 init works against its
    # heavily-damped plant; ours is calibrated to the same effect)
    weight_init = cfg.weight_init_scale * 2.0 * (
        np.asarray(jax.random.uniform(k2, (INPUT_DIM, cfg.num_basis))) - 0.5
    )
    agent.policy_params = policy.init_params(
        kc, lengthscales=np.pi * np.ones(24), centers=centers_init, weight=weight_init
    )
    agent.expl_params = exploration.init_params(
        kc, sqrt_kp=np.ones(6), sqrt_kd=0.1 * np.ones(6)
    )

    reinforce_kwargs = dict(
        num_trials=cfg.num_trials,
        T_exploration=cfg.T_control,
        T_control=cfg.T_control,
        model_fit_options=[ModelFitOptions(num_epochs=cfg.gp_epochs)] * max(cfg.num_trials, 1),
        policy_opt_options=[
            PolicyOptOptions(opt_steps=s, learning_rate=0.01, p_dropout=0.25)
            for s in cfg.opt_steps
        ],
    )
    agent.scenario_name = "ur5"
    agent.scenario_config = cfg
    return agent, reinforce_kwargs


def tracking_error_deg(agent) -> np.ndarray:
    """Per-joint RMS tracking error in degrees on the final trial
    (the log_plot_ur5.py:122-150 diagnostic)."""
    final = agent.trials[-1]
    num_steps = min(final.true.shape[0], len(agent.cost.target_traj))
    traj = np.asarray(agent.cost.target_traj)[:num_steps, :6]
    err = final.true[:num_steps, :6] - traj
    return np.sqrt((err**2).mean(axis=0)) * 180.0 / np.pi
