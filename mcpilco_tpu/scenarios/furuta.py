"""Furuta-pendulum swing-up with a semiparametric dynamics model.

Exercises the reference's semiparametric model family
(SP_Speed_Model_learning_Furuta, model_learning/Model_learning.py:763-872):
each velocity-delta GP head is a *sum* of an SE kernel and a linear kernel
over nine physics-derived features, so the model generalizes along the known
rigid-body structure while the SE part absorbs the residuals.  The reference
ships the model class but no simulator or scenario; envs/ode.py provides a
QUBE-Servo-2-like plant (``furuta_qube``: DC-motor VOLTAGE input with
back-EMF damping — the configuration the reference's physics features were
written for, cf. the linear dtheta_h and u*cos(theta_v) terms at
Model_learning.py:817-837) so the scenario runs end-to-end.

State [theta_h, theta_v, dtheta_h, dtheta_v]; swing-up target |theta_v| = pi
(pendulum up), arm near home (theta_h = 0).

Design notes (feasibility study, round 2): at u_max = 3 V the bang-bang
energy-pumping bound reaches the upright energy in < 1 s and arm speed stays
< 35 rad/s (back-EMF bounded), so a 3 s horizon leaves time to catch and
balance.  Velocities reach ~(15, 30) rad/s during the swing, so the policy
input is normalized by ``scale_factor`` — with unit-range centers the RBF
features would otherwise all sit at "velocity ~ 0" and the policy could not
represent velocity-phased pumping.  The cost penalizes the pendulum angle
(ls 2) and the ARM ANGLE (ls 4, bounded during pumping) — penalizing arm
*velocity* would fight the energy pumping itself.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..control.mc_pilco import MCPilco, ModelFitOptions, PolicyOptOptions
from ..control.rollout import InitialStateDistribution, RolloutEngine
from ..control.trainer import PolicyOptimizer
from ..envs.plants import ODEPlant
from ..models import kernels as K
from ..models.costs import SaturatedDistance
from ..models.dynamics import FurutaSemiparametric
from ..models.gp import MultiGP
from ..models.policies import RandomExploration, SumOfGaussiansWithAngles
from ..utils import prng


@dataclasses.dataclass(frozen=True)
class FurutaConfig:
    seed: int = 1
    dt: float = 0.02
    T_exploration: float = 3.0
    T_control: float = 3.0
    u_max: float = 3.0  # motor voltage limit (V) on the QUBE-like plant
    std_noise: float = 1e-3
    num_basis: int = 200
    num_particles: int = 400
    # policy-input normalization (dth_h, dth_v, cos/sin of both angles)
    scale_factor: tuple = (15.0, 30.0, 1.0, 1.0, 1.0, 1.0)
    num_trials: int = 6
    opt_steps: tuple = (2000, 4000, 4000, 4000, 4000, 4000)
    gp_epochs: int = 1501
    semiparametric: bool = True
    # vmapped policy-init restarts per trial (PolicyOptimizer.num_restarts);
    # the failing furuta seeds are optimization-mode (analyze_mujoco_failures
    # --scenario furuta), the same lever as MuJoCo.  1 = single init.
    num_restarts: int = 1
    # False = sequential restart lanes reusing the compiled R=1 program
    # (the tunneled-TPU fallback for the vmapped-R stall; trainer.py)
    restart_vmap: bool = True
    log_dir: Optional[str] = None

    def smoke(self) -> "FurutaConfig":
        return dataclasses.replace(
            self, num_trials=1, num_basis=40, num_particles=50, opt_steps=(60,), gp_epochs=300
        )


def policy_init(cfg: FurutaConfig, policy, key):
    """Pure per-seed policy initializer: centers uniform over the NORMALIZED
    feature range, weights uniform +-u_max/2 (pure JAX for the seed farm)."""
    kc = prng.fold(prng.stream(key, prng.STREAM_POLICY_INIT), 0xC0)
    k1, k2 = jax.random.split(kc)
    centers = 2.0 * (jax.random.uniform(k1, (cfg.num_basis, 6)) - 0.5)
    weight = cfg.u_max * (jax.random.uniform(k2, (1, cfg.num_basis)) - 0.5)
    return policy.init_params(
        kc, lengthscales=jnp.ones(6), centers=centers, weight=weight
    )


def build(cfg: FurutaConfig):
    key = prng.root_key(cfg.seed)
    model = FurutaSemiparametric(
        state_dim=4, input_dim=1, dt=cfg.dt, vel_indices=(2, 3), pos_indices=(0, 1)
    )
    d = model.gp_input_dim  # 12
    if cfg.semiparametric:
        # SE over the raw state/input + linear over the physics features
        # (Model_learning.py:797-807: RBF + Linear_GP)
        kern = K.Sum(
            members=(
                K.SEArd(active_dims=tuple(range(5))),
                K.Linear(active_dims=tuple(range(5, d)), offset=False),
            )
        )
    else:
        kern = K.SEArd(active_dims=tuple(range(d)))
    # normalize_outputs: velocity deltas are large and uneven across heads
    # (flg_norm analog, Model_learning.py:406-409)
    gp = MultiGP(kernel=kern, num_heads=2, normalize_outputs=True)

    policy = SumOfGaussiansWithAngles(
        feature_dim=6, input_dim=1, num_basis=cfg.num_basis, u_max=cfg.u_max,
        angle_indices=(0, 1), non_angle_indices=(2, 3),
        scale_factor=cfg.scale_factor,
        reinit_lengthscales=(1.0,) * 6,
        reinit_centers=(1.0,) * 6,  # normalized feature range
        reinit_weight=cfg.u_max,
    )
    exploration = RandomExploration(state_dim=4, input_dim=1, u_max=cfg.u_max)
    # saturated distance on [|theta_v| -> pi, theta_h -> 0]; abs makes the
    # physically equivalent -pi upright equally rewarded (the CartPoleCost
    # |theta| idiom, Cost_function.py:177)
    cost = SaturatedDistance(
        target_state=(np.pi, 0.0), lengthscales=(2.0, 4.0), active_dims=(1, 0),
        abs_dims=(1,),
    )
    plant = ODEPlant(ode_name="furuta_qube", noise_std=(cfg.std_noise,) * 4, substeps=20)
    init_dist = InitialStateDistribution(kind="gaussian", mean=np.zeros(4), var=1e-6 * np.ones(4))

    # delta_cap: the semiparametric Linear kernel's mean/variance grow with
    # ||physics features||^2 outside the data support; capping per-step deltas
    # at 3x the largest observed training delta keeps early-trial closed-loop
    # rollouts finite (see RolloutEngine.delta_cap)
    engine = RolloutEngine(model=model, gp=gp, policy=policy, delta_cap=3.0)
    optimizer = PolicyOptimizer(
        engine=engine, cost=cost, init_dist=init_dist,
        num_particles=cfg.num_particles, horizon=int(cfg.T_control / cfg.dt),
        max_opt_steps=max(cfg.opt_steps),
        # the 150-step saturated cost has a flat landscape near the swing-up
        # threshold: a looser monitor (cartpole's 0.08/200) exits at ~1000 of
        # 4000 steps while the cost is still falling, so gate harder (the
        # UR5-style slow-exit settings, test_mcpilco_ur5_mujoco.py:193-208)
        alpha_diff_cost=0.99, min_diff_cost=0.04, num_min_diff_cost=400,
        min_step=400.0, lr_min=0.001, p_drop_reduction=0.125,
        num_restarts=cfg.num_restarts,
        restart_vmap=cfg.restart_vmap,
    )
    agent = MCPilco(
        dt=cfg.dt, model=model, gp=gp, policy=policy,
        exploration_policy=exploration, cost=cost, optimizer=optimizer,
        plant=plant, init_dist=init_dist, seed=cfg.seed, log_dir=cfg.log_dir,
    )
    agent.policy_params = policy_init(cfg, policy, key)

    reinforce_kwargs = dict(
        num_trials=cfg.num_trials,
        T_exploration=cfg.T_exploration,
        T_control=cfg.T_control,
        model_fit_options=[ModelFitOptions(num_epochs=cfg.gp_epochs)] * max(cfg.num_trials, 1),
        policy_opt_options=[
            PolicyOptOptions(opt_steps=s, learning_rate=0.01, p_dropout=0.25)
            for s in cfg.opt_steps
        ],
    )
    agent.scenario_name = "furuta"
    agent.scenario_config = cfg
    return agent, reinforce_kwargs


def swingup_success(states: np.ndarray) -> bool:
    """|theta_v| within 0.3 rad of pi over the final quarter."""
    tail = states[-(len(states) // 4):]
    return bool(np.all(np.abs(np.abs(tail[:, 1]) - np.pi) < 0.3))
