"""MuJoCo cart-pole swing-up scenario (test_mcpilco_cartpole_mujoco.py analog).

State layout differs from the ODE scenario (SURVEY §2.4): [x, theta, xd, thd]
with theta = 0 at the UPRIGHT target, initial state theta = pi (hanging);
u_max 2.5, sim timestep 0.01 s, control at 20 Hz.
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
from ..envs.mujoco_plant import MujocoPlant
from ..models import kernels as K
from ..models import sod as sod_mod
from ..models.costs import CartPoleCost
from ..models.dynamics import SpeedIntegration
from ..models.gp import MultiGP
from ..models.policies import RandomExploration, SumOfGaussiansWithAngles
from ..utils import prng
from . import cartpole as base


@dataclasses.dataclass(frozen=True)
class CartpoleMujocoConfig:
    seed: int = 1
    dt: float = 0.05
    sim_timestep: float = 0.01
    T_exploration: float = 3.0
    T_control: float = 3.0
    num_trials: int = 5
    u_max: float = 2.5
    std_noise: float = 1e-2
    num_basis: int = 200
    num_particles: int = 400
    opt_steps: tuple = (2000, 4000, 4000, 4000, 4000)
    gp_epochs: int = 1501
    use_sod: bool = True
    # Optional rollout stabilizer: the SE+P(2) kernel's mean/variance grow
    # polynomially outside the data support (the furuta finding); capping
    # per-step deltas at this multiple of the largest observed training delta
    # suppresses early-trial NaN-reinit storms (seed 7 recorded 1359 reinits
    # in a 2000-step trial-0 opt).  None = reference-faithful unbounded
    # rollouts.  Requires normalize_outputs on the GP, so it flips that too.
    delta_cap: Optional[float] = None
    # Multi-restart policy optimization (trainer.PolicyOptimizer.num_restarts):
    # the round-3 failure analysis (scripts/analyze_mujoco_failures.py) shows
    # every failing MuJoCo seed converges to a no-swing-up local optimum IN
    # ITS OWN MODEL (model one-step error is fine), so restarts — not model
    # fixes — are the matching lever.  1 = reference-faithful single init.
    num_restarts: int = 1
    # False = sequential restart lanes reusing the compiled R=1 program
    # (the tunneled-TPU fallback for the vmapped-R stall; trainer.py)
    restart_vmap: bool = True
    # "fixed" = the reference's (3.0, 1.0) (test_mcpilco_cartpole_mujoco.py
    # cost config); "curriculum" = per-trial lengthscales, wide trial 0
    # (6.0, 2.0) then the reference values — the UR5 plateau-rescue lever
    # (Cost_function.py:104-147 per-trial feature) applied to the cartpole
    # cost, for the optimization-mode failure seeds (RESULTS.md round-4
    # failure analysis: model fine, in-model cost saturated at hanging)
    cost_lengthscales: str = "fixed"
    log_dir: Optional[str] = None

    def smoke(self) -> "CartpoleMujocoConfig":
        return dataclasses.replace(
            self, num_trials=1, num_basis=40, num_particles=50, opt_steps=(60,), gp_epochs=300
        )


def policy_init(cfg: CartpoleMujocoConfig, policy, key):
    """Pure per-seed policy initializer — MuJoCo-specific center ranges
    (test_mcpilco_cartpole_mujoco.py:130-134): angles span +-1.5pi and the
    [x, xd, thd] centers span [+-2, +-2, +-2pi] — wider than the ODE
    scenario's uniform +-pi, critically so on thd (the pole passes
    |thd| > pi during the catch; centers must cover it).  Pure JAX so the
    multi-seed farm can vmap it; ``key`` is the scenario root key."""
    kc = prng.fold(prng.stream(key, prng.STREAM_POLICY_INIT), 0xC0)
    k1, k2, k3 = jax.random.split(kc, 3)
    angle_centers = 1.5 * jnp.pi * 2 * (jax.random.uniform(k1, (cfg.num_basis, 1)) - 0.5)
    not_angle_scale = jnp.array([2.0, 2.0, 2.0 * jnp.pi])
    centers_init = jnp.concatenate(
        [not_angle_scale * 2 * (jax.random.uniform(k2, (cfg.num_basis, 3)) - 0.5),
         jnp.cos(angle_centers), jnp.sin(angle_centers)], axis=1,
    )
    weight_init = cfg.u_max * (jax.random.uniform(k3, (1, cfg.num_basis)) - 0.5)
    return policy.init_params(
        kc, lengthscales=jnp.ones(5), centers=centers_init, weight=weight_init
    )


def build(cfg: CartpoleMujocoConfig):
    key = prng.root_key(cfg.seed)
    # mujoco layout: [x, theta, xd, thd] — vel indices (2, 3), angle index 1
    model = SpeedIntegration(
        state_dim=4, input_dim=1, dt=cfg.dt,
        vel_indices=(2, 3), pos_indices=(0, 1),
        angle_indices=(1,), not_angle_indices=(0, 2, 3),
    )
    kern = (
        K.se_plus_volterra(active_dims=tuple(range(6)), degree=2)
        if cfg.gp_epochs >= 1000
        else K.SEArd(active_dims=tuple(range(6)))
    )
    gp = MultiGP(kernel=kern, num_heads=2, normalize_outputs=cfg.delta_cap is not None)
    policy = SumOfGaussiansWithAngles(
        feature_dim=5, input_dim=1, num_basis=cfg.num_basis, u_max=cfg.u_max,
        angle_indices=(1,), non_angle_indices=(0, 2, 3),
        reinit_lengthscales=(1.0,) * 5,
        reinit_centers=(np.pi, np.pi, np.pi, 1.0, 1.0),
        reinit_weight=cfg.u_max,
    )
    exploration = RandomExploration(state_dim=4, input_dim=1, u_max=cfg.u_max)
    # upright target theta = 0 (test_mcpilco_cartpole_mujoco.py:147-148)
    if cfg.cost_lengthscales == "curriculum":
        # wide trial 0 un-flattens the saturated cost far from upright and
        # halves the x-motion penalty that blocks aggressive pump swings;
        # trial >= 1 index clamps to the reference row (jnp gather clamp,
        # same idiom as the UR5 curriculum)
        cost_ls, per_trial = np.array([[6.0, 2.0], [3.0, 1.0]]), True
    elif cfg.cost_lengthscales == "fixed":
        cost_ls, per_trial = np.array([3.0, 1.0]), False
    else:
        raise ValueError(f"unknown cost_lengthscales {cfg.cost_lengthscales!r}")
    cost = CartPoleCost(
        target_state=(0.0, 0.0), lengthscales=cost_ls, per_trial=per_trial,
        angle_index=1, pos_index=0,
    )
    plant = MujocoPlant(
        xml="cartpole_swingup.xml", noise_std=(cfg.std_noise,) * 4, sim_timestep=cfg.sim_timestep
    )
    init_dist = InitialStateDistribution(
        kind="gaussian", mean=np.array([0.0, np.pi, 0.0, 0.0]), var=1e-4 * np.ones(4)
    )
    engine = RolloutEngine(model=model, gp=gp, policy=policy, delta_cap=cfg.delta_cap)
    optimizer = PolicyOptimizer(
        engine=engine, cost=cost, init_dist=init_dist,
        num_particles=cfg.num_particles, horizon=int(cfg.T_control / cfg.dt),
        max_opt_steps=max(cfg.opt_steps),
        alpha_diff_cost=0.99, min_diff_cost=0.08, num_min_diff_cost=200,
        min_step=200.0, lr_min=0.0025, p_drop_reduction=0.125,
        num_restarts=cfg.num_restarts,
        restart_vmap=cfg.restart_vmap,
    )
    agent = MCPilco(
        dt=cfg.dt, model=model, gp=gp, policy=policy,
        exploration_policy=exploration, cost=cost, optimizer=optimizer,
        plant=plant, init_dist=init_dist,
        sod=sod_mod.SODConfig(threshold_mode="relative", threshold=(0.5,)) if cfg.use_sod else None,
        seed=cfg.seed, log_dir=cfg.log_dir,
    )
    # shared pure-JAX initializer (single source with the seed farm; centers
    # shift <= 2 f32 ulps vs the former np-f64 inline path — within the
    # documented f32 re-roll band)
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
    agent.scenario_name = "cartpole_mujoco"
    agent.scenario_config = cfg
    return agent, reinforce_kwargs


def swingup_success(states: np.ndarray) -> bool:
    """MuJoCo layout: angle index 1, upright target 0."""
    tail = states[-(len(states) // 4) :]
    wrapped = np.abs((tail[:, 1] + np.pi) % (2 * np.pi) - np.pi)
    return bool(np.all(wrapped < 0.25) and np.all(np.abs(tail[:, 0]) < 0.5))
