"""MC-PILCO-4PMS cart-pole: swing-up with a modeled measurement system.

Mirrors the reference `test_mcpilco4pms_cartpole.py`:

- plant: ODE cartpole at 30 Hz, positions measured with 3e-3 noise,
  velocities NOT measured — estimated online by causal differentiation +
  1st-order Butterworth (fc=0.5) during control, and offline by zero-phase
  filtering + central differences for model data (MC_PILCO.py:908-962)
- simulated rollouts inject the same measurement chain differentiably so the
  policy trains against what it will actually sense (MC_PILCO.py:808-906)
- SE-only kernel, Sum-of-sinusoids exploration, fixed initial state
  (:88-101, :191)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..control.mc_pilco import MCPilco, ModelFitOptions, PolicyOptOptions
from ..control.rollout import InitialStateDistribution, PMSSensors, RolloutEngine
from ..control.trainer import PolicyOptimizer
from ..envs.plants import PMSODEPlant
from ..models import kernels as K
from ..models.costs import CartPoleCost
from ..models.dynamics import SpeedIntegration
from ..models.gp import MultiGP
from ..models.policies import SumOfGaussiansWithAngles, SumOfSinusoids
from ..utils import prng
from . import cartpole as base


@dataclasses.dataclass(frozen=True)
class CartpolePMSConfig:
    seed: int = 1
    dt: float = 1.0 / 30.0
    T_exploration: float = 3.0
    T_control: float = 3.0
    num_trials: int = 5
    u_max: float = 10.0
    std_noise: float = 3e-3
    fc_online: float = 0.5  # online butter(1, fc) cutoff (:155-158)
    num_basis: int = 200
    num_particles: int = 400
    opt_steps: tuple = (2000, 4000, 4000, 4000, 4000)
    learning_rates: tuple = (0.01,) * 5
    p_dropout: tuple = (0.25,) * 5
    gp_epochs: int = 1501
    bptt_clip: float = 0.2
    # offline velocity estimator for GP training targets: "butter_cd" is the
    # reference protocol (MC_PILCO.py:940-962); "savgol" is this framework's
    # opt-in Savitzky-Golay estimator (window 7, polyorder 5), which on
    # recorded 4PMS trials cuts theta-dot RMSE vs the true plant ~40% and
    # raises the peak |delta v| gain from ~0.90 to ~0.96-0.98 (RESULTS.md)
    vel_est: str = "butter_cd"
    # vmapped policy-init restarts per trial (PolicyOptimizer.num_restarts);
    # 2 of the 3 failing sequential-protocol seeds are optimization-mode —
    # zero in-model upright particles (analyze_mujoco_failures --scenario
    # pms, results/analyze_pms_modes_r3.json).  1 = reference single init.
    num_restarts: int = 1
    # False = sequential restart lanes reusing the compiled R=1 program
    # (the tunneled-TPU fallback for the vmapped-R stall; trainer.py)
    restart_vmap: bool = True
    log_dir: Optional[str] = None

    def smoke(self) -> "CartpolePMSConfig":
        return dataclasses.replace(
            self, num_trials=1, num_basis=40, num_particles=50, opt_steps=(60,), gp_epochs=300
        )


def policy_init(cfg: CartpolePMSConfig, policy, key):
    """Pure per-seed policy initializer (test_mcpilco4pms_cartpole.py policy
    seeding); pure JAX so the multi-seed farm can vmap it.  Draws match the
    sequential build() exactly (same key folds, same uniform calls)."""
    import jax

    kc = prng.fold(prng.stream(key, prng.STREAM_POLICY_INIT), 0xC0)
    k1, k2, k3 = jax.random.split(kc, 3)
    angle_centers = jnp.pi * 2 * (jax.random.uniform(k1, (cfg.num_basis, 1)) - 0.5)
    centers_init = jnp.concatenate(
        [jnp.pi * 2 * (jax.random.uniform(k2, (cfg.num_basis, 3)) - 0.5),
         jnp.cos(angle_centers), jnp.sin(angle_centers)], axis=1,
    )
    weight_init = cfg.u_max * (jax.random.uniform(k3, (1, cfg.num_basis)) - 0.5)
    return policy.init_params(
        kc, lengthscales=jnp.ones(5), centers=centers_init, weight=weight_init
    )


def build(cfg: CartpolePMSConfig):
    key = prng.root_key(cfg.seed)
    model = SpeedIntegration(
        state_dim=4, input_dim=1, dt=cfg.dt,
        vel_indices=(1, 3), pos_indices=(0, 2),
        angle_indices=(2,), not_angle_indices=(0, 1, 3),
    )
    gp = MultiGP(kernel=K.SEArd(active_dims=tuple(range(6))), num_heads=2)

    policy = SumOfGaussiansWithAngles(
        feature_dim=5, input_dim=1, num_basis=cfg.num_basis, u_max=cfg.u_max,
        angle_indices=(2,), non_angle_indices=(0, 1, 3),
        reinit_lengthscales=(1.0,) * 5,
        reinit_centers=(np.pi, np.pi, np.pi, 1.0, 1.0),
        reinit_weight=cfg.u_max,
    )
    exploration = SumOfSinusoids(
        state_dim=4, input_dim=1, num_sin=10,
        omega_min=0.1 * 2 * np.pi, omega_max=2 * 2 * np.pi,
        amplitude_min=cfg.u_max / 10, amplitude_max=cfg.u_max / 10,
        dt=cfg.dt,
    )
    cost = CartPoleCost(target_state=(np.pi, 0.0), lengthscales=(3.0, 1.0))
    plant = PMSODEPlant(
        ode_name="cartpole", noise_std=(cfg.std_noise,) * 4,
        pos_indices=(0, 2), vel_indices=(1, 3), fc=cfg.fc_online,
    )
    sensors = PMSSensors(
        pos_indices=(0, 2), vel_indices=(1, 3),
        std_pos_noise=(cfg.std_noise, cfg.std_noise), fc=cfg.fc_online, dt=cfg.dt,
    )
    init_dist = InitialStateDistribution(kind="gaussian", mean=np.zeros(4), var=1e-4 * np.ones(4))

    # bptt_clip: the 4PMS sensor chain (finite-difference velocities, gain
    # 1/dt) makes BPTT cotangents explode on TPU; a tight per-particle cap
    # keeps the clipped-spike noise below the healthy signal even as the
    # model sharpens in later trials (see rollout._clip_bptt; cap sweep:
    # 5.0 diverges by trial 3, 1.0 marginal, 0.2 converges)
    engine = RolloutEngine(model=model, gp=gp, policy=policy, sensors=sensors, bptt_clip=cfg.bptt_clip)
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
        offline_filtering=True, offline_filter_cutoff=0.5,
        offline_filter_method=cfg.vel_est,
        seed=cfg.seed, log_dir=cfg.log_dir,
        fixed_initial_state=True,  # random_initial_state=False (:191)
    )
    # scripted policy init (same pattern as the fully-measurable scenario)
    agent.policy_params = policy_init(cfg, policy, key)

    reinforce_kwargs = dict(
        num_trials=cfg.num_trials,
        T_exploration=cfg.T_exploration,
        T_control=cfg.T_control,
        model_fit_options=[ModelFitOptions(num_epochs=cfg.gp_epochs)] * max(cfg.num_trials, 1),
        policy_opt_options=[
            PolicyOptOptions(opt_steps=s, learning_rate=lr, p_dropout=p)
            for s, lr, p in zip(cfg.opt_steps, cfg.learning_rates, cfg.p_dropout)
        ],
    )
    agent.scenario_name = "cartpole_pms"
    agent.scenario_config = cfg
    return agent, reinforce_kwargs


swingup_success = base.swingup_success
