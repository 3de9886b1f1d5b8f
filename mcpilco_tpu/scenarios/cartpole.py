"""Cart-pole swing-up scenarios (the reference's flagship configs).

Builders return a ready :class:`mcpilco_tpu.control.mc_pilco.MCPilco` plus the
``reinforce`` kwargs.  Config values mirror the reference entry scripts:

- :func:`build`                    <- test_mcpilco_cartpole.py (SE+P(2) kernel,
  SOD relative 0.5, 400 particles, 5 trials x 3 s @ 20 Hz, u_max 10)
- ``kernel='se'`` + ``sod=None``   <- test_mcpilco_cartpole_rbf_ker.py
- ``multi_init=True``              <- test_mcpilco_cartpole_multi_init.py
  (bimodal initial distribution at x = +-1 m, wider policy centers)

The state is [x, x_dot, theta, theta_dot]; swing-up target is |theta| = pi,
x = 0 (Cost_function.py:170-182).
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
from ..models import sod as sod_mod
from ..models.costs import CartPoleCost
from ..models.dynamics import SpeedIntegration
from ..models.gp import MultiGP
from ..models.policies import RandomExploration, SumOfGaussiansWithAngles
from ..utils import prng


@dataclasses.dataclass(frozen=True)
class CartpoleConfig:
    seed: int = 1
    dt: float = 0.05
    T_exploration: float = 3.0
    T_control: float = 3.0
    num_trials: int = 5
    u_max: float = 10.0
    std_noise: float = 1e-2
    kernel: str = "se+p2"  # 'se+p2' | 'se'
    use_sod: bool = True
    num_basis: int = 200
    num_particles: int = 400
    opt_steps: tuple = (2000, 4000, 4000, 4000, 4000)
    learning_rates: tuple = (0.01,) * 5
    p_dropout: tuple = (0.25,) * 5
    p_drop_reduction: float = 0.125
    alpha_diff_cost: float = 0.99
    min_diff_cost: float = 0.08
    num_min_diff_cost: int = 200
    min_step: float = 200.0
    lr_min: float = 0.0025
    gp_epochs: int = 1501
    multi_init: bool = False
    log_dir: Optional[str] = None

    def smoke(self) -> "CartpoleConfig":
        """Tiny config for CI smoke tests.

        Uses the SE kernel: the polynomial (MPK) part needs the full epoch
        budget before its weights shrink enough to extrapolate safely, and a
        smoke budget would leave it wild out-of-distribution.
        """
        return dataclasses.replace(
            self,
            kernel="se",
            num_trials=1,
            num_basis=40,
            num_particles=50,
            opt_steps=(60,),
            gp_epochs=300,
            num_min_diff_cost=20,
            min_step=10.0,
        )


STATE_DIM = 4
INPUT_DIM = 1
GP_INPUT_DIM = 6  # [x, xd, thd, sin(th), cos(th), u]


def policy_init(cfg: CartpoleConfig, policy, key):
    """Pure per-seed policy initializer (random centers over the state range,
    random weights — test_mcpilco_cartpole.py:123-151).  ``key`` is the
    scenario root key; pure JAX so the multi-seed farm can vmap it."""
    kc = prng.fold(prng.stream(key, prng.STREAM_POLICY_INIT), 0xC0)
    k1, k2, k3 = jax.random.split(kc, 3)
    # center ranges for [x, xd, thd]: the single-init test uses +-pi on all
    # three (test_mcpilco_cartpole.py:140); the multi-init test widens to
    # [+-2, +-2, +-2pi] (test_mcpilco_cartpole_multi_init.py:123)
    not_angle_scale = (
        jnp.array([2.0, 2.0, 2.0 * jnp.pi]) if cfg.multi_init
        else jnp.array([jnp.pi, jnp.pi, jnp.pi])
    )
    angle_centers = jnp.pi * 2 * (jax.random.uniform(k1, (cfg.num_basis, 1)) - 0.5)
    not_angle_centers = (
        not_angle_scale * 2 * (jax.random.uniform(k2, (cfg.num_basis, 3)) - 0.5)
    )
    centers_init = jnp.concatenate(
        [not_angle_centers, jnp.cos(angle_centers), jnp.sin(angle_centers)], axis=1
    )
    weight_init = cfg.u_max * (jax.random.uniform(k3, (INPUT_DIM, cfg.num_basis)) - 0.5)
    return policy.init_params(
        kc,
        lengthscales=jnp.ones(STATE_DIM + 1),
        centers=centers_init,
        weight=weight_init,
    )


def build(cfg: CartpoleConfig, mesh=None) -> tuple:
    """Returns (MCPilco, reinforce_kwargs).  ``mesh`` (optional
    jax.sharding.Mesh with a particle axis) shards policy optimization
    across devices — see trainer.PolicyOptimizer.mesh."""
    key = prng.root_key(cfg.seed)

    model = SpeedIntegration(
        state_dim=STATE_DIM,
        input_dim=INPUT_DIM,
        dt=cfg.dt,
        vel_indices=(1, 3),
        pos_indices=(0, 2),
        angle_indices=(2,),
        not_angle_indices=(0, 1, 3),
    )

    if cfg.kernel == "se+p2":
        kern = K.se_plus_volterra(active_dims=tuple(range(GP_INPUT_DIM)), degree=2)
    elif cfg.kernel == "se":
        kern = K.SEArd(active_dims=tuple(range(GP_INPUT_DIM)))
    else:
        raise ValueError(cfg.kernel)
    gp = MultiGP(kernel=kern, num_heads=model.num_heads)

    # policy: squashed RBF net over [x, xd, thd, cos(th), sin(th)]
    # (test_mcpilco_cartpole.py:123-151)
    policy = SumOfGaussiansWithAngles(
        feature_dim=STATE_DIM + 1,
        input_dim=INPUT_DIM,
        num_basis=cfg.num_basis,
        u_max=cfg.u_max,
        angle_indices=(2,),
        non_angle_indices=(0, 1, 3),
        reinit_lengthscales=(1.0,) * (STATE_DIM + 1),
        reinit_centers=(np.pi, np.pi, np.pi, 1.0, 1.0),
        reinit_weight=cfg.u_max,
    )
    exploration = RandomExploration(state_dim=STATE_DIM, input_dim=INPUT_DIM, u_max=cfg.u_max)
    cost = CartPoleCost(
        target_state=(np.pi, 0.0), lengthscales=(3.0, 1.0), angle_index=2, pos_index=0
    )
    plant = ODEPlant(ode_name="cartpole", noise_std=(cfg.std_noise,) * STATE_DIM)

    if cfg.multi_init:
        init_dist = InitialStateDistribution(
            kind="multi_gauss",
            mean=np.array([[1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]]),
            var=np.array([[1e-4] * 4, [1e-4] * 4]),
        )
    else:
        init_dist = InitialStateDistribution(
            kind="gaussian", mean=np.zeros(4), var=1e-4 * np.ones(4)
        )

    engine = RolloutEngine(model=model, gp=gp, policy=policy)
    horizon = int(cfg.T_control / cfg.dt)
    optimizer = PolicyOptimizer(
        engine=engine,
        cost=cost,
        init_dist=init_dist,
        num_particles=cfg.num_particles,
        horizon=horizon,
        max_opt_steps=max(cfg.opt_steps),
        alpha_diff_cost=cfg.alpha_diff_cost,
        min_diff_cost=cfg.min_diff_cost,
        num_min_diff_cost=cfg.num_min_diff_cost,
        min_step=cfg.min_step,
        lr_min=cfg.lr_min,
        p_drop_reduction=cfg.p_drop_reduction,
    )

    agent = MCPilco(
        dt=cfg.dt,
        model=model,
        gp=gp,
        policy=policy,
        exploration_policy=exploration,
        cost=cost,
        optimizer=optimizer,
        plant=plant,
        init_dist=init_dist,
        sod=sod_mod.SODConfig(threshold_mode="relative", threshold=(0.5,)) if cfg.use_sod else None,
        seed=cfg.seed,
        log_dir=cfg.log_dir,
        mesh=mesh,
    )
    # reproduce the scripted policy init (random centers/weights,
    # test_mcpilco_cartpole.py:123-151)
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
    agent.scenario_name = "cartpole"
    agent.scenario_config = cfg
    return agent, reinforce_kwargs


def swingup_success(states: np.ndarray, angle_index: int = 2, pos_index: int = 0) -> bool:
    """Success oracle: |theta| within 0.25 rad of pi and |x| < 0.5 m over the
    final quarter of the trajectory (the plot-based check of
    log_plot_cartpole.py:65-67 made explicit).

    Pinned decision (VERDICT r3 #6): the oracle is SIDE-AGNOSTIC — an
    opposite-side swing-up (theta -> -pi) that is upright and centered
    through the final quarter is a success (|theta| handles both signs, as
    the reference plot draws both +pi and -pi target lines); one still
    paying its swing-up transient inside the final quarter is a failure —
    "stabilized too late" is exactly what the tail window scores."""
    tail = states[-(len(states) // 4) :]
    th_ok = np.abs(np.abs(tail[:, angle_index]) - np.pi) < 0.25
    x_ok = np.abs(tail[:, pos_index]) < 0.5
    return bool(np.all(th_ok & x_ok))
