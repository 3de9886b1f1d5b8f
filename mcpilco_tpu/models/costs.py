"""Cost functions over particle trajectories.

A cost is a static config object with
``stage_costs(states [T,P,ds], inputs [T,P,du], trial_index) -> [T,P]``;
:func:`expected_cost` reduces to the scalar objective exactly as the reference
``Expected_cost`` does (policy_learning/Cost_function.py:15-36):

    total = sum_t mean_particles(c_t),   spread = sum_t std_particles(c_t)

Reference parity:
- :class:`SaturatedDistance`           <- Cost_function.py:66-101
- :class:`QuadraticDistance`           <- Cost_function.py:39-63
- :class:`SaturatedTrajectoryTracking` <- Cost_function.py:104-147
- :class:`CartPoleCost`                <- Cost_function.py:150-182
  (|theta| makes both swing-up directions equivalent)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import _as_tuple


def expected_cost(stage: jax.Array):
    """Reduce [T, P] stage costs to (sum of means, sum of stds).

    The particle std uses the unbiased estimator (torch.std default) and is
    detached from the gradient in the reference (Cost_function.py:33-35);
    callers should ``lax.stop_gradient`` the second output if differentiating.
    """
    mean_t = jnp.mean(stage, axis=1)
    std_t = jnp.std(stage, axis=1, ddof=1)
    return jnp.sum(mean_t), jnp.sum(jax.lax.stop_gradient(std_t))


class CostBase:
    def stage_costs(self, states, inputs, trial_index=0):
        raise NotImplementedError

    def __call__(self, states, inputs, trial_index=0):
        return expected_cost(self.stage_costs(states, inputs, trial_index))


@dataclasses.dataclass(frozen=True)
class QuadraticDistance(CostBase):
    """Squared lengthscale-weighted distance to a target state
    (``Expected_distance``, Cost_function.py:39-63)."""

    target_state: Tuple[float, ...]
    lengthscales: Tuple[float, ...]
    active_dims: Optional[Tuple[int, ...]] = None
    # state dims to take |.| of before the distance — makes +target and
    # -target equivalent for angle dims, the CartPoleCost |theta| idiom
    # (Cost_function.py:177)
    abs_dims: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        object.__setattr__(
            self, "target_state", tuple(float(v) for v in np.asarray(self.target_state, float))
        )
        object.__setattr__(
            self,
            "lengthscales",
            tuple(float(v) for v in np.asarray(self.lengthscales, float).reshape(-1)),
        )
        object.__setattr__(self, "active_dims", _as_tuple(self.active_dims))
        object.__setattr__(self, "abs_dims", _as_tuple(self.abs_dims))

    def _dist(self, states):
        if self.abs_dims is not None:
            idx = jnp.array(self.abs_dims)
            states = states.at[..., idx].set(jnp.abs(states[..., idx]))
        if self.active_dims is not None:
            states = states[..., jnp.array(self.active_dims)]
        ls = jnp.asarray(self.lengthscales, states.dtype)
        tgt = jnp.asarray(self.target_state, states.dtype)
        d = (states - tgt) / ls
        return jnp.sum(d * d, axis=-1)

    def stage_costs(self, states, inputs, trial_index=0):
        return self._dist(states)


@dataclasses.dataclass(frozen=True)
class SaturatedDistance(QuadraticDistance):
    """1 - exp(-squared weighted distance) (Cost_function.py:80-101)."""

    def stage_costs(self, states, inputs, trial_index=0):
        return 1.0 - jnp.exp(-self._dist(states))


@dataclasses.dataclass(frozen=True)
class SaturatedTrajectoryTracking(CostBase):
    """Saturated tracking cost vs a time-indexed target trajectory
    (Cost_function.py:124-147).  ``lengthscales`` may be per-trial
    ([n_trials, d] with ``per_trial=True``)."""

    target_traj: Tuple[Tuple[float, ...], ...]
    lengthscales: Tuple
    per_trial: bool = False
    used_indices: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        tt = tuple(tuple(float(v) for v in row) for row in np.asarray(self.target_traj))
        object.__setattr__(self, "target_traj", tt)
        ls = np.asarray(self.lengthscales, float)
        # native floats (see rollout.InitialStateDistribution.__post_init__):
        # np-scalar members make tuple equality raise when a flat (fixed)
        # and a per-trial (curriculum) instance are compared by jit caching
        object.__setattr__(
            self,
            "lengthscales",
            tuple(tuple(float(x) for x in row) for row in ls)
            if ls.ndim == 2
            else tuple(float(x) for x in ls.reshape(-1)),
        )
        object.__setattr__(self, "used_indices", _as_tuple(self.used_indices))

    def stage_costs(self, states, inputs, trial_index=0):
        T = states.shape[0]
        traj_full = jnp.asarray(self.target_traj, states.dtype)
        # Clamp the time index into the target: an EXECUTED trial carries T+1
        # states (initial sample included), one more than the T-step target —
        # the trailing sample is scored against the final target state.
        traj = traj_full[jnp.clip(jnp.arange(T), 0, traj_full.shape[0] - 1)]  # [T, ds]
        ls = jnp.asarray(self.lengthscales, states.dtype)
        if self.per_trial:
            ls = ls[trial_index]
        err = states - traj[:, None, :]
        if self.used_indices is not None:
            idx = jnp.array(self.used_indices)
            err = err[..., idx]
            ls = ls[..., idx] if ls.ndim else ls
        d = jnp.sum((err / ls) ** 2, axis=-1)
        return 1.0 - jnp.exp(-d)


@dataclasses.dataclass(frozen=True)
class CartPoleCost(CostBase):
    """1 - exp(-((|theta|-theta*)/l_th)^2 - ((x-x*)/l_x)^2)
    (Cost_function.py:170-182); target_state = (theta*, x*).

    ``lengthscales`` may be per-trial ([n_trials, 2] with ``per_trial=True``),
    the cartpole analog of the reference's per-trial trajectory-cost
    lengthscales (Cost_function.py:104-147) — a wide-early curriculum
    un-flattens the saturated cost for plateau seeds exactly as it does
    for the UR5 tracking cost (RESULTS.md "Targeted curriculum rescue")."""

    target_state: Tuple[float, float]
    lengthscales: Tuple
    angle_index: int = 2
    pos_index: int = 0
    per_trial: bool = False

    def __post_init__(self):
        object.__setattr__(
            self, "target_state", tuple(float(v) for v in np.asarray(self.target_state, float))
        )
        ls = np.asarray(self.lengthscales, float)
        # native floats: np-scalar members break tuple equality between a
        # flat (fixed) and a nested (per-trial) instance under jit caching
        # (see SaturatedTrajectoryTracking.__post_init__)
        object.__setattr__(
            self,
            "lengthscales",
            tuple(tuple(float(x) for x in row) for row in ls)
            if ls.ndim == 2
            else tuple(float(x) for x in ls.reshape(-1)),
        )

    def stage_costs(self, states, inputs, trial_index=0):
        theta = states[..., self.angle_index]
        x = states[..., self.pos_index]
        t_th, t_x = self.target_state
        ls = jnp.asarray(self.lengthscales, states.dtype)
        if self.per_trial:
            ls = ls[trial_index]
        l_th, l_x = ls[0], ls[1]
        return 1.0 - jnp.exp(
            -(((jnp.abs(theta) - t_th) / l_th) ** 2) - ((x - t_x) / l_x) ** 2
        )
