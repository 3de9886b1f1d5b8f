"""One-step GP dynamics models: state/input <-> GP-IO mappings + integration.

The reference expresses these as ``Model_learning`` subclasses overriding
``data_to_gp_input`` / ``data_to_gp_output`` / ``get_next_state_from_gp_output``
(model_learning/Model_learning.py:443-493).  Here each model family is a static
config with three pure functions, used both to build training sets (host side,
per trial) and inside the jitted rollout scan (device side, per step):

- ``gp_inputs(states, inputs) -> [.., D_gp]`` feature map
- ``gp_targets(states) -> [G, N-1]`` per-head regression targets from a
  trajectory of raw states
- ``next_state(state, input, delta) -> state'`` integration of the sampled
  per-head GP outputs back into the full state

Reference parity:
- :class:`DeltaState`       <- Model_learning.py:450-493 (+ subclass RBF :496)
- :class:`DeltaStateAngles` <- Model_learning_RBF_angle_state :528-579
  (kernel choice is orthogonal here — pass any kernel to MultiGP)
- :class:`SpeedIntegration` <- Speed_Model_learning_RBF_angle_state :619-718:
  G = #velocities heads predict velocity deltas; positions integrate by
  trapezoid p' = p + Ts*v + Ts/2*dv (:711-716)
- :class:`FurutaSemiparametric` <- SP_Speed_Model_learning_Furuta :763-872
  (physics-derived features for the semiparametric kernel)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .kernels import _as_tuple


class DynamicsModel:
    """Static config base; see module docstring."""

    state_dim: int
    input_dim: int

    @property
    def num_heads(self) -> int:
        raise NotImplementedError

    @property
    def gp_input_dim(self) -> int:
        raise NotImplementedError

    def gp_inputs(self, states: jax.Array, inputs: jax.Array) -> jax.Array:
        return jnp.concatenate([states, inputs], axis=-1)

    def gp_targets(self, states: jax.Array) -> jax.Array:
        """[G, N-1] targets from an [N, ds] trajectory."""
        raise NotImplementedError

    def next_state(self, state: jax.Array, inp: jax.Array, delta: jax.Array) -> jax.Array:
        """Integrate sampled GP outputs ``delta`` [..., G] into the next state."""
        raise NotImplementedError

    def training_pairs(self, states: jax.Array, inputs: jax.Array):
        """(gp_inputs [N-1, D_gp], targets [G, N-1]) — the data_to_gp_IO analog
        (Model_learning.py:465-469)."""
        return self.gp_inputs(states, inputs)[:-1], self.gp_targets(states)

    def sample_next_state(self, state, inp, mean, var, key, particle_pred=True):
        """Reparameterized next-state draw (Model_learning.py:471-493).

        ``mean``/``var`` are [G, ...] stacked head outputs (as returned by
        MultiGP.predict); the particle axis is trailing."""
        mu = jnp.moveaxis(mean, 0, -1)  # [..., G]
        # variance floor keeps d(sqrt)/d(var) finite when the clamped posterior
        # variance hits exactly zero (BPTT would otherwise produce NaN grads)
        sd = jnp.sqrt(jnp.moveaxis(var, 0, -1) + 1e-12)
        if particle_pred:
            eps = jax.random.normal(key, mu.shape, mu.dtype)
            delta = mu + sd * eps
        else:
            delta = mu
        return self.next_state(state, inp, delta), mu, sd * sd


def _angle_extend(states, angle_idx, not_angle_idx):
    """[x_other, sin(x_ang), cos(x_ang)] extension (Model_learning.py:564-579)."""
    ang = states[..., jnp.array(angle_idx)] if angle_idx else states[..., :0]
    rest = states[..., jnp.array(not_angle_idx)] if not_angle_idx else states[..., :0]
    return jnp.concatenate([rest, jnp.sin(ang), jnp.cos(ang)], axis=-1)


@dataclasses.dataclass(frozen=True)
class DeltaState(DynamicsModel):
    """One GP head per state dim predicting s_{t+1} - s_t
    (Model_learning.py:450-493)."""

    state_dim: int
    input_dim: int

    @property
    def num_heads(self) -> int:
        return self.state_dim

    @property
    def gp_input_dim(self) -> int:
        return self.state_dim + self.input_dim

    def gp_targets(self, states):
        return (states[1:] - states[:-1]).T

    def next_state(self, state, inp, delta):
        return state + delta


@dataclasses.dataclass(frozen=True)
class DeltaStateAngles(DeltaState):
    """Delta-state model with sin/cos-extended GP inputs
    (Model_learning.py:528-579)."""

    angle_indices: Tuple[int, ...] = ()
    not_angle_indices: Tuple[int, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "angle_indices", _as_tuple(self.angle_indices) or ())
        object.__setattr__(self, "not_angle_indices", _as_tuple(self.not_angle_indices) or ())

    @property
    def gp_input_dim(self) -> int:
        return len(self.not_angle_indices) + 2 * len(self.angle_indices) + self.input_dim

    def gp_inputs(self, states, inputs):
        ext = _angle_extend(states, self.angle_indices, self.not_angle_indices)
        return jnp.concatenate([ext, inputs], axis=-1)


@dataclasses.dataclass(frozen=True)
class SpeedIntegration(DynamicsModel):
    """Speed-integration model — the one used by every shipped config
    (Model_learning.py:619-718).

    ``num_heads = len(vel_indices)`` GPs predict velocity deltas dv; the next
    state is
        v' = v + dv
        p' = p + Ts * v + Ts/2 * dv        (trapezoid, :711-716)
    where position i in ``pos_indices`` is the integral of velocity i in
    ``vel_indices``.
    """

    state_dim: int
    input_dim: int
    dt: float
    vel_indices: Tuple[int, ...]
    pos_indices: Tuple[int, ...]
    angle_indices: Tuple[int, ...] = ()
    not_angle_indices: Tuple[int, ...] = ()

    def __post_init__(self):
        for f in ("vel_indices", "pos_indices", "angle_indices", "not_angle_indices"):
            object.__setattr__(self, f, _as_tuple(getattr(self, f)) or ())

    @property
    def num_heads(self) -> int:
        return len(self.vel_indices)

    @property
    def gp_input_dim(self) -> int:
        n_ext = (
            len(self.not_angle_indices) + 2 * len(self.angle_indices)
            if (self.angle_indices or self.not_angle_indices)
            else self.state_dim
        )
        return n_ext + self.input_dim

    def gp_inputs(self, states, inputs):
        if self.angle_indices or self.not_angle_indices:
            ext = _angle_extend(states, self.angle_indices, self.not_angle_indices)
        else:
            ext = states
        return jnp.concatenate([ext, inputs], axis=-1)

    def gp_targets(self, states):
        vel = states[..., jnp.array(self.vel_indices)]
        return (vel[1:] - vel[:-1]).T

    def next_state(self, state, inp, delta):
        vel_idx = jnp.array(self.vel_indices)
        pos_idx = jnp.array(self.pos_indices)
        v = state[..., vel_idx]
        nxt = state.at[..., vel_idx].set(v + delta)
        nxt = nxt.at[..., pos_idx].add(self.dt * v + 0.5 * self.dt * delta)
        return nxt


@dataclasses.dataclass(frozen=True)
class FurutaSemiparametric(SpeedIntegration):
    """Furuta-pendulum semiparametric model (Model_learning.py:763-872).

    State [theta_h, theta_v, dtheta_h, dtheta_v]; GP input appends the nine
    physics-derived features of the forward-dynamics model (:817-837), meant
    to pair with a Sum(SEArd, Linear) kernel.
    """

    @property
    def gp_input_dim(self) -> int:
        return self.state_dim + self.input_dim + 7

    def gp_inputs(self, states, inputs):
        th_v = states[..., 1:2]
        dth_h = states[..., 2:3]
        dth_v = states[..., 3:4]
        feats = [
            states,
            inputs,
            jnp.sin(th_v) * dth_v**2,
            dth_h * dth_v * jnp.sin(2.0 * th_v),
            dth_h,
            dth_h**2 * jnp.sin(2.0 * th_v),
            dth_v,
            jnp.sin(th_v),
            inputs * jnp.cos(th_v),
        ]
        return jnp.concatenate(feats, axis=-1)
