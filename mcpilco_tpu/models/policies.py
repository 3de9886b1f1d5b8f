"""Control and exploration policies as pure functions of parameter pytrees.

Every policy is a static config object with:

- ``init_params(key, dtype) -> params``  (pytree; empty dict if parameter-free)
- ``apply(params, states, t, key, p_dropout) -> actions`` — pure, batched over
  a leading particle axis, differentiable w.r.t. ``params`` and ``states``.
- ``param_mask(params)`` — trainable-leaf mask.
- ``reinit(params, key) -> params`` — randomized re-initialization used by the
  NaN guard (reference Policy.py:229-240).

Reference parity (citations into /root/reference):

- :class:`SumOfGaussians`            <- policy_learning/Policy.py:153-265
  (squashed RBF network with feature dropout)
- :class:`SumOfGaussiansWithAngles`  <- Policy.py:268-335 (cos/sin extension)
- :class:`SumOfGaussiansTracking`    <- Policy.py:338-403 ([s, target(t)-s])
- :class:`PDController`              <- Policy.py:406-449
- :class:`RandomExploration`         <- Policy.py:74-91
- :class:`SumOfSinusoids`            <- Policy.py:94-150
- squashing u_max*tanh(u/u_max)      <- Policy.py:52-60

Dropout matches ``torch.nn.functional.dropout`` semantics (inverted dropout:
mask/(1-p) at train time — Policy.py:225,261) but is driven by an explicit
PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import HIGHEST, _as_tuple


def squash(u: jax.Array, u_max) -> jax.Array:
    """Smoothly constrain inputs to (-u_max, u_max); ``u_max`` may be a
    scalar or per-actuator vector (Policy.py:52-60)."""
    um = jnp.asarray(u_max, u.dtype)
    return um * jnp.tanh(u / um)


def _umax_static(u_max):
    """Normalize u_max to a hashable static value (float or tuple)."""
    import numpy as _np

    a = _np.asarray(u_max, float)
    return float(a) if a.ndim == 0 else tuple(float(x) for x in a.reshape(-1))


class PolicyBase:
    """Static config base class; see module docstring for the contract."""

    input_dim: int

    def init_params(self, key, dtype=jnp.float32) -> dict:
        return {}

    def param_mask(self, params):
        return jax.tree_util.tree_map(lambda _: False, params)

    def apply(self, params, states, t, key=None, p_dropout=0.0):
        raise NotImplementedError

    def reinit(self, params, key):
        return params

    def host_policy(self, params):
        """NumPy-facing closure for host-side plant rollouts — the
        ``get_np_policy`` analog (Policy.py:62-68).  Single jit per policy."""
        fn = jax.jit(lambda s, t: self.apply(params, s[None, :], t)[0])

        def np_policy(state, t):
            return np.asarray(fn(jnp.asarray(state, jnp.float32), jnp.asarray(int(round(t)))))

        return np_policy


@dataclasses.dataclass(frozen=True)
class RandomExploration(PolicyBase):
    """Uniform random action in (-u_max, u_max) each step (Policy.py:74-91).

    Squashing a uniform draw (as the reference does) would bias actions toward
    the interior; we draw uniformly and squash identically for parity.
    """

    state_dim: int
    input_dim: int
    u_max: float = 1.0

    def apply(self, params, states, t, key=None, p_dropout=0.0):
        if key is None:
            raise ValueError("RandomExploration needs a key")
        batch = states.shape[:-1]
        k = jax.random.fold_in(key, t)
        raw = self.u_max * (2.0 * jax.random.uniform(k, batch + (self.input_dim,)) - 1.0)
        return squash(raw, self.u_max)


@dataclasses.dataclass(frozen=True)
class SumOfSinusoids(PolicyBase):
    """Sum of ``num_sin`` random-parameter sinusoids (Policy.py:94-150).

    The random amplitudes/frequencies/phases are *frozen params* drawn at
    ``init_params`` time.  ``t`` is the integer step index; the reference
    evaluates sin(omega * t + phase) with t in steps as well (MC_PILCO.py:660-671).
    """

    state_dim: int
    input_dim: int
    num_sin: int
    omega_min: float
    omega_max: float
    amplitude_min: float
    amplitude_max: float
    squash_output: bool = False
    u_max: float = 1.0
    # step-index -> seconds conversion: omegas are in rad/s and the reference
    # host rollout evaluates sin(omega * t_seconds + phase)
    # (simulation_class/model.py:56-58 passes seconds)
    dt: float = 1.0

    def init_params(self, key, dtype=jnp.float32) -> dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        shape = (self.num_sin, self.input_dim)
        amp = self.amplitude_min + (self.amplitude_max - self.amplitude_min) * jax.random.uniform(
            k1, shape, dtype
        )
        sign_w = jnp.where(jax.random.bernoulli(k2, 0.5, shape), 1.0, -1.0).astype(dtype)
        omega = sign_w * (
            self.omega_min + (self.omega_max - self.omega_min) * jax.random.uniform(k3, shape, dtype)
        )
        sign_p = jnp.where(jax.random.bernoulli(k4, 0.5, shape), 1.0, -1.0).astype(dtype)
        phase = sign_p * jnp.pi * (jax.random.uniform(k5, shape, dtype) - 0.5)
        return {"amplitudes": amp, "omega": omega, "phases": phase}

    def apply(self, params, states, t, key=None, p_dropout=0.0):
        tt = jnp.asarray(t, states.dtype) * self.dt
        u = jnp.sum(params["amplitudes"] * jnp.sin(params["omega"] * tt + params["phases"]), axis=0)
        u = jnp.broadcast_to(u, states.shape[:-1] + (self.input_dim,))
        return squash(u, self.u_max) if self.squash_output else u


@dataclasses.dataclass(frozen=True)
class SumOfGaussians(PolicyBase):
    """The trainable controller: squashed RBF network with feature dropout.

    u = squash(W @ dropout(exp(-||(s/scale - c)/l||^2)))   (Policy.py:242-265)

    ``feature_dim`` is the dimension of the (possibly extended) policy input.
    """

    feature_dim: int
    input_dim: int
    num_basis: int
    u_max: float = 1.0
    squash_output: bool = True
    use_bias: bool = False
    train_lengthscales: bool = True
    train_centers: bool = True
    train_weight: bool = True
    train_bias: bool = False
    centers_init_min: float = -1.0
    centers_init_max: float = 1.0
    scale_factor: Optional[Tuple[float, ...]] = None
    # randomized-reinit magnitudes (reference policy_reinit_dict,
    # test_mcpilco_cartpole.py:148-151)
    reinit_lengthscales: Optional[Tuple[float, ...]] = None
    reinit_centers: Optional[Tuple[float, ...]] = None
    reinit_weight: Optional[float] = None

    def __post_init__(self):
        object.__setattr__(self, "u_max", _umax_static(self.u_max))
        for f in ("scale_factor", "reinit_lengthscales", "reinit_centers"):
            v = getattr(self, f)
            if v is not None:
                object.__setattr__(self, f, tuple(float(x) for x in np.asarray(v).reshape(-1)))

    def init_params(self, key, lengthscales=None, centers=None, weight=None, bias=None, dtype=jnp.float32):
        kc, kw = jax.random.split(key)
        nf, nb = self.feature_dim, self.num_basis
        ls = jnp.ones(nf, dtype) if lengthscales is None else jnp.asarray(lengthscales, dtype) * jnp.ones(nf, dtype)
        if centers is None:
            centers = self.centers_init_min + (self.centers_init_max - self.centers_init_min) * jax.random.uniform(
                kc, (nb, nf), dtype
            )
        else:
            centers = jnp.asarray(centers, dtype)
        if weight is None:
            um = jnp.asarray(self.u_max, dtype)
            um = um.reshape(-1, 1) if um.ndim else um
            weight = um * (jax.random.uniform(kw, (self.input_dim, nb), dtype) - 0.5)
        else:
            weight = jnp.asarray(weight, dtype)
        p = {"log_lengthscales": jnp.log(ls), "centers": centers, "weight": weight}
        if self.use_bias:
            p["bias"] = jnp.zeros(self.input_dim, dtype) if bias is None else jnp.asarray(bias, dtype)
        return p

    def param_mask(self, params):
        m = {
            "log_lengthscales": self.train_lengthscales,
            "centers": self.train_centers,
            "weight": self.train_weight,
        }
        if "bias" in params:
            m["bias"] = self.train_bias
        return m

    def reinit(self, params, key):
        """Randomized re-init on NaN (Policy.py:229-240): centers ~ c*2(U-.5),
        weight ~ w*(U-.5), lengthscales reset to the configured values."""
        kc, kw = jax.random.split(key)
        dtype = params["centers"].dtype
        ls = jnp.asarray(
            self.reinit_lengthscales if self.reinit_lengthscales is not None else jnp.exp(params["log_lengthscales"]),
            dtype,
        ) * jnp.ones(self.feature_dim, dtype)
        c_mag = jnp.asarray(
            self.reinit_centers if self.reinit_centers is not None else jnp.ones(self.feature_dim), dtype
        )
        w_mag = jnp.asarray(self.reinit_weight if self.reinit_weight is not None else self.u_max, dtype)
        w_mag = w_mag.reshape(-1, 1) if w_mag.ndim else w_mag
        new = dict(params)
        new["log_lengthscales"] = jnp.log(ls)
        new["centers"] = c_mag * 2.0 * (jax.random.uniform(kc, params["centers"].shape, dtype) - 0.5)
        new["weight"] = w_mag * (jax.random.uniform(kw, params["weight"].shape, dtype) - 0.5)
        return new

    def features(self, params, policy_in):
        """exp(-squared distance to centers): [..., num_basis]."""
        if self.scale_factor is not None:
            policy_in = policy_in / jnp.asarray(self.scale_factor, policy_in.dtype)
        ls = jnp.exp(params["log_lengthscales"])
        s = policy_in / ls
        c = params["centers"] / ls
        # direct differences: cancellation-free (see kernels.sq_dist)
        diff = s[..., :, None, :] - c[None, :, :]
        return jnp.exp(-jnp.sum(diff * diff, axis=-1))

    def _policy_input(self, states, t):
        return states

    def apply(self, params, states, t, key=None, p_dropout=0.0):
        feats = self.features(params, self._policy_input(states, t))
        p = jnp.asarray(p_dropout, feats.dtype)
        if key is not None:
            keep = 1.0 - p
            mask = jax.random.bernoulli(key, jnp.maximum(keep, 1e-6), feats.shape)
            feats = jnp.where(p > 0, feats * mask / jnp.maximum(keep, 1e-6), feats)
        u = jnp.matmul(feats, params["weight"].T, precision=HIGHEST)
        if "bias" in params:
            u = u + params["bias"]
        return squash(u, self.u_max) if self.squash_output else u


@dataclasses.dataclass(frozen=True)
class SumOfGaussiansWithAngles(SumOfGaussians):
    """Angle dims mapped to (cos, sin) before the RBF net (Policy.py:268-335).

    ``feature_dim`` must equal state_dim + len(angle_indices).
    """

    angle_indices: Tuple[int, ...] = ()
    non_angle_indices: Tuple[int, ...] = ()

    def __post_init__(self):
        super().__post_init__()
        object.__setattr__(self, "angle_indices", _as_tuple(self.angle_indices))
        object.__setattr__(self, "non_angle_indices", _as_tuple(self.non_angle_indices))

    def _policy_input(self, states, t):
        ang = states[..., jnp.array(self.angle_indices)]
        rest = states[..., jnp.array(self.non_angle_indices)]
        return jnp.concatenate([rest, jnp.cos(ang), jnp.sin(ang)], axis=-1)


@dataclasses.dataclass(frozen=True)
class SumOfGaussiansTracking(SumOfGaussians):
    """Time-indexed tracking policy: input [s, target(t) - s] (Policy.py:338-403).

    ``feature_dim`` must equal 2 * state_dim; the target trajectory is static
    data (non-trainable), supplied at construction.
    """

    target_traj: Tuple[Tuple[float, ...], ...] = ()

    def __post_init__(self):
        super().__post_init__()
        tt = tuple(tuple(float(v) for v in row) for row in np.asarray(self.target_traj))
        object.__setattr__(self, "target_traj", tt)

    def _traj(self, dtype):
        return jnp.asarray(self.target_traj, dtype)

    def _policy_input(self, states, t):
        traj = self._traj(states.dtype)
        idx = jnp.clip(jnp.asarray(t, jnp.int32), 0, traj.shape[0] - 1)
        target = traj[idx]
        return jnp.concatenate([states, target - states], axis=-1)


@dataclasses.dataclass(frozen=True)
class PDController(PolicyBase):
    """PD tracking controller: u = squash(Kp^2 e_pos + Kd^2 e_vel)
    against a reference trajectory (Policy.py:406-449)."""

    state_dim: int
    input_dim: int
    target_traj: Tuple[Tuple[float, ...], ...] = ()
    u_max: float = 1.0
    trainable: bool = False
    # exploration dither added to the PD torque before squashing: gives the
    # GP coverage of the torque dims beyond the exact PD law (the polynomial
    # kernel extrapolates wildly in under-covered input dims)
    noise_std: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "u_max", _umax_static(self.u_max))
        tt = tuple(tuple(float(v) for v in row) for row in np.asarray(self.target_traj))
        object.__setattr__(self, "target_traj", tt)

    def init_params(self, key, sqrt_kp=None, sqrt_kd=None, dtype=jnp.float32):
        half = self.state_dim // 2
        kp = jnp.ones(half, dtype) if sqrt_kp is None else jnp.asarray(sqrt_kp, dtype)
        kd = jnp.ones(half, dtype) if sqrt_kd is None else jnp.asarray(sqrt_kd, dtype)
        return {"sqrt_kp": kp, "sqrt_kd": kd}

    def param_mask(self, params):
        return {"sqrt_kp": self.trainable, "sqrt_kd": self.trainable}

    def apply(self, params, states, t, key=None, p_dropout=0.0):
        traj = jnp.asarray(self.target_traj, states.dtype)
        idx = jnp.clip(jnp.asarray(t, jnp.int32), 0, traj.shape[0] - 1)
        err = traj[idx] - states
        half = self.state_dim // 2
        u = params["sqrt_kp"] ** 2 * err[..., :half] + params["sqrt_kd"] ** 2 * err[..., half:]
        if self.noise_std > 0 and key is not None:
            u = u + self.noise_std * jax.random.normal(
                jax.random.fold_in(key, 0x9D), u.shape, u.dtype
            )
        return squash(u, self.u_max)
