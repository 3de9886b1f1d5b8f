"""Differentiable Monte-Carlo particle rollouts through the learned GP model.

The reference rolls particles with a Python time loop of torch ops
(MC_PILCO.py:615-674; 4PMS variant :808-906).  Here the rollout is a single
``lax.scan`` over the horizon whose step does, for all particles at once:

    gp_in = model.gp_inputs(s, u)            # feature map
    mu, var = gp.predict(params, post, gp_in)  # all heads, batched (MXU)
    s' = model.next_state(s, u, mu + sqrt(var) * eps)   # reparameterized
    u' = policy(theta, sensor(s'), t)

Everything is differentiable w.r.t. the policy parameters (BPTT through the
scan), optionally rematerialized per step with ``jax.checkpoint`` to trade
FLOPs for memory on long horizons (the "long-context" analog — SURVEY §5).

The 4PMS sensor chain (position noise -> causal finite-difference velocities
-> online 1st-order Butterworth) runs inside the same scan and stays
differentiable (MC_PILCO.py:873-903).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import filters
from ..models.dynamics import DynamicsModel
from ..models.gp import MultiGP, Posterior
from ..models.policies import PolicyBase
from ..utils import prng


@dataclasses.dataclass(frozen=True)
class InitialStateDistribution:
    """Initial particle distribution (MC_PILCO.py:635-657).

    kind: 'gaussian' (mean/var), 'uniform' (low/high), or 'multi_gauss'
    (rows of mean/var are mixture components, sampled uniformly).
    """

    kind: str
    mean: Tuple = ()
    var: Tuple = ()
    low: Tuple = ()
    high: Tuple = ()

    def __post_init__(self):
        for f in ("mean", "var", "low", "high"):
            v = np.asarray(getattr(self, f), float)
            # native floats, not np scalars: frozen-dataclass equality must
            # never hit np.float64.__eq__(tuple), which broadcasts to an
            # array and breaks jit static-arg / pytree-metadata comparison
            # when two differently-shaped configs meet in one process
            object.__setattr__(
                self,
                f,
                tuple(tuple(float(x) for x in row) for row in v)
                if v.ndim == 2
                else tuple(float(x) for x in v.reshape(-1)),
            )

    def sample(self, key, num_particles: int, dtype=jnp.float32) -> jax.Array:
        if self.kind == "uniform":
            lo = jnp.asarray(self.low, dtype)
            hi = jnp.asarray(self.high, dtype)
            u = jax.random.uniform(key, (num_particles, lo.shape[0]), dtype)
            return lo + (hi - lo) * u
        mean = jnp.asarray(self.mean, dtype)
        std = jnp.sqrt(jnp.asarray(self.var, dtype))
        if self.kind == "multi_gauss":
            k1, k2 = jax.random.split(key)
            idx = jax.random.randint(k1, (num_particles,), 0, mean.shape[0])
            eps = jax.random.normal(k2, (num_particles, mean.shape[1]), dtype)
            return mean[idx] + std[idx] * eps
        if self.kind != "gaussian":
            raise ValueError(f"unknown initial distribution kind: {self.kind}")
        eps = jax.random.normal(key, (num_particles, mean.shape[0]), dtype)
        return mean + std * eps

    def sample_single(self, key, dtype=jnp.float32) -> jax.Array:
        """One initial state for a real-system interaction
        (MC_PILCO.py:115-124)."""
        return self.sample(key, 1, dtype)[0]


@dataclasses.dataclass(frozen=True)
class PMSSensors:
    """Partially-measurable-system sensor model used inside rollouts
    (MC_PILCO.py:808-906): positions measured with Gaussian noise, velocities
    by causal differentiation + online 1st-order Butterworth low-pass."""

    pos_indices: Tuple[int, ...]
    vel_indices: Tuple[int, ...]
    std_pos_noise: Tuple[float, ...]
    fc: float  # normalized cutoff (Nyquist units) of butter(1, fc)
    dt: float

    def __post_init__(self):
        object.__setattr__(self, "pos_indices", tuple(int(i) for i in np.asarray(self.pos_indices)))
        object.__setattr__(self, "vel_indices", tuple(int(i) for i in np.asarray(self.vel_indices)))
        object.__setattr__(
            self, "std_pos_noise", tuple(float(v) for v in np.asarray(self.std_pos_noise).reshape(-1))
        )

    def coeffs(self):
        return filters.butter1(self.fc)


class RolloutResult(NamedTuple):
    states: jax.Array  # [T, P, ds] true states (cost is evaluated on these)
    inputs: jax.Array  # [T, P, du]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _clip_bptt(x, cap):
    """Identity whose backward clips the per-particle cotangent norm.

    BPTT through the closed loop of learned dynamics + policy (+ the 4PMS
    measurement chain) can have step Jacobians with spectral radius > 1, so
    cotangents — and any numerical noise in them — grow exponentially with
    the horizon (measured up to 1e4x on TPU for the 4PMS cartpole at
    horizon 90, while CPU f32/f64 stay bounded).  Clipping the state
    cotangent once per step is the standard chaotic-BPTT stabilizer: exact
    whenever norms stay under ``cap``, bounded otherwise.
    """
    return x


def _clip_bptt_fwd(x, cap):
    return x, None


def _clip_bptt_bwd(cap, _, g):
    n = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    return (g * jnp.minimum(1.0, cap / (n + 1e-30)),)


_clip_bptt.defvjp(_clip_bptt_fwd, _clip_bptt_bwd)


@dataclasses.dataclass(frozen=True)
class RolloutEngine:
    """Binds (dynamics model, GP, policy, optional sensors) into scan rollouts."""

    model: DynamicsModel
    gp: MultiGP
    policy: PolicyBase
    sensors: Optional[PMSSensors] = None
    remat: bool = False  # jax.checkpoint each step for long horizons
    # per-particle state-cotangent norm cap applied once per scan step
    # (see _clip_bptt); None disables.  Healthy per-particle cotangents in
    # the shipped scenarios are O(0.1-1); explosions reach O(1e3).  Enable
    # for sensor-chain (4PMS) or long-horizon configs.
    bptt_clip: Optional[float] = None
    # Cap on the predicted per-step delta, in units of the largest observed
    # training target (Posterior.norm): mean clipped to +-cap*norm, variance
    # to (cap*norm)^2.  Unbounded-feature kernels (the semiparametric Linear
    # over quadratic physics terms, Model_learning.py:817-837) have posterior
    # mean AND variance that grow with ||feature||^2, so one particle leaving
    # the data support explodes the whole closed-loop rollout within a few
    # steps (measured: trial-0 Furuta NaN-reinit storms).  A delta larger
    # than a few times the largest delta ever observed is physically
    # impossible for a torque-limited system, so the cap only binds where
    # the model has no data.  Requires MultiGP(normalize_outputs=True) for
    # norm to carry the max-abs target scale.  None disables (exact parity).
    delta_cap: Optional[float] = None
    # lax.scan unroll factor for the rollout horizon.  The flagship step is
    # dominated by per-scan-step fusion overhead (~30 small kernels/step;
    # profile in RESULTS.md), not FLOPs or HBM; unrolling lets XLA fuse
    # across consecutive steps at the cost of compile time.  1 = off.
    scan_unroll: int = 1

    def __post_init__(self):
        if self.delta_cap is not None and not self.gp.normalize_outputs:
            raise ValueError(
                "delta_cap is expressed in units of Posterior.norm (the "
                "max-abs training target); with MultiGP(normalize_outputs="
                "False) norm is all-ones and the cap would bind at "
                f"{self.delta_cap} absolute output units, silently distorting "
                "rollouts. Enable output normalization or disable delta_cap."
            )

    def _cap_delta(self, posterior, mean, var):
        if self.delta_cap is None:
            return mean, var
        lim = self.delta_cap * posterior.norm[:, None]  # [G, 1] output units
        return jnp.clip(mean, -lim, lim), jnp.minimum(var, lim * lim)

    # -------------------------------------------------- standard rollout

    def simulate(
        self,
        key: jax.Array,
        policy_params,
        gp_params,
        posterior: Posterior,
        s0: jax.Array,
        horizon: int,
        p_dropout=0.0,
        particle_pred: bool = True,
    ) -> RolloutResult:
        """Roll ``s0`` [P, ds] forward ``horizon`` steps (step 0 = s0)."""
        if self.sensors is not None:
            return self._simulate_pms(
                key, policy_params, gp_params, posterior, s0, horizon, p_dropout, particle_pred
            )

        def policy_at(s, t, key_t):
            kd = prng.stream(key_t, prng.STREAM_DROPOUT)
            return self.policy.apply(policy_params, s, t, key=kd, p_dropout=p_dropout)

        u0 = policy_at(s0, 0, prng.fold(key, 0))

        def step(carry, t):
            s, u = carry
            if self.bptt_clip is not None:
                s = _clip_bptt(s, self.bptt_clip)
            kt = prng.fold(key, t)
            gp_in = self.model.gp_inputs(s, u)
            mean, var = self.gp.predict(gp_params, posterior, gp_in)
            mean, var = self._cap_delta(posterior, mean, var)
            s_next, _, _ = self.model.sample_next_state(
                s, u, mean, var, prng.stream(kt, prng.STREAM_ROLLOUT), particle_pred
            )
            u_next = policy_at(s_next, t, kt)
            return (s_next, u_next), (s_next, u_next)

        if self.remat:
            step = jax.checkpoint(step)
        _, (states, inputs) = jax.lax.scan(
            step, (s0, u0), jnp.arange(1, horizon), unroll=self.scan_unroll
        )
        states = jnp.concatenate([s0[None], states], axis=0)
        inputs = jnp.concatenate([u0[None], inputs], axis=0)
        return RolloutResult(states=states, inputs=inputs)

    # -------------------------------------------------- 4PMS rollout

    def _simulate_pms(
        self, key, policy_params, gp_params, posterior, s0, horizon, p_dropout, particle_pred
    ) -> RolloutResult:
        sens = self.sensors
        b, a = sens.coeffs()
        b, a = jnp.asarray(b, s0.dtype), jnp.asarray(a, s0.dtype)
        pos = jnp.array(sens.pos_indices)
        vel = jnp.array(sens.vel_indices)
        std_pos = jnp.asarray(sens.std_pos_noise, s0.dtype)

        def policy_at(s_meas, t, key_t):
            kd = prng.stream(key_t, prng.STREAM_DROPOUT)
            return self.policy.apply(policy_params, s_meas, t, key=kd, p_dropout=p_dropout)

        # at t=0 the measurement equals the true state (MC_PILCO.py:854-871)
        u0 = policy_at(s0, 0, prng.fold(key, 0))

        def step(carry, t):
            s, u, noisy_prev, meas_vel_prev = carry
            if self.bptt_clip is not None:
                s = _clip_bptt(s, self.bptt_clip)
                noisy_prev = _clip_bptt(noisy_prev, self.bptt_clip)
                meas_vel_prev = _clip_bptt(meas_vel_prev, self.bptt_clip)
            kt = prng.fold(key, t)
            gp_in = self.model.gp_inputs(s, u)
            mean, var = self.gp.predict(gp_params, posterior, gp_in)
            mean, var = self._cap_delta(posterior, mean, var)
            s_next, _, _ = self.model.sample_next_state(
                s, u, mean, var, prng.stream(kt, prng.STREAM_ROLLOUT), particle_pred
            )
            # simulated measurement chain (MC_PILCO.py:881-900)
            kn = prng.stream(kt, prng.STREAM_MEAS_NOISE)
            noise = std_pos * jax.random.normal(kn, s_next[..., pos].shape, s_next.dtype)
            noisy_pos = s_next[..., pos] + noise
            noisy_vel = (noisy_pos - noisy_prev[..., pos]) / sens.dt
            meas_vel = filters.iir_step(b, a, noisy_vel, noisy_prev[..., vel], meas_vel_prev)
            meas = s_next.at[..., pos].set(noisy_pos).at[..., vel].set(meas_vel)
            noisy = s_next.at[..., pos].set(noisy_pos).at[..., vel].set(noisy_vel)
            u_next = policy_at(meas, t, kt)
            return (s_next, u_next, noisy, meas_vel), (s_next, u_next)

        if self.remat:
            step = jax.checkpoint(step)
        carry0 = (s0, u0, s0, s0[..., vel])
        _, (states, inputs) = jax.lax.scan(
            step, carry0, jnp.arange(1, horizon), unroll=self.scan_unroll
        )
        states = jnp.concatenate([s0[None], states], axis=0)
        inputs = jnp.concatenate([u0[None], inputs], axis=0)
        return RolloutResult(states=states, inputs=inputs)

    # -------------------------------------------------- open-loop replay

    def replay(
        self,
        gp_params,
        posterior: Posterior,
        s0: jax.Array,
        inputs: jax.Array,
        key: Optional[jax.Array] = None,
        particle_pred: bool = False,
    ) -> jax.Array:
        """Mean (or sampled) open-loop rollout following a recorded input
        trajectory — the rollout-MSE diagnostic (MC_PILCO.py:347-373).

        ``s0``: [ds]; ``inputs``: [T, du].  Returns [T, ds].
        """
        if key is None:
            key = jax.random.PRNGKey(0)

        def step(s, t_u):
            t, u = t_u
            gp_in = self.model.gp_inputs(s[None, :], u[None, :])
            mean, var = self.gp.predict(gp_params, posterior, gp_in)
            mean, var = self._cap_delta(posterior, mean, var)
            s_next, _, _ = self.model.sample_next_state(
                s[None, :], u[None, :], mean, var, prng.fold(key, t), particle_pred
            )
            return s_next[0], s_next[0]

        T = inputs.shape[0]
        _, traj = jax.lax.scan(step, s0, (jnp.arange(1, T), inputs[:-1]))
        return jnp.concatenate([s0[None], traj], axis=0)
