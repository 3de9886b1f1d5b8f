"""The "real system" protocol: host-facing plant rollouts.

A plant exposes ``rollout(key, s0, policy_fn, T, dt) -> TrialData`` where
``policy_fn(state [ds], t_step) -> u [du]`` operates on *measured* states.
The three concrete plants mirror the reference's simulation tier
(simulation_class/model.py, model_mujoco.py):

- :class:`ODEPlant`    <- model.py:18-68  (additive Gaussian measurement
  noise on all dims; policy sees the noisy state)
- :class:`PMSODEPlant` <- model.py:71-141 (positions measured noisily,
  velocities by causal differentiation + online 1st-order Butterworth)
- ``MujocoPlant``      <- model_mujoco.py:20-76 (in envs/mujoco_plant.py,
  gated on the ``mujoco`` package)

Unlike the reference (host NumPy + scipy odeint per step), ODE plants run the
*entire* trial on-device: one jitted ``lax.scan`` over control steps with RK4
sub-stepping, with the policy evaluated in-graph.  A host-callback variant
(``rollout_with_host_policy``) remains for policies that are not JAX-traceable
(e.g. hardware-in-the-loop).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import filters
from ..utils import prng
from . import ode as ode_mod


class TrialData(NamedTuple):
    """One system interaction, in the layout the model learner consumes.

    measured: [N, ds] what the policy saw / what gets modeled
    inputs:   [N, du]
    true:     [N, ds] noiseless simulator states
    noisy:    [N, ds] raw noisy measurements (pre-filter; = measured for
              fully-measurable plants)
    """

    measured: np.ndarray
    inputs: np.ndarray
    true: np.ndarray
    noisy: np.ndarray


@dataclasses.dataclass(frozen=True)
class ODEPlant:
    """Fully-measurable ODE plant (model.py:18-68).

    ``noise_std`` is the per-dim measurement noise std; the policy acts on the
    noisy state, dynamics evolve the true state.
    """

    ode_name: str
    noise_std: Tuple[float, ...] = ()
    substeps: int = 20

    def __post_init__(self):
        object.__setattr__(self, "noise_std", tuple(float(v) for v in np.asarray(self.noise_std).reshape(-1)))

    @property
    def ode(self) -> Callable:
        return ode_mod.REGISTRY[self.ode_name]

    def _device_rollout(self, policy, policy_params):
        """Build the jitted on-device trial rollout for a JAX policy."""

        @partial(jax.jit, static_argnums=(3,))
        def run(key, s0, t_offset, num_steps, dt):
            noise = jnp.asarray(self.noise_std, s0.dtype)
            k_meas = prng.stream(key, prng.STREAM_MEAS_NOISE)
            k_pol = prng.stream(key, prng.STREAM_EXPLORATION)

            noisy0 = s0 + noise * jax.random.normal(prng.fold(k_meas, 0), s0.shape, s0.dtype)

            def step(carry, i):
                s, meas = carry
                u = policy.apply(policy_params, meas[None, :], i, key=prng.fold(k_pol, i))[0]
                s_next = ode_mod.integrate(self.ode, s, u, dt, self.substeps)
                meas_next = s_next + noise * jax.random.normal(
                    prng.fold(k_meas, i + 1), s.shape, s.dtype
                )
                return (s_next, meas_next), (s_next, meas_next, u)

            (_, meas_last), (states, measured, inputs) = jax.lax.scan(
                step, (s0, noisy0), jnp.arange(num_steps)
            )
            u_last = policy.apply(policy_params, meas_last[None, :], num_steps,
                                  key=prng.fold(k_pol, num_steps))[0]
            states = jnp.concatenate([s0[None], states], axis=0)
            measured = jnp.concatenate([noisy0[None], measured], axis=0)
            inputs = jnp.concatenate([inputs, u_last[None]], axis=0)
            return measured, inputs, states

        return run

    def rollout(self, key, s0, policy, policy_params, T: float, dt: float) -> TrialData:
        """Simulate ``T`` seconds at sampling time ``dt`` (N = T/dt + 1 samples,
        matching model.py:42-68)."""
        num_steps = int(round(T / dt))
        run = self._device_rollout(policy, policy_params)
        measured, inputs, states = run(key, jnp.asarray(s0, jnp.float32), 0.0, num_steps, dt)
        m = np.asarray(measured)
        return TrialData(measured=m, inputs=np.asarray(inputs), true=np.asarray(states), noisy=m)


@dataclasses.dataclass(frozen=True)
class PMSODEPlant(ODEPlant):
    """Partially-measurable ODE plant (model.py:71-141): the policy sees
    noisy positions and online-filtered finite-difference velocities."""

    pos_indices: Tuple[int, ...] = ()
    vel_indices: Tuple[int, ...] = ()
    fc: float = 0.5  # online butter(1, fc) cutoff (model.py:116)

    def __post_init__(self):
        super().__post_init__()
        object.__setattr__(self, "pos_indices", tuple(int(i) for i in np.asarray(self.pos_indices)))
        object.__setattr__(self, "vel_indices", tuple(int(i) for i in np.asarray(self.vel_indices)))

    def _device_rollout(self, policy, policy_params):
        b, a = filters.butter1(self.fc)
        pos = jnp.array(self.pos_indices)
        vel = jnp.array(self.vel_indices)

        @partial(jax.jit, static_argnums=(3,))
        def run(key, s0, t_offset, num_steps, dt):
            noise = jnp.asarray(self.noise_std, s0.dtype)
            k_meas = prng.stream(key, prng.STREAM_MEAS_NOISE)
            k_pol = prng.stream(key, prng.STREAM_EXPLORATION)

            def step(carry, i):
                s, noisy_prev, meas_prev = carry
                u = policy.apply(policy_params, meas_prev[None, :], i, key=prng.fold(k_pol, i))[0]
                s_next = ode_mod.integrate(self.ode, s, u, dt, self.substeps)
                full_noise = noise * jax.random.normal(prng.fold(k_meas, i + 1), s.shape, s.dtype)
                noisy = s_next + full_noise
                # positions measured; velocities by causal diff of measured
                # positions then online low-pass (model.py:128-136)
                meas_pos = noisy[pos]
                noisy_vel = (meas_pos - meas_prev[pos]) / dt
                meas_vel = filters.iir_step(b, a, noisy_vel, noisy_prev[vel], meas_prev[vel])
                noisy = noisy.at[vel].set(noisy_vel)
                meas = s_next.at[pos].set(meas_pos).at[vel].set(meas_vel)
                return (s_next, noisy, meas), (s_next, noisy, meas, u)

            carry0 = (s0, s0, s0)  # noisy_states[0] = meas_states[0] = s0 (model.py:111-113)
            (_, _, meas_last), (states, noisy, measured, inputs) = jax.lax.scan(
                step, carry0, jnp.arange(num_steps)
            )
            u_last = policy.apply(policy_params, meas_last[None, :], num_steps,
                                  key=prng.fold(k_pol, num_steps))[0]
            states = jnp.concatenate([s0[None], states], axis=0)
            noisy = jnp.concatenate([s0[None], noisy], axis=0)
            measured = jnp.concatenate([s0[None], measured], axis=0)
            inputs = jnp.concatenate([inputs, u_last[None]], axis=0)
            return measured, inputs, states, noisy

        return run

    def rollout(self, key, s0, policy, policy_params, T: float, dt: float) -> TrialData:
        num_steps = int(round(T / dt))
        run = self._device_rollout(policy, policy_params)
        measured, inputs, states, noisy = run(key, jnp.asarray(s0, jnp.float32), 0.0, num_steps, dt)
        return TrialData(
            measured=np.asarray(measured),
            inputs=np.asarray(inputs),
            true=np.asarray(states),
            noisy=np.asarray(noisy),
        )


def _savgol_fit_matrix(n: int, window: int, polyorder: int, deriv: int,
                       delta: float) -> np.ndarray:
    """[n, n] matrix A such that (A @ y) is the Savitzky-Golay estimate of
    the ``deriv``-th derivative of the signal y sampled at spacing ``delta``.

    Interior rows are the standard centered least-squares fit; the first/last
    ``window//2`` rows evaluate the polynomial fitted to the first/last full
    window at the edge positions (scipy.signal.savgol_filter mode='interp'
    semantics — unit-tested against scipy). Expressed as one dense matrix so
    the estimator is a single matmul: jit/vmap-friendly for the seed farm,
    and numerically identical between the host and device paths.
    """
    if window % 2 != 1 or window > n:
        raise ValueError(f"savgol window must be odd and <= n, got {window} (n={n})")
    if polyorder >= window:
        raise ValueError("savgol polyorder must be < window")
    half = window // 2
    # d-th derivative evaluation row at offset x for a poly with basis x^j
    fact = np.array([math.factorial(j) / math.factorial(j - deriv)
                     if j >= deriv else 0.0 for j in range(polyorder + 1)])

    def eval_row(offsets, x):
        V = np.vander(np.asarray(offsets, np.float64), polyorder + 1,
                      increasing=True)  # [w, p+1]
        beta_from_y = np.linalg.pinv(V)  # [p+1, w]
        powers = np.array([x ** (j - deriv) if j >= deriv else 0.0
                           for j in range(polyorder + 1)])
        return (fact * powers) @ beta_from_y  # [w]

    A = np.zeros((n, n))
    center = eval_row(np.arange(-half, half + 1), 0.0)
    for i in range(half, n - half):
        A[i, i - half:i + half + 1] = center
    for i in range(half):  # leading edge: poly fit on samples [0, window)
        A[i, :window] = eval_row(np.arange(window), float(i))
        # trailing edge: poly fit on samples [n - window, n)
        j = n - 1 - i
        A[j, n - window:] = eval_row(np.arange(window), float(window - 1 - i))
    return A / delta**deriv


def _savgol_pos_vel(n: int, dt: float, window: int, polyorder: int):
    smooth = _savgol_fit_matrix(n, window, polyorder, 0, dt)
    diff = _savgol_fit_matrix(n, window, polyorder, 1, dt)
    return smooth, diff


def offline_velocity_estimation_jax(
    noisy: jax.Array,
    inputs: jax.Array,
    dt: float,
    pos_indices,
    vel_indices,
    filt_order: int = 2,
    filt_cutoff: float = 0.5,
    method: str = "butter_cd",
    savgol_window: int = 7,
    savgol_polyorder: int = 5,
):
    """Pure-JAX offline state estimation (MC_PILCO.py:940-962): zero-phase
    Butterworth on positions, central-difference velocities, trim first/last
    samples.  jit/vmap-compatible (the seed farm batches it over seeds);
    the host path below delegates here, so farm and sequential results are
    bitwise identical modulo batching reassociation.

    ``method='savgol'`` replaces the butter+central-difference chain with a
    Savitzky-Golay polynomial fit (positions: deriv-0 smoothing, velocities:
    deriv-1).  Opt-in, NOT reference semantics: the reference chain
    systematically attenuates velocity changes at acceleration peaks (~5%
    at the swing-up band, RESULTS.md "4PMS failure-mode analysis"), and the
    SavGol differentiator's flat in-band response removes that bias.  The
    output contract (trim to [1:-1], same shapes) is unchanged.
    """
    pos_idx = jnp.asarray(tuple(pos_indices), jnp.int32)
    vel_idx = jnp.asarray(tuple(vel_indices), jnp.int32)
    noisy = jnp.asarray(noisy)
    if method == "savgol":
        smooth, diff = _savgol_pos_vel(noisy.shape[0], dt, savgol_window,
                                       savgol_polyorder)
        pos_f = jnp.asarray(smooth, noisy.dtype) @ noisy[:, pos_idx]
        vel = (jnp.asarray(diff, noisy.dtype) @ noisy[:, pos_idx])[1:-1]
    elif method == "butter_cd":
        b, a = filters.butter2(filt_cutoff) if filt_order == 2 else filters.butter1(filt_cutoff)
        pos_f = filters.filtfilt(b, a, noisy[:, pos_idx])  # [N, n_pos]
        vel = (pos_f[2:] - pos_f[:-2]) / (2.0 * dt)  # [N-2, n_pos]
    else:
        raise ValueError(f"unknown offline filter method {method!r}")
    out = jnp.zeros((noisy.shape[0] - 2, noisy.shape[1]), noisy.dtype)
    out = out.at[:, pos_idx].set(pos_f[1:-1])
    out = out.at[:, vel_idx].set(vel)
    return out, jnp.asarray(inputs)[1:-1, :]


def offline_velocity_estimation(
    noisy: np.ndarray,
    inputs: np.ndarray,
    dt: float,
    pos_indices,
    vel_indices,
    filt_order: int = 2,
    filt_cutoff: float = 0.5,
    method: str = "butter_cd",
    savgol_window: int = 7,
    savgol_polyorder: int = 5,
):
    """Offline state estimation for model training (MC_PILCO.py:940-962):
    zero-phase Butterworth on positions, central-difference velocities, then
    trim the first/last samples.  Returns (states, inputs_trimmed).
    ``method='savgol'`` selects the opt-in Savitzky-Golay estimator (see the
    JAX analog above for semantics and rationale).

    Host path (sequential MCPilco.collect): the central difference runs in
    f64 NumPy, deliberately kept bit-identical to rounds 1-2 — the farm's
    f32 on-device analog above agrees to ~1 ulp (parity-tested)."""
    n = noisy.shape[0]
    out = np.zeros((n - 2, noisy.shape[1]))
    if method == "savgol":
        smooth, diff = _savgol_pos_vel(n, dt, savgol_window, savgol_polyorder)
        for p_i, v_i in zip(pos_indices, vel_indices):
            out[:, p_i] = (smooth @ noisy[:, p_i])[1:-1]
            out[:, v_i] = (diff @ noisy[:, p_i])[1:-1]
        return out, inputs[1:-1, :]
    if method != "butter_cd":
        raise ValueError(f"unknown offline filter method {method!r}")
    b, a = filters.butter2(filt_cutoff) if filt_order == 2 else filters.butter1(filt_cutoff)
    for p_i, v_i in zip(pos_indices, vel_indices):
        pos = np.asarray(filters.filtfilt(b, a, jnp.asarray(noisy[:, p_i])))
        vel = (pos[2:] - pos[:-2]) / (2.0 * dt)
        out[:, p_i] = pos[1:-1]
        out[:, v_i] = vel
    return out, inputs[1:-1, :]
