"""On-device ODE dynamics + fixed-step RK4 integration.

The reference integrates its plants on the host with adaptive LSODA
(``scipy.integrate.odeint`` — simulation_class/model.py:61) between control
steps.  Here the dynamics are JAX functions and one control interval is a
``lax.scan`` of fixed-step RK4 sub-steps, so entire system rollouts (plant +
policy + measurement noise) can run on-device; tests validate trajectory
agreement with scipy's LSODA.

Dynamics parity (same physical models, re-derived from the stated equations):
- :func:`pendulum`  <- simulation_class/ode_systems.py:16-31
  (m=1, l=1, b=0.1, g=9.81, I=ml^2/3; u = joint torque)
- :func:`cartpole`  <- simulation_class/ode_systems.py:34-68
  (m1=m2=0.5, l=0.5, b=0.1, g=9.81; state [x, xd, theta, thd]; u = cart force)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def pendulum(x: jax.Array, t, u: jax.Array) -> jax.Array:
    """Pendulum: state [theta, theta_dot], torque input (ode_systems.py:16-31)."""
    theta, theta_dot = x[..., 0], x[..., 1]
    m, l, b, g = 1.0, 1.0, 0.1, 9.81
    inertia = m * l * l / 3.0
    acc = (u[..., 0] - b * theta_dot - 0.5 * m * l * g * jnp.sin(theta)) / inertia
    return jnp.stack([theta_dot, acc], axis=-1)


def cartpole(x: jax.Array, t, u: jax.Array) -> jax.Array:
    """Cart-pole: state [x, x_dot, theta, theta_dot], force input
    (ode_systems.py:34-68; pole-down stable equilibrium at theta=0)."""
    pos_dot, theta, theta_dot = x[..., 1], x[..., 2], x[..., 3]
    m1, m2, l, b, g = 0.5, 0.5, 0.5, 0.1, 9.81
    s, c = jnp.sin(theta), jnp.cos(theta)
    f = u[..., 0]
    den = 4.0 * (m1 + m2) - 3.0 * m2 * c * c
    x_acc = (2.0 * m2 * l * theta_dot**2 * s + 3.0 * m2 * g * s * c + 4.0 * f - 4.0 * b * pos_dot) / den
    th_acc = (
        -3.0 * m2 * l * theta_dot**2 * s * c - 6.0 * (m1 + m2) * g * s - 6.0 * (f - b * pos_dot) * c
    ) / (l * den)
    return jnp.stack([pos_dot, x_acc, theta_dot, th_acc], axis=-1)


def furuta(x: jax.Array, t, u: jax.Array) -> jax.Array:
    """Furuta pendulum: state [theta_h, theta_v, dtheta_h, dtheta_v], torque on
    the horizontal arm.  The reference models this system semiparametrically
    (Model_learning.py:763-872) but ships no simulator; this standard
    two-link model (Cazzolato & Prime 2011 parameterization) provides the
    matching plant."""
    th_v, dth_h, dth_v = x[..., 1], x[..., 2], x[..., 3]
    # arm/pendulum parameters (Quanser-like)
    m_p, L_a, L_p = 0.024, 0.085, 0.129
    J_a, J_p = 0.57e-4, 0.33e-4
    b_a, b_p, g = 1e-4, 5e-5, 9.81
    l_p = L_p / 2.0
    J_p_tot = J_p + m_p * l_p * l_p
    J_a_tot = J_a + m_p * L_a * L_a
    sv, cv = jnp.sin(th_v), jnp.cos(th_v)
    tau = u[..., 0]
    # mass matrix
    m11 = J_a_tot + J_p_tot * sv * sv
    m12 = m_p * l_p * L_a * cv
    m22 = J_p_tot
    # coriolis / gravity
    c1 = J_p_tot * 2.0 * sv * cv * dth_h * dth_v - m_p * l_p * L_a * sv * dth_v**2 + b_a * dth_h
    c2 = -J_p_tot * sv * cv * dth_h**2 + m_p * g * l_p * sv + b_p * dth_v
    det = m11 * m22 - m12 * m12
    rhs1 = tau - c1
    rhs2 = -c2
    ddth_h = (m22 * rhs1 - m12 * rhs2) / det
    ddth_v = (-m12 * rhs1 + m11 * rhs2) / det
    return jnp.stack([dth_h, dth_v, ddth_h, ddth_v], axis=-1)


def rk4_step(ode: Callable, x: jax.Array, t, h, u: jax.Array) -> jax.Array:
    k1 = ode(x, t, u)
    k2 = ode(x + 0.5 * h * k1, t + 0.5 * h, u)
    k3 = ode(x + 0.5 * h * k2, t + 0.5 * h, u)
    k4 = ode(x + h * k3, t + h, u)
    return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@partial(jax.jit, static_argnums=(0, 4))
def integrate(ode: Callable, x0: jax.Array, u: jax.Array, dt: float, substeps: int = 20, t0=0.0):
    """Integrate one control interval [t0, t0+dt] with zero-order-hold input."""
    h = dt / substeps

    def step(x, i):
        return rk4_step(ode, x, t0 + i * h, h, u), None

    x, _ = jax.lax.scan(step, x0, jnp.arange(substeps))
    return x


def furuta_qube(x: jax.Array, t, u: jax.Array) -> jax.Array:
    """Furuta pendulum driven by a DC motor VOLTAGE (Quanser QUBE-Servo-2-like
    parameters): tau = kt (V - km dtheta_h) / Rm.  The back-EMF term acts as
    strong viscous damping on the arm, bounding its speed at V/km — this is
    the configuration the reference's semiparametric Furuta model was built
    for (its physics features include the linear dtheta_h and u cos(theta_v)
    terms — Model_learning.py:817-837), and the bounded arm speed is what
    makes fixed-step integration and BPTT through the learned model stable."""
    kt, km, Rm = 0.042, 0.042, 8.4
    dth_h = x[..., 2]
    tau = kt * (u[..., 0] - km * dth_h) / Rm
    return furuta(x, t, jnp.stack([tau], axis=-1))


REGISTRY = {
    "pendulum": pendulum,
    "cartpole": cartpole,
    "furuta": furuta,
    "furuta_qube": furuta_qube,
}
