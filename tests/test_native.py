"""Native RK45 integrator: build, correctness vs scipy LSODA and JAX RK4."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcpilco_tpu import native
from mcpilco_tpu.envs import ode as ode_mod

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


class TestNativeRK45:
    def test_cartpole_matches_scipy_lsoda(self):
        scipy_int = pytest.importorskip("scipy.integrate")
        x0 = np.array([0.1, -0.3, 0.5, 1.2])
        u = np.array([2.0])

        def np_cartpole(y, t, uu):
            # pure f64 dynamics (routing through the f32 JAX fn would cap
            # the reference accuracy at ~1e-7 per call)
            m1, m2, l, b, g = 0.5, 0.5, 0.5, 0.1, 9.81
            xd, th, thd = y[1], y[2], y[3]
            sn, cs = np.sin(th), np.cos(th)
            den = 4 * (m1 + m2) - 3 * m2 * cs * cs
            return np.array([
                xd,
                (2 * m2 * l * thd**2 * sn + 3 * m2 * g * sn * cs + 4 * uu - 4 * b * xd) / den,
                thd,
                (-3 * m2 * l * thd**2 * sn * cs - 6 * (m1 + m2) * g * sn
                 - 6 * (uu - b * xd) * cs) / (l * den),
            ])

        x_ref = scipy_int.odeint(
            np_cartpole, x0, [0.0, 0.05], args=(2.0,), rtol=1e-10, atol=1e-12
        )[1]
        x_nat = native.integrate("cartpole", x0, 0.0, 0.05, u)
        np.testing.assert_allclose(x_nat, x_ref, rtol=1e-6, atol=1e-8)
        # and the caller's buffer must not be mutated
        np.testing.assert_array_equal(x0, [0.1, -0.3, 0.5, 1.2])

    def test_pendulum_energy_decay(self):
        # unforced pendulum with friction: energy must decrease
        x = np.array([2.0, 0.0])
        u = np.array([0.0])

        def energy(s):
            m, l, g = 1.0, 1.0, 9.81
            inertia = m * l * l / 3.0
            return 0.5 * inertia * s[1] ** 2 - 0.5 * m * l * g * np.cos(s[0])

        e0 = energy(x)
        for _ in range(100):
            x = native.integrate("pendulum", x, 0.0, 0.05, u)
        assert energy(x) < e0

    def test_matches_jax_rk4(self):
        x0 = np.array([0.0, 0.0, 0.1, 0.0])
        u = np.array([1.0])
        x_nat = native.integrate("cartpole", x0, 0.0, 0.05, u)
        x_jax = np.asarray(
            ode_mod.integrate(ode_mod.cartpole, jnp.asarray(x0, jnp.float32),
                              jnp.asarray(u, jnp.float32), 0.05, 20)
        )
        np.testing.assert_allclose(x_nat, x_jax, rtol=1e-4, atol=1e-6)

    def test_furuta_runs(self):
        x = native.integrate("furuta", np.array([0.0, 0.1, 0.0, 0.0]), 0.0, 0.02, np.array([0.01]))
        assert np.isfinite(x).all()

    def test_unknown_system_raises(self):
        with pytest.raises(KeyError):
            native.integrate("nonexistent", np.zeros(2), 0.0, 0.1, np.zeros(1))

    def test_long_interval_stable(self):
        # one long adaptive interval instead of many short ones
        x = native.integrate("cartpole", np.zeros(4), 0.0, 5.0, np.array([3.0]))
        assert np.isfinite(x).all()
