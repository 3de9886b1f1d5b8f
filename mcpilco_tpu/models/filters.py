"""Discrete low-pass filters for the 4PMS measurement chain.

The reference designs Butterworth filters with ``scipy.signal.butter`` and
applies them (a) one IIR step at a time inside the simulated rollout
(MC_PILCO.py:859,894-900 and simulation_class/model.py:116,132-136) and
(b) offline with zero-phase ``filtfilt`` on collected data
(MC_PILCO.py:940-962).

The device path must be scipy-free and differentiable, so the order-1/2
Butterworth coefficients are computed in closed form (bilinear transform of
the analog prototype; verified against scipy in tests), and the zero-phase
filter is implemented as a ``lax.scan`` forward/backward pass with scipy's
default odd-extension padding and steady-state initial conditions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def butter1(wn: float) -> Tuple[np.ndarray, np.ndarray]:
    """First-order Butterworth low-pass, cutoff ``wn`` in Nyquist units.

    Equals ``scipy.signal.butter(1, wn)``.
    """
    w = np.tan(np.pi * wn / 2.0)
    a0 = 1.0 + w
    b = np.array([w / a0, w / a0])
    a = np.array([1.0, (w - 1.0) / a0])
    return b, a


def butter2(wn: float) -> Tuple[np.ndarray, np.ndarray]:
    """Second-order Butterworth low-pass (= ``scipy.signal.butter(2, wn)``)."""
    w = np.tan(np.pi * wn / 2.0)
    s2 = np.sqrt(2.0)
    a0 = 1.0 + s2 * w + w * w
    b = (w * w / a0) * np.array([1.0, 2.0, 1.0])
    a = np.array([1.0, 2.0 * (w * w - 1.0) / a0, (1.0 - s2 * w + w * w) / a0])
    return b, a


def iir_step(b, a, x_t, x_tm1, y_tm1):
    """One step of a first-order IIR: y_t = (b0 x_t + b1 x_{t-1} - a1 y_{t-1})/a0.

    This is the differentiable in-scan online filter of 4PMS rollouts
    (MC_PILCO.py:894-900)."""
    return (b[0] * x_t + b[1] * x_tm1 - a[1] * y_tm1) / a[0]


def lfilter(b, a, x: jax.Array, zi: jax.Array = None) -> jax.Array:
    """Causal IIR filtering along axis 0 (direct form II transposed),
    equivalent to ``scipy.signal.lfilter``.  Supports arbitrary trailing axes.
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    n = max(b.shape[0], a.shape[0])
    b = jnp.pad(b, (0, n - b.shape[0]))
    a = jnp.pad(a, (0, n - a.shape[0]))
    if zi is None:
        zi = jnp.zeros((n - 1,) + x.shape[1:], x.dtype)

    def step(z, xt):
        yt = b[0] * xt + z[0]
        znew = [b[i + 1] * xt + (z[i + 1] if i + 1 < n - 1 else 0.0) - a[i + 1] * yt for i in range(n - 1)]
        return jnp.stack(znew), yt

    _, y = jax.lax.scan(step, zi, x)
    return y


def lfilter_zi(b, a) -> np.ndarray:
    """Steady-state initial conditions for a unit-step input
    (``scipy.signal.lfilter_zi``)."""
    b = np.asarray(b, float)
    a = np.asarray(a, float)
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    # companion-form solution of (I - A) zi = B  (scipy implementation math)
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    zi = np.linalg.solve(np.eye(n - 1) - A, B)
    return zi


def filtfilt(b, a, x: jax.Array) -> jax.Array:
    """Zero-phase forward-backward filtering along axis 0, matching
    ``scipy.signal.filtfilt`` defaults (odd extension, padlen=3*max(len(a),
    len(b)), steady-state zi scaled by the first padded sample)."""
    x = jnp.asarray(x)
    ntaps = max(np.asarray(a).shape[0], np.asarray(b).shape[0])
    padlen = 3 * ntaps
    if x.shape[0] <= padlen:
        raise ValueError(f"input length {x.shape[0]} must exceed padlen {padlen}")
    # odd extension at both ends
    head = 2.0 * x[0] - x[1 : padlen + 1][::-1]
    tail = 2.0 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([head, x, tail], axis=0)
    zi = jnp.asarray(lfilter_zi(b, a), x.dtype)
    zi_shaped = zi.reshape((-1,) + (1,) * (x.ndim - 1))
    y = lfilter(b, a, ext, zi_shaped * ext[0])
    y = lfilter(b, a, y[::-1], zi_shaped * y[-1])[::-1]
    return y[padlen:-padlen]
