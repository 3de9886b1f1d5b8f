"""MuJoCo plant behind the same TrialData protocol as the ODE plants.

TPU-native equivalent of the reference's gym/mujoco-py adapter
(simulation_class/model_mujoco.py:20-76): the simulator runs host-side (it is
the "real system"); ``frame_skip = dt / sim_timestep`` physics sub-steps per
control step; observation = [qpos, qvel]; the policy sees the noisy state.

Uses the modern ``mujoco`` bindings directly (no gym).  Import is lazy so the
rest of the framework works without MuJoCo installed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import prng
from .plants import TrialData

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def _require_mujoco():
    try:
        import mujoco  # noqa: F401

        return mujoco
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "MujocoPlant requires the `mujoco` package (pip install mujoco)"
        ) from e


@dataclasses.dataclass(frozen=True)
class MujocoPlant:
    """Host-side MuJoCo system.

    xml: path to the model XML (absolute, or a name in envs/assets/).
    noise_std: per-dim Gaussian measurement noise on [qpos, qvel].
    """

    xml: str
    noise_std: Tuple[float, ...] = ()
    sim_timestep: float = 0.01

    def __post_init__(self):
        object.__setattr__(
            self, "noise_std", tuple(float(v) for v in np.asarray(self.noise_std).reshape(-1))
        )

    def _load(self):
        mujoco = _require_mujoco()
        path = self.xml if os.path.isabs(self.xml) else os.path.join(ASSETS, self.xml)
        model = mujoco.MjModel.from_xml_path(path)
        if abs(model.opt.timestep - self.sim_timestep) > 1e-12:
            model.opt.timestep = self.sim_timestep
        return mujoco, model

    def rollout(self, key, s0, policy, policy_params, T: float, dt: float) -> TrialData:
        """N = T/dt control steps (model_mujoco.py:49 uses int(T/dt) samples)."""
        mujoco, model = self._load()
        data = mujoco.MjData(model)
        nq = model.nq
        frame_skip = max(1, int(round(dt / model.opt.timestep)))
        num_steps = int(round(T / dt))

        s0 = np.asarray(s0, np.float64)
        data.qpos[:] = s0[:nq]
        data.qvel[:] = s0[nq:]
        mujoco.mj_forward(model, data)

        rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).sum() % (2**32))
        noise = np.asarray(self.noise_std) if self.noise_std else np.zeros(2 * nq)

        # Device-side policy closure: ONE jit (and hence one device dispatch)
        # per control step.  The per-step key fold lives INSIDE the jit — on
        # the tunneled TPU runtime every eager op is a separate RPC, so an
        # eager fold_in + key transfer per step tripled the closed-loop
        # collection latency (same fold_in op traced or eager: the PRNG
        # stream is bit-identical).
        k_pol = prng.stream(key, prng.STREAM_EXPLORATION)
        pol = jax.jit(
            lambda s, t: policy.apply(
                policy_params, s[None, :], t, key=prng.fold(k_pol, t)
            )[0]
        )

        def obs():
            return np.concatenate([data.qpos, data.qvel])

        states = [obs()]
        noisy = [obs() + rng.standard_normal(2 * nq) * noise]
        inputs = []
        for t in range(num_steps):
            u = np.asarray(pol(jnp.asarray(noisy[t], jnp.float32), t), np.float64)
            inputs.append(u)
            data.ctrl[:] = u
            for _ in range(frame_skip):
                mujoco.mj_step(model, data)
            states.append(obs())
            noisy.append(obs() + rng.standard_normal(2 * nq) * noise)
        # final input sample so |inputs| == |states| (model_mujoco convention)
        inputs.append(
            np.asarray(pol(jnp.asarray(noisy[-1], jnp.float32), num_steps), np.float64)
        )
        m = np.asarray(noisy, np.float32)
        return TrialData(
            measured=m,
            inputs=np.asarray(inputs, np.float32),
            true=np.asarray(states, np.float32),
            noisy=m,
        )
