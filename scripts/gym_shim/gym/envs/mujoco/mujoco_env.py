"""Old-gym ``MujocoEnv`` semantics over the modern ``mujoco`` bindings.

Implements exactly what the reference envs + Mujoco_Model touch
(envs/cartpole_swingup.py:12-41, envs/ur5.py:13-39,
simulation_class/model_mujoco.py:34-76):

- ``__init__(model_path, frame_skip)`` loads the XML and exposes mutable
  ``init_qpos`` / ``init_qvel`` (the reference writes slices of these before
  every rollout, model_mujoco.py:53-54);
- ``self.sim.data.qpos/qvel`` (mujoco-py style) — modern ``MjData`` already
  has ``.qpos/.qvel`` with ``.flat``, so ``sim`` is a tiny namespace;
- ``reset()`` resets the sim then defers to the subclass ``reset_model()``
  (which calls ``set_state(init_qpos, init_qvel)``);
- ``do_simulation(ctrl, n_frames)`` applies the control and sub-steps;
- ``render()`` is a no-op (the reference renders every step,
  model_mujoco.py:64 — headless here).
"""

import numpy as np


class _Sim:
    """mujoco-py ``sim`` facade: the reference only reads ``sim.data``."""

    def __init__(self, data):
        self.data = data


class MujocoEnv:
    def __init__(self, model_path, frame_skip):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_path(model_path)
        self.data = mujoco.MjData(self.model)
        self.sim = _Sim(self.data)
        self.frame_skip = frame_skip
        mujoco.mj_forward(self.model, self.data)
        self.init_qpos = self.data.qpos.ravel().copy()
        self.init_qvel = self.data.qvel.ravel().copy()

    @property
    def dt(self):
        return self.model.opt.timestep * self.frame_skip

    def set_state(self, qpos, qvel):
        self.data.qpos[:] = np.asarray(qpos, dtype=np.float64)
        self.data.qvel[:] = np.asarray(qvel, dtype=np.float64)
        self._mujoco.mj_forward(self.model, self.data)

    def do_simulation(self, ctrl, n_frames):
        self.data.ctrl[:] = np.asarray(ctrl, dtype=np.float64).reshape(-1)
        for _ in range(int(n_frames)):
            self._mujoco.mj_step(self.model, self.data)

    def reset(self):
        self._mujoco.mj_resetData(self.model, self.data)
        return self.reset_model()

    def render(self, *args, **kwargs):
        return None

    def close(self):
        return None
