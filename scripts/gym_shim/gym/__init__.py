"""Minimal `gym` shim over the modern `mujoco` bindings.

Purpose: obtain the reference MuJoCo-cartpole parity denominator (VERDICT r4
item 2) by running the UNMODIFIED reference scripts on this machine, where
`mujoco` 3.x is installed but `gym`/`mujoco_py` are not.  Implements ONLY the
surface the reference actually touches:

- ``gym.envs.registration.register`` + ``gym.make`` used by
  `test_mcpilco_cartpole_mujoco.py:31-35` / `simulation_class/model_mujoco.py:29`;
- ``gym.utils.EzPickle`` and ``gym.envs.mujoco.mujoco_env.MujocoEnv`` used by
  `envs/cartpole_swingup.py:12-41` and `envs/ur5.py:13-39`
  (attrs: ``frame_skip``, ``init_qpos``, ``init_qvel``, ``sim.data.qpos/qvel``,
  ``do_simulation``, ``set_state``, ``reset``, ``render``);
- ``gym.wrappers`` as an importable name (`model_mujoco.py:15` imports it but
  the reference never uses it).

This is new code written against the old gym-0.x MujocoEnv semantics the
reference relies on; no gym source was consulted or copied.
"""

from . import envs, utils, wrappers  # noqa: F401
from .envs.registration import make, register  # noqa: F401
