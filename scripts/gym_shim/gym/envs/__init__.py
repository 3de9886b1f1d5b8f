from . import mujoco, registration  # noqa: F401
