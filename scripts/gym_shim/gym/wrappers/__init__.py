"""gym.wrappers shim: imported by simulation_class/model_mujoco.py:15, unused."""
