"""gym.envs.registration shim: register() + make() by entry-point string.

Matches the one call pattern the reference uses
(test_mcpilco_cartpole_mujoco.py:31-35):
``register(id=..., entry_point="module.path:ClassName")`` then
``gym.make(id)`` inside Mujoco_Model (simulation_class/model_mujoco.py:29).
Returns the bare env instance (no TimeLimit wrapper — the reference drives
the env manually and reads/writes raw attrs like ``frame_skip``).
"""

import importlib

_REGISTRY = {}


def register(id, entry_point, **kwargs):
    _REGISTRY[id] = entry_point


def make(id, **kwargs):
    entry_point = _REGISTRY[id]
    module_name, cls_name = entry_point.split(":")
    cls = getattr(importlib.import_module(module_name), cls_name)
    return cls(**kwargs)
