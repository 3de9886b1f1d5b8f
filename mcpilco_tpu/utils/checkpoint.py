"""Checkpoint / resume without pickle.

The reference pickles its entire mutable state into ``log.pkl`` after every
phase (MC_PILCO.py:160-172, 214-221, 245-250).  Here checkpoints are a
directory of ``.npz`` files (one per named pytree) plus a JSON manifest with
the tree structures and scalar metadata — portable, inspectable, and safe to
load (no arbitrary code execution).

Layout:
    <dir>/manifest.json          {"meta": {...}, "trees": {name: treedef_str}}
    <dir>/<name>.npz             flattened leaves of pytree <name>
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save(path: str, trees: Dict[str, Any], meta: Dict[str, Any] | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    manifest = {"meta": meta or {}, "trees": {}}
    for name, tree in trees.items():
        leaves, treedef = _flatten(tree)
        np.savez(os.path.join(path, f"{name}.npz"), **{f"leaf_{i}": l for i, l in enumerate(leaves)})
        manifest["trees"][name] = str(treedef)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)


def load(path: str, templates: Dict[str, Any]) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Load named pytrees using ``templates`` (same-structure examples) to
    recover tree structure.  Returns (trees, meta)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    out = {}
    for name, template in templates.items():
        data = np.load(os.path.join(path, f"{name}.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        _, treedef = jax.tree_util.tree_flatten(template)
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, manifest["meta"]


def peek_meta(path: str) -> Dict[str, Any]:
    """Read only a checkpoint's scalar metadata (cheap — no npz loads).
    Used by auto-resume to validate the stored scenario config against the
    current one before restoring any arrays."""
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)["meta"]


def save_meta(path: str, meta: Dict[str, Any]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load_meta(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)
