"""Checkpoint IO: flat-``npz`` ↔ flax variable pytrees.

Checkpoints store one array per leaf with '/'-joined key paths
(``params/Conv_0/kernel``). ``tools/convert_weights.py`` produces these from
the reference's ONNX models when onnx is installed; this module only needs
numpy, so runtime weight loading works in every environment.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def flatten_tree(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(arr)
    return root


def save_npz_variables(path: str, variables: Mapping) -> None:
    np.savez_compressed(path, **flatten_tree(variables))


def load_npz_variables(path: str) -> Dict[str, Any]:
    data = np.load(path)
    return unflatten_tree({k: data[k] for k in data.files})
