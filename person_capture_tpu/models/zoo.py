"""Bundled-weights resolution.

The reference resolves model files through download mirrors at runtime
(person_capture/face_embedder.py:36-83). This environment has no egress, so
the zoo ships in-repo weights trained on synthetic scenes
(train/scrfd_synth.py) and resolves user-supplied checkpoints first:

  spec == path       → load that .npz (tools/weights.py layout)
  spec == "auto"/""  → bundled synthetic weights when present, else None
  spec == "random"   → None (random init; test/benchmark mode)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights")

BUNDLED = {
    "scrfd_2.5g": "scrfd_2.5g_synth.npz",
    "scrfd_tiny": "scrfd_tiny_synth.npz",
    "yolov8n": "yolov8n_synth.npz",
    "yolo_tiny": "yolo_tiny_synth.npz",
    "yolov8n_face": "yolov8n_face_synth.npz",
    "yolo_face_tiny": "yolo_face_tiny_synth.npz",
    "arcface_synth": "arcface_synth.npz",
    "clip_reid_s": "clip_reid_s_synth.npz",
}


def bundled_weights_path(model_name: str) -> Optional[str]:
    fname = BUNDLED.get(model_name)
    if not fname:
        return None
    path = os.path.join(_WEIGHTS_DIR, fname)
    return path if os.path.isfile(path) else None


def _cast_f32(tree):
    if isinstance(tree, dict):
        return {k: _cast_f32(v) for k, v in tree.items()}
    arr = np.asarray(tree)
    if arr.dtype in (np.float16, np.float64):
        return arr.astype(np.float32)
    return arr


def resolve_weights(spec: str, model_name: str) -> Optional[Dict[str, Any]]:
    """Resolve a weights spec to a flax variables pytree (float32), or None
    for random init."""
    from ..tools.weights import load_npz_variables

    spec = (spec or "auto").strip()
    if spec.lower() in ("random", "none"):
        return None
    if spec.lower().endswith(".onnx"):
        # checkpoint-exact execution of the reference's own ONNX files
        # (models/onnx_zoo adapters; face_embedder.py:55-83 mirrors)
        if not os.path.isfile(spec):
            raise FileNotFoundError(f"ONNX checkpoint not found: {spec!r}")
        return spec
    if spec.lower() in ("auto", ""):
        path = bundled_weights_path(model_name)
        if path is None:
            import logging

            logging.getLogger(__name__).warning(
                "no bundled weights for %r — running RANDOM-INIT "
                "(detections will be meaningless); pass an .npz checkpoint "
                "or 'random' to silence", model_name)
            return None
        return _cast_f32(load_npz_variables(path))
    if not os.path.isfile(spec):
        raise FileNotFoundError(
            f"weights checkpoint not found: {spec!r} (pass 'auto' for "
            f"bundled weights or 'random' for random init)")
    vars_ = load_npz_variables(spec)
    if "params" not in vars_:
        # a converted-torch dump (src/... keys from tools/convert_weights)
        # or a foreign npz would otherwise unflatten into a bogus tree and
        # fail much later as an opaque missing-parameter error inside jit
        raise ValueError(
            f"{spec!r} is not a flax-variables checkpoint (no 'params/' "
            f"keys; found {sorted({k.split('/')[0] for k in _npz_roots(spec)})}). "
            f"Converted torch dumps load via models.loaders.load_checkpoint "
            f"with the matching architecture config.")
    return _cast_f32(vars_)


def _npz_roots(path: str):
    with np.load(path) as data:
        return list(data.files)
