"""Ultralytics-layout checkpoint mapping for the YOLOv8-face (pose) head.

Builds a synthetic state dict with exactly the tensor names/shapes an
ultralytics yolov8-face checkpoint carries (cv2/cv3/cv4 branches on
model.22) and verifies every value lands on the right flax leaf — the
cv4 landmark branch included (reference face_embedder.py:36-51 loads
these checkpoints through ultralytics).
"""

import numpy as np

from person_capture_tpu.models import yolov8 as Y
from person_capture_tpu.models.loaders import (load_yolov8_torch,
                                               yolov8_name_map,
                                               yolov8_required_names)


def _fake_src_for(variables, cfg):
    """Synthesize a torch-layout dict whose shapes match our variables."""
    import jax

    flat = {}

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    out = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    src = {}
    for (coll, scope, leaf), tname in yolov8_name_map(cfg).items():
        parts = tuple(scope.split("/")) if scope else ()
        target = np.asarray(get(out[coll], parts + (leaf,)))
        rng = np.random.default_rng(abs(hash(tname)) % (2 ** 32))
        w = rng.normal(size=target.shape).astype(np.float32)
        if target.ndim == 4:   # store OIHW like torch
            w = np.transpose(w, (3, 2, 0, 1))
        src[tname] = w
        flat[(coll, scope, leaf)] = None
    return src


def test_face_head_names_present():
    names = yolov8_required_names(Y.TINY_FACE)
    assert "model.22.cv4.0.2.weight" in names
    assert "model.22.cv4.2.2.bias" in names
    # detection-only configs must NOT expect cv4
    assert not any("cv4" in n for n in yolov8_required_names(Y.TINY))


def test_face_checkpoint_roundtrip():
    import jax

    model, variables = Y.init_yolo(jax.random.PRNGKey(0), Y.TINY_FACE,
                                   size=64)
    src = _fake_src_for(variables, Y.TINY_FACE)
    loaded = load_yolov8_torch(variables, Y.TINY_FACE, src, strict=True)

    # spot-check: the cv4 final conv of level 1 landed on the right leaf
    w = src["model.22.cv4.1.2.weight"]
    got = np.asarray(loaded["params"]["Conv_5"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(w, (2, 3, 1, 0)))
    b = src["model.22.cv4.1.2.bias"]
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["Conv_5"]["bias"]), b)
    # and the model still runs with the loaded tree
    x = np.zeros((1, 64, 64, 3), np.float32)
    levels = model.apply(loaded, x)
    assert levels[0][2].shape[-1] == 15
