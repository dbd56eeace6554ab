"""YOLO synthetic-person training: target/DFL invariants + bundled trained
weights detecting schematic persons through the real backend."""

import numpy as np
import pytest

from person_capture_tpu.train.scenes import sample_person_batch
from person_capture_tpu.train.yolo_synth import build_targets


def test_person_scene_bodies_fit_canvas():
    rng = np.random.default_rng(2)
    d = sample_person_batch(rng, 6, 128)
    for i in range(6):
        for j in np.flatnonzero(d["gt_mask"][i]):
            x1, y1, x2, y2 = d["boxes"][i][j]
            assert 0 <= x1 < x2 <= 128 and 0 <= y1 < y2 <= 128


def test_yolo_targets_decode_back():
    boxes = np.zeros((1, 4, 4), np.float32)
    mask = np.zeros((1, 4), bool)
    boxes[0, 0] = [20, 10, 70, 100]  # max dim 90 → level stride 16
    mask[0, 0] = True
    t = build_targets(boxes, mask, 128, reg_max=16)
    lv = t[1]
    s, n = 16, 128 // 16
    pos = np.flatnonzero(lv["pos"][0])
    assert pos.size > 0
    for p in pos:
        cy, cx = (p // n + 0.5) * s, (p % n + 0.5) * s
        l, tt, r, b = lv["box_t"][0, p] * s
        np.testing.assert_allclose([cx - l, cy - tt, cx + r, cy + b],
                                   boxes[0, 0], atol=16 * 1e-3 + 0.1)


def test_yolo_targets_clip_to_dfl_range():
    boxes = np.zeros((1, 4, 4), np.float32)
    mask = np.zeros((1, 4), bool)
    boxes[0, 0] = [0, 0, 127, 127]  # huge box → distances clipped
    mask[0, 0] = True
    t = build_targets(boxes, mask, 128, reg_max=16)
    for lv in t:
        assert lv["box_t"].max() <= 15.0


@pytest.mark.slow
def test_yolo_train_step_runs():
    from person_capture_tpu.train.yolo_synth import train

    _, ev = train("yolo_tiny", size=64, batch=4, steps=6, eval_every=0,
                  log_every=100)
    assert 0.0 <= ev["recall"] <= 1.0


@pytest.fixture(scope="module")
def tiny_person_backend():
    import jax.numpy as jnp

    from person_capture_tpu.models import yolov8 as Y
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import YoloPersonBackend

    w = resolve_weights("auto", "yolo_tiny")
    if w is None:
        pytest.skip("bundled yolo_tiny weights not present")
    return YoloPersonBackend(cfg=Y.TINY, det_size=128, conf=0.4,
                             max_det=4, dtype=jnp.float32, weights=w)


def test_bundled_yolo_tiny_detects_persons(tiny_person_backend):
    rng = np.random.default_rng(11)
    d = sample_person_batch(rng, 6, 128, min_face=14, max_face=22)
    out = tiny_person_backend.detect_batch(d["images"].astype(np.uint8),
                                           np.ones(6, bool))
    hits = misses = 0
    for i in range(6):
        for gt in d["boxes"][i][d["gt_mask"][i]]:
            found = False
            for j in np.flatnonzero(out["mask"][i]):
                bx = out["boxes"][i, j]
                ix = max(0, min(bx[2], gt[2]) - max(bx[0], gt[0]))
                iy = max(0, min(bx[3], gt[3]) - max(bx[1], gt[1]))
                inter = ix * iy
                ua = ((bx[2] - bx[0]) * (bx[3] - bx[1])
                      + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
                if inter / max(ua, 1e-9) >= 0.5:
                    found = True
            hits += int(found)
            misses += int(not found)
    assert hits >= max(1, int(0.6 * (hits + misses))), (hits, misses)
