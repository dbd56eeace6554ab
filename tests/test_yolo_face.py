"""YOLOv8-face: keypoint head, pose decode, trainer targets, backend glue.

The reference's alternate face detector is a YOLOv8-face model
(person_capture/face_embedder.py:36-51); models/yolov8.py adds the 5-point
pose head + decode with the same output contract as SCRFD.
"""

import numpy as np

import jax.numpy as jnp

from person_capture_tpu.models import yolov8 as Y
import pytest


def test_face_model_emits_kps_head():
    import jax

    model, variables = Y.init_yolo(jax.random.PRNGKey(0), Y.TINY_FACE,
                                   size=64)
    x = jnp.zeros((1, 64, 64, 3))
    levels = model.apply(variables, x)
    assert len(levels) == 3
    for (box, cls, kps), stride in zip(levels, Y.TINY_FACE.strides):
        side = 64 // stride
        assert box.shape == (1, side, side, 4 * Y.TINY_FACE.reg_max)
        assert cls.shape == (1, side, side, 1)
        assert kps.shape == (1, side, side, 15)


def test_kpts_decode_matches_pose_formula():
    """decode_kpts_level == ultralytics kpts_decode:
    p = (t*2 + (anchor-0.5)) * stride with anchor = cell + 0.5."""
    rng = np.random.default_rng(0)
    h = w = 4
    stride = 8
    t = rng.normal(size=(2, h, w, 15)).astype(np.float32)
    pts, vis = Y.decode_kpts_level(jnp.asarray(t), stride, 5, 3)
    tt = t.reshape(2, h * w, 5, 3)
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cx = gx.reshape(-1)[None, :, None]
    cy = gy.reshape(-1)[None, :, None]
    want_x = (tt[..., 0] * 2.0 + cx) * stride
    want_y = (tt[..., 1] * 2.0 + cy) * stride
    np.testing.assert_allclose(np.asarray(pts)[..., 0], want_x, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pts)[..., 1], want_y, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vis),
                               1 / (1 + np.exp(-tt[..., 2])), rtol=1e-5)


def test_kps_target_decode_roundtrip():
    """build_targets' kps_t parameterization inverts decode_kpts_level:
    planting kps_t as raw map values at a positive cell reproduces the gt
    landmarks."""
    from person_capture_tpu.train.yolo_synth import build_targets

    size = 64
    boxes = np.asarray([[[10.0, 12.0, 40.0, 44.0]]], np.float32)
    kps = np.asarray([[[[18, 22], [32, 22], [25, 30], [20, 37], [30, 37]]]],
                     np.float32)
    gt_mask = np.ones((1, 1), bool)
    targets = build_targets(boxes, gt_mask, size, strides=(8, 16, 32),
                            kps=kps)
    found = False
    for t, stride in zip(targets, (8, 16, 32)):
        if not t["pos"].any():
            continue
        side = size // stride
        raw = np.zeros((1, side, side, 15), np.float32)
        flat = raw.reshape(1, side * side, 5, 3)
        idx = np.flatnonzero(t["pos"][0])
        flat[0, idx, :, :2] = t["kps_t"][0, idx]
        pts, _ = Y.decode_kpts_level(jnp.asarray(raw), stride, 5, 3)
        for i in idx:
            np.testing.assert_allclose(np.asarray(pts)[0, i], kps[0, 0],
                                       atol=1e-3)
            found = True
    assert found


def test_detect_faces_yolo_contract():
    import jax

    model, variables = Y.init_yolo(jax.random.PRNGKey(0), Y.TINY_FACE,
                                   size=64)
    frames = jnp.zeros((2, 64, 64, 3))
    det = Y.detect_faces_yolo(model, variables, frames,
                              jnp.ones(2), score_thresh=0.9, max_faces=4)
    assert det["boxes"].shape == (2, 4, 4)
    assert det["kps"].shape == (2, 4, 5, 2)
    assert det["scores"].shape == (2, 4)
    assert det["mask"].dtype == jnp.bool_


@pytest.mark.slow
def test_backend_accepts_yolo_face_cfg():
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    backend = ScrfdArcFaceBackend(scrfd_cfg=Y.TINY_FACE, det_size=64,
                                  max_faces=4, transfer_format="bgr")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(2, bool))
    assert out["boxes"].shape == (2, 4, 4)
    assert out["kps"].shape == (2, 4, 5, 2)
    assert out["feats"].shape[0] == 2


@pytest.mark.slow
def test_trainer_mechanics_short_run():
    """A few steps must run end-to-end and report sane metrics (the
    bundled-weights recipe itself is a longer offline run — see
    test_bundled_yolo_face_weights)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from person_capture_tpu.train.yolo_face_synth import train

    _, final = train("yolo_face_tiny", size=64, batch=4, steps=8,
                     lr=1e-3, eval_every=0, log_every=1000)
    assert 0.0 <= final["recall"] <= 1.0
    assert final["kps_err"] >= 0.0


@pytest.mark.slow
def test_bundled_yolo_face_weights():
    """Bundled trained YOLO-face weights detect synthetic faces with
    usable landmarks through the real backend."""
    import pytest

    from person_capture_tpu.models.zoo import bundled_weights_path

    path = bundled_weights_path("yolo_face_tiny")
    if path is None:
        pytest.skip("no bundled yolo_face_tiny weights")
    import jax

    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.train.scenes import sample_batch

    weights = resolve_weights("auto", "yolo_face_tiny")
    model, _ = Y.init_yolo(jax.random.PRNGKey(0), Y.TINY_FACE, size=128)
    rng = np.random.default_rng(7)
    data = sample_batch(rng, 8, 128)
    det = Y.detect_faces_yolo(model, weights,
                              jnp.asarray(data["images"].astype(np.float32)),
                              jnp.ones(8, np.float32), 0.35)
    mask = np.asarray(det["mask"])
    boxes = np.asarray(det["boxes"])
    kps = np.asarray(det["kps"])
    tp = fn = 0
    kp_errs = []
    for i in range(8):
        gts = data["boxes"][i][data["gt_mask"][i]]
        gkps = data["kps"][i][data["gt_mask"][i]]
        for gi, gt in enumerate(gts):
            best_iou, best_j = 0.0, -1
            for j in np.flatnonzero(mask[i]):
                ix = max(0.0, min(boxes[i, j, 2], gt[2])
                         - max(boxes[i, j, 0], gt[0]))
                iy = max(0.0, min(boxes[i, j, 3], gt[3])
                         - max(boxes[i, j, 1], gt[1]))
                inter = ix * iy
                ua = ((boxes[i, j, 2] - boxes[i, j, 0])
                      * (boxes[i, j, 3] - boxes[i, j, 1])
                      + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
                iou = inter / max(ua, 1e-9)
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_iou >= 0.5:
                tp += 1
                fw = max(gt[2] - gt[0], 1.0)
                kp_errs.append(float(np.linalg.norm(
                    kps[i, best_j] - gkps[gi], axis=-1).mean() / fw))
            else:
                fn += 1
    assert tp / max(tp + fn, 1) >= 0.7, (tp, fn)
    assert np.mean(kp_errs) <= 0.2, kp_errs
