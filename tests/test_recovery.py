"""Rotation / scale-TTA / edge-pad recovery ladder (pipeline/recovery.py).

Reference behavior being matched: empty 0° detection escalates to rotated /
scaled probes with coordinate remap + cross-rotation NMS
(person_capture/face_embedder.py:2251-2443)."""

import numpy as np
import pytest

from person_capture_tpu.pipeline.recovery import (
    ROTATION_KS, RecoveringFaceBackend, RecoveryPolicy, apply_remap_boxes,
    apply_remap_points, make_edgepad_variant, make_rotation_variant,
    make_scale_variant, nms_host)


def _mark_frame(h, w, x, y):
    """Frame with a 5x5 marker block centered at (x, y) — survives the
    fit-to-canvas downscale of non-square rotations."""
    f = np.zeros((h, w, 3), np.uint8)
    f[y - 2:y + 3, x - 2:x + 3] = (255, 255, 255)
    return f


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_rotation_remap_roundtrip(k, hw):
    h, w = hw
    x, y = 11, 29
    img, m = make_rotation_variant(_mark_frame(h, w, x, y), k)
    assert img.shape == (h, w, 3)
    ys, xs, _ = np.nonzero(img > 80)
    vy, vx = float(ys.mean()), float(xs.mean())
    bx, by = apply_remap_points(m, np.array([vx, vy], np.float64))
    assert abs(bx - x) < 2.5 and abs(by - y) < 2.5, (bx, by)


@pytest.mark.parametrize("scale", [0.75, 0.60, 1.25])
def test_scale_remap_roundtrip(scale):
    h = w = 96
    f = np.zeros((h, w, 3), np.uint8)
    f[40:56, 24:40] = (255, 255, 255)  # 16px block survives resampling
    img, m = make_scale_variant(f, scale)
    assert img.shape == f.shape
    ys, xs, _ = np.nonzero(img > 120)
    box_v = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                     np.float64)
    box_o = apply_remap_boxes(m, box_v)
    np.testing.assert_allclose(box_o, [24, 40, 40, 56], atol=3.0)


def test_edgepad_remap_roundtrip():
    h = w = 96
    f = np.zeros((h, w, 3), np.uint8)
    f[8:24, 64:80] = (255, 255, 255)
    img, m = make_edgepad_variant(f)
    ys, xs, _ = np.nonzero(img > 120)
    box_v = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                     np.float64)
    box_o = apply_remap_boxes(m, box_v)
    np.testing.assert_allclose(box_o, [64, 8, 80, 24], atol=3.5)


def test_nms_host_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_host(boxes, scores, 0.4)
    assert keep == [0, 2]


def test_policy_prescan_round_robin():
    p = RecoveryPolicy(prescan_rot_probe_period=3)
    p.set_prescan_fast(True)
    seq = [p.variants_for_empty() for _ in range(9)]
    probes = [v for v in seq if v]
    assert len(probes) == 3
    assert [v[0][1] for v in probes] == list(ROTATION_KS)
    assert all(len(v) == 1 for v in probes)  # no scale TTA in fast mode


def test_policy_adaptive_streak_gating():
    p = RecoveryPolicy(rot_adaptive=True, rot_every_n=4,
                       use_scale_tta=False, use_edge_pad=False)
    rots = [[x for x in p.variants_for_empty() if x[0] == "rot"]
            for _ in range(8)]
    assert [len(r) for r in rots] == [0, 0, 0, 3, 0, 0, 0, 3]
    p.note_hit(None)
    assert p.streak == 0


def test_policy_sticky_rotation_after_hit():
    p = RecoveryPolicy(rot_after_hit_frames=2, use_scale_tta=False,
                       use_edge_pad=False)
    p.note_hit(1)
    v = p.variants_for_empty()
    assert ("rot", 1) in v


class UprightMarkerBackend:
    """Detects an exact 2-pixel magic marker — only visible when the frame
    is in its original orientation (any rotation moves the second pixel).
    Emulates an orientation-sensitive detector for ladder tests."""

    A = (250, 1, 2)
    B = (3, 250, 4)
    SIZE = 16

    def __init__(self, max_faces=4, embed_dim=8):
        self.max_faces = max_faces
        self.embed_dim = embed_dim
        self.det_size = 64
        self.score_thresh = 0.5
        self.calls = 0

    def extract_batch(self, frames, valid, frame_idxs=None):
        self.calls += 1
        b, f = frames.shape[0], self.max_faces
        out = {"boxes": np.zeros((b, f, 4), np.float32),
               "kps": np.zeros((b, f, 5, 2), np.float32),
               "scores": np.zeros((b, f), np.float32),
               "mask": np.zeros((b, f), bool),
               "feats": np.zeros((b, f, self.embed_dim), np.float32),
               "quality": np.zeros((b, f), np.float32)}
        s = self.SIZE
        for i in range(b):
            if not valid[i]:
                continue
            ys, xs = np.nonzero((frames[i] == self.A).all(-1))
            for y, x in zip(ys, xs):
                y2, x2 = y + s - 1, x + s - 1
                if (y2 < frames.shape[1] and x2 < frames.shape[2]
                        and (frames[i, y2, x2] == self.B).all()):
                    out["boxes"][i, 0] = [x, y, x + s, y + s]
                    out["scores"][i, 0] = 0.9
                    out["mask"][i, 0] = True
                    out["feats"][i, 0, 0] = 1.0
                    out["quality"][i, 0] = 100.0
        return out


def _marker_frame(h, w, x, y):
    f = np.zeros((h, w, 3), np.uint8)
    s = UprightMarkerBackend.SIZE
    f[y, x] = UprightMarkerBackend.A
    f[y + s - 1, x + s - 1] = UprightMarkerBackend.B
    return f


def test_recovering_backend_finds_rotated_marker():
    inner = UprightMarkerBackend()
    policy = RecoveryPolicy(rot_adaptive=True, rot_every_n=1,
                            use_scale_tta=False, use_edge_pad=False)
    bk = RecoveringFaceBackend(inner, policy)
    # frame rotated 90° CW in "the world": rotating the marker frame by
    # np.rot90(k=3); only the k=1 recovery variant restores uprightness
    upright = _marker_frame(64, 64, 20, 12)
    world = np.ascontiguousarray(np.rot90(upright, 3))
    out = bk.extract_batch(world[None], np.ones(1, bool))
    assert out["mask"][0, 0], "ladder failed to recover the rotated face"
    # box remapped into world coords: the world-frame marker location
    wys, wxs = np.nonzero((world == UprightMarkerBackend.A).all(-1))
    bx = out["boxes"][0, 0]
    assert bx[0] <= wxs[0] + 16 and bx[1] <= wys[0] + 16
    assert bk.recovered_faces == 1
    # upright frame: no recovery needed, 0° pass hits
    out2 = bk.extract_batch(upright[None], np.ones(1, bool))
    assert out2["mask"][0, 0]


def test_recovering_backend_passthrough_when_hits():
    inner = UprightMarkerBackend()
    bk = RecoveringFaceBackend(inner, RecoveryPolicy())
    frame = _marker_frame(64, 64, 5, 5)
    out = bk.extract_batch(frame[None], np.ones(1, bool))
    assert out["mask"][0, 0]
    assert inner.calls == 1  # no extra device calls on hit


def test_recovering_backend_submit_protocol():
    inner = UprightMarkerBackend()
    policy = RecoveryPolicy(rot_adaptive=True, rot_every_n=1,
                            use_scale_tta=False, use_edge_pad=False)
    bk = RecoveringFaceBackend(inner, policy)
    world = np.ascontiguousarray(np.rot90(_marker_frame(64, 64, 20, 12), 3))
    fetch = bk.submit_batch(world[None], np.ones(1, bool))
    out = fetch()
    assert out["mask"][0, 0]

@pytest.mark.parametrize("deg", [45, -45, 135, -135])
def test_affine_remap_roundtrip(deg):
    from person_capture_tpu.pipeline.recovery import make_affine_variant

    h, w = 72, 96
    f = np.zeros((h, w, 3), np.uint8)
    f[30:42, 60:72] = (255, 255, 255)
    img, m = make_affine_variant(f, deg)
    assert img.shape == f.shape
    ys, xs, _ = np.nonzero(img > 120)
    assert ys.size, "marker vanished under affine variant"
    vx, vy = float(xs.mean()), float(ys.mean())
    bx, by = apply_remap_points(m, np.array([vx, vy], np.float64))
    assert abs(bx - 66.0) < 3.0 and abs(by - 36.0) < 3.0, (bx, by)


def test_policy_affine_probes_gated_to_yolo_backend():
    from person_capture_tpu.pipeline.recovery import AFFINE_DEGS

    p = RecoveryPolicy(rot_adaptive=True, rot_every_n=1,
                       use_scale_tta=False, use_edge_pad=False,
                       affine_probes=True)
    v = p.variants_for_empty()
    assert [x for x in v if x[0] == "affine"] == \
        [("affine", d) for d in AFFINE_DEGS]
    # default (SCRFD) policy: no affine probes, reference scopes them to
    # the YOLO-face backend (face_embedder.py:1935-2036)
    p2 = RecoveryPolicy(rot_adaptive=True, rot_every_n=1,
                        use_scale_tta=False, use_edge_pad=False)
    assert not [x for x in p2.variants_for_empty() if x[0] == "affine"]


def test_shared_upload_capability_mirrors_inner():
    # mainpass selects its dispatch path with hasattr(backend,
    # "upload_shared"): a facade exposing it over an inner without it
    # (e.g. the sharded backend) would select a crashing path
    from person_capture_tpu.pipeline.recovery import RecoveringFaceBackend

    class NoShared:
        max_faces = 4
        embed_dim = 8

        def extract_batch(self, frames, valid, frame_idxs=None):
            raise NotImplementedError

    class WithShared(NoShared):
        def upload_shared(self, frames):
            return "dev"

        def submit_device(self, bgr_dev, valid, frame_idxs=None):
            return lambda: "out"

    assert not hasattr(RecoveringFaceBackend(NoShared()), "upload_shared")
    assert not hasattr(RecoveringFaceBackend(NoShared()), "submit_device")
    wrapped = RecoveringFaceBackend(WithShared())
    assert hasattr(wrapped, "upload_shared")
    assert wrapped.upload_shared(np.zeros((1, 4, 4, 3))) == "dev"
