import os

import numpy as np
import pytest

from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.curator import core as CU


_ID_COLORS = [(60, 180, 240), (200, 90, 60)]


class ColorFaceBackend:
    """Finds the synthetic identity-colored blob in arbitrary images."""

    embed_dim = 16
    max_faces = 2

    def identity_feat(self, ident):
        v = np.zeros(self.embed_dim, np.float32)
        v[ident] = 1.0
        return v

    def extract_batch(self, frames, valid, frame_idxs=None):
        b, f = frames.shape[0], self.max_faces
        out = {
            "boxes": np.zeros((b, f, 4), np.float32),
            "kps": np.zeros((b, f, 5, 2), np.float32),
            "scores": np.zeros((b, f), np.float32),
            "mask": np.zeros((b, f), bool),
            "feats": np.zeros((b, f, self.embed_dim), np.float32),
            "quality": np.zeros((b, f), np.float32),
        }
        for i in range(b):
            if not valid[i]:
                continue
            slot = 0
            for ident, color in enumerate(_ID_COLORS):
                mask = np.all(np.abs(frames[i].astype(int) - color) < 30, -1)
                if mask.sum() < 25 or slot >= f:
                    continue
                ys, xs = np.nonzero(mask)
                box = [xs.min(), ys.min(), xs.max(), ys.max()]
                out["boxes"][i, slot] = box
                w, h = box[2] - box[0], box[3] - box[1]
                out["kps"][i, slot] = np.array(
                    [[box[0] + 0.3 * w, box[1] + 0.35 * h],
                     [box[0] + 0.7 * w, box[1] + 0.35 * h],
                     [box[0] + 0.5 * w, box[1] + 0.55 * h],
                     [box[0] + 0.35 * w, box[1] + 0.75 * h],
                     [box[0] + 0.65 * w, box[1] + 0.75 * h]])
                out["scores"][i, slot] = 0.9
                out["mask"][i, slot] = True
                out["feats"][i, slot] = self.identity_feat(ident)
                out["quality"][i, slot] = 500.0
                slot += 1
        return out


class MeanColorClip:
    def extract(self, crops):
        out = []
        for c in crops:
            v = np.asarray(c, np.float32).reshape(-1, 3).mean(0) + 1e-3
            out.append((v / np.linalg.norm(v)).astype(np.float32))
        return np.stack(out)


def _make_pool(tmp_path, n_scenes=3, per_scene=6, ident=0):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    k = 0
    for s in range(n_scenes):
        bg = rng.integers(40, 200, 3)
        for j in range(per_scene):
            img = np.full((240, 160, 3), bg, np.uint8)
            img += rng.integers(0, 6, img.shape).astype(np.uint8)
            size = 40 + 8 * (j % 3)
            cx, cy = 80, 70 + 5 * j
            color = _ID_COLORS[ident]
            cv2.ellipse(img, (cx, cy), (size // 2, size // 2), 0, 0, 360,
                        color, -1)
            p = str(tmp_path / f"f{k * 24:08d}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)
            k += 1
    return paths


def test_feature_helpers():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    assert 0.0 <= CU.sharpness_norm(img) <= 1.0
    assert 0.0 <= CU.exposure_score(img) <= 1.0
    assert CU.exposure_score(np.zeros((64, 64, 3), np.uint8)) < 0.2
    h = CU.phash64(img)
    assert CU.hamming64(h, h) == 0
    yaw, roll = CU.yaw_roll_from_5pts(np.array(
        [[30, 40], [70, 40], [50, 60], [35, 80], [65, 80]], np.float32))
    assert abs(yaw) < 2 and abs(roll) < 2
    yaw_r, _ = CU.yaw_roll_from_5pts(np.array(
        [[30, 40], [70, 40], [62, 60], [35, 80], [65, 80]], np.float32))
    assert yaw_r > 5


def test_timestamp_from_name():
    assert CU.timestamp_from_name("f00000240.jpg", 30.0) == pytest.approx(8.0)
    assert CU.timestamp_from_name("crop_t12.5s.png") == pytest.approx(12.5)
    assert CU.timestamp_from_name("nonumber.jpg") == 0.0


def test_ratio_label_and_categorize():
    assert CU.ratio_label(100, 100) == "1:1"
    assert CU.ratio_label(200, 300) == "2:3"
    it = CU.Item(path="x", ratio="2:3", face_frac=0.4)
    assert CU.categorize(it) == "closeup"
    it.face_frac = 0.25
    assert CU.categorize(it) == "portrait"
    it.face_frac = 0.15
    assert CU.categorize(it) == "cowboy"
    it.face_frac = 0.05
    assert CU.categorize(it) == "full"


def test_quality_score_weighting():
    good = CU.Item(path="a", face_fd=0.1, sharpness=0.8, exposure=0.9,
                   face_quality=800)
    bad = CU.Item(path="b", face_fd=0.45, sharpness=0.2, exposure=0.3,
                  face_quality=100)
    assert good.quality_score() > bad.quality_score()
    wm = CU.Item(path="c", face_fd=0.1, sharpness=0.8, exposure=0.9,
                 face_quality=800, wmark=1.0)
    assert wm.quality_score() < good.quality_score()


def test_cluster_scenes_groups_similar():
    items = []
    rng = np.random.default_rng(2)
    for s in range(3):
        base_vec = rng.normal(size=8)
        base_vec /= np.linalg.norm(base_vec)
        ph = int(rng.integers(0, 2 ** 60))
        for j in range(4):
            it = CU.Item(path=f"s{s}_{j}", ts=s * 100.0 + j)
            it.bg_clip = base_vec.astype(np.float32)
            it.phash = ph  # identical hash within scene
            items.append(it)
    ids = CU.cluster_scenes(items)
    assert len(set(ids)) == 3
    for s in range(3):
        scene_vals = {ids[s * 4 + j] for j in range(4)}
        assert len(scene_vals) == 1


def test_curator_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    pool = tmp_path / "pool"
    out = tmp_path / "out"
    pool.mkdir()
    paths = _make_pool(pool)
    backend = ColorFaceBackend()
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cur = CU.Curator(backend, bank, clip_backend=MeanColorClip(), batch=4)
    res = cur.run(str(pool), str(out), max_images=8)
    m = res["metrics"]
    assert m["pool"] == len(paths)
    assert 1 <= m["selected"] <= 8
    assert os.path.exists(out / "selection_debug.csv")
    assert os.path.exists(out / "metrics.json")
    for p in res["selected"]:
        assert os.path.exists(p)
    # identity gate: wrong-identity pool selects nothing
    bank2 = RefBank(cap=8)
    bank2.seed([backend.identity_feat(1)])
    cur2 = CU.Curator(backend, bank2, clip_backend=MeanColorClip(), batch=4)
    res2 = cur2.run(str(pool), str(tmp_path / "out2"), max_images=8)
    assert res2["metrics"]["selected"] == 0


def test_mmr_dedup_blocks_near_duplicates():
    items = []
    v = np.ones(8, np.float32) / np.sqrt(8)
    for j in range(5):
        it = CU.Item(path=f"dup{j}", face_fd=0.1, sharpness=0.9,
                     exposure=0.9, face_quality=900)
        it.phash = 0xABCDEF  # identical
        it.face_feat = v
        it.scene = 0
        items.append(it)
    chosen, _ = CU.mmr_select(items, max_images=5)
    assert len(chosen) == 1  # pHash dedup kills the rest


def test_cluster_scenes_stitches_adjacent_drifted_clusters():
    """A continuous shot whose medoid drifts must not over-fragment: the
    adjacent-cluster stitch (reference dataset_curator.py:555-577) merges
    clusters whose boundary items are time-close and pHash-similar."""
    from person_capture_tpu.curator.core import Item, cluster_scenes

    p0 = 0
    p1 = (1 << 5) - 1               # 5 bits from p0 (same scene)
    p2 = p1 ^ (0b11111 << 5)        # 5 bits from p1, 10 bits from p0
    items = [Item(path="a", ts=0.0, phash=p0),
             Item(path="b", ts=1.0, phash=p1),
             Item(path="c", ts=2.0, phash=p2)]
    ids = cluster_scenes(items, hamm_thresh=7, time_gap=4.0)
    # c is far from the medoid (a) but adjacent to b: one stitched scene
    assert ids == [0, 0, 0]
    # far apart in time: no stitch
    items[2].ts = 60.0
    ids = cluster_scenes(items, hamm_thresh=7, time_gap=4.0)
    assert ids[0] == ids[1] != ids[2]


def test_match_detections_shared_matcher():
    """train/common.match_detections: greedy one-to-one IoU matching with
    optional keypoint error (shared by the three detector trainers)."""
    import numpy as np

    from person_capture_tpu.train.common import match_detections

    gt = np.asarray([[[10, 10, 50, 50], [100, 100, 140, 140]]], np.float32)
    gt_mask = np.ones((1, 2), bool)
    boxes = np.asarray([[[12, 12, 52, 52],      # matches gt0
                         [11, 11, 49, 49],      # duplicate → fp (gt0 used)
                         [300, 300, 340, 340]]], np.float32)  # fp
    mask = np.asarray([[True, True, True]])
    tp, fp, fn, errs = match_detections(boxes, mask, gt, gt_mask,
                                        iou_thresh=0.5)
    assert (tp, fp, fn) == (1, 2, 1)
    kps = np.zeros((1, 3, 5, 2), np.float32)
    gt_kps = np.zeros((1, 2, 5, 2), np.float32)
    gt_kps[0, 0] += 4.0             # mean kp err 4*sqrt(2) px over width 40
    tp, fp, fn, errs = match_detections(boxes, mask, gt, gt_mask,
                                        iou_thresh=0.5, kps=kps,
                                        gt_kps=gt_kps)
    assert len(errs) == 1
    assert abs(errs[0] - 4.0 * np.sqrt(2.0) / 40.0) < 1e-6


def test_curator_cli_resolves_real_weights(monkeypatch, tmp_path):
    """The curator CLI resolves bundled weights like the main CLI — a
    random-init SCRFD/ArcFace can never find or identify the reference
    face (round-3 review finding)."""
    import person_capture_tpu.curator.__main__ as M
    import person_capture_tpu.pipeline.backends as B

    captured = {}

    class FakeBackend:
        def __init__(self, **kw):
            captured.update(kw)

    monkeypatch.setattr(B, "ScrfdArcFaceBackend", FakeBackend)
    rc = M.main(["--pool", str(tmp_path), "--out", str(tmp_path / "o"),
                 "--ref", str(tmp_path / "missing.png"), "--no-clip"])
    assert rc == 1   # unreadable ref exits after backend construction
    assert captured.get("scrfd_weights") is not None
    assert captured.get("arcface_weights") is not None


def test_ratio_label_reference_buckets():
    # reference norm_ratio semantics (dataset_curator.py:730-744): >1.70
    # aspect is "wide" (16:9 crops were mislabeled and fell into the
    # portrait quota), <0.60 "narrow", unmatched "other"
    assert CU.ratio_label(1920, 1080) == "wide"
    assert CU.ratio_label(400, 800) == "narrow"
    assert CU.ratio_label(400, 300) == "other"   # 4:3
    assert CU.ratio_label(300, 200) == "3:2"
    it = CU.Item(path="x", ratio=CU.ratio_label(1920, 1080), face_frac=0.1)
    assert CU.categorize(it) == "wide"
