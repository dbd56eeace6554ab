"""SCRFD synthetic training: target assignment invariants + a train step
smoke (train/scrfd_synth.py), and the bundled trained weights actually
detecting synthetic faces through the real backend — the no-oracle E2E the
reference gets from its pretrained ONNX (face_embedder.py:55-65)."""

import numpy as np
import pytest

from person_capture_tpu.train.scenes import MAX_GT, sample_batch, sample_scene
from person_capture_tpu.train.scrfd_synth import LEVEL_HI, build_targets


def test_scene_sampler_shapes_and_truth():
    rng = np.random.default_rng(3)
    s = sample_scene(rng, 128)
    assert s["image"].shape == (128, 128, 3)
    assert s["boxes"].shape == (MAX_GT, 4)
    assert s["kps"].shape == (MAX_GT, 5, 2)
    for j in np.flatnonzero(s["gt_mask"]):
        x1, y1, x2, y2 = s["boxes"][j]
        assert x2 > x1 and y2 > y1
        # landmarks inside (the unclipped) box neighborhood
        assert (s["kps"][j][:, 0] >= x1 - 2).all()


def test_targets_every_gt_has_a_positive():
    rng = np.random.default_rng(0)
    for seed in range(4):
        d = sample_batch(np.random.default_rng(seed), 4, 128)
        t = build_targets(d["boxes"], d["kps"], d["gt_mask"], 128)
        total_pos = sum(int(lv["pos"].sum()) for lv in t)
        ngt = int(d["gt_mask"].sum())
        if ngt:
            assert total_pos >= ngt, (total_pos, ngt)
        # anchor pairs share assignments (2 anchors per location)
        for lv in t:
            lab = lv["labels"].reshape(lv["labels"].shape[0], -1, 2)
            np.testing.assert_array_equal(lab[..., 0], lab[..., 1])


def test_targets_box_distances_decode_back():
    """ltrb targets (stride units) must decode to the assigned gt box."""
    boxes = np.zeros((1, MAX_GT, 4), np.float32)
    kps = np.zeros((1, MAX_GT, 5, 2), np.float32)
    mask = np.zeros((1, MAX_GT), bool)
    boxes[0, 0] = [30, 34, 70, 78]  # max dim 44 → level stride 8
    from person_capture_tpu.train.scenes import kps_from_box
    kps[0, 0] = kps_from_box(boxes[0, 0])
    mask[0, 0] = True
    t = build_targets(boxes, kps, mask, 128)
    lv = t[0]
    s = 8
    n = 128 // s
    pos_idx = np.flatnonzero(lv["pos"][0])
    assert pos_idx.size > 0
    for p in pos_idx:
        loc = p // 2
        cy, cx = (loc // n) * s, (loc % n) * s
        l, tt, r, b = lv["box_t"][0, p] * s
        np.testing.assert_allclose(
            [cx - l, cy - tt, cx + r, cy + b], boxes[0, 0], atol=1e-3)


@pytest.mark.slow
def test_train_step_reduces_loss():
    import jax

    from person_capture_tpu.train.scrfd_synth import train

    _, ev = train("scrfd_tiny", size=64, batch=4, steps=8, lr=1e-3,
                  eval_every=0, log_every=100)
    # smoke only: runs end-to-end, produces finite eval numbers
    assert 0.0 <= ev["recall"] <= 1.0


@pytest.fixture(scope="module")
def tiny_backend():
    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    w = resolve_weights("auto", "scrfd_tiny")
    if w is None:
        pytest.skip("bundled scrfd_tiny weights not present")
    import jax.numpy as jnp

    return ScrfdArcFaceBackend(
        scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=128, max_faces=4,
        score_thresh=0.5, dtype=jnp.float32, scrfd_weights=w,
        transfer_format="bgr")


def test_bundled_tiny_weights_detect_synthetic_faces(tiny_backend):
    from person_capture_tpu.train.scenes import sample_batch

    rng = np.random.default_rng(42)
    d = sample_batch(rng, 6, 128, min_face=24, max_face=90)
    out = tiny_backend.extract_batch(d["images"].astype(np.uint8),
                                     np.ones(6, bool))
    hits = misses = 0
    for i in range(6):
        gts = d["boxes"][i][d["gt_mask"][i]]
        for gt in gts:
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
    assert hits >= max(1, int(0.7 * (hits + misses))), (hits, misses)


def test_rotated_face_recovered_by_ladder_real_weights(tiny_backend):
    """A 90°-rotated synthetic face is invisible to the 0° pass (upright
    training distribution) but recovered by the rotation ladder with a
    correctly remapped box — reference face_embedder.py:2363-2433."""
    from person_capture_tpu.pipeline.recovery import (RecoveringFaceBackend,
                                                      RecoveryPolicy)
    from person_capture_tpu.train.scenes import sample_scene

    rng = np.random.default_rng(7)
    world = gt = upright = None
    for _ in range(40):  # find a rotated sample the 0° pass misses
        s = sample_scene(rng, 128, min_face=50, max_face=80)
        if not s["gt_mask"].any() or s["gt_mask"].sum() > 1:
            continue
        cand_world = np.ascontiguousarray(np.rot90(s["image"], 3))
        base = tiny_backend.extract_batch(cand_world[None].astype(np.uint8),
                                          np.ones(1, bool))
        up = tiny_backend.extract_batch(s["image"][None].astype(np.uint8),
                                        np.ones(1, bool))
        if up["mask"][0].any() and not base["mask"][0].any():
            world, gt, upright = cand_world, s["boxes"][0], s["image"]
            break
    if world is None:
        pytest.skip("0° pass sees every rotated sample; ladder untestable")

    policy = RecoveryPolicy(rot_adaptive=True, rot_every_n=1,
                            use_scale_tta=False, use_edge_pad=False)
    bk = RecoveringFaceBackend(tiny_backend, policy)
    out = bk.extract_batch(world[None].astype(np.uint8), np.ones(1, bool))
    assert out["mask"][0].any(), "rotation ladder failed on real weights"
    # remap check: world-frame gt = rot90(k=3) image of the upright gt
    h = w = 128
    wx1, wy1 = gt[1], h - 1 - gt[2]
    wx2, wy2 = gt[3], h - 1 - gt[0]
    bx = out["boxes"][0][np.flatnonzero(out["mask"][0])[0]]
    ix = max(0, min(bx[2], wx2) - max(bx[0], wx1))
    iy = max(0, min(bx[3], wy2) - max(bx[1], wy1))
    inter = ix * iy
    ua = ((bx[2] - bx[0]) * (bx[3] - bx[1])
          + (wx2 - wx1) * (wy2 - wy1) - inter)
    assert inter / max(ua, 1e-9) >= 0.4, (bx, (wx1, wy1, wx2, wy2))


def test_bundled_arcface_synth_separates_identities():
    """The bundled margin-trained embedder separates synthetic identities
    (intra-cos >> inter-cos) through the production encode path."""
    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.train.arcface_synth import (make_identities,
                                                        render_chip)

    w = resolve_weights("auto", "arcface_synth")
    if w is None:
        pytest.skip("bundled arcface_synth weights not present")
    import jax

    model = AF.IResNet(AF.SYNTH_R18)
    rng = np.random.default_rng(123)
    ident = make_identities(rng, 6)
    feats = []
    for i in range(6):
        chips = np.stack([render_chip(rng, ident, i) for _ in range(3)])
        feats.append(np.asarray(AF.encode_chips(model, w, chips,
                                                flip_tta=False)))
    intra = np.mean([feats[i][0] @ feats[i][1] for i in range(6)])
    inter = np.mean([feats[i][0] @ feats[j][0]
                     for i in range(6) for j in range(6) if i != j])
    assert intra > 0.75, intra
    assert inter < 0.35, inter
    assert intra - inter > 0.4
