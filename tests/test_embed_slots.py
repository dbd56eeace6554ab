"""Decision equivalence of the embed_slots FLOP cut (VERDICT r2 weak #7).

``embed_slots=K`` embeds only the K highest-score NMS slots (the embedder
dominates step FLOPs). For scenes with ≤K faces this must be DECISION
IDENTICAL to embedding every slot — same masks, boxes, embeddings, and the
same accepted/best-fd outcome — so the flag is safe to enable on
bandwidth-rich hardware.
"""

import numpy as np
import pytest

from person_capture_tpu.video.synthetic import FacePlacement, draw_face


@pytest.fixture(scope="module")
def backends():
    import jax.numpy as jnp

    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    sw = resolve_weights("auto", "scrfd_tiny")
    if sw is None:
        pytest.skip("bundled tiny weights not present")
    kw = dict(scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=128,
              max_faces=8, score_thresh=0.45, dtype=jnp.float32,
              scrfd_weights=sw, transfer_format="bgr", seed=0)
    full = ScrfdArcFaceBackend(**kw)                     # embed all 8 slots
    topk = ScrfdArcFaceBackend(embed_slots=4, **kw)      # embed top 4 only
    return full, topk


def _scene(rng, n_faces):
    img = np.full((128, 128, 3), 70, np.uint8)
    for j in range(n_faces):
        s = float(rng.uniform(34, 48))
        x = float(rng.uniform(4, 124 - s - 4))
        y = float(rng.uniform(4, 124 - s - 4))
        draw_face(img, FacePlacement(int(rng.integers(0, 3)), j,
                                     (x, y, x + s, y + s)))
    return img


@pytest.mark.slow
def test_embed_slots_decisions_match_full(backends):
    full, topk = backends
    rng = np.random.default_rng(11)
    frames = np.stack([_scene(rng, int(rng.integers(0, 3)))
                       for _ in range(8)])
    valid = np.ones(8, bool)

    a = full.extract_batch(frames, valid)
    b = topk.extract_batch(frames, valid)

    np.testing.assert_array_equal(np.asarray(a["mask"]),
                                  np.asarray(b["mask"]))
    np.testing.assert_allclose(np.asarray(a["boxes"]),
                               np.asarray(b["boxes"]), atol=1e-4)
    mask = np.asarray(a["mask"])
    assert mask.any(), "fixture must detect faces"
    # ≤4 faces/frame ⇒ every valid slot is embedded in both
    np.testing.assert_allclose(np.asarray(a["feats"])[mask],
                               np.asarray(b["feats"])[mask],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["quality"])[mask],
                               np.asarray(b["quality"])[mask], atol=1e-5)

    # the accepted-face decision (best bank fd per frame) is identical
    bank = rng.normal(size=(4, a["feats"].shape[-1])).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)

    def best_fd(out):
        feats = np.asarray(out["feats"])
        m = np.asarray(out["mask"])
        fds = np.full(feats.shape[:2], 9.0, np.float32)
        for i in range(feats.shape[0]):
            for j in np.flatnonzero(m[i]):
                v = feats[i, j]
                v = v / max(np.linalg.norm(v), 1e-6)
                fds[i, j] = 1.0 - float(np.max(bank @ v))
        return fds.min(axis=1)

    np.testing.assert_allclose(best_fd(a), best_fd(b), atol=1e-5)


def test_embed_slots_never_masks_unembedded_detections(backends):
    """Slots beyond K must have mask=False, not mask=True with zeroed
    feats (fd=1.0 would close active prescan spans on detected frames).
    Invariant: every masked slot carries a real (unit-norm-ish) embedding."""
    full, topk = backends
    rng = np.random.default_rng(5)
    # crowd scenes: more faces than embed_slots when the detector finds >4
    frames = np.stack([_scene(rng, 6) for _ in range(8)])
    valid = np.ones(8, bool)
    out = topk.extract_batch(frames, valid)
    mask = np.asarray(out["mask"])
    feats = np.asarray(out["feats"])
    assert mask.sum(axis=1).max() <= 4          # never more than K claimed
    norms = np.linalg.norm(feats[mask], axis=-1)
    assert (norms > 0.1).all(), "masked slot with zeroed embedding"
