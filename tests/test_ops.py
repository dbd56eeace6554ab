import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.ops import align as A  # noqa: E402
from person_capture_tpu.ops import nms as N  # noqa: E402
from person_capture_tpu.ops import preprocess as P  # noqa: E402
from person_capture_tpu.ops import quality as Q  # noqa: E402


# ------------------------------ align -------------------------------------

def test_canon_5pts_orders_landmarks():
    pts = np.array([[70, 50], [30, 50], [50, 70], [65, 90], [35, 90]], np.float32)
    out = A.canon_5pts(pts)
    assert out is not None
    np.testing.assert_array_equal(out[0], [30, 50])  # left eye
    np.testing.assert_array_equal(out[1], [70, 50])  # right eye
    np.testing.assert_array_equal(out[2], [50, 70])  # nose
    np.testing.assert_array_equal(out[3], [35, 90])  # left mouth
    np.testing.assert_array_equal(out[4], [65, 90])  # right mouth


def test_canon_5pts_rejects_nonface():
    # nose above the eyes
    pts = np.array([[30, 50], [70, 50], [50, 10], [35, 90], [65, 90]], np.float32)
    assert A.canon_5pts(pts) is None
    assert A.canon_5pts(np.full((5, 2), np.nan, np.float32)) is None
    assert A.canon_5pts(np.zeros((4, 2), np.float32)) is None


def _random_similarity(rng):
    theta = rng.uniform(-np.pi, np.pi)
    s = rng.uniform(0.5, 2.0)
    t = rng.uniform(-50, 50, 2)
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return s, r, t


def test_umeyama_recovers_exact_similarity():
    rng = np.random.default_rng(0)
    for _ in range(20):
        s, r, t = _random_similarity(rng)
        src = rng.uniform(0, 100, (5, 2))
        dst = (s * (r @ src.T)).T + t
        m = A.umeyama_similarity(src, dst)
        mapped = (m[:, :2] @ src.T).T + m[:, 2]
        np.testing.assert_allclose(mapped, dst, atol=1e-3)
        # uniform scale: columns orthogonal, equal norm
        a = m[:, :2]
        assert abs(np.linalg.norm(a[:, 0]) - np.linalg.norm(a[:, 1])) < 1e-4
        assert abs(a[:, 0] @ a[:, 1]) < 1e-4


def test_umeyama_matches_cv2_estimate_affine_partial2d():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    for _ in range(20):
        src = rng.uniform(10, 100, (5, 2)).astype(np.float32)
        s, r, t = _random_similarity(rng)
        # clean correspondences: LMEDS degenerates to least-squares
        dst = ((s * (r @ src.T)).T + t).astype(np.float32)
        m_cv, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)
        m_us = A.umeyama_similarity(src, dst)
        np.testing.assert_allclose(m_us, m_cv, atol=1e-3)
    # under mild landmark noise the transforms stay functionally close:
    # mapped template points agree within a pixel
    for _ in range(10):
        src = rng.uniform(10, 100, (5, 2)).astype(np.float32)
        s, r, t = _random_similarity(rng)
        dst = ((s * (r @ src.T)).T + t + rng.normal(0, 0.3, (5, 2))).astype(np.float32)
        m_cv, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)
        m_us = A.umeyama_similarity(src, dst)
        mapped_cv = (m_cv[:, :2] @ src.T).T + m_cv[:, 2]
        mapped_us = (m_us[:, :2] @ src.T).T + m_us[:, 2]
        assert np.abs(mapped_cv - mapped_us).max() < 1.5


def test_umeyama_jnp_matches_host():
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 100, (4, 5, 2)).astype(np.float32)
    dst = A.ARC_DST
    ms = np.asarray(A.umeyama_similarity_jnp(jnp.asarray(src), jnp.asarray(dst)))
    for i in range(4):
        m_host = A.umeyama_similarity(src[i], dst)
        # float32 SVD vs float64: compare mapped landmark positions (sub-0.1px)
        mapped_dev = (ms[i][:, :2] @ src[i].T).T + ms[i][:, 2]
        mapped_host = (m_host[:, :2] @ src[i].T).T + m_host[:, 2]
        assert np.abs(mapped_dev - mapped_host).max() < 0.1


def test_invert_affine():
    m = jnp.asarray([[2.0, 0.0, 5.0], [0.0, 2.0, -3.0]])
    inv = np.asarray(A.invert_affine(m))
    pt = np.array([7.0, 9.0])
    fwd = np.asarray(m)[:, :2] @ pt + np.asarray(m)[:, 2]
    back = inv[:, :2] @ fwd + inv[:, 2]
    np.testing.assert_allclose(back, pt, atol=1e-5)


def test_warp_affine_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (80, 60, 3)).astype(np.float32)
    src = np.array([[20, 20], [40, 21], [30, 35], [22, 48], [38, 47]], np.float32)
    m = A.umeyama_similarity(src, A.ARC_DST)
    ref = cv2.warpAffine(img, m, (112, 112), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    ours = np.asarray(A.warp_affine_jnp(jnp.asarray(img), jnp.asarray(m), 112, 112))
    # interior agreement (borders differ slightly in subpixel rounding)
    diff = np.abs(ref - ours)
    assert np.median(diff) < 0.5
    assert (diff < 2.0).mean() > 0.97


def test_align_chips_matmul_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(9)
    img = cv2.GaussianBlur(
        rng.uniform(0, 255, (216, 384, 3)).astype(np.float32), (5, 5), 1.5)
    for theta, scale in [(-0.2, 30.0), (0.5, 22.0), (0.0, 55.0)]:
        r = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        base = (A.ARC_DST - A.ARC_DST.mean(0)) / 112.0
        kps = (scale * (r @ base.T)).T + np.array([150.0, 110.0])
        m = A.umeyama_similarity(kps.astype(np.float32), A.ARC_DST)
        ref = cv2.warpAffine(img, m, (112, 112), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT)
        got = np.asarray(A.align_chips_matmul_jnp(
            jnp.asarray(img), jnp.asarray(kps[None], jnp.float32),
            jnp.asarray([True])))[0]
        d = np.abs(ref - got)
        assert np.median(d) < 0.5
        assert np.percentile(d, 99) < 3.0


def test_align_chips_matmul_masks_invalid():
    rng = np.random.default_rng(10)
    frame = rng.uniform(0, 255, (100, 100, 3)).astype(np.float32)
    kps = np.stack([A.ARC_DST * 0.5 + 10, A.ARC_DST * 0.5], 0).astype(np.float32)
    valid = jnp.asarray([True, False])
    chips = np.asarray(A.align_chips_matmul_jnp(
        jnp.asarray(frame), jnp.asarray(kps), valid))
    assert chips.shape == (2, 112, 112, 3)
    assert chips[0].std() > 0
    assert np.all(chips[1] == 0)


def test_align_chips_masks_invalid():
    rng = np.random.default_rng(4)
    frame = rng.uniform(0, 255, (100, 100, 3)).astype(np.float32)
    kps = np.stack([A.ARC_DST + 10, A.ARC_DST], 0).astype(np.float32)
    valid = jnp.asarray([True, False])
    chips = np.asarray(A.align_chips_jnp(jnp.asarray(frame), jnp.asarray(kps), valid))
    assert chips.shape == (2, 112, 112, 3)
    assert chips[0].std() > 0
    assert np.all(chips[1] == 0)


# ------------------------------ nms ----------------------------------------

def test_iou_matrix():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]], jnp.float32)
    m = np.asarray(N.iou_matrix(boxes, boxes))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(1 / 3)
    assert m[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # overlaps #0
        [20, 0, 30, 10],  # separate
        [0, 0, 0, 0],     # invalid slot
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.0])
    valid = jnp.asarray([True, True, True, False])
    keep = np.asarray(N.nms_mask(boxes, scores, valid, 0.45))
    assert keep.tolist() == [True, False, True, False]


def test_nms_keeps_higher_score():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.5, 0.95])
    valid = jnp.asarray([True, True])
    keep = np.asarray(N.nms_mask(boxes, scores, valid, 0.45))
    assert keep.tolist() == [False, True]


def test_nms_select_packs_results():
    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [20, 0, 30, 10], [40, 0, 50, 10],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.85, 0.7, 0.6])
    valid = jnp.ones(4, bool)
    idx, mask = N.nms_select(boxes, scores, valid, max_out=3)
    idx, mask = np.asarray(idx), np.asarray(mask)
    assert mask.tolist() == [True, True, True]
    assert set(idx.tolist()) == {0, 2, 3}


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(5)
    for _ in range(10):
        k = 16
        xy = rng.uniform(0, 100, (k, 2))
        wh = rng.uniform(5, 40, (k, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, k).astype(np.float32)
        keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.ones(k, bool), 0.4))
        ref = _greedy_nms_ref(boxes, scores, 0.4)
        assert keep.tolist() == ref.tolist()


def _greedy_nms_ref(boxes, scores, thr):
    from person_capture_tpu.core.geometry import box_iou
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    for i in order:
        if all(not keep[j] or box_iou(boxes[i], boxes[j]) <= thr
               for j in range(len(boxes))):
            keep[i] = True
    return keep


# --------------------------- preprocess -------------------------------------

def test_letterbox_topleft_landscape():
    img = jnp.ones((50, 100, 3), jnp.float32)
    out, scale = P.letterbox_topleft(img, 64)
    out = np.asarray(out)
    assert out.shape == (64, 64, 3)
    assert scale == pytest.approx(0.64)
    np.testing.assert_allclose(out[:32, :64], 1.0, atol=1e-5)
    assert np.all(out[33:] == 0.0)


def test_letterbox_topleft_portrait():
    img = jnp.ones((100, 50, 3), jnp.float32)
    out, scale = P.letterbox_topleft(img, 64)
    assert scale == pytest.approx(0.64)
    out = np.asarray(out)
    assert np.all(out[:, 33:] == 0.0)


def test_normalizations():
    x = jnp.full((4, 4, 3), 127.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(P.normalize_scrfd(x)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P.normalize_arcface(x)), 0.0, atol=1e-6)
    y = jnp.full((4, 4, 3), 255.0, jnp.float32)
    np.testing.assert_allclose(np.asarray(P.normalize_yolo(y)), 1.0, atol=1e-6)


def test_bgr_rgb_swap():
    x = np.zeros((2, 2, 3), np.float32)
    x[..., 0] = 255.0  # blue channel
    out = np.asarray(P.normalize_yolo(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., 2], 1.0, atol=1e-5)
    assert np.all(out[..., 0] == 0.0)


def test_crop_and_resize_identity():
    # smooth gradient: near-identity sampling must reproduce it closely
    gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    img = np.stack([gx, gy, gx + gy], -1).astype(np.float32)
    out = np.asarray(P.crop_and_resize(jnp.asarray(img),
                                       jnp.asarray([0.0, 0.0, 64.0, 64.0]), 64, 64))
    assert np.abs(out - img).mean() < 1.0


def test_crop_and_resize_subregion():
    img = np.zeros((64, 64, 3), np.float32)
    img[16:32, 16:32] = 100.0
    out = np.asarray(P.crop_and_resize(jnp.asarray(img),
                                       jnp.asarray([16.0, 16.0, 32.0, 32.0]), 8, 8))
    assert out.mean() > 80.0


# ----------------------------- quality --------------------------------------

def test_laplacian_variance_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 255, (48, 56)).astype(np.uint8)
    ref = float(cv2.Laplacian(gray, cv2.CV_64F).var())
    host = Q.laplacian_variance_np(gray)
    dev = float(np.asarray(Q.laplacian_variance(jnp.asarray(gray.astype(np.float32)))))
    assert host == pytest.approx(ref, rel=1e-6)
    assert dev == pytest.approx(ref, rel=1e-3)


def test_chip_quality_batched():
    rng = np.random.default_rng(8)
    sharp = rng.integers(0, 255, (112, 112, 3)).astype(np.float32)
    blurry = np.full((112, 112, 3), 128.0, np.float32)
    q = np.asarray(Q.chip_quality(jnp.stack([jnp.asarray(sharp), jnp.asarray(blurry)])))
    assert q.shape == (2,)
    assert q[0] > 100 * q[1] + 1.0
