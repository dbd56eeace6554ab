import numpy as np
import pytest

from person_capture_tpu.core import geometry as G


def test_parse_ratio():
    assert G.parse_ratio("2:3") == (2.0, 3.0)
    assert G.parse_ratio_list("1:1, 2:3,3:4") == [(1.0, 1.0), (2.0, 3.0), (3.0, 4.0)]


def test_cosine_distance_basics():
    a = np.array([1.0, 0.0, 0.0])
    assert G.cosine_distance(a, a) == pytest.approx(0.0, abs=1e-6)
    assert G.cosine_distance(a, [0.0, 1.0, 0.0]) == pytest.approx(1.0, abs=1e-6)
    assert G.cosine_distance(a, -a) == pytest.approx(2.0, abs=1e-6)


def test_l2_normalize():
    v = np.array([3.0, 4.0])
    n = G.l2_normalize(v)
    assert np.linalg.norm(n) == pytest.approx(1.0, rel=1e-6)


@pytest.mark.parametrize("ratio", [(1, 1), (2, 3), (3, 4), (16, 9)])
def test_expand_box_to_ratio_exact_ratio_and_containment(ratio):
    rng = np.random.default_rng(0)
    fw, fh = 1920, 1080
    for _ in range(200):
        x1, y1 = rng.uniform(0, fw - 50), rng.uniform(0, fh - 50)
        x2 = x1 + rng.uniform(10, fw - x1 - 1)
        y2 = y1 + rng.uniform(10, fh - y1 - 1)
        bx = G.expand_box_to_ratio(x1, y1, x2, y2, ratio[0], ratio[1], fw, fh)
        nx1, ny1, nx2, ny2 = bx
        assert 0 <= nx1 < nx2 <= fw
        assert 0 <= ny1 < ny2 <= fh
        cw, ch = nx2 - nx1, ny2 - ny1
        target = ratio[0] / ratio[1]
        # exact ratio up to integer rounding
        assert abs(cw / ch - target) <= target * 2.5 / min(cw, ch) + 2e-2


def test_expand_box_to_ratio_centered_simple():
    # small centered box in a big frame: result should contain it
    bx = G.expand_box_to_ratio(900, 500, 1000, 580, 1, 1, 1920, 1080)
    nx1, ny1, nx2, ny2 = bx
    assert nx1 <= 900 and ny1 <= 500 and nx2 >= 1000 and ny2 >= 580
    assert abs((nx2 - nx1) - (ny2 - ny1)) <= 1


def test_expand_box_head_bias_moves_up():
    no_bias = G.expand_box_to_ratio(900, 500, 1000, 580, 1, 1, 1920, 1080, head_bias=0.0)
    biased = G.expand_box_to_ratio(900, 500, 1000, 580, 1, 1, 1920, 1080, head_bias=0.5)
    assert biased[1] < no_bias[1]


def test_detect_black_borders():
    img = np.zeros((200, 300, 3), np.uint8)
    img[20:180, 30:270] = 200
    x1, y1, x2, y2 = G.detect_black_borders(img, thr=10)
    assert (x1, y1, x2, y2) == (30, 20, 270, 180)


def test_detect_black_borders_no_border():
    img = np.full((100, 100, 3), 128, np.uint8)
    assert G.detect_black_borders(img) == (0, 0, 100, 100)


def test_detect_black_borders_all_black():
    img = np.zeros((100, 120, 3), np.uint8)
    x1, y1, x2, y2 = G.detect_black_borders(img)
    # degenerates to a clamped 1px-at-least ROI, never inverted
    assert x1 < x2 and y1 < y2


def test_detect_black_borders_matches_scalar_reference():
    """Cross-check the vectorized scan against a direct per-row loop."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        h, w = rng.integers(40, 120, 2)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        t, b, l, r = rng.integers(0, 10, 4)
        img[: t or 0] = 0
        if b:
            img[-b:] = 0
        img[:, : l or 0] = 0
        if r:
            img[:, -r:] = 0
        got = G.detect_black_borders(img, thr=10)
        exp = _scalar_black_borders(img, thr=10)
        assert got == exp


def _scalar_black_borders(bgr, thr=10, max_scan=None):
    H, W = bgr.shape[:2]
    gray = G.bgr_to_gray(bgr)
    if max_scan is None:
        max_scan = max(64, min(H, W) // 8)
    top = 0
    for r in range(min(H, max_scan)):
        if gray[r, :].mean() > thr:
            break
        top = r + 1
    bottom = H
    for r in range(H - 1, max(H - max_scan - 1, -1), -1):
        if gray[r, :].mean() > thr:
            break
        bottom = r
    left = 0
    for c in range(min(W, max_scan)):
        if gray[:, c].mean() > thr:
            break
        left = c + 1
    right = W
    for c in range(W - 1, max(W - max_scan - 1, -1), -1):
        if gray[:, c].mean() > thr:
            break
        right = c
    left = int(G.clamp(left, 0, right - 1))
    top = int(G.clamp(top, 0, bottom - 1))
    right = int(G.clamp(right, left + 1, W))
    bottom = int(G.clamp(bottom, top + 1, H))
    return left, top, right, bottom


def test_clip_to_frame_shifts_before_clamping():
    # out-of-frame left: shift right, keep size
    assert G.clip_to_frame(-10, 0, 90, 100, 200, 100) == (0, 0, 100, 100)
    # out-of-frame right
    assert G.clip_to_frame(150, 0, 250, 100, 200, 100) == (100, 0, 200, 100)


def test_coerce_box():
    assert G.coerce_box_xyxy(None, (0, 0, 10, 10)) is None
    assert G.coerce_box_xyxy((0, 0, 0.5, 0.5), (0, 0, 10, 10)) is None
    assert G.coerce_box_xyxy((-5, -5, 5, 5), (0, 0, 10, 10)) == (0, 0, 5, 5)
    assert G.coerce_box_xyxy((float("nan"), 0, 5, 5), (0, 0, 10, 10)) is None


def test_union_boxes():
    assert G.union_boxes_xyxy(None, None) is None
    assert G.union_boxes_xyxy((0, 0, 5, 5), (3, 3, 9, 8)) == (0, 0, 9, 8)


def test_pad_box():
    assert G.pad_box_xyxy((10, 10, 20, 20), 2, 3, None, (0, 0, 100, 100)) == (8, 7, 22, 23)
    assert G.pad_box_xyxy((10, 10, 20, 20), 2, 3, 1, (0, 0, 100, 100)) == (8, 7, 22, 21)


def test_containment_deficit():
    crop = (0, 0, 100, 100)
    assert G.containment_deficit_xyxy(crop, None) == 0.0
    assert G.containment_deficit_xyxy(crop, (10, 10, 90, 90)) == 0.0
    # protect sticks out 10px right over an 80px-wide box -> 10/80
    assert G.containment_deficit_xyxy(crop, (30, 10, 110, 90)) == pytest.approx(10 / 80)


def test_shift_crop_to_include_box():
    # crop misses the protect box to the right; shifted right, size preserved
    out = G.shift_crop_to_include_box((0, 0, 50, 50), (60, 10, 70, 20), (0, 0, 200, 200))
    x1, y1, x2, y2 = out
    assert x2 - x1 == 50 and y2 - y1 == 50
    assert x1 <= 60 and x2 >= 70


def test_face_head_proxy_box():
    out = G.face_head_proxy_box((100, 100, 200, 200), 1000, 1000)
    assert out is not None
    hx1, hy1, hx2, hy2 = out
    assert hx1 < 100 and hy1 < 100 and hx2 > 200 and hy2 > 200
    # bottom pad smaller than top pad
    assert (hy2 - 200) < (100 - hy1)
    assert G.face_head_proxy_box(None, 100, 100) is None


def test_box_iou():
    assert G.box_iou((0, 0, 10, 10), (0, 0, 10, 10)) == pytest.approx(1.0)
    assert G.box_iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
    assert G.box_iou((0, 0, 10, 10), (5, 0, 15, 10)) == pytest.approx(1 / 3)
