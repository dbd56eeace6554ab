"""Behavioral tests for the saliency-guided crop slide
(core/smartcrop.py — compact re-implementation of the reference
`_smart_crop_box`, person_capture/gui_app.py:8118-8489)."""

import numpy as np

from person_capture_tpu.core.smartcrop import (gradient_saliency,
                                               smart_crop_box)


def _frame_with_texture(W=320, H=240, tex_x1=200, tex_x2=300):
    """Flat frame with a high-gradient textured vertical band."""
    rng = np.random.default_rng(0)
    f = np.full((H, W, 3), 90, np.uint8)
    f[:, tex_x1:tex_x2] = rng.integers(0, 255,
                                       (H, tex_x2 - tex_x1, 3), np.uint8)
    return f


def test_gradient_saliency_highlights_edges():
    g = np.zeros((40, 40), np.uint8)
    g[:, 20:] = 200
    s = gradient_saliency(g)
    assert s[:, 19:22].sum() > 0
    assert s[:, :10].sum() == 0.0


def test_slides_toward_saliency():
    f = _frame_with_texture()
    # crop left of the textured band; search range reaches it
    crop = (100, 40, 220, 200)
    out = smart_crop_box(f, crop, steps=6, side_search_frac=0.35)
    assert out[0] > crop[0], out       # moved right, toward texture
    assert out[2] - out[0] == 120      # width preserved
    assert (out[1], out[3]) == (40, 200)


def test_face_containment_blocks_slide():
    f = _frame_with_texture()
    crop = (100, 40, 220, 200)
    # face hugging the crop's left edge: any right shift would expel it
    face = (101.0, 80.0, 140.0, 130.0)
    out = smart_crop_box(f, crop, face_xyxy=face)
    assert out[0] <= face[0] - 1 and out[2] >= face[2] + 1
    assert out == (100, 40, 220, 200)  # stays put


def test_flat_frame_prefers_original_position():
    f = np.full((240, 320, 3), 128, np.uint8)
    crop = (80, 40, 200, 200)
    assert smart_crop_box(f, crop) == crop


def test_stays_inside_frame_bounds():
    f = _frame_with_texture(tex_x1=280, tex_x2=320)
    crop = (190, 40, 310, 200)         # near the right edge
    out = smart_crop_box(f, crop, steps=8, side_search_frac=0.5)
    assert 0 <= out[0] and out[2] <= 320
    assert out[2] - out[0] == 120


def test_use_grad_false_is_identity():
    f = _frame_with_texture()
    crop = (100, 40, 220, 200)
    assert smart_crop_box(f, crop, use_grad=False) == crop


def _smart_crop_box_fullframe(frame, crop_xyxy, face_xyxy=None, steps=6,
                              side_search_frac=0.35):
    """Naive full-frame-integral formulation (the original shape of the
    algorithm) — the production band-limited version must be
    decision-identical to it."""
    from person_capture_tpu.core.geometry import to_gray

    x1, y1, x2, y2 = (int(v) for v in crop_xyxy)
    H, W = frame.shape[:2]
    crop_w = x2 - x1
    y1 = max(0, min(H - 1, y1))
    y2 = max(y1 + 1, min(H, y2))
    gray = to_gray(frame)
    sal = gradient_saliency(gray)
    integral = np.zeros((H + 1, W + 1), np.float64)
    integral[1:, 1:] = np.cumsum(np.cumsum(sal, 0), 1)

    def box_sum(bx1, bx2):
        return float(integral[y2, bx2] - integral[y2, bx1]
                     - integral[y1, bx2] + integral[y1, bx1])

    max_shift = side_search_frac * crop_w
    n = max(1, int(steps))
    offsets = sorted({int(round(max_shift * k / n))
                      for k in range(-n, n + 1)})
    best_x1 = x1
    best_score = box_sum(max(0, x1), min(W, x2)) * 1.02
    for off in offsets:
        if off == 0:
            continue
        nx1 = x1 + off
        nx2 = nx1 + crop_w
        if nx1 < 0 or nx2 > W:
            continue
        if face_xyxy is not None:
            if face_xyxy[0] < nx1 + 1 or face_xyxy[2] > nx2 - 1:
                continue
        s = box_sum(nx1, nx2)
        if s > best_score:
            best_score, best_x1 = s, nx1
    return best_x1, y1, best_x1 + crop_w, y2


def test_band_limited_matches_fullframe_integral():
    """Randomized decision parity: the band-limited saliency (gradient on
    a ±1 px-margin slice + 1-D column prefix) must pick exactly the crop
    the full-frame integral picks, including at frame edges."""
    rng = np.random.default_rng(7)
    for trial in range(120):
        H = int(rng.integers(40, 160))
        W = int(rng.integers(60, 240))
        f = rng.integers(0, 255, (H, W, 3), np.uint8)
        cw = int(rng.integers(8, max(9, W // 2)))
        ch = int(rng.integers(8, max(9, H - 2)))
        x1 = int(rng.integers(-4, W - cw + 4))       # may touch edges
        y1 = int(rng.integers(0, H - ch))
        crop = (x1, y1, x1 + cw, y1 + ch)
        face = None
        if trial % 3 == 0:
            fx1 = x1 + cw // 4
            face = (fx1, y1 + 2, fx1 + cw // 2, y1 + ch - 2)
        steps = int(rng.integers(1, 9))
        frac = float(rng.uniform(0.05, 0.6))
        got = smart_crop_box(f, crop, face, steps=steps,
                             side_search_frac=frac)
        want = _smart_crop_box_fullframe(f, crop, face, steps=steps,
                                         side_search_frac=frac)
        assert got == want, (trial, crop, face, steps, frac, got, want)
