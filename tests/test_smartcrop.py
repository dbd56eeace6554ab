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
