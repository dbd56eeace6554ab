import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core import compose_profiles as CP
from person_capture_tpu.core.geometry import (containment_deficit_xyxy,
                                              parse_ratio)

CFG = SessionConfig()
BOUNDS = (0, 0, 1920, 1080)


def _ratio_of(crop):
    x1, y1, x2, y2 = crop
    return (x2 - x1) / max(1, y2 - y1)


def test_ratio_crop_contains_protect_when_possible():
    protect = (800, 300, 1100, 700)
    for rs in ["1:1", "2:3", "3:4", "16:9"]:
        crop = CP.ratio_crop_containing_box(protect, rs, BOUNDS)
        assert containment_deficit_xyxy(crop, protect) < 0.02
        rw, rh = parse_ratio(rs)
        assert abs(_ratio_of(crop) - rw / rh) < 0.02


def test_ratio_crop_grows_after_clamp():
    # protect near an edge: expand_box_to_ratio-style shrink would cut it,
    # this helper must keep it inside
    protect = (1700, 100, 1900, 700)
    crop = CP.ratio_crop_containing_box(protect, "1:1", BOUNDS)
    assert containment_deficit_xyxy(crop, protect) < 0.02


def test_ratio_crop_respects_min_size():
    protect = (900, 500, 950, 560)
    crop = CP.ratio_crop_containing_box(protect, "1:1", BOUNDS,
                                        min_size_xy=(400, 400))
    x1, y1, x2, y2 = crop
    assert (x2 - x1) >= 398 and (y2 - y1) >= 398


def test_ratio_crop_impossible_containment_centers_on_anchor():
    # protect wider than the widest legal 1:1 crop in a short frame
    bounds = (0, 0, 1920, 400)
    protect = (100, 50, 1800, 350)
    crop = CP.ratio_crop_containing_box(protect, "1:1", bounds,
                                        anchor=(960, 200))
    x1, y1, x2, y2 = crop
    assert abs((x1 + x2) / 2 - 960) < 5


def test_compose_face_only_portrait():
    # medium face with lots of room below: portrait_close should win with 2:3
    face = (880, 200, 1040, 400)  # face_h 200/1080 ≈ 0.185, room below
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, face, ["1:1", "2:3", "3:4"], BOUNDS, face_box=face)
    assert profile in ("portrait_close", "upper", "close")
    # detected face stays fully inside (hard invariant)
    assert containment_deficit_xyxy(crop, face, 1.0) <= 0.011
    rw, rh = parse_ratio(rs)
    assert rw / rh <= 1.05  # no landscape for portrait profiles


def test_compose_with_subject_box():
    face = (900, 150, 1020, 290)
    subj = (800, 120, 1120, 1000)
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, subj, ["1:1", "2:3", "3:4"], BOUNDS,
        subject_box=subj, face_box=face)
    assert containment_deficit_xyxy(crop, face, 1.0) <= 0.011
    assert profile in ("portrait_close", "upper", "body", "close")


def test_compose_no_face_uses_body_profile():
    subj = (700, 100, 1200, 1050)
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, subj, ["2:3", "1:1"], BOUNDS, subject_box=subj)
    assert profile == "body"
    assert containment_deficit_xyxy(crop, subj, 1.0) < 0.3


def test_compose_no_inputs_base_profile():
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, (500, 300, 900, 800), ["2:3"], BOUNDS)
    assert profile in ("base", "fallback")
    x1, y1, x2, y2 = crop
    assert 0 <= x1 < x2 <= 1920 and 0 <= y1 < y2 <= 1080


def test_compose_square_ratio_only():
    face = (880, 200, 1040, 400)
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, face, ["1:1"], BOUNDS, face_box=face)
    assert rs == "1:1"
    assert abs(_ratio_of(crop) - 1.0) < 0.02
    assert containment_deficit_xyxy(crop, face, 1.0) <= 0.011


def test_compose_wide_context_needs_side_room():
    # small face centered with big side room, landscape ratio available
    face = (930, 300, 990, 375)  # face_h 75/1080 = 0.07
    crop, rs, profile = CP.compose_dataset_crop(
        CFG, face, ["16:9", "2:3"], BOUNDS, face_box=face, frame_idx=5)
    # frame_idx=5 triggers wide cadence (every 5): landscape is viable here
    if profile == "wide_context":
        rw, rh = parse_ratio(rs)
        assert rw / rh > 1.05
    assert containment_deficit_xyxy(crop, face, 1.0) <= 0.011


def test_compose_deterministic():
    face = (880, 200, 1040, 400)
    a = CP.compose_dataset_crop(CFG, face, ["1:1", "2:3"], BOUNDS,
                                face_box=face, frame_idx=12)
    b = CP.compose_dataset_crop(CFG, face, ["1:1", "2:3"], BOUNDS,
                                face_box=face, frame_idx=12)
    assert a == b


def test_prefer_lower_face_crop_y_moves_down():
    face = (880, 500, 1040, 700)
    # crop with huge top headroom
    crop = (700, 100, 1300, 700 + 1)
    out = CP.prefer_lower_face_crop_y(crop, face, None, BOUNDS, "close")
    assert out[1] >= crop[1]  # moved down or equal
    assert out[3] - out[1] == crop[3] - crop[1]  # size preserved
    # face still inside
    assert out[1] <= face[1] and out[3] >= face[3]


def test_prefer_lower_face_noop_for_body():
    crop = (700, 100, 1300, 701)
    out = CP.prefer_lower_face_crop_y(crop, (880, 500, 1040, 700), None,
                                      BOUNDS, "body")
    assert out == tuple(int(round(v)) for v in crop)
