import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core import compose as CP
from person_capture_tpu.core.geometry import parse_ratio


CFG = SessionConfig()
FW, FH = 1920, 1080


def test_huber():
    assert CP.huber(0.0, 0.1) == 0.0
    assert CP.huber(0.05, 0.1) == pytest.approx(0.5 * 0.05 ** 2)
    assert CP.huber(0.5, 0.1) == pytest.approx(0.1 * (0.5 - 0.05))
    assert CP.huber(-0.5, 0.1) == CP.huber(0.5, 0.1)


def test_enforce_expands_small_crop():
    # face 200px tall; face_max_frac_in_crop=0.42 -> crop_h >= 476
    face = (900, 400, 1060, 600)
    crop = (880, 380, 1080, 580)  # 200px tall, too small
    out = CP.enforce_scale_and_margins(crop, "1:1", FW, FH, CFG, face_box=face)
    x1, y1, x2, y2 = out
    assert (y2 - y1) >= 200 / CFG.face_max_frac_in_crop - 2
    assert abs((x2 - x1) - (y2 - y1)) <= 1  # aspect kept


def test_enforce_min_height_frac():
    out = CP.enforce_scale_and_margins((0, 0, 100, 100), "1:1", FW, FH, CFG,
                                       face_box=None)
    x1, y1, x2, y2 = out
    assert (y2 - y1) >= CFG.crop_min_height_frac * FH - 2


def test_enforce_never_shrinks_existing_crop():
    # The reference's shrink branch is unreachable: min_required_h starts at
    # current_h, so max_allowed_h is always raised to at least current_h
    # (gui_app.py:3121-3131). A huge crop around a tiny face stays unchanged;
    # we intentionally replicate that decision behavior.
    face = (940, 520, 980, 560)  # 40px face
    crop = (100, 0, 1180, 1080)
    out = CP.enforce_scale_and_margins(crop, "1:1", FW, FH, CFG, face_box=face)
    assert out == crop


def test_enforce_noop_when_in_bounds():
    face = (900, 400, 1060, 600)
    crop = (700, 200, 1300, 800)  # 600px tall; face frac 0.33 in [0.18, 0.42]
    out = CP.enforce_scale_and_margins(crop, "1:1", FW, FH, CFG, face_box=face)
    assert out == crop


def test_choose_best_ratio_respects_side_guard():
    ratios = ["1:1", "2:3", "3:4"]
    # face near left edge of det box
    det = (100, 100, 700, 1000)
    face = (120, 150, 280, 350)
    crop, ratio, _ = CP.choose_best_ratio(det, ratios, FW, FH, CFG,
                                          face_box=face)
    x1, y1, x2, y2 = crop
    fw = face[2] - face[0]
    want = CFG.crop_face_side_margin_frac * fw
    assert face[0] - x1 >= want - 2 or x1 == 0
    assert ratio in ratios


def test_choose_best_ratio_prefers_head_containment():
    # The head-containment term is graded (1e6 × deficit): the chosen crop's
    # deficit must be minimal among the per-ratio candidates (full repair
    # happens in the save-path post-passes, as in the reference).
    from person_capture_tpu.core.geometry import (containment_deficit_xyxy,
                                                  face_head_proxy_box)
    ratios = ["1:1", "2:3", "16:9"]
    det = (800, 300, 1100, 900)
    face = (900, 350, 1000, 470)
    head = face_head_proxy_box(face, FW, FH, CFG.crop_head_side_pad_frac,
                               CFG.crop_head_top_pad_frac,
                               CFG.crop_head_bottom_pad_frac)
    crop, ratio, _ = CP.choose_best_ratio(det, ratios, FW, FH, CFG,
                                          face_box=face)
    chosen_def = containment_deficit_xyxy(crop, head, 1.0)
    per_ratio = {}
    for rs in ratios:
        c, _, _ = CP.choose_best_ratio(det, [rs], FW, FH, CFG, face_box=face)
        per_ratio[rs] = containment_deficit_xyxy(c, head, 1.0)
    assert chosen_def <= min(per_ratio.values()) + 1e-6


def test_choose_best_ratio_no_face_prefers_small_area():
    ratios = ["1:1", "2:3", "3:4"]
    det = (900, 400, 1020, 580)  # 120x180 box: 2:3 fits exactly
    crop, ratio, tl = CP.choose_best_ratio(det, ratios, FW, FH, CFG)
    assert ratio == "2:3"
    assert tl == 0.0
    x1, y1, x2, y2 = crop
    assert x1 <= det[0] and y1 <= det[1] and x2 >= det[2] and y2 >= det[3]


def test_choose_best_ratio_exact_output_ratio():
    ratios = ["1:1", "2:3", "3:4"]
    det = (400, 200, 900, 900)
    face = (550, 250, 750, 450)
    crop, ratio, _ = CP.choose_best_ratio(det, ratios, FW, FH, CFG,
                                          face_box=face)
    rw, rh = parse_ratio(ratio)
    x1, y1, x2, y2 = crop
    assert abs((x2 - x1) / (y2 - y1) - rw / rh) < 0.05


def test_choose_best_ratio_fallback_on_bad_ratios():
    crop, ratio, tl = CP.choose_best_ratio((10, 10, 50, 50), ["bogus"],
                                           FW, FH, CFG)
    assert ratio is None or ratio == "bogus"
    assert crop[2] > crop[0] and crop[3] > crop[1]


def test_landscape_penalty_term():
    # score a fixed landscape candidate with a prominent face: the landscape
    # penalty adds weight * min(4, scale/0.12) * (asp - 1.05) to the total
    face = (880, 260, 1060, 480)   # face_h 220/1080 ≈ 0.204 -> prominent
    crop = (400, 150, 1680, 870)   # 16:9 crop containing face and head
    asp = 16 / 9
    on, _ = CP.score_ratio_candidate(crop, asp, 100000.0, face, None, FW, FH, CFG)
    cfg_off = SessionConfig(wide_face_aspect_penalty_weight=0.0)
    off, _ = CP.score_ratio_candidate(crop, asp, 100000.0, face, None, FW, FH, cfg_off)
    scale = max(180 / FW, 220 / FH)
    expected = 10.0 * min(4.0, scale / 0.12) * (asp - 1.05)
    assert on - off == pytest.approx(expected, rel=1e-6)


def test_square_pull_term():
    face = (880, 260, 1060, 480)
    crop = (400, 150, 1680, 870)
    asp = 16 / 9
    on, _ = CP.score_ratio_candidate(crop, asp, 100000.0, face, None, FW, FH, CFG)
    cfg_off = SessionConfig(square_pull_weight=0.0)
    off, _ = CP.score_ratio_candidate(crop, asp, 100000.0, face, None, FW, FH, cfg_off)
    pull = (220 / FH) - CFG.square_pull_face_min
    expected = CFG.square_pull_weight * pull * abs(asp - 1.0)
    assert on - off == pytest.approx(expected, rel=1e-6)


def test_hard_side_guard_term():
    face = (880, 260, 1060, 480)
    # crop whose left edge sits inside the wanted side margin
    crop = (860, 150, 1680, 870)
    total, _ = CP.score_ratio_candidate(crop, 1.0, 100000.0, face, None,
                                        FW, FH, CFG)
    assert total >= CP.HARD_SIDE_GUARD
