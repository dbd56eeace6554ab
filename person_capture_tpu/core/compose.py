"""Crop composition: ratio choice and scale/margin enforcement.

Host-pure re-implementations of the reference's crop heuristics with the
same hard invariants (face side-guard, head containment) and scoring terms
(softened area, placement penalties, Huber face-fraction templates, square
pull, landscape penalty). Reference contracts:
``_choose_best_ratio`` gui_app.py:3147-3328 and
``_enforce_scale_and_margins`` gui_app.py:3076-3145.

These run per *saved* frame (a handful per second of video), so they stay on
host; the hot per-frame work is the detector/embedder batch on device.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

from .geometry import (Box, IntBox, clip_to_frame, containment_deficit_xyxy,
                       expand_box_to_ratio, face_head_proxy_box, parse_ratio)

HEAD_CONTAIN_PENALTY = 1.0e6
HARD_SIDE_GUARD = 1e9


def huber(x: float, delta: float) -> float:
    ax = abs(x)
    return 0.5 * ax * ax if ax <= delta else delta * (ax - 0.5 * delta)


def enforce_scale_and_margins(
    crop_xyxy: Sequence[float], ratio_str: str, frame_w: int, frame_h: int,
    cfg, face_box: Optional[Sequence[float]] = None,
    anchor: Optional[Tuple[float, float]] = None,
) -> IntBox:
    """Grow/shrink a crop (keeping its target aspect) so the face fraction,
    side margins and minimum height bounds hold."""
    cx1, cy1, cx2, cy2 = (int(v) for v in crop_xyxy)
    current_h = float(cy2 - cy1)
    current_w = float(cx2 - cx1)
    try:
        rw, rh = parse_ratio(ratio_str)
        target_aspect = float(rw) / float(rh)
    except (ValueError, AttributeError):
        target_aspect = current_w / current_h if current_h > 0 else 1.0
        if target_aspect <= 0:
            target_aspect = 1.0

    min_required_h = current_h
    max_allowed_h = float("inf")

    if face_box is not None:
        fx1, fy1, fx2, fy2 = face_box
        face_w = float(fx2 - fx1)
        face_h = float(fy2 - fy1)
        if face_h > 0:
            min_required_h = max(min_required_h,
                                 face_h / max(cfg.face_max_frac_in_crop, 1e-6))
            want_side = float(cfg.crop_face_side_margin_frac) * face_w
            required_w = face_w + 2.0 * want_side
            min_required_h = max(min_required_h,
                                 required_w / max(target_aspect, 1e-6))
            if cfg.face_min_frac_in_crop > 0:
                max_allowed_h = min(max_allowed_h,
                                    face_h / max(cfg.face_min_frac_in_crop, 1e-6))

    min_required_h = max(min_required_h,
                         float(cfg.crop_min_height_frac) * float(frame_h))

    if max_allowed_h < min_required_h:
        max_allowed_h = min_required_h

    if current_h + 0.5 < min_required_h:
        new_h = min_required_h
    elif current_h > max_allowed_h + 0.5:
        new_h = max_allowed_h
    else:
        return cx1, cy1, cx2, cy2

    new_w = new_h * target_aspect
    if anchor is not None:
        ax, ay = anchor
    else:
        ax, ay = (cx1 + cx2) / 2.0, (cy1 + cy2) / 2.0
    return clip_to_frame(ax - new_w / 2.0, ay - new_h / 2.0,
                         ax + new_w / 2.0, ay + new_h / 2.0,
                         frame_w, frame_h)


def placement_penalty(crop_xyxy: Sequence[float],
                      face_xyxy: Optional[Sequence[float]], cfg) -> float:
    """Placement penalty: side-margin deficit, excess headroom, missing lower
    torso, face de-centering."""
    if face_xyxy is None:
        return 0.0
    cx1, cy1, cx2, cy2 = crop_xyxy
    fx1, fy1, fx2, fy2 = face_xyxy
    cw, ch = max(1.0, cx2 - cx1), max(1.0, cy2 - cy1)
    fw, fh = max(1.0, fx2 - fx1), max(1.0, fy2 - fy1)
    left = max(0.0, fx1 - cx1)
    right = max(0.0, cx2 - fx2)
    top = max(0.0, fy1 - cy1)
    bottom = max(0.0, cy2 - fy2)

    want_side = float(cfg.crop_face_side_margin_frac) * fw
    side_def = max(0.0, want_side - min(left, right)) / fw

    headroom_def = max(0.0, top / ch - float(cfg.crop_top_headroom_max_frac))

    tight = (fh / ch) >= float(cfg.tight_face_relax_thresh)
    relax = float(cfg.tight_face_relax_scale) if tight else 1.0
    want_bottom = float(cfg.crop_bottom_min_face_heights) * fh * relax
    bottom_def = max(0.0, want_bottom - bottom) / fh

    ccx, ccy = 0.5 * (cx1 + cx2), 0.5 * (cy1 + cy2)
    fcx, fcy = 0.5 * (fx1 + fx2), 0.5 * (fy1 + fy2)
    center_def = math.hypot((fcx - ccx) / cw, (fcy - ccy) / ch)
    return (side_def + headroom_def + bottom_def
            + float(cfg.crop_center_weight) * center_def)


def score_ratio_candidate(crop: Sequence[float], asp: float, det_area: float,
                          face_box: Optional[Sequence[float]],
                          head_box: Optional[Sequence[float]],
                          frame_w: int, frame_h: int, cfg
                          ) -> Tuple[float, float]:
    """Score one ratio-expanded candidate (lower is better). Returns
    ``(total, template_loss)``. All terms mirror gui_app.py:3147-3328."""
    ex1, ey1, ex2, ey2 = crop
    area = max(1, (ex2 - ex1) * (ey2 - ey1))
    area_term = pow(float(area) / float(det_area), float(cfg.area_gamma))
    total = area_term + float(cfg.crop_penalty_weight) * placement_penalty(
        crop, face_box, cfg)
    if head_box is not None:
        # hard invariant: never cut the visible head/hair; graded so the
        # least-bad candidate still wins if none can satisfy it
        total += HEAD_CONTAIN_PENALTY * containment_deficit_xyxy(
            crop, head_box, margin_px=1.0)
    tmpl_loss = 0.0

    if face_box is not None:
        fx1, fy1, fx2, fy2 = face_box
        farea = max(1.0, (fx2 - fx1) * (fy2 - fy1))
        face_frac = farea / max(1.0, float(area))
        fw = max(1.0, fx2 - fx1)
        fh = max(1.0, fy2 - fy1)

        # hard side guard: discard ratios that would cut the face
        left = max(0.0, fx1 - ex1)
        right = max(0.0, ex2 - fx2)
        want_side = float(cfg.crop_face_side_margin_frac) * fw
        if min(left, right) < want_side:
            total += HARD_SIDE_GUARD

        # area term shrinks as the face becomes prominent
        face_scale = max(fw / max(1.0, frame_w), fh / max(1.0, frame_h))
        area_scale = max(0.30, 1.0 - float(cfg.area_face_scale_weight) * face_scale)
        total += (area_scale - 1.0) * area_term

        # Huber face-fraction template loss vs close/upper/cowboy/body
        allow_close = face_scale >= float(cfg.face_target_close_min_frac)
        targets = [
            (float(cfg.face_target_upper), float(cfg.w_upper)),
            (float(cfg.face_target_cowboy), float(cfg.w_cowboy)),
            (float(cfg.face_target_body), float(cfg.w_body)),
        ]
        if allow_close:
            targets.append((float(cfg.face_target_close), float(cfg.w_close)))
        delta = float(cfg.face_target_tolerance)
        tmpl_loss = min(w * huber(face_frac - t, delta) for t, w in targets)
        total += float(cfg.lambda_facefrac) * tmpl_loss

        # square pull for prominent faces
        if (fh / max(1.0, frame_h)) > float(cfg.square_pull_face_min):
            pull = (fh / float(frame_h)) - float(cfg.square_pull_face_min)
            total += float(cfg.square_pull_weight) * pull * abs(asp - 1.0)

        # landscape penalty for prominent faces
        wide_min = max(1e-6, float(cfg.wide_face_min_frame_frac))
        wide_limit = max(1.0, float(cfg.wide_face_aspect_limit))
        if face_scale >= wide_min and asp > wide_limit:
            strength = min(4.0, face_scale / wide_min)
            total += (float(cfg.wide_face_aspect_penalty_weight)
                      * strength * (asp - wide_limit))
    return total, tmpl_loss


def choose_best_ratio(
    det_box: Sequence[float], ratios: Sequence[str], frame_w: int,
    frame_h: int, cfg, anchor: Optional[Tuple[float, float]] = None,
    face_box: Optional[Sequence[float]] = None,
) -> Tuple[IntBox, Optional[str], float]:
    """Expand ``det_box`` to each candidate ratio and pick the best-scoring
    crop. Returns ``(crop, ratio_str, template_loss)``."""
    x1, y1, x2, y2 = det_box
    det_area = max(1, (x2 - x1) * (y2 - y1))
    head_box = face_head_proxy_box(
        face_box, frame_w, frame_h,
        side_pad_frac=cfg.crop_head_side_pad_frac,
        top_pad_frac=cfg.crop_head_top_pad_frac,
        bottom_pad_frac=cfg.crop_head_bottom_pad_frac)

    best: Optional[IntBox] = None
    best_ratio: Optional[str] = None
    best_score = 1e9
    best_template_loss = 0.0

    for rs in ratios:
        try:
            rw, rh = parse_ratio(rs)
        except (ValueError, AttributeError):
            continue
        # dynamic head bias pushes framing downward to include torso
        hb = 0.0
        if face_box is not None:
            fbh = max(1.0, face_box[3] - face_box[1])
            bh = max(1.0, y2 - y1)
            hb = -float(cfg.face_anchor_down_frac) * (fbh / bh)
        ex1, ey1, ex2, ey2 = expand_box_to_ratio(
            x1, y1, x2, y2, rw, rh, frame_w, frame_h, anchor=anchor,
            head_bias=hb)
        crop = (ex1, ey1, ex2, ey2)
        total, tmpl_loss = score_ratio_candidate(
            crop, rw / rh, det_area, face_box, head_box, frame_w, frame_h, cfg)
        if total < best_score:
            best_score = total
            best = (int(round(ex1)), int(round(ey1)),
                    int(round(ex2)), int(round(ey2)))
            best_ratio = rs
            best_template_loss = tmpl_loss

    if best is None:
        try:
            rw, rh = parse_ratio(str(ratios[0]))
            ex1, ey1, ex2, ey2 = expand_box_to_ratio(
                x1, y1, x2, y2, rw, rh, frame_w, frame_h, anchor=anchor,
                head_bias=0.0)
            best = (int(round(ex1)), int(round(ey1)),
                    int(round(ex2)), int(round(ey2)))
            best_ratio = str(ratios[0])
        except (ValueError, IndexError, AttributeError):
            best = (int(round(x1)), int(round(y1)),
                    int(round(x2)), int(round(y2)))
            best_ratio = None
        best_template_loss = 0.0
    return best, best_ratio, best_template_loss
