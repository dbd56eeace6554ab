"""Profile-based dataset crop composer.

Behavior port of the reference's final crop composer
(person_capture/gui_app.py:2113-3074): after identity is decided, build
candidate crops from semantic profiles (close / portrait_close / upper /
wide_context / body / base), each with its own protect box, target
face-height fraction, anchor and minimum size; score candidates by
containment deficits + profile/ratio priors + face-height loss + area +
placement; apply the portrait-override of square winners and the ratio
fallback ladder. Deterministic variety oscillators (body/wide/square
cadence) key off the frame index.

All helpers are pure host functions; the few-per-second call rate keeps
them off the device path.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

from .geometry import (Box, IntBox, clip_to_frame, coerce_box_xyxy,
                       containment_deficit_xyxy, face_head_proxy_box,
                       pad_box_xyxy, parse_ratio, union_boxes_xyxy)

LANDSCAPE_ASPECT = 1.05


def _aspect(rs: str) -> Optional[float]:
    try:
        rw, rh = parse_ratio(rs)
        return float(rw) / max(1e-6, float(rh))
    except (ValueError, AttributeError):
        return None


def _is_landscape(rs: str) -> bool:
    a = _aspect(rs)
    return a is not None and a > LANDSCAPE_ASPECT


def wide_context_cadence_active(cfg, frame_idx: Optional[int]) -> bool:
    period = max(0, int(cfg.compose_wide_context_every_n))
    return period > 0 and frame_idx is not None and int(frame_idx) % period == 0


def effective_wide_context_max_frame_frac(cfg, wide_cadence: bool) -> float:
    m = max(0.08, min(0.32, float(cfg.compose_wide_context_max_frame_face_frac)))
    if wide_cadence:
        m = max(m + 0.12, 0.32)
    return max(0.08, min(0.34, m))


def ratio_crop_containing_box(protect_xyxy: Sequence[float], ratio_str: str,
                              bounds_xyxy: Sequence[int],
                              anchor: Optional[Tuple[float, float]] = None,
                              min_size_xy: Optional[Tuple[float, float]] = None
                              ) -> IntBox:
    """Smallest in-bounds crop of the exact ratio that tries to contain the
    protected box; may grow after clamping (unlike expand_box_to_ratio)."""
    bx1, by1, bx2, by2 = (float(v) for v in bounds_xyxy)
    bounds_w = max(1.0, bx2 - bx1)
    bounds_h = max(1.0, by2 - by1)
    px1, py1, px2, py2 = (float(v) for v in protect_xyxy)
    px1 = max(bx1, min(bx2, px1))
    py1 = max(by1, min(by2, py1))
    px2 = max(px1 + 1.0, min(bx2, px2))
    py2 = max(py1 + 1.0, min(by2, py2))
    try:
        rw, rh = parse_ratio(str(ratio_str))
        target = max(1e-6, float(rw) / float(rh))
    except (ValueError, AttributeError):
        target = 1.0

    need_w = max(1.0, px2 - px1)
    need_h = max(1.0, py2 - py1)
    if min_size_xy is not None:
        need_w = max(need_w, float(min_size_xy[0]))
        need_h = max(need_h, float(min_size_xy[1]))

    crop_w = max(need_w, need_h * target)
    crop_h = crop_w / target
    if crop_h < need_h:
        crop_h = need_h
        crop_w = crop_h * target

    if (bounds_w / bounds_h) >= target:
        max_h, max_w = bounds_h, bounds_h * target
    else:
        max_w, max_h = bounds_w, bounds_w / target
    crop_w = min(crop_w, max_w)
    crop_h = min(crop_h, max_h)

    if anchor is not None:
        ax, ay = float(anchor[0]), float(anchor[1])
    else:
        ax, ay = (px1 + px2) * 0.5, (py1 + py2) * 0.5
    ax = max(bx1, min(bx2, ax))
    ay = max(by1, min(by2, ay))

    x1 = ax - crop_w * 0.5
    y1 = ay - crop_h * 0.5

    # containment shift (exact-legacy when the box fits; anchor-centered when
    # containment is impossible on an axis)
    if (px2 - px1) <= crop_w + 1e-6:
        if px1 < x1:
            x1 = px1
        if px2 > x1 + crop_w:
            x1 = px2 - crop_w
    else:
        x_anchor = ax if px1 <= ax <= px2 else (px1 + px2) * 0.5
        x1 = x_anchor - crop_w * 0.5
    if (py2 - py1) <= crop_h + 1e-6:
        if py1 < y1:
            y1 = py1
        if py2 > y1 + crop_h:
            y1 = py2 - crop_h
    else:
        y_anchor = ay if py1 <= ay <= py2 else (py1 + py2) * 0.5
        y1 = y_anchor - crop_h * 0.5

    x1 = max(bx1, min(bx2 - crop_w, x1))
    y1 = max(by1, min(by2 - crop_h, y1))
    x2 = x1 + crop_w
    y2 = y1 + crop_h

    ibx1 = int(math.ceil(bx1))
    iby1 = int(math.ceil(by1))
    ibx2 = int(math.floor(bx2))
    iby2 = int(math.floor(by2))
    if ibx2 <= ibx1:
        ibx1 = int(round(bx1))
        ibx2 = max(ibx1 + 1, int(round(bx2)))
    if iby2 <= iby1:
        iby1 = int(round(by1))
        iby2 = max(iby1 + 1, int(round(by2)))
    lx1, ly1, lx2, ly2 = clip_to_frame(
        x1 - ibx1, y1 - iby1, x2 - ibx1, y2 - iby1,
        ibx2 - ibx1, iby2 - iby1)
    return ibx1 + lx1, iby1 + ly1, ibx1 + lx2, iby1 + ly2


def prefer_lower_face_crop_y(crop_xyxy: Sequence[float],
                             face_xyxy: Optional[Sequence[float]],
                             head_xyxy: Optional[Sequence[float]],
                             bounds_xyxy: Sequence[int],
                             profile: str) -> IntBox:
    """Final placement pass: slide a finished face crop downward when that
    only removes top headroom, preserving ratio/size."""
    as_int = tuple(int(round(float(v))) for v in crop_xyxy)
    if face_xyxy is None or str(profile or "").lower() == "body":
        return as_int
    face = coerce_box_xyxy(face_xyxy, bounds_xyxy)
    if face is None:
        return as_int
    bx1, by1, bx2, by2 = (float(v) for v in bounds_xyxy)
    cx1, cy1, cx2, cy2 = (float(v) for v in crop_xyxy)
    crop_w = max(1.0, cx2 - cx1)
    crop_h = max(1.0, cy2 - cy1)
    max_y1 = by2 - crop_h
    if max_y1 <= by1 + 1.0:
        return as_int
    fx1, fy1, fx2, fy2 = face
    fh = max(1.0, fy2 - fy1)
    head = coerce_box_xyxy(head_xyxy, bounds_xyxy) if head_xyxy is not None else None
    top_guard = fy1
    if head is not None:
        proxy_top = min(float(head[1]), fy1)
        top_guard = max(fy1 - 0.45 * fh, proxy_top)
    top_guard = max(by1, min(by2, top_guard))
    top_margin = max(4.0, min(0.055 * fh, 0.030 * crop_h))
    bottom_margin = max(4.0, min(0.10 * fh, 0.075 * crop_h))
    hard_low = max(by1, fy2 + 1.0 - crop_h)
    hard_high = min(max_y1, fy1 - 1.0)
    if hard_high < hard_low:
        return as_int
    pref_low = max(hard_low, fy2 + bottom_margin - crop_h)
    pref_high = min(hard_high, top_guard - top_margin)
    target_y1 = pref_high if pref_high >= pref_low else hard_high
    if target_y1 <= cy1 + 1.0:
        return as_int
    y1 = max(by1, min(max_y1, target_y1))
    return (int(round(cx1)), int(round(y1)),
            int(round(cx1 + crop_w)), int(round(y1 + crop_h)))


def compose_dataset_crop(cfg,
                         base_crop_xyxy: Sequence[float],
                         ratio_candidates: Sequence[str],
                         bounds_xyxy: Sequence[int],
                         subject_box: Optional[Sequence[float]] = None,
                         face_box: Optional[Sequence[float]] = None,
                         frame_idx: Optional[int] = None
                         ) -> Tuple[IntBox, str, str]:
    """Compose the final dataset crop. Returns (crop, ratio_str, profile)."""
    bx1, by1, bx2, by2 = (int(v) for v in bounds_xyxy)
    bounds = (bx1, by1, bx2, by2)
    bound_w = max(1.0, float(bx2 - bx1))
    bound_h = max(1.0, float(by2 - by1))
    bound_area = bound_w * bound_h

    user_ratios: List[str] = []
    for rs in (str(r).strip() for r in (ratio_candidates or [])):
        if not rs or rs in user_ratios:
            continue
        if _aspect(rs) is not None:
            user_ratios.append(rs)

    def ratio_list_for_profile(profile: str) -> List[str]:
        preferred = {
            "close": ["1:1", "2:3", "3:4"],
            "portrait_close": ["2:3", "3:4"],
            "upper": ["2:3", "3:4", "1:1"],
            "body": ["2:3", "3:4", "1:1", "3:2"],
            "wide_context": ["3:2", "4:3", "16:9"],
            "base": ["1:1", "2:3"],
        }.get(profile, ["1:1", "2:3"])
        allow_landscape = profile in ("body", "wide_context")
        available = user_ratios if user_ratios else preferred
        out: List[str] = []

        def add(rs: str) -> None:
            a = _aspect(rs)
            if a is None:
                return
            if a > LANDSCAPE_ASPECT and not allow_landscape:
                return
            if rs not in out:
                out.append(rs)

        for rs in preferred:
            if rs in available:
                add(rs)
        for rs in available:
            add(rs)
        if out:
            return out
        return [] if user_ratios else ["1:1", "2:3"]

    def landscape_available() -> bool:
        if user_ratios:
            return any(_is_landscape(rs) for rs in user_ratios)
        return True

    base = coerce_box_xyxy(base_crop_xyxy, bounds)
    subj = coerce_box_xyxy(subject_box, bounds)
    face = coerce_box_xyxy(face_box, bounds)
    if base is None:
        base = face or subj or (bx1, by1, bx2, by2)

    head = face_head_proxy_box(face, bx2, by2,
                               cfg.crop_head_side_pad_frac,
                               cfg.crop_head_top_pad_frac,
                               cfg.crop_head_bottom_pad_frac) \
        if face is not None else None
    head = coerce_box_xyxy(head, bounds)
    face_protect = union_boxes_xyxy(head, face) or face
    face_hard_protect = face  # the detected face is the hard invariant

    # profile list: (name, protect, target_face_h_frac, anchor, min_size)
    profiles: List[Tuple[str, Box, float, Tuple[float, float],
                         Tuple[float, float]]] = []
    face_h = 0.0
    face_frame_frac = 0.0
    room_below_face = 0.0
    portrait_close_eligible = False
    SMALL_FACE = 0.12
    UPPER_SMALL_PROFILE_NUDGE = 0.10
    UPPER_SMALL_SQUARE_NUDGE = 0.16
    CLOSE_SMALL_FACE_PENALTY = 0.55
    UPPER_SMALL_FACE_LOSS_NUDGE = 0.12
    subj_h_frac = ((subj[3] - subj[1]) / bound_h) if subj is not None else 0.0
    body_period = max(0, int(cfg.compose_body_every_n))
    body_cadence = (body_period > 0 and frame_idx is not None
                    and int(frame_idx) % body_period == 0)
    wide_period = max(0, int(cfg.compose_wide_context_every_n))
    wide_cadence = wide_context_cadence_active(cfg, frame_idx)
    square_cadence = (wide_period > 1 and frame_idx is not None
                      and int(frame_idx) % wide_period == max(1, wide_period // 2))
    eff_wide_max = effective_wide_context_max_frame_frac(cfg, wide_cadence)
    wide_min_side = max(0.0, min(4.0, float(
        cfg.compose_wide_context_min_side_face_heights)))
    eff_wide_min_side = wide_min_side * (0.70 if wide_cadence else 1.0)

    if face is not None:
        fx1, fy1, fx2, fy2 = face
        fw = max(1.0, fx2 - fx1)
        face_h = max(1.0, fy2 - fy1)
        fcx, fcy = 0.5 * (fx1 + fx2), 0.5 * (fy1 + fy2)
        face_frame_frac = face_h / bound_h
        room_below_face = max(0.0, float(by2) - float(fy2))
        portrait_close_eligible = (0.14 <= face_frame_frac <= 0.56
                                   and room_below_face >= 0.35 * face_h)
        hx1, hy1, hx2, hy2 = face_protect or face

        close_target = max(0.20, min(0.46, float(cfg.compose_close_face_h_frac)))
        upper_target = max(0.12, min(0.34, float(cfg.compose_upper_face_h_frac)))
        body_target = max(0.035, min(0.16, float(cfg.compose_body_face_h_frac)))
        wide_enabled = bool(cfg.compose_wide_context_enable)
        wide_target = max(0.08, min(0.26, float(cfg.compose_wide_context_face_h_frac)))

        close_protect = pad_box_xyxy(
            (hx1, hy1, hx2, max(hy2, fy2 + 0.85 * face_h)),
            pad_x=0.12 * fw, pad_y_top=0.0, pad_y_bottom=0.45 * face_h,
            bounds_xyxy=bounds) or (hx1, hy1, hx2, max(hy2, fy2 + 0.85 * face_h))
        profiles.append(("close", close_protect, close_target,
                         (fcx, fcy + 0.70 * face_h),
                         (fw * 2.0, face_h / close_target)))

        portrait_target = max(0.34, min(0.48,
                                        float(cfg.compose_portrait_close_face_h_frac)))
        if subj is not None:
            sx1, sy1, sx2, sy2 = subj
            sw, sh = max(1.0, sx2 - sx1), max(1.0, sy2 - sy1)
            torso_cx = 0.5 * (sx1 + sx2)
            p_bottom = min(float(by2), max(fy2 + 1.70 * face_h, sy1 + 0.34 * sh))
            p_half_w = max(1.05 * fw, 0.30 * sw)
            p_top = min(hy1, sy1)
            portrait_protect = (max(float(bx1), min(hx1, torso_cx - p_half_w)),
                                max(float(by1), p_top),
                                min(float(bx2), max(hx2, torso_cx + p_half_w)),
                                p_bottom)
            portrait_anchor = (torso_cx, 0.5 * (p_top + p_bottom))
        else:
            portrait_protect = pad_box_xyxy(
                (hx1, hy1, hx2, max(hy2, fy2 + 1.45 * face_h)),
                pad_x=0.18 * fw, pad_y_top=0.0, pad_y_bottom=0.35 * face_h,
                bounds_xyxy=bounds) or (hx1, hy1, hx2,
                                        max(hy2, fy2 + 1.45 * face_h))
            portrait_anchor = (fcx, fcy + 1.05 * face_h)
        profiles.append(("portrait_close", portrait_protect, portrait_target,
                         portrait_anchor, (fw * 2.05, face_h / portrait_target)))

        if subj is not None:
            sx1, sy1, sx2, sy2 = subj
            sw, sh = max(1.0, sx2 - sx1), max(1.0, sy2 - sy1)
            u_bottom = min(float(by2), max(fy2 + 3.6 * face_h, sy1 + 0.58 * sh))
            u_half_w = max(1.15 * fw, 0.48 * sw)
            u_top = min(hy1, sy1)
            upper_protect = (max(float(bx1), min(hx1, 0.5 * (sx1 + sx2) - u_half_w)),
                             max(float(by1), u_top),
                             min(float(bx2), max(hx2, 0.5 * (sx1 + sx2) + u_half_w)),
                             u_bottom)
            upper_anchor = (0.5 * (sx1 + sx2), 0.5 * (u_top + u_bottom))
        else:
            upper_protect = pad_box_xyxy(
                (hx1, hy1, hx2, max(hy2, fy2 + 2.6 * face_h)),
                pad_x=0.35 * fw, pad_y_top=0.0, pad_y_bottom=0.55 * face_h,
                bounds_xyxy=bounds) or (hx1, hy1, hx2,
                                        max(hy2, fy2 + 2.6 * face_h))
            upper_anchor = (fcx, fcy + 1.45 * face_h)
        profiles.append(("upper", upper_protect, upper_target, upper_anchor,
                         (fw * 2.8, face_h / upper_target)))

        if wide_enabled and landscape_available() and face_frame_frac <= eff_wide_max:
            side_room_fh = min(max(0.0, float(fx1) - bx1),
                               max(0.0, bx2 - float(fx2))) / max(1.0, face_h)
            if side_room_fh >= eff_wide_min_side:
                if subj is not None:
                    sx1, sy1, sx2, sy2 = subj
                    sw, sh = max(1.0, sx2 - sx1), max(1.0, sy2 - sy1)
                    subj_cx = 0.5 * (sx1 + sx2)
                    w_bottom = min(float(by2), max(fy2 + 2.4 * face_h,
                                                   sy1 + 0.70 * sh))
                    w_half_w = max(2.2 * fw, 0.62 * sw)
                    w_top = min(hy1, max(float(by1), sy1 - 0.05 * sh))
                    wide_anchor = (subj_cx, 0.5 * (w_top + w_bottom))
                else:
                    w_bottom = min(float(by2), max(hy2, fy2 + 2.8 * face_h))
                    w_half_w = max(2.4 * fw, 0.45 * float(bx2 - bx1))
                    w_top = hy1
                    wide_anchor = (fcx, fcy + 1.20 * face_h)
                wide_protect = (max(float(bx1), min(hx1, wide_anchor[0] - w_half_w)),
                                max(float(by1), w_top),
                                min(float(bx2), max(hx2, wide_anchor[0] + w_half_w)),
                                w_bottom)
                if subj is not None:
                    wide_protect = union_boxes_xyxy(wide_protect, subj) or wide_protect
                profiles.append(("wide_context", wide_protect, wide_target,
                                 wide_anchor,
                                 (max(fw * 4.0, w_half_w * 2.0),
                                  face_h / wide_target)))

        if subj is not None:
            sx1, sy1, sx2, sy2 = subj
            sw, sh = max(1.0, sx2 - sx1), max(1.0, sy2 - sy1)
            body_box = pad_box_xyxy(
                subj, pad_x=max(0.07 * sw, 0.35 * fw),
                pad_y_top=max(0.025 * sh, 0.25 * face_h),
                pad_y_bottom=max(0.035 * sh, 0.35 * face_h),
                bounds_xyxy=bounds) or subj
            profiles.append(("body", body_box, body_target,
                             ((sx1 + sx2) * 0.5, (sy1 + sy2) * 0.5), (sw, sh)))
    elif subj is not None:
        sx1, sy1, sx2, sy2 = subj
        profiles.append(("body", subj, float(cfg.compose_body_face_h_frac),
                         ((sx1 + sx2) * 0.5, (sy1 + sy2) * 0.5),
                         (max(1.0, sx2 - sx1), max(1.0, sy2 - sy1))))
    else:
        b = base or (bx1, by1, bx2, by2)
        profiles.append(("base", b, 0.20,
                         ((b[0] + b[2]) * 0.5, (b[1] + b[3]) * 0.5),
                         (b[2] - b[0], b[3] - b[1])))

    def square_rescue_allowed() -> bool:
        if not portrait_close_eligible or face is None:
            return True
        if user_ratios and not any(rs in user_ratios for rs in ("2:3", "3:4")):
            return True
        fx1, fy1, fx2, fy2 = face
        fw_l = max(1.0, fx2 - fx1)
        fh_l = max(1.0, fy2 - fy1)
        side_room = min(float(fx1 - bx1), float(bx2 - fx2))
        return bool(side_room < 0.24 * fw_l
                    or room_below_face < 0.50 * fh_l
                    or face_frame_frac >= 0.50)

    best: Optional[Tuple[float, IntBox, str, str]] = None
    best_portrait_alt = None
    best_useful_portrait_alt = None

    def portrait_useful(fh_frac, side_m, bottom_m) -> bool:
        return bool(0.18 <= fh_frac <= 0.50 and bottom_m >= 0.28
                    and side_m >= 0.10)

    def maybe_portrait_alt(score, crop, rs, profile, actual_fh_frac):
        nonlocal best_portrait_alt, best_useful_portrait_alt
        if face is None or profile not in ("close", "portrait_close", "upper") \
                or rs not in ("2:3", "3:4"):
            return
        cx1, _, cx2, cy2 = (float(v) for v in crop)
        fx1, fy1, fx2, fy2 = (float(v) for v in face)
        fw_l = max(1.0, fx2 - fx1)
        fh_l = max(1.0, fy2 - fy1)
        side_m = min(max(0.0, fx1 - cx1), max(0.0, cx2 - fx2)) / fw_l
        bottom_m = max(0.0, cy2 - fy2) / fh_l
        cand = (score, crop, rs, profile, actual_fh_frac, side_m, bottom_m)
        if best_portrait_alt is None or cand[0] < best_portrait_alt[0]:
            best_portrait_alt = cand
        if portrait_useful(actual_fh_frac, side_m, bottom_m):
            if best_useful_portrait_alt is None \
                    or cand[0] < best_useful_portrait_alt[0]:
                best_useful_portrait_alt = cand

    for profile, protect_raw, target_fh_frac, anchor, min_size in profiles:
        protect = coerce_box_xyxy(protect_raw, bounds)
        if protect is None:
            continue
        px1, py1, px2, py2 = protect
        min_w = max(float(min_size[0]), max(1.0, px2 - px1))
        min_h = max(float(min_size[1]), max(1.0, py2 - py1))

        for rs in ratio_list_for_profile(profile):
            aspect = _aspect(rs)
            if aspect is None:
                continue
            is_landscape = aspect > LANDSCAPE_ASPECT
            if profile in ("close", "portrait_close", "upper", "base") and is_landscape:
                continue
            if profile == "portrait_close" and rs == "1:1" and portrait_close_eligible:
                continue
            if profile == "body" and is_landscape:
                if subj is None:
                    continue
                if face is not None and face_frame_frac >= 0.12:
                    continue
                if subj_h_frac < 0.60:
                    continue
            if profile == "wide_context":
                if not is_landscape or face is None:
                    continue
                if face_frame_frac > eff_wide_max:
                    continue

            crop = ratio_crop_containing_box(protect, rs, bounds,
                                             anchor=anchor,
                                             min_size_xy=(min_w, min_h))
            cx1, cy1, cx2, cy2 = crop
            crop_w = max(1.0, float(cx2 - cx1))
            crop_h = max(1.0, float(cy2 - cy1))
            crop_area = crop_w * crop_h

            face_deficit = containment_deficit_xyxy(crop, face_hard_protect, 1.0) \
                if face_hard_protect is not None else 0.0
            head_deficit = containment_deficit_xyxy(crop, face_protect, 1.0) \
                if face_protect is not None else 0.0
            body_deficit = containment_deficit_xyxy(crop, subj, 1.0) \
                if (profile in ("body", "wide_context") and subj is not None) else 0.0
            protect_deficit = containment_deficit_xyxy(crop, protect, 1.0)
            if face_deficit > 0.01:
                continue
            if body_deficit > 0.02:
                continue
            containment = (120.0 * face_deficit + 30.0 * head_deficit
                           + 120.0 * body_deficit + 18.0 * protect_deficit)

            ratio_prior = 0.0
            if profile == "close":
                profile_prior = 0.0
                ratio_prior += 0.0 if rs == "1:1" else 0.08
                if portrait_close_eligible:
                    profile_prior += 0.20
                    if rs == "1:1" and not square_rescue_allowed():
                        ratio_prior += 0.42
            elif profile == "portrait_close":
                profile_prior = -0.38 if portrait_close_eligible else 0.30
                if rs == "2:3":
                    ratio_prior -= 0.16 if portrait_close_eligible else -0.02
                elif rs == "3:4":
                    ratio_prior += 0.02 if portrait_close_eligible else 0.04
                elif rs == "1:1":
                    ratio_prior += 1.25
                else:
                    ratio_prior += 0.24
            elif profile == "upper":
                profile_prior = 0.12
                ratio_prior += 0.0 if rs == "2:3" else 0.06
                if portrait_close_eligible and rs == "1:1" \
                        and not square_rescue_allowed():
                    ratio_prior += 0.48
                if face is not None and face_frame_frac < SMALL_FACE:
                    profile_prior -= UPPER_SMALL_PROFILE_NUDGE
                    if rs == "1:1":
                        ratio_prior += UPPER_SMALL_SQUARE_NUDGE
                if square_cadence and rs == "1:1" and not portrait_close_eligible:
                    profile_prior -= 0.10
                    ratio_prior -= 0.16
            elif profile == "wide_context":
                lp = max(0.0, min(20.0, float(cfg.compose_landscape_face_penalty)))
                profile_prior = max(-0.25, min(1.50,
                                               float(cfg.compose_wide_context_prior)))
                if is_landscape:
                    ratio_prior -= 0.26
                else:
                    ratio_prior += 2.0
                over = max(0.0, face_frame_frac - eff_wide_max)
                ratio_prior += lp * 4.0 * over
                if wide_cadence:
                    profile_prior -= 0.72
                    ratio_prior -= 0.20
                actual_probe = face_h / max(1.0, crop_h)
                if actual_probe > 0.30:
                    ratio_prior += lp * (actual_probe - 0.30)
                if subj is None:
                    profile_prior += 0.08
            elif profile == "body":
                lp = max(0.0, min(20.0, float(cfg.compose_landscape_face_penalty)))
                profile_prior = 0.78
                if body_cadence and face_frame_frac < 0.10 and subj_h_frac > 0.62:
                    profile_prior -= 0.076 * lp
                if face is not None and face_frame_frac >= 0.10:
                    profile_prior += 0.70
                if is_landscape:
                    profile_prior += 0.70
                if rs == "2:3":
                    pass
                elif rs == "3:4":
                    ratio_prior += 0.08
                elif rs == "1:1":
                    ratio_prior += 0.12
                    if square_cadence:
                        profile_prior -= 0.08
                        ratio_prior -= 0.18
                else:
                    ratio_prior += 0.30
                if is_landscape and subj is not None:
                    subj_aspect = (subj[2] - subj[0]) / max(1.0, subj[3] - subj[1])
                    if subj_aspect < 0.72:
                        ratio_prior += 0.12 * lp
            else:
                profile_prior = 0.35

            if face is not None:
                actual_fh_frac = face_h / crop_h
                face_loss = abs(actual_fh_frac - max(1e-6, target_fh_frac))
                if profile == "close" and face_frame_frac < SMALL_FACE:
                    profile_prior += CLOSE_SMALL_FACE_PENALTY
                if profile == "portrait_close" and not portrait_close_eligible:
                    profile_prior += 0.40
                if profile == "upper" and face_frame_frac < SMALL_FACE:
                    profile_prior -= UPPER_SMALL_FACE_LOSS_NUDGE
            else:
                actual_fh_frac = 0.0
                face_loss = 0.0

            area_penalty = 0.08 * (crop_area / bound_area)
            if profile not in ("body", "wide_context") \
                    and crop_area / bound_area > 0.72:
                area_penalty += 0.35

            placement = 0.0
            if face is not None and profile in ("close", "portrait_close",
                                                "upper", "wide_context"):
                fcx_l = 0.5 * (face[0] + face[2])
                fcy_l = 0.5 * (face[1] + face[3])
                rel_x = (fcx_l - cx1) / crop_w
                rel_y = (fcy_l - cy1) / crop_h
                if subj is not None and profile in ("portrait_close", "upper",
                                                    "wide_context"):
                    scx = 0.5 * (subj[0] + subj[2])
                    placement += 0.18 * abs((scx - cx1) / crop_w - 0.50)
                    face_x_weight = 0.16
                else:
                    face_x_weight = 0.25
                placement += face_x_weight * abs(rel_x - 0.50)
                if profile == "close":
                    target_y = 0.36
                elif profile == "portrait_close":
                    target_y = 0.27 if subj is not None else 0.33
                elif profile == "upper":
                    target_y = 0.22 if subj is not None else 0.28
                else:
                    target_y = 0.32 if subj is not None else 0.38
                placement += 0.35 * abs(rel_y - target_y)

            if subj is not None and profile in ("upper", "body", "wide_context"):
                sx1, sy1, sx2, sy2 = subj
                sh = max(1.0, sy2 - sy1)
                scx = 0.5 * (sx1 + sx2)
                if profile == "upper" and face is not None:
                    u_bottom = min(float(by2), max(face[3] + 3.6 * face_h,
                                                   sy1 + 0.58 * sh))
                    body_cy = 0.5 * (min(sy1, face[1]) + u_bottom)
                    y_weight = 0.24
                elif profile == "wide_context" and face is not None:
                    body_cy = 0.5 * (min(sy1, face[1])
                                     + min(float(by2),
                                           max(face[3] + 2.4 * face_h,
                                               sy1 + 0.70 * sh)))
                    y_weight = 0.16
                else:
                    body_cy = 0.5 * (sy1 + sy2)
                    y_weight = 0.20
                placement += 0.16 * abs((scx - cx1) / crop_w - 0.50)
                placement += y_weight * abs((body_cy - cy1) / crop_h - 0.50)

            score = (containment + profile_prior + ratio_prior
                     + 2.2 * face_loss + area_penalty + placement)
            maybe_portrait_alt(score, crop, rs, profile, actual_fh_frac)
            if best is None or score < best[0]:
                best = (score, crop, rs, profile)

    if best is not None:
        best_score, crop, rs, profile = best
        if (face is not None and rs == "1:1"
                and profile in ("close", "portrait_close", "upper")
                and best_portrait_alt is not None):
            cand = best_useful_portrait_alt or best_portrait_alt
            (p_score, p_crop, p_rs, p_profile, p_fh, p_side, p_bottom) = cand
            if (portrait_useful(p_fh, p_side, p_bottom)
                    and p_score <= best_score + 0.85
                    and not square_rescue_allowed()):
                return p_crop, p_rs, p_profile
        return crop, rs, profile

    # ---- ratio fallback ladder -----------------------------------------
    fallback_protect = face_hard_protect or subj or base or (bx1, by1, bx2, by2)
    fallback_ratio = None
    fallback_profile = "fallback"

    def wide_ok() -> bool:
        if face is None or not bool(cfg.compose_wide_context_enable) \
                or face_frame_frac > eff_wide_max:
            return False
        fx1_f, fy1_f, fx2_f, fy2_f = (float(v) for v in face)
        side_room_fh = min(max(0.0, fx1_f - bx1),
                           max(0.0, bx2 - fx2_f)) / max(1.0, fy2_f - fy1_f)
        return side_room_fh >= eff_wide_min_side

    for rs in user_ratios:
        aspect = _aspect(rs)
        if aspect is None:
            continue
        if aspect > LANDSCAPE_ASPECT:
            if wide_ok():
                fallback_profile = "wide_context"
                fallback_protect = subj or face_protect or face or base \
                    or (bx1, by1, bx2, by2)
            else:
                if subj is None:
                    continue
                if face is not None and face_frame_frac >= SMALL_FACE:
                    continue
                if subj_h_frac < 0.60:
                    continue
                fallback_profile = "body"
                fallback_protect = subj or base or face_hard_protect \
                    or (bx1, by1, bx2, by2)
        fallback_ratio = rs
        break

    if fallback_ratio is None:
        if portrait_close_eligible:
            preferred = ("2:3", "3:4", "1:1")
        elif square_cadence and face_hard_protect is not None:
            preferred = ("1:1", "2:3", "3:4")
        elif face_hard_protect is not None and face_frame_frac >= 0.16:
            preferred = ("1:1", "2:3", "3:4")
        else:
            preferred = ("2:3", "3:4", "1:1")
        available = user_ratios or list(preferred)
        fallback_ratio = next((rs for rs in preferred if rs in available),
                              available[0] if available else "2:3")
        fallback_profile = "fallback"
        fb_aspect = _aspect(fallback_ratio) or 1.0
        if fb_aspect > LANDSCAPE_ASPECT:
            if wide_ok():
                fallback_profile = "wide_context"
                fallback_protect = subj or face_protect or face or base \
                    or (bx1, by1, bx2, by2)
            elif (subj is not None and face_frame_frac < SMALL_FACE
                  and subj_h_frac >= 0.60):
                fallback_profile = "body"
                fallback_protect = subj or base or face_hard_protect \
                    or (bx1, by1, bx2, by2)
    crop = ratio_crop_containing_box(fallback_protect, fallback_ratio, bounds)
    return crop, fallback_ratio, fallback_profile
