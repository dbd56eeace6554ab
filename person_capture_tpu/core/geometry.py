"""Box / ratio geometry primitives.

Behavior-compatible with the reference helpers in
``person_capture/utils.py:101-268`` and ``person_capture/gui_app.py:1909-2112``
(expand-to-exact-ratio, black-border detection, crop clipping, padding,
containment deficits), re-implemented vectorized from the written contracts.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]
IntBox = Tuple[int, int, int, int]


def clamp(v: float, lo: float, hi: float) -> float:
    return max(lo, min(hi, v))


def parse_ratio(s: str) -> Tuple[float, float]:
    """Parse ``"W:H"`` into a float pair (reference: utils.py:101)."""
    w, h = s.split(":")
    return float(w), float(h)


def parse_ratio_list(s: str) -> list[Tuple[float, float]]:
    """Parse a comma-separated ratio list like ``"1:1,2:3,3:4"``."""
    out = []
    for part in s.split(","):
        part = part.strip()
        if part:
            out.append(parse_ratio(part))
    return out


def l2_normalize(x: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    n = float(np.linalg.norm(x)) + eps
    return x / n


def cosine_distance(a: Iterable[float], b: Iterable[float]) -> float:
    """1 - cosine similarity with 1e-9 norm guards (reference: utils.py:260)."""
    va = np.asarray(a, dtype=np.float32).reshape(-1)
    vb = np.asarray(b, dtype=np.float32).reshape(-1)
    na = float(np.linalg.norm(va)) + 1e-9
    nb = float(np.linalg.norm(vb)) + 1e-9
    return 1.0 - float(np.dot(va / na, vb / nb))


def crop_img(frame: np.ndarray, box: Sequence[float]) -> np.ndarray:
    x1, y1, x2, y2 = (int(v) for v in box)
    return frame[y1:y2, x1:x2]


def box_iou(a: Sequence[float], b: Sequence[float]) -> float:
    ax1, ay1, ax2, ay2 = (float(v) for v in a)
    bx1, by1, bx2, by2 = (float(v) for v in b)
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax2, bx2), min(ay2, by2)
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    area_a = max(0.0, ax2 - ax1) * max(0.0, ay2 - ay1)
    area_b = max(0.0, bx2 - bx1) * max(0.0, by2 - by1)
    denom = area_a + area_b - inter
    return inter / denom if denom > 0 else 0.0


def expand_box_to_ratio(
    x1: float, y1: float, x2: float, y2: float,
    ratio_w: float, ratio_h: float,
    frame_w: int, frame_h: int,
    anchor: Optional[Tuple[float, float]] = None,
    head_bias: float = 0.0,
) -> IntBox:
    """Return a box of EXACT ``ratio_w:ratio_h`` containing the input box,
    inside the frame (reference contract: utils.py:198-257).

    Expand minimally around the (possibly head-biased) anchor/center, clamp to
    the frame, then shrink symmetrically to restore the exact ratio if the
    clamp broke it.
    """
    x1, y1, x2, y2 = float(x1), float(y1), float(x2), float(y2)
    bw = max(1.0, x2 - x1)
    bh = max(1.0, y2 - y1)
    target = float(ratio_w) / float(ratio_h)

    if anchor is not None:
        cx, cy = float(anchor[0]), float(anchor[1])
    else:
        cx, cy = x1 + bw * 0.5, y1 + bh * 0.5
    cy -= head_bias * bh

    if bw / bh < target:
        nw, nh = target * bh, bh
    else:
        nw, nh = bw, bw / target

    nx1, ny1 = cx - nw * 0.5, cy - nh * 0.5
    nx2, ny2 = cx + nw * 0.5, cy + nh * 0.5

    nx1 = clamp(nx1, 0, frame_w - 1)
    ny1 = clamp(ny1, 0, frame_h - 1)
    nx2 = clamp(nx2, 0, frame_w - 1)
    ny2 = clamp(ny2, 0, frame_h - 1)

    cw, ch = nx2 - nx1, ny2 - ny1
    if cw <= 1 or ch <= 1:
        return int(nx1), int(ny1), int(nx2), int(ny2)

    if abs(cw / ch - target) > 1e-4:
        if cw / ch < target:
            ch2 = cw / target
            dy = (ch - ch2) * 0.5
            ny1 += dy
            ny2 -= dy
        else:
            cw2 = ch * target
            dx = (cw - cw2) * 0.5
            nx1 += dx
            nx2 -= dx
        nx1 = clamp(nx1, 0, frame_w - 1)
        ny1 = clamp(ny1, 0, frame_h - 1)
        nx2 = clamp(nx2, 0, frame_w - 1)
        ny2 = clamp(ny2, 0, frame_h - 1)

    return int(round(nx1)), int(round(ny1)), int(round(nx2)), int(round(ny2))


def find_person_box_for_face(face_xyxy, persons, frame_w: int,
                             frame_h: int):
    """The person box most likely to OWN a matched face — scored, not
    first-containment: containment of the face center dominates, then
    face-inside-with-slack, normalized center distance, a top-band bias
    (faces live in the upper 42% of a body box) and a mild big-box area
    penalty; None when even the best score is implausible (≥5).
    Decision-identical to the reference ``_find_person_box_for_face``
    (gui_app.py:2303-2350, differential-tested). ``persons`` may hold
    xyxy tuples or dicts with an ``"xyxy"`` key."""
    try:
        fx1, fy1, fx2, fy2 = [float(v) for v in face_xyxy]
    except Exception:
        return None
    fcx = 0.5 * (fx1 + fx2)
    fcy = 0.5 * (fy1 + fy2)
    fw = max(1.0, fx2 - fx1)
    fh = max(1.0, fy2 - fy1)
    best = None
    best_score = 1.0e18
    for p in persons or []:
        try:
            px1, py1, px2, py2 = [
                float(v) for v in (p.get("xyxy", p)
                                   if isinstance(p, dict) else p)]
        except Exception:
            continue
        px1 = max(0.0, min(float(frame_w), px1))
        py1 = max(0.0, min(float(frame_h), py1))
        px2 = max(px1 + 1.0, min(float(frame_w), px2))
        py2 = max(py1 + 1.0, min(float(frame_h), py2))
        pw = max(1.0, px2 - px1)
        ph = max(1.0, py2 - py1)
        contains_center = (px1 <= fcx <= px2) and (py1 <= fcy <= py2)
        face_inside = (px1 <= fx1 + 0.2 * fw and fx2 - 0.2 * fw <= px2
                       and py1 <= fy1 + 0.2 * fh and fy2 - 0.2 * fh <= py2)
        top_band_y = py1 + 0.42 * ph
        top_bias = max(0.0, (fcy - top_band_y) / ph)
        dx = 0.0 if px1 <= fcx <= px2 \
            else min(abs(fcx - px1), abs(fcx - px2)) / pw
        dy = 0.0 if py1 <= fcy <= py2 \
            else min(abs(fcy - py1), abs(fcy - py2)) / ph
        area_penalty = 0.02 * ((pw * ph)
                               / max(1.0, float(frame_w * frame_h)))
        score = ((0.0 if contains_center else 4.0)
                 + (0.0 if face_inside else 1.5)
                 + dx + dy + top_bias + area_penalty)
        if score < best_score:
            best_score = score
            best = (px1, py1, px2, py2)
    if best is None or best_score >= 5.0:
        return None
    return best


def to_gray(a: np.ndarray) -> np.ndarray:
    """BGR→gray via SIMD cv2 when present (the reference converts with
    cv2, gui_app.py:8118+), :func:`bgr_to_gray` BT.601 fallback (±1 LSB
    from cv2's fixed-point rounding on rare values)."""
    if a.ndim != 3:
        return a
    try:
        import cv2

        return cv2.cvtColor(np.ascontiguousarray(a), cv2.COLOR_BGR2GRAY)
    except ImportError:
        return bgr_to_gray(a)


def bgr_to_gray(bgr: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, matching OpenCV's BGR2GRAY coefficients."""
    b = bgr[..., 0].astype(np.float32)
    g = bgr[..., 1].astype(np.float32)
    r = bgr[..., 2].astype(np.float32)
    y = 0.114 * b + 0.587 * g + 0.299 * r
    if bgr.dtype == np.uint8:
        return np.clip(np.round(y), 0, 255).astype(np.uint8)
    return y


def detect_black_borders(
    bgr: Optional[np.ndarray], thr: int = 10, max_scan: Optional[int] = None
) -> IntBox:
    """Detect constant near-black borders; return the content ROI (x1,y1,x2,y2).

    Border depth = run length of edge rows/cols whose mean intensity <= thr,
    scanned at most ``max_scan`` deep (reference contract: utils.py:152-196),
    computed vectorized instead of per-row Python loops.
    """
    if bgr is None or bgr.size == 0:
        return (0, 0, 0, 0)
    H, W = bgr.shape[:2]
    if max_scan is None:
        max_scan = max(64, min(H, W) // 8)
    n_row = min(H, max_scan)
    n_col = min(W, max_scan)

    # gray-convert ONLY the four scanned bands (this runs per saved frame
    # on a 1-core host; a full-frame conversion allocated ~3 float planes
    # of a 4K frame to inspect max_scan-deep edges), via SIMD cv2 when
    # present — the reference's own implementation converts with cv2
    def _gray(a: np.ndarray) -> np.ndarray:
        if a.ndim != 3:
            return a
        try:
            import cv2

            return cv2.cvtColor(np.ascontiguousarray(a),
                                cv2.COLOR_BGR2GRAY)
        except ImportError:
            return bgr_to_gray(a)

    def _leading_run(means: np.ndarray, n_scan: int) -> int:
        scan = means[:n_scan] > thr
        idx = np.argmax(scan) if scan.any() else n_scan
        return int(idx)

    top = _leading_run(
        _gray(bgr[:n_row]).mean(axis=1, dtype=np.float64), n_row)
    bot_run = _leading_run(
        _gray(bgr[H - n_row:]).mean(axis=1, dtype=np.float64)[::-1], n_row)
    left = _leading_run(
        _gray(bgr[:, :n_col]).mean(axis=0, dtype=np.float64), n_col)
    right_run = _leading_run(
        _gray(bgr[:, W - n_col:]).mean(axis=0, dtype=np.float64)[::-1],
        n_col)
    bottom = H - bot_run
    right = W - right_run

    left = int(clamp(left, 0, right - 1))
    top = int(clamp(top, 0, bottom - 1))
    right = int(clamp(right, left + 1, W))
    bottom = int(clamp(bottom, top + 1, H))
    return left, top, right, bottom


# ---------------------------------------------------------------------------
# crop-bound helpers (reference contracts: gui_app.py:1909-2112)
# ---------------------------------------------------------------------------

def clip_to_frame(x1: float, y1: float, x2: float, y2: float,
                  frame_w: int, frame_h: int) -> IntBox:
    """Shift then clamp so the crop stays inside the frame, preserving size
    when possible."""
    shift_x = -x1 if x1 < 0 else (frame_w - x2 if x2 > frame_w else 0.0)
    shift_y = -y1 if y1 < 0 else (frame_h - y2 if y2 > frame_h else 0.0)
    x1, x2 = x1 + shift_x, x2 + shift_x
    y1, y2 = y1 + shift_y, y2 + shift_y
    ix1 = max(0, min(frame_w - 1, int(round(x1))))
    ix2 = max(ix1 + 1, min(frame_w, int(round(x2))))
    iy1 = max(0, min(frame_h - 1, int(round(y1))))
    iy2 = max(iy1 + 1, min(frame_h, int(round(y2))))
    return ix1, iy1, ix2, iy2


def coerce_box_xyxy(box: Optional[Sequence[float]],
                    bounds_xyxy: Sequence[float]) -> Optional[Box]:
    """Clamp a box into bounds; None if degenerate (<1px interior)."""
    if box is None:
        return None
    try:
        x1, y1, x2, y2 = (float(v) for v in box)
        bx1, by1, bx2, by2 = (float(v) for v in bounds_xyxy)
    except (TypeError, ValueError):
        return None
    vals = (x1, y1, x2, y2, bx1, by1, bx2, by2)
    if not all(math.isfinite(v) for v in vals):
        return None
    x1, x2 = clamp(x1, bx1, bx2), clamp(x2, bx1, bx2)
    y1, y2 = clamp(y1, by1, by2), clamp(y2, by1, by2)
    if x2 <= x1 + 1.0 or y2 <= y1 + 1.0:
        return None
    return x1, y1, x2, y2


def union_boxes_xyxy(*boxes: Optional[Sequence[float]]) -> Optional[Box]:
    valid = []
    for box in boxes:
        if box is None:
            continue
        try:
            x1, y1, x2, y2 = (float(v) for v in box)
        except (TypeError, ValueError):
            continue
        if all(math.isfinite(v) for v in (x1, y1, x2, y2)) \
                and x2 > x1 + 1.0 and y2 > y1 + 1.0:
            valid.append((x1, y1, x2, y2))
    if not valid:
        return None
    return (min(b[0] for b in valid), min(b[1] for b in valid),
            max(b[2] for b in valid), max(b[3] for b in valid))


def pad_box_xyxy(box: Optional[Sequence[float]], pad_x: float,
                 pad_y_top: float, pad_y_bottom: Optional[float],
                 bounds_xyxy: Sequence[float]) -> Optional[Box]:
    if box is None:
        return None
    try:
        x1, y1, x2, y2 = (float(v) for v in box)
        bx1, by1, bx2, by2 = (float(v) for v in bounds_xyxy)
    except (TypeError, ValueError):
        return None
    pxb = max(0.0, float(pad_x))
    pyt = max(0.0, float(pad_y_top))
    pyb = pyt if pad_y_bottom is None else max(0.0, float(pad_y_bottom))
    x1, y1 = max(bx1, x1 - pxb), max(by1, y1 - pyt)
    x2, y2 = min(bx2, x2 + pxb), min(by2, y2 + pyb)
    if x2 <= x1 + 1.0 or y2 <= y1 + 1.0:
        return None
    return x1, y1, x2, y2


def containment_deficit_xyxy(crop_xyxy: Sequence[float],
                             protect_xyxy: Optional[Sequence[float]],
                             margin_px: float = 0.0) -> float:
    """How badly (normalized) a protected box sticks out of a crop; 0 = fully
    contained with margin."""
    if protect_xyxy is None:
        return 0.0
    cx1, cy1, cx2, cy2 = (float(v) for v in crop_xyxy)
    px1, py1, px2, py2 = (float(v) for v in protect_xyxy)
    pw = max(1.0, px2 - px1)
    ph = max(1.0, py2 - py1)
    m = max(0.0, float(margin_px))
    dx = max(0.0, (cx1 + m) - px1) + max(0.0, px2 - (cx2 - m))
    dy = max(0.0, (cy1 + m) - py1) + max(0.0, py2 - (cy2 - m))
    return dx / pw + dy / ph


def shift_crop_to_include_box(crop_xyxy: Sequence[float],
                              protect_xyxy: Optional[Sequence[float]],
                              bounds_xyxy: Sequence[int],
                              margin_px: float = 0.0) -> IntBox:
    """Translate a fixed-size crop (keeping its aspect) so the protected box
    stays visible; clamp into bounds."""
    cx1, cy1, cx2, cy2 = (float(v) for v in crop_xyxy)
    bx1, by1, bx2, by2 = (int(v) for v in bounds_xyxy)

    def _round_clamped() -> IntBox:
        ix1 = max(bx1, min(bx2 - 1, int(round(cx1))))
        iy1 = max(by1, min(by2 - 1, int(round(cy1))))
        ix2 = max(ix1 + 1, min(bx2, int(round(cx2))))
        iy2 = max(iy1 + 1, min(by2, int(round(cy2))))
        return ix1, iy1, ix2, iy2

    if protect_xyxy is None:
        return _round_clamped()
    try:
        px1, py1, px2, py2 = (float(v) for v in protect_xyxy)
    except (TypeError, ValueError):
        return _round_clamped()

    m = max(0.0, float(margin_px))
    w = max(1.0, cx2 - cx1)
    h = max(1.0, cy2 - cy1)

    dx = 0.0
    if px1 - m < cx1:
        dx = (px1 - m) - cx1
    if px2 + m > cx2 + dx:
        dx = (px2 + m) - cx2
    nx1 = max(float(bx1), min(float(bx2) - w, cx1 + dx))
    nx2 = nx1 + w

    dy = 0.0
    if py1 - m < cy1:
        dy = (py1 - m) - cy1
    if py2 + m > cy2 + dy:
        dy = (py2 + m) - cy2
    ny1 = max(float(by1), min(float(by2) - h, cy1 + dy))
    ny2 = ny1 + h

    ix1 = max(bx1, min(bx2 - 1, int(round(nx1))))
    iy1 = max(by1, min(by2 - 1, int(round(ny1))))
    ix2 = max(ix1 + 1, min(bx2, int(round(nx2))))
    iy2 = max(iy1 + 1, min(by2, int(round(ny2))))
    return ix1, iy1, ix2, iy2


def face_head_proxy_box(face_box: Optional[Sequence[float]],
                        frame_w: float, frame_h: float,
                        side_pad_frac: float = 0.88,
                        top_pad_frac: float = 0.95,
                        bottom_pad_frac: float = 0.30) -> Optional[Box]:
    """Grow a raw face-detector box into a conservative head/hair protection
    box (detector boxes cover the facial region only)."""
    if face_box is None:
        return None
    try:
        fx1, fy1, fx2, fy2 = (float(v) for v in face_box)
    except (TypeError, ValueError):
        return None
    fw = max(1.0, fx2 - fx1)
    fh = max(1.0, fy2 - fy1)
    side = max(0.0, float(side_pad_frac)) * fw
    top = max(0.0, float(top_pad_frac)) * fh
    bottom = max(0.0, float(bottom_pad_frac)) * fh
    hx1 = max(0.0, fx1 - side)
    hy1 = max(0.0, fy1 - top)
    hx2 = min(float(frame_w), fx2 + side)
    hy2 = min(float(frame_h), fy2 + bottom)
    if hx2 <= hx1 + 1.0 or hy2 <= hy1 + 1.0:
        return None
    return hx1, hy1, hx2, hy2
