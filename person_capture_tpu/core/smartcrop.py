"""Saliency-guided lateral crop refinement.

Compact re-implementation of the reference ``_smart_crop_box``
(person_capture/gui_app.py:8118-8489): search horizontal shifts of the
finished crop (± ``smart_crop_side_search_frac``·crop_w over
``smart_crop_steps`` half-steps per side) and keep the position maximizing
gradient saliency inside the crop, without letting the detected face leave
the crop. Ratio and size are preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .geometry import IntBox, to_gray


def gradient_saliency(gray: np.ndarray) -> np.ndarray:
    """|∇| saliency map (float32) with an integral-friendly dtype."""
    g = gray.astype(np.float32)
    gx = np.zeros_like(g)
    gy = np.zeros_like(g)
    gx[:, 1:-1] = np.abs(g[:, 2:] - g[:, :-2])
    gy[1:-1, :] = np.abs(g[2:, :] - g[:-2, :])
    return gx + gy


def smart_crop_box(frame: np.ndarray, crop_xyxy: Sequence[int],
                   face_xyxy: Optional[Sequence[float]] = None,
                   steps: int = 6, side_search_frac: float = 0.35,
                   use_grad: bool = True) -> IntBox:
    """Slide the crop horizontally toward saliency; face stays contained."""
    x1, y1, x2, y2 = (int(v) for v in crop_xyxy)
    H, W = frame.shape[:2]
    crop_w = x2 - x1
    if crop_w <= 0 or y2 - y1 <= 0 or not use_grad:
        return x1, y1, x2, y2
    # the saliency sums index y directly: out-of-frame y would wrap
    # (negative indexing) or raise — clamp like x is clamped below
    y1 = max(0, min(H - 1, y1))
    y2 = max(y1 + 1, min(H, y2))

    max_shift = side_search_frac * crop_w
    n = max(1, int(steps))
    offsets = sorted({int(round(max_shift * k / n)) for k in range(-n, n + 1)})

    # every candidate sum covers rows y1:y2 and columns within
    # [x1+min_offset, x2+max_offset]: compute the saliency only on that
    # band (±1 px margin so the centered gradient matches the values a
    # full-frame pass would produce) and reduce it to a 1-D column prefix
    # sum. A full-frame float64 2-D integral here cost more than the whole
    # rest of the save path (~37 ms/save at 1080p, measured).
    xlo = max(0, min(W, x1 + offsets[0]))
    xhi = max(xlo, min(W, x2 + offsets[-1]))
    if xhi <= xlo:
        return x1, y1, x2, y2
    mx1, mx2 = max(0, xlo - 1), min(W, xhi + 1)
    my1, my2 = max(0, y1 - 1), min(H, y2 + 1)
    band = frame[my1:my2, mx1:mx2]
    gray = to_gray(band)
    sal = gradient_saliency(gray)[y1 - my1:y2 - my1, xlo - mx1:xhi - mx1]
    prefix = np.zeros(xhi - xlo + 1, np.float64)
    np.cumsum(sal.sum(axis=0, dtype=np.float64), out=prefix[1:])

    def box_sum(bx1, bx2):
        return float(prefix[bx2 - xlo] - prefix[bx1 - xlo])

    # baseline = the finished crop itself, with a mild preference so ties
    # (and zero-saliency frames) never move the crop
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
