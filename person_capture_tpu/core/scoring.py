"""Match-score combination and sharpness metrics.

Reference contracts: ``combine_scores`` (person_capture/main.py:127-144) and
``_calc_sharpness`` (main.py:86-102).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def combine_scores(face_dist: Optional[float], reid_dist: Optional[float],
                   mode: str = "min") -> Optional[float]:
    vals = [v for v in (face_dist, reid_dist) if v is not None]
    if not vals:
        return None
    if mode == "avg":
        return sum(vals) / len(vals)
    if mode == "face_priority":
        if face_dist is not None:
            return 0.7 * face_dist + 0.3 * (reid_dist if reid_dist is not None else 0.5)
        return reid_dist
    return min(vals)  # "min" and default


def calc_sharpness(bgr: Optional[np.ndarray]) -> float:
    """Normalized sharpness: Laplacian variance of a ≤256px gray thumbnail
    divided by squared mean intensity."""
    if bgr is None or bgr.size == 0:
        return 0.0
    if cv2 is not None:
        g = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY) if bgr.ndim == 3 else bgr
        h, w = g.shape[:2]
        md = max(h, w)
        if md > 256:
            s = 256.0 / md
            g = cv2.resize(g, (int(round(w * s)), int(round(h * s))),
                           interpolation=cv2.INTER_AREA)
        lap = cv2.Laplacian(g, cv2.CV_32F)
        variance = float(np.var(lap))
        mean_i = float(np.mean(g))
    else:
        from .geometry import bgr_to_gray
        from ..ops.quality import laplacian_variance_np
        g = bgr_to_gray(bgr) if bgr.ndim == 3 else bgr
        variance = laplacian_variance_np(g)
        mean_i = float(np.mean(g))
    return variance / (mean_i * mean_i + 1e-6)
