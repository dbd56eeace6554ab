"""Synthetic video + ground-truth generation for tests and benchmarks.

The reference ships no test assets; we generate deterministic videos with
known "face" placements (per-identity colored patterns with 5 landmark dots)
plus a ground-truth table, so pipeline logic (spans, bank growth, locks,
compose, export) is testable end-to-end without trained weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclass
class FacePlacement:
    frame: int
    identity: int
    box: Tuple[float, float, float, float]  # xyxy in frame coords

    @property
    def kps(self) -> np.ndarray:
        """Synthetic 5-point landmarks laid out like a face inside the box."""
        x1, y1, x2, y2 = self.box
        w, h = x2 - x1, y2 - y1
        return np.array([
            [x1 + 0.30 * w, y1 + 0.35 * h],
            [x1 + 0.70 * w, y1 + 0.35 * h],
            [x1 + 0.50 * w, y1 + 0.55 * h],
            [x1 + 0.35 * w, y1 + 0.75 * h],
            [x1 + 0.65 * w, y1 + 0.75 * h],
        ], np.float32)


@dataclass
class SyntheticVideo:
    path: str
    width: int
    height: int
    fps: float
    total_frames: int
    # frame -> list of placements
    truth: Dict[int, List[FacePlacement]] = field(default_factory=dict)

    def identity_spans(self, identity: int) -> List[Tuple[int, int]]:
        """Ground-truth contiguous frame spans where the identity appears."""
        frames = sorted(f for f, pls in self.truth.items()
                        if any(p.identity == identity for p in pls))
        spans: List[Tuple[int, int]] = []
        for f in frames:
            if spans and f == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], f)
            else:
                spans.append((f, f))
        return spans


_ID_COLORS = [(60, 180, 240), (200, 90, 60), (80, 220, 90), (180, 60, 200)]


def draw_face(img: np.ndarray, pl: FacePlacement) -> None:
    """Render a synthetic face: filled ellipse in an identity color with
    darker landmark dots (enough texture for quality metrics)."""
    x1, y1, x2, y2 = (int(round(v)) for v in pl.box)
    color = _ID_COLORS[pl.identity % len(_ID_COLORS)]
    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    ax, ay = max(2, (x2 - x1) // 2), max(2, (y2 - y1) // 2)
    if cv2 is not None:
        cv2.ellipse(img, (cx, cy), (ax, ay), 0, 0, 360, color, -1)
        for px, py in pl.kps:
            cv2.circle(img, (int(px), int(py)), max(1, ax // 8), (20, 20, 20), -1)
    else:  # numpy fallback
        img[max(0, y1):y2, max(0, x1):x2] = color


def person_box_for_face(box, width: int, height: int):
    """Deterministic body extent below a face box (matches the rendering
    of draw_person and OraclePersonBackend's inflation)."""
    x1, y1, x2, y2 = box
    fw, fh = x2 - x1, y2 - y1
    return (max(0.0, x1 - fw), max(0.0, y1 - 0.2 * fh),
            min(float(width), x2 + fw), min(float(height), y2 + 4.2 * fh))


def draw_person(img: np.ndarray, pl: FacePlacement,
                clothing=None) -> None:
    """Render a schematic person: torso + legs below the face, then the
    face on top (so the face pattern stays detector-visible)."""
    if cv2 is None:
        draw_face(img, pl)
        return
    x1, y1, x2, y2 = pl.box
    fw, fh = x2 - x1, y2 - y1
    h, w = img.shape[:2]
    clothing = clothing or tuple(
        int(v) for v in np.random.default_rng(pl.identity + 7)
        .integers(40, 220, 3))
    dark = tuple(max(0, c - 60) for c in clothing)
    # torso
    tx1, ty1 = int(x1 - 0.35 * fw), int(y2)
    tx2, ty2 = int(x2 + 0.35 * fw), int(min(h, y2 + 2.4 * fh))
    cv2.rectangle(img, (tx1, ty1), (tx2, ty2), clothing, -1)
    # legs
    ly2 = int(min(h, y2 + 4.2 * fh))
    mid = (tx1 + tx2) // 2
    cv2.rectangle(img, (tx1 + 2, ty2), (mid - 2, ly2), dark, -1)
    cv2.rectangle(img, (mid + 2, ty2), (tx2 - 2, ly2), dark, -1)
    draw_face(img, pl)


def generate_video(path: str, width: int = 320, height: int = 240,
                   fps: float = 30.0, total_frames: int = 120,
                   segments: Optional[Sequence[Tuple[int, int, int]]] = None,
                   moving: bool = True, seed: int = 0,
                   draw_body: bool = False,
                   fourcc: str = "mp4v") -> SyntheticVideo:
    """Write an mp4 with faces present in the given ``(start, end, identity)``
    frame segments (inclusive), plus background noise.

    A segment may carry two optional trailing fields:
    ``(start, end, identity, x_frac, body)`` — a fixed horizontal center
    (overrides ``moving``) and a per-segment body-rendering flag — so tests
    can stage two concurrent non-overlapping persons.
    """
    if cv2 is None:
        raise RuntimeError("cv2 required to generate synthetic videos")
    if segments is None:
        segments = [(20, 60, 0), (90, 110, 0)]
    rng = np.random.default_rng(seed)
    sv = SyntheticVideo(path, width, height, fps, total_frames)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc),
                             fps, (width, height))
    if not writer.isOpened():
        raise IOError(f"cannot open writer: {path}")
    base = rng.integers(30, 70, (height, width, 3), dtype=np.uint8)
    fw = min(width, height) // 4
    for f in range(total_frames):
        img = base.copy()
        # light noise so frames differ
        noise = rng.integers(0, 12, (height, width, 1), dtype=np.uint8)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        for seg in segments:
            s, e, ident = seg[0], seg[1], seg[2]
            x_frac = seg[3] if len(seg) > 3 else None
            body = bool(seg[4]) if len(seg) > 4 else draw_body
            if s <= f <= e:
                if x_frac is not None:
                    cx, cy = width * float(x_frac), height * 0.5
                elif moving:
                    t = (f - s) / max(1, e - s)
                    cx = width * (0.3 + 0.4 * t)
                    cy = height * 0.5
                else:
                    cx, cy = width * 0.5, height * 0.5
                box = (cx - fw / 2, cy - fw / 2, cx + fw / 2, cy + fw / 2)
                pl = FacePlacement(f, ident, box)
                if body:
                    draw_person(img, pl)
                else:
                    draw_face(img, pl)
                sv.truth.setdefault(f, []).append(pl)
        writer.write(img)
    writer.release()
    return sv
