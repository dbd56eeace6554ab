"""Span-gated main pass: identity decision + crop composition + export.

TPU-first restructuring of the reference's hot loop
(person_capture/gui_app.py:4372-8111). Frames inside keep-spans decode into
fixed-size batches; one fused device program yields faces + embeddings for
the whole batch; the sequential identity/lock/save logic replays on host in
frame order. Crop composition (choose_best_ratio + enforce_scale_and_margins
+ guards) runs per accepted frame, and exports go through the async saver.

Round-1 scope: the face-identity path (match_mode face_only / either without
ReID), temporal lock with IoU gate and miss timeout, min_gap_sec save
cadence, sharpness/min-size gates, side-guard drop. The YOLO person path and
ReID fusion plug in through the optional ``person_backend`` /
``reid_backend`` hooks.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import SessionConfig
from ..core.bank import RefBank
from ..core.compose import choose_best_ratio, enforce_scale_and_margins
from ..core.geometry import (box_iou, crop_img, detect_black_borders,
                             parse_ratio_list)
from ..core.scoring import calc_sharpness, combine_scores
from ..core.spans import span_index_for
from .saver import AsyncSaver, SaveItem


@dataclass
class Hit:
    frame: int
    time_secs: float
    score: float
    face_dist: float
    crop: Tuple[int, int, int, int]
    path: str
    sharpness: float
    ratio: Optional[str]


@dataclass
class LockState:
    hits: int = 0
    locked: bool = False
    last_face_box: Optional[Tuple[float, float, float, float]] = None
    last_seen_frame: int = -1
    misses: int = 0

    def register_hit(self, face_box, frame_idx: int, lock_after_hits: int):
        self.hits += 1
        self.last_face_box = tuple(face_box)
        self.last_seen_frame = frame_idx
        self.misses = 0
        if self.hits >= max(1, lock_after_hits):
            self.locked = True

    def register_miss(self, max_misses: int):
        self.misses += 1
        if self.locked and self.misses > max(1, max_misses):
            self.locked = False
            self.hits = 0
            self.last_face_box = None


@dataclass
class MainPassResult:
    hits: List[Hit] = field(default_factory=list)
    frames_processed: int = 0
    frames_decoded: int = 0
    wall_s: float = 0.0


def run_main_pass(reader, backend, cfg: SessionConfig, bank: RefBank,
                  spans: Sequence[Tuple[int, int]], saver: AsyncSaver,
                  meta=None, batch_size: Optional[int] = None,
                  progress: Optional[Callable[[float], None]] = None,
                  should_stop: Optional[Callable[[], bool]] = None
                  ) -> MainPassResult:
    t0 = time.perf_counter()
    meta = meta or reader.meta()
    fps = meta.fps or 30.0
    res = MainPassResult()
    if not spans:
        res.wall_s = time.perf_counter() - t0
        return res

    stride = max(1, int(cfg.frame_stride))
    batch = int(batch_size or cfg.tpu_batch_frames)
    ratios = [f"{int(w) if w == int(w) else w}:{int(h) if h == int(h) else h}"
              for (w, h) in parse_ratio_list(cfg.ratio)]
    crops_dir = os.path.join(cfg.out_dir, "crops")
    os.makedirs(crops_dir, exist_ok=True)

    lock = LockState()
    last_save_t = -1e9
    min_gap = float(cfg.min_gap_sec)
    bank_mat = bank.matrix()

    pend: List[Tuple[int, np.ndarray]] = []

    def flush():
        nonlocal last_save_t
        if not pend:
            return
        n = len(pend)
        frames = np.stack([f for (_, f) in pend])
        idxs = np.asarray([i for (i, _) in pend])
        valid = np.ones((n,), bool)
        if n < batch:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], batch - n, axis=0)], 0)
            idxs = np.concatenate([idxs, np.repeat(idxs[-1:], batch - n)])
            valid = np.concatenate([valid, np.zeros(batch - n, bool)])
        out = backend.extract_batch(frames, valid, idxs)
        for slot in range(n):
            frame_idx = int(idxs[slot])
            frame = pend[slot][1]
            _process_frame(frame_idx, frame, out, slot)
        pend.clear()

    def _process_frame(frame_idx: int, frame: np.ndarray, out: Dict, slot: int):
        nonlocal last_save_t
        res.frames_processed += 1
        H, W = frame.shape[:2]
        mask = out["mask"][slot]
        if not mask.any():
            lock.register_miss(cfg.lock_face_roi_max_misses)
            return
        feats = out["feats"][slot]
        boxes = out["boxes"][slot]
        quality = out["quality"][slot]

        # best face by bank distance
        fds = np.array([
            1.0 - float(np.max(bank_mat @ (feats[j] / max(np.linalg.norm(feats[j]), 1e-6))))
            if mask[j] else 9.0
            for j in range(len(mask))
        ])
        j = int(np.argmin(fds))
        fd = float(fds[j])
        face_box = tuple(float(v) for v in boxes[j])

        thresh = float(cfg.face_thresh)
        accept = fd <= thresh
        # tighter re-accept when locked but drifting: candidates far from the
        # lock box need the lock threshold (identity-jump guard)
        if accept and lock.locked and lock.last_face_box is not None:
            iou = box_iou(face_box, lock.last_face_box)
            if iou < float(cfg.iou_gate) and fd > float(cfg.lock_face_thresh):
                accept = False
        if not accept:
            lock.register_miss(cfg.lock_face_roi_max_misses)
            return
        if cfg.face_quality_min > 0 and cfg.face_visible_uses_quality \
                and float(quality[j]) < float(cfg.face_quality_min) and fd > thresh * 0.5:
            lock.register_miss(cfg.lock_face_roi_max_misses)
            return

        lock.register_hit(face_box, frame_idx, cfg.lock_after_hits)

        t = frame_idx / fps
        if t - last_save_t < min_gap:
            return

        # --- crop composition -------------------------------------------
        work = frame
        off_x = off_y = 0
        if cfg.auto_crop_borders:
            bx1, by1, bx2, by2 = detect_black_borders(
                frame, thr=int(cfg.border_threshold))
            if (bx1, by1) != (0, 0) or (bx2, by2) != (W, H):
                work = frame[by1:by2, bx1:bx2]
                off_x, off_y = bx1, by1
        wh, ww = work.shape[:2]
        fb = (face_box[0] - off_x, face_box[1] - off_y,
              face_box[2] - off_x, face_box[3] - off_y)
        anchor = (0.5 * (fb[0] + fb[2]), 0.5 * (fb[1] + fb[3]))
        det_box = _det_box_from_face(fb, ww, wh)
        crop, ratio, _ = choose_best_ratio(det_box, ratios, ww, wh, cfg,
                                           anchor=anchor, face_box=fb)
        crop = enforce_scale_and_margins(crop, ratio or ratios[0], ww, wh,
                                         cfg, face_box=fb, anchor=anchor)
        x1, y1, x2, y2 = crop
        if (x2 - x1) * (y2 - y1) < int(cfg.min_box_pixels):
            return
        if cfg.side_guard_drop_enable:
            fw = max(1.0, fb[2] - fb[0])
            want = cfg.crop_face_side_margin_frac * fw * cfg.side_guard_drop_factor
            left, right = fb[0] - x1, x2 - fb[2]
            face_at_edge = fb[0] <= 1.0 or fb[2] >= ww - 1.0
            if min(left, right) < want and not face_at_edge:
                return
        img = crop_img(work, crop)
        if img.size == 0:
            return
        sharp = calc_sharpness(img)
        if cfg.min_sharpness > 0 and sharp < cfg.min_sharpness:
            return

        path = os.path.join(crops_dir, f"f{frame_idx:08d}.jpg")
        score = combine_scores(fd, None, cfg.combine)
        row = [frame_idx, f"{t:.3f}", f"{score:.4f}" if score is not None else "",
               f"{fd:.4f}", "", x1 + off_x, y1 + off_y, x2 + off_x, y2 + off_y,
               os.path.basename(path), f"{sharp:.4f}", ratio or ""]
        saver.submit(SaveItem(img=img, path=path, csv_row=row))
        res.hits.append(Hit(frame_idx, t, score or fd, fd,
                            (x1 + off_x, y1 + off_y, x2 + off_x, y2 + off_y),
                            path, sharp, ratio))
        last_save_t = t

    # ---- span-gated decode loop ---------------------------------------
    for s, e in spans:
        if should_stop is not None and should_stop():
            break
        if hasattr(reader, "seek"):
            reader.seek(s)
        else:
            reader.skip(max(0, s - reader.pos))
        idx = s
        while idx <= e:
            if should_stop is not None and should_stop():
                break
            frame = reader.read()
            if frame is None:
                break
            res.frames_decoded += 1
            pend.append((idx, frame))
            if len(pend) == batch:
                flush()
                if progress is not None and meta.total_frames > 0:
                    progress(min(1.0, idx / meta.total_frames))
            skipped = reader.skip(stride - 1)
            idx += 1 + skipped
            if skipped < stride - 1:
                break
        flush()
    flush()
    res.wall_s = time.perf_counter() - t0
    return res


def _det_box_from_face(fb, frame_w: int, frame_h: int):
    """Approximate a subject box from a face box when no person detector ran
    (face_only without YOLO): head + torso extent below the face."""
    fx1, fy1, fx2, fy2 = fb
    fw = max(1.0, fx2 - fx1)
    fh = max(1.0, fy2 - fy1)
    x1 = max(0.0, fx1 - 1.2 * fw)
    x2 = min(float(frame_w), fx2 + 1.2 * fw)
    y1 = max(0.0, fy1 - 1.0 * fh)
    y2 = min(float(frame_h), fy2 + 4.0 * fh)
    return (x1, y1, x2, y2)
