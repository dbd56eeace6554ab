"""Batched pre-scan: find the time spans where the target person appears.

TPU-first redesign of the reference's frame-at-a-time pre-scan loop
(person_capture/gui_app.py:1101-1907). The per-sample GPU calls become one
fused XLA program over a whole batch of strided samples; the sequential
logic — fd9 skip gate, streaming bank growth, span hysteresis — stays on
host and is replayed in sample order after each batch completes, so span
and bank decisions remain deterministic and order-faithful.

Differences vs the reference, by design (SURVEY.md §2.3, §7):
* rotation/TTA escalation ladders are replaced by batching: TPU batches make
  per-sample escalation unnecessary for throughput, and fixed shapes keep
  XLA from recompiling;
* bank growth applies between samples on host exactly like the reference,
  but embeddings were computed with the bank as of the batch start (fd used
  for *span* decisions is recomputed per sample against the live bank).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..config import SessionConfig
from ..core.bank import FD_NONE, RefBank, fd_min
from ..core.spans import Fd9SkipGate, SpanBuilder, SpanBuilderConfig
from ..video.reader import SampledBatchIterator


@dataclass
class PrescanResult:
    spans: List[Tuple[int, int]]
    bank: RefBank
    samples: int = 0
    extracted: int = 0
    skipped: int = 0
    wall_s: float = 0.0
    per_sample_fd: Dict[int, float] = field(default_factory=dict)


def run_prescan(reader, backend, cfg: SessionConfig, bank: RefBank,
                meta=None, batch_size: Optional[int] = None,
                progress: Optional[Callable[[float], None]] = None,
                should_stop: Optional[Callable[[], bool]] = None) -> PrescanResult:
    """Run the batched pre-scan over ``reader`` using ``backend``.

    Args:
      reader: video reader (already at prescan decode width).
      backend: a FaceBatchBackend.
      cfg: session config (prescan_* fields).
      bank: reference bank, pre-seeded with the user's reference embeddings.
      meta: VideoMeta (probed from reader when None).
    """
    t0 = time.perf_counter()
    meta = meta or reader.meta()
    fps = meta.fps or 30.0
    total = meta.total_frames
    stride = max(1, int(cfg.prescan_stride))
    batch = int(batch_size or cfg.tpu_batch_frames)

    sb = SpanBuilder(SpanBuilderConfig(
        fps=fps, stride=stride, enter=cfg.prescan_fd_enter,
        exit=cfg.prescan_fd_exit,
        exit_cooldown_sec=cfg.prescan_exit_cooldown_sec,
        pad_sec=cfg.prescan_pad_sec,
        min_segment_sec=cfg.prescan_min_segment_sec,
        bridge_gap_sec=cfg.prescan_bridge_gap_sec,
        total_frames=total))
    gate = Fd9SkipGate(enabled=bool(cfg.prescan_fd9_skip),
                       grace=cfg.prescan_fd9_grace,
                       probe_period=cfg.prescan_fd9_probe_period)

    res = PrescanResult(spans=[], bank=bank)
    last_add_sample = -10 ** 9
    sample_idx = 0
    add_cooldown = max(0, int(cfg.prescan_add_cooldown_samples))

    # Pending batch of decoded samples awaiting the device program
    pend_idxs: List[int] = []
    pend_frames: List[np.ndarray] = []
    # Ordered queue of (frame_idx, batch_slot|None, gate_already_observed)
    order: List[Tuple[int, Optional[int], bool]] = []

    def flush():
        nonlocal pend_idxs, pend_frames, order, last_add_sample, sample_idx
        out = None
        if pend_frames:
            n = len(pend_frames)
            frames = np.stack(pend_frames)
            valid = np.ones((n,), bool)
            if n < batch:
                framepad = np.repeat(frames[-1:], batch - n, axis=0)
                frames = np.concatenate([frames, framepad], 0)
                valid = np.concatenate([valid, np.zeros(batch - n, bool)])
            out = backend.extract_batch(
                frames, valid, np.asarray(pend_idxs + [pend_idxs[-1]] * (batch - n)))
        # replay in order
        for frame_idx, slot, gate_observed in order:
            if slot is None:
                best = FD_NONE
                res.skipped += 1
            else:
                best = FD_NONE
                mask = out["mask"][slot]
                feats = out["feats"][slot]
                quality = out["quality"][slot]
                for j in np.flatnonzero(mask):
                    fd = res.bank.fd(feats[j])
                    best = min(best, fd)
                    if (fd <= cfg.prescan_fd_add
                            and (sample_idx - last_add_sample) >= add_cooldown
                            and quality[j] >= cfg.face_quality_min):
                        action, _ = res.bank.update(feats[j], float(quality[j]))
                        if action in ("added", "replaced"):
                            last_add_sample = sample_idx
                res.extracted += 1
            res.per_sample_fd[frame_idx] = best
            if not gate_observed:
                gate.observe(best)
            sb.update(frame_idx, best)
            res.samples += 1
            sample_idx += 1
        pend_idxs, pend_frames, order = [], [], []

    idx = 0
    while total <= 0 or idx < total:
        if should_stop is not None and should_stop():
            break
        # The gate's skip decision must see every earlier sample's fd; if the
        # gate could be active, resolve pending probes first. This costs
        # batch efficiency only inside long no-face stretches, where decode
        # skipping (the gate's purpose) dominates the savings anyway.
        if (gate.enabled and not sb.active and pend_frames
                and gate.streak >= max(0, int(gate.grace))):
            flush()
        if gate.should_skip(sb.active):
            skipped = reader.skip(stride)
            # a skipped sample is fd=9 by definition: observe immediately so
            # the next skip decision sees the updated streak
            gate.observe(FD_NONE)
            order.append((idx, None, True))
            if len(order) >= batch * 4:
                flush()
            if skipped < stride:
                break
            idx += stride
            continue
        frame = reader.read()
        if frame is None:
            break
        pend_idxs.append(idx)
        pend_frames.append(frame)
        order.append((idx, len(pend_frames) - 1, False))
        if len(pend_frames) == batch:
            flush()
            if progress is not None and total > 0:
                progress(min(1.0, idx / total))
        skipped = reader.skip(stride - 1)
        if skipped < stride - 1:
            idx += 1 + skipped
            break
        idx += stride
    flush()
    res.spans = sb.finish()
    res.wall_s = time.perf_counter() - t0
    return res
