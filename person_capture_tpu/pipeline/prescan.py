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


@dataclass
class PrescanResult:
    spans: List[Tuple[int, int]]
    bank: RefBank
    samples: int = 0
    extracted: int = 0
    skipped: int = 0
    wall_s: float = 0.0
    per_sample_fd: Dict[int, float] = field(default_factory=dict)
    # True when an interactive command (seek) modified the scan — the
    # result must not be cached (reference gui_app.py:5047-5058)
    perturbed: bool = False


def run_prescan(reader, backend, cfg: SessionConfig, bank: RefBank,
                meta=None, batch_size: Optional[int] = None,
                reopen_reader: Optional[Callable[[], object]] = None,
                progress: Optional[Callable[[float], None]] = None,
                should_stop: Optional[Callable[[], bool]] = None,
                seek_request: Optional[Callable[[], Optional[int]]] = None,
                on_preview: Optional[Callable] = None,
                source_is_hdr: bool = False, timer=None) -> PrescanResult:
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

    # pre-scan runtime hints (reference gui_app.py:1162-1196): fast mode on
    # the recovery ladder + the dedicated pre-scan detector threshold
    if hasattr(backend, "set_prescan_fast"):
        backend.set_prescan_fast(True)
    restore_conf = None
    if (getattr(backend, "score_thresh", None) is not None
            and float(getattr(cfg, "prescan_face_conf", 0.0) or 0.0) > 0.0):
        restore_conf = backend.score_thresh
        backend.score_thresh = float(cfg.prescan_face_conf)
    # pre-scan preview: SDR sources always; HDR sources only when the
    # dedicated pre-scan HDR preview is enabled (reference
    # prescan_hdr_preview; the analysis reader already tone-maps, so the
    # emitted frame IS the SDR preview)
    if on_preview is not None and source_is_hdr \
            and not bool(getattr(cfg, "prescan_hdr_preview", False)):
        on_preview = None
    try:
        return _run_prescan_inner(reader, backend, cfg, bank, meta, batch,
                                  reopen_reader, progress, should_stop,
                                  seek_request, t0, fps, total, stride,
                                  on_preview, timer)
    finally:
        if hasattr(backend, "set_prescan_fast"):
            backend.set_prescan_fast(False)
        if restore_conf is not None:
            backend.score_thresh = restore_conf


def _run_prescan_inner(reader, backend, cfg: SessionConfig, bank: RefBank,
                       meta, batch, reopen_reader, progress, should_stop,
                       seek_request, t0, fps, total, stride,
                       on_preview=None, timer=None) -> PrescanResult:
    from ..utils.timing import NULL_TIMER

    timer = timer or NULL_TIMER

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
    last_seen_idx = -1  # last frame index fed to the span machine
    probe_dispatches = 0  # gate probes dispatched so far (see below)
    add_cooldown = max(0, int(cfg.prescan_add_cooldown_samples))

    # Pending batch of decoded samples awaiting the device program
    pend_idxs: List[int] = []
    pend_frames: List[np.ndarray] = []
    # Ordered queue of (frame_idx, batch_slot|None, gate_already_observed)
    order: List[Tuple[int, Optional[int], bool]] = []
    # software pipeline (depth = cfg.tpu_pipeline_depth, default 4): up to
    # `depth` submitted batches stay in flight before the oldest resolves,
    # so device compute overlaps the host round trip(s). Replay stays
    # submission-ordered, so spans/bank are depth-independent.
    inflight: List[Tuple[Callable, List]] = []
    submit = getattr(backend, "submit_batch", None)
    pipe_depth = max(1, int(getattr(cfg, "tpu_pipeline_depth", 1) or 1))

    def _resolve(entry):
        nonlocal last_add_sample, sample_idx
        fetch, entry_order = entry
        with timer("prescan.device_fetch"):
            out = fetch() if fetch is not None else None
        with timer("prescan.host_replay"):
            _replay(out, entry_order)

    def flush(drain: bool = True):
        """Submit the pending batch; resolve earlier work. With drain=False
        only the previously in-flight batch resolves (pipelining); the gate
        path and EOF call with drain=True to fully synchronize."""
        nonlocal pend_idxs, pend_frames, order
        fetch = None
        if pend_frames:
            from .backends import pad_batch

            frames, idxs, valid, n = pad_batch(pend_frames, batch,
                                               idxs=pend_idxs)
            if submit is not None:
                fetch = submit(frames, valid, idxs)
            else:
                out_now = backend.extract_batch(frames, valid, idxs)
                fetch = lambda out_now=out_now: out_now
        if fetch is not None or order:
            inflight.append((fetch, order))
            pend_idxs, pend_frames, order = [], [], []
        while inflight and (drain or len(inflight) > pipe_depth):
            _resolve(inflight.pop(0))

    def _replay(out, entry_order):
        nonlocal last_add_sample, sample_idx, last_seen_idx
        for frame_idx, slot, gate_observed in entry_order:
            last_seen_idx = frame_idx
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
            if sb.update(frame_idx, best):
                # span just closed: drop the fd9 streak like the reference
                # (its span-close branch zeroes fd9_streak) so the very next
                # sample is probed, not skipped on the closing miss run
                gate.reset()
            res.samples += 1
            sample_idx += 1

    idx = 0

    def _advance_after_read() -> bool:
        """Shared stride advance after a decoded sample; False on an EOF
        shortfall (caller breaks). Both the probe fast path and the normal
        read path must account identically or sample indices desync."""
        nonlocal idx
        skipped = reader.skip(stride - 1)
        if skipped < stride - 1:
            idx += 1 + skipped
            return False
        idx += stride
        return True

    while total <= 0 or idx < total:
        if should_stop is not None and should_stop():
            # an aborted scan covers only a prefix: its spans must never be
            # cached as complete (reference refuses the save on abort,
            # gui_app.py:893) — perturbed makes get_or_run skip the save
            res.perturbed = True
            break
        # interactive commands inside the pre-scan (reference drains the
        # command queue twice per iteration, gui_app.py:1230-1415): seek
        # jumps the scan position; LIVE span thresholds re-read each step
        if seek_request is not None:
            target = seek_request()
            if target is not None:
                flush()
                target = max(0, int(target))
                if hasattr(reader, "seek"):
                    reader.seek(target)
                    idx = target
                else:
                    # seekless reader: a backward target is unreachable —
                    # continue from the reader's ACTUAL position so frame
                    # indices stay truthful (silently pretending we landed
                    # on target would mislabel every later sample)
                    reader.skip(max(0, target - reader.pos))
                    idx = reader.pos
                # the sample stream just jumped: close any active span at
                # the last processed sample (a seek must not extend a span
                # across unseen video, and a backward seek would otherwise
                # hand the builder a start > end) and drop the fd9 streak,
                # which described the pre-seek neighborhood
                sb.interrupt(last_seen_idx)
                gate.reset()
                res.perturbed = True
                continue
        sb.cfg.enter = float(cfg.prescan_fd_enter)
        sb.cfg.exit = float(cfg.prescan_fd_exit)
        # The gate's skip decision must see every earlier sample's fd; if the
        # gate could be active, resolve pending/in-flight probes first. This
        # costs batch/pipeline efficiency only inside long no-face
        # stretches, where decode skipping (the gate's purpose) dominates
        # the savings anyway.
        if (gate.enabled and not sb.active and (pend_frames or inflight)
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
        with timer("prescan.decode"):
            frame = reader.read()
        if frame is None:
            break
        frame = _cap_width(frame, cfg.prescan_max_width)
        # Gate probe: inside a no-face stretch this read exists only to
        # refresh the gate, and the drain above means it would dispatch as
        # ONE real frame padded to the full production batch — batch× the
        # upload bytes over the tunnel per probe. After a few such probes
        # (a stretch long enough to amortize it), pay one small extra XLA
        # compile for a batch-1 program and dispatch probes alone.
        if (gate.enabled and not sb.active and not pend_frames
                and not inflight
                and gate.streak >= max(0, int(gate.grace))):
            probe_dispatches += 1
            if probe_dispatches > 4:
                flush()  # host-only here: replays any queued skip entries
                out = backend.extract_batch(frame[None], np.ones((1,), bool),
                                            np.asarray([idx]))
                _replay(out, [(idx, 0, False)])
                if progress is not None and total > 0:
                    progress(min(1.0, idx / total))
                if not _advance_after_read():
                    break
                continue
        pend_idxs.append(idx)
        pend_frames.append(frame)
        order.append((idx, len(pend_frames) - 1, False))
        if len(pend_frames) == batch:
            if on_preview is not None:
                on_preview(pend_frames[0], pend_idxs[0])
            flush(drain=False)
            if progress is not None and total > 0:
                progress(min(1.0, idx / total))
        if not _advance_after_read():
            break
    flush()
    res.spans = sb.finish(last_seen_idx if last_seen_idx >= 0 else None)
    if cfg.prescan_boundary_refine_sec > 0 and res.spans and reopen_reader:
        res.spans = refine_span_edges(res.spans, reopen_reader, backend, cfg,
                                      res.bank, fps, total)
    res.wall_s = time.perf_counter() - t0
    return res


def _cap_width(frame: np.ndarray, max_w: int) -> np.ndarray:
    """Downscale analysis frames wider than prescan_max_width (reference:
    gui_app.py:1503-1509)."""
    max_w = int(max_w or 0)
    if max_w <= 0 or frame.shape[1] <= max_w:
        return frame
    try:
        import cv2
        nh = int(round(frame.shape[0] * (max_w / frame.shape[1])))
        return cv2.resize(frame, (max_w, nh), interpolation=cv2.INTER_AREA)
    except ImportError:
        return frame


def refine_span_edges(spans, reopen_reader, backend, cfg: SessionConfig,
                      bank: RefBank, fps: float, total: int):
    """Budgeted boundary refinement (reference `_refine_edges`,
    gui_app.py:1671-1832): rescan a window around each span edge with a
    small stride and move the edge to the first/last matching sample;
    optionally trims the pad when a tighter edge is found.

    The rescan batches all edge-window samples of a span through one device
    call instead of the reference's per-frame loop.
    """
    stride_ref = max(1, min(max(1, int(cfg.prescan_stride)) // 4,
                            int(cfg.prescan_refine_stride_min)))
    win = int(round(max(0.0, float(cfg.prescan_boundary_refine_sec)) * fps))
    pad = int(round(max(0.0, float(cfg.prescan_pad_sec)) * fps))
    # the true edge can sit a full coarse stride beyond the last matching
    # sample, plus the pad — cover both (the reference's max(pad, win) can
    # miss the edge when pad < stride)
    search = max(pad, win) + max(1, int(cfg.prescan_stride))
    if search <= 0:
        return spans
    budget = float(cfg.prescan_refine_budget_sec)
    t0 = time.perf_counter()
    enter = float(cfg.prescan_fd_enter)
    out = []
    # ONE decoder for every edge window (edges are visited in ascending
    # order and _sample_fds seeks per sample): a reopen per edge spawned
    # two processes per span, whose open/seek/preroll overhead can
    # dominate the refine budget on short windows
    reader = reopen_reader()
    try:
        for (s, e) in spans:
            if budget > 1e-3 and (time.perf_counter() - t0) > budget:
                out.append((s, e))
                continue
            if cfg.prescan_skip_trailing_refine and e >= total - 1:
                trailing = True
            else:
                trailing = False
            new_s, new_e = s, e
            for edge, is_start in (((s), True), ((e), False)):
                if not is_start and trailing:
                    continue
                lo = max(0, edge - search)
                hi = min(total - 1, edge + search)
                idxs = list(range(lo, hi + 1, stride_ref))
                if not idxs:
                    continue
                fds = _sample_fds(reader, backend, cfg, bank, idxs)
                matched = [i for i, fd in zip(idxs, fds) if fd <= enter]
                if is_start:
                    if matched:
                        # trim_pad: tighten to just before the first match;
                        # otherwise only ever move the start EARLIER
                        new_s = max(0, matched[0] - stride_ref) \
                            if cfg.prescan_trim_pad else min(edge, matched[0])
                else:
                    if matched:
                        new_e = min(total - 1, matched[-1] + stride_ref) \
                            if cfg.prescan_trim_pad else max(edge, matched[-1])
            if new_e < new_s:
                new_s, new_e = s, e
            out.append((new_s, new_e))
    finally:
        reader.release()
    # keep spans sorted/merged after edge moves
    out.sort()
    merged = []
    for (s, e) in out:
        if merged and s <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    # post-trim minimum-length re-check (reference keeps a trimmed span
    # only if it remains big enough, gui_app.py:1819): trim_pad can shrink
    # a marginal span below prescan_min_segment_sec
    min_len = max(1, int(round(float(cfg.prescan_min_segment_sec)
                               * float(fps or 30.0))))
    return [(s, e) for (s, e) in merged if (e - s + 1) >= min_len]


def _sample_fds(reader, backend, cfg: SessionConfig, bank: RefBank, idxs):
    """Decode specific frames and return each sample's best fd (batched)."""
    frames = []
    got = []
    for i in idxs:
        if hasattr(reader, "seek"):
            reader.seek(i)
        else:
            reader.skip(max(0, i - reader.pos))
        f = reader.read()
        if f is None:
            continue
        frames.append(_cap_width(f, cfg.prescan_max_width))
        got.append(i)
    if not frames:
        return []
    # pad every chunk to the production batch shape so boundary refinement
    # reuses the already-compiled pre-scan program — a fresh XLA compile per
    # distinct edge-window size costs minutes over tunneled links
    batch = max(1, int(cfg.tpu_batch_frames))
    bank_mat = bank.matrix()
    fds = []
    from .backends import pad_batch

    for c0 in range(0, len(frames), batch):
        chunk = frames[c0:c0 + batch]
        cidx = got[c0:c0 + batch]
        arr, pidx, valid, n = pad_batch(chunk, batch, idxs=cidx)
        out = backend.extract_batch(arr, valid, pidx)
        for slot in range(n):
            best = FD_NONE
            for j in np.flatnonzero(out["mask"][slot]):
                best = min(best, fd_min(out["feats"][slot][j], bank_mat))
            fds.append(best)
    # map back to requested idxs (missing decodes -> FD_NONE)
    by_idx = dict(zip(got, fds))
    return [by_idx.get(i, FD_NONE) for i in idxs]
