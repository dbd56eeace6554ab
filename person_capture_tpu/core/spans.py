"""Pre-scan span state machine.

Consumes a stream of ``(frame_idx, best_fd)`` samples — in the TPU rebuild
these arrive a *batch at a time* from the fused pre-scan XLA program — and
produces keep-spans with enter/exit hysteresis, exit cooldown, padding,
minimum length, adjacent-merge and gap bridging.

Behavior-compatible with the reference loop (person_capture/gui_app.py:
1587-1668): enter when fd <= enter threshold; while active, count consecutive
non-matching samples and close when the miss run covers ``exit_cooldown_sec``
of video or fd >= exit threshold; pad both edges by ``pad_sec``; drop spans
shorter than ``min_segment_sec``; merge spans that touch after padding;
finally bridge gaps shorter than ``bridge_gap_sec``.

The fd9 skip gate (reference gui_app.py:1481-1566) is also implemented here
as a pure sampling policy: it tells the host driver which upcoming samples can
skip device extraction entirely during long no-face streaks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

Span = Tuple[int, int]

FD_NONE = 9.0  # sentinel distance for "no face found" (reference fd≈9)


@dataclass
class SpanBuilderConfig:
    fps: float = 30.0
    stride: int = 24
    enter: float = 0.45
    exit: float = 0.52
    exit_cooldown_sec: float = 0.50
    pad_sec: float = 1.5
    min_segment_sec: float = 1.0
    bridge_gap_sec: float = 1.0
    total_frames: int = 0


@dataclass
class SpanBuilder:
    cfg: SpanBuilderConfig
    active: bool = False
    start: int = 0
    neg_run: int = 0
    spans: List[Span] = field(default_factory=list)

    @property
    def _pad(self) -> int:
        return int(round(max(0.0, self.cfg.pad_sec) * self.cfg.fps))

    @property
    def _min_len(self) -> int:
        return int(round(max(0.0, self.cfg.min_segment_sec) * self.cfg.fps))

    @property
    def _exit_cool(self) -> int:
        return int(round(max(0.0, self.cfg.exit_cooldown_sec) * self.cfg.fps))

    def _commit(self, end_idx: int) -> None:
        s = max(0, self.start - self._pad)
        e = end_idx + self._pad
        if self.cfg.total_frames > 0:
            # total_frames <= 0 means UNKNOWN length (cv2 can't always
            # report frame counts): no upper clamp then — clamping to -1
            # would silently drop every span of the whole scan
            e = min(self.cfg.total_frames - 1, e)
        if e - s + 1 >= self._min_len:
            # merge only on genuine touch/overlap with the previous span —
            # after a backward seek the new span can lie entirely BEFORE it
            # (finish() sorts, so append is safe)
            if (self.spans and s <= self.spans[-1][1] + 1
                    and e >= self.spans[-1][0] - 1):
                prev_s, prev_e = self.spans[-1]
                self.spans[-1] = (min(prev_s, s), max(prev_e, e))
            else:
                self.spans.append((s, e))

    def update(self, frame_idx: int, best_fd: float) -> bool:
        """Feed one sample (in frame order). Returns True when this sample
        CLOSED a span (the prescan driver resets its fd9 gate streak then,
        like the reference's span-close branch)."""
        if best_fd <= self.cfg.enter:
            if not self.active:
                self.active = True
                self.start = frame_idx
            self.neg_run = 0
        elif self.active:
            self.neg_run += 1
            if (self.neg_run * self.cfg.stride >= self._exit_cool
                    or best_fd >= self.cfg.exit):
                self._commit(frame_idx)
                self.active = False
                self.neg_run = 0
                return True
        return False

    def update_batch(self, frame_idxs: Sequence[int],
                     best_fds: Sequence[float]) -> None:
        for i, fd in zip(frame_idxs, best_fds):
            self.update(int(i), float(fd))

    def interrupt(self, last_idx: int) -> None:
        """Close any active span at ``last_idx``. Call when the sample stream
        jumps (interactive seek): without this a forward seek silently
        extends the active span across unseen video, and a backward seek
        feeds the span a start > end."""
        if self.active:
            self._commit(last_idx)
            self.active = False
            self.neg_run = 0

    def finish(self, last_idx: Optional[int] = None) -> List[Span]:
        """Close any open span at EOF, bridge gaps, return the final spans.

        ``last_idx``: last scanned frame index — the open-span end for
        unknown-length streams (total_frames <= 0); with a known total the
        span closes at total_frames - 1 as before."""
        if self.active:
            if self.cfg.total_frames > 0:
                end = self.cfg.total_frames - 1 - self._pad  # _commit re-pads
            else:
                end = (last_idx if last_idx is not None else self.start)
            self._commit(max(self.start, end))
            self.active = False
        # backward seeks feed samples out of global order: _commit only
        # merges with the immediately previous span, so normalize (sort +
        # merge overlaps) before bridging, which assumes sorted input
        merged: List[Span] = []
        for s, e in sorted(self.spans):
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        return bridge_gaps(merged, self.cfg.bridge_gap_sec, self.cfg.fps)


def bridge_gaps(spans: List[Span], bridge_gap_sec: float, fps: float) -> List[Span]:
    """Merge spans separated by gaps <= bridge_gap_sec of video."""
    if not spans or bridge_gap_sec <= 0:
        return list(spans)
    gap = int(round(bridge_gap_sec * fps))
    bridged: List[Span] = []
    cs, ce = spans[0]
    for s, e in spans[1:]:
        if s - ce <= gap:
            ce = max(ce, e)
        else:
            bridged.append((cs, ce))
            cs, ce = s, e
    bridged.append((cs, ce))
    return bridged


def span_index_for(f: int, spans: Sequence[Span]) -> Optional[int]:
    """Index of the span containing frame ``f``, else the next span's index,
    else None when past all spans."""
    for i, (s, e) in enumerate(spans):
        if s <= f <= e:
            return i
        if f < s:
            return i
    return None


@dataclass
class Fd9SkipGate:
    """No-face fast-forward: after ``grace`` consecutive fd≈9 samples while no
    span is active, only probe every ``probe_period``-th sample and report the
    rest as fd=9 without running the detector."""

    enabled: bool = True
    grace: int = 1
    probe_period: int = 2
    streak: int = 0

    def should_skip(self, span_active: bool) -> bool:
        """Decide BEFORE extraction whether this sample may skip the device."""
        if span_active or not self.enabled:
            return False
        grace = max(0, int(self.grace))
        period = max(1, int(self.probe_period))
        return self.streak >= grace and (self.streak % period) != 0

    def observe(self, best_fd: float) -> None:
        """Feed the sample's resulting fd (9.0 when skipped)."""
        if best_fd >= 8.99:
            self.streak += 1
        else:
            self.streak = 0

    def reset(self) -> None:
        self.streak = 0
