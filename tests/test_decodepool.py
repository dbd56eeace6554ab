"""Striped multi-worker decode pool (video/decodepool.py, VERDICT r3
next #3): order/results identical to a single reader at any worker count,
wall time scales with workers on a slow decoder, deviations (seeks,
fd9-style skips, live stride changes) replan correctly."""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from person_capture_tpu.video.decodepool import (StripedDecodeReader,
                                                 _cut_blocks,
                                                 _plan_segments)
from person_capture_tpu.video.reader import VideoMeta


class FakeReader:
    """Deterministic reader: frame pixel encodes its index; optional
    per-read delay simulates decode cost; `opens`/`reads` shared counters
    audit pool behavior."""

    def __init__(self, total: int, delay: float = 0.0, stats=None,
                 true_end: int = -1):
        self.pos = 0
        self.total = int(total)
        self.true_end = int(true_end) if true_end >= 0 else int(total)
        self.delay = float(delay)
        self.stats = stats if stats is not None else {}
        self.stats["opens"] = self.stats.get("opens", 0) + 1

    def read(self):
        if self.pos >= self.true_end:
            return None
        if self.delay:
            time.sleep(self.delay)
        f = np.zeros((2, 2, 3), np.uint8)
        f[0, 0, 0] = self.pos % 256
        f[0, 0, 1] = self.pos // 256
        self.pos += 1
        self.stats["reads"] = self.stats.get("reads", 0) + 1
        return f

    def skip(self, n: int) -> int:
        n = max(0, int(n))
        d = min(n, self.true_end - self.pos)
        self.pos += d
        return d

    def seek(self, i: int) -> None:
        self.pos = min(int(i), self.true_end)

    def meta(self):
        return VideoMeta(2, 2, 30.0, self.total)

    def release(self):
        pass


def _decoded_idx(frame) -> int:
    return int(frame[0, 0, 0]) + 256 * int(frame[0, 0, 1])


def _walk_spans(reader, spans, stride):
    """The main-pass consumption pattern: seek to each span start, then
    read + skip(stride-1) while inside the span. Returns decoded indices
    (asserting pixel payload == position)."""
    out = []
    for s, e in spans:
        reader.seek(s)
        idx = s
        while idx <= e:
            f = reader.read()
            if f is None:
                return out
            assert _decoded_idx(f) == idx
            out.append(idx)
            skipped = reader.skip(stride - 1)
            idx += 1 + skipped
            if skipped < stride - 1:
                return out
    return out


def _expected(spans, stride, total=None):
    out = []
    for s, e in spans:
        if total is not None:
            e = min(e, total - 1)
        out.extend(range(s, e + 1, stride))
    return out


def test_plan_segments_and_blocks():
    segs = _plan_segments([(0, 10), (20, 23)], 3)
    assert segs == [(0, 4, 3), (20, 2, 3)]
    # replan from inside span 0: re-phases at from_pos
    assert _plan_segments([(0, 10), (20, 23)], 3, from_pos=5) == \
        [(5, 2, 3), (20, 2, 3)]
    # replan from a gap: next span extends backward
    assert _plan_segments([(0, 10), (20, 23)], 3, from_pos=14) == \
        [(14, 4, 3), ]
    blocks = _cut_blocks([(0, 7, 2)], 3)
    assert blocks == [(0, 3, 2), (6, 3, 2), (12, 1, 2)]
    assert sum(n for _, n, _ in blocks) == 7


@pytest.mark.parametrize("workers", [1, 2, 3])
def test_order_identical_to_single_reader(workers):
    spans = [(5, 40), (60, 61), (80, 119)]
    stride = 3
    r = StripedDecodeReader(lambda: FakeReader(140), spans, stride,
                            workers=workers, total_frames=140,
                            block_samples=4)
    try:
        assert _walk_spans(r, spans, stride) == _expected(spans, stride)
    finally:
        r.release()


def test_fd9_style_skip_discards_samples():
    """Prescan's gate path: at a grid point, skip(stride) drops that
    sample entirely; the next read serves the following grid point."""
    r = StripedDecodeReader(lambda: FakeReader(100), [(0, 99)], 4,
                            workers=3, total_frames=100, block_samples=4)
    try:
        got = []
        idx = 0
        while idx < 96:
            if idx % 16 == 0 and idx > 0:     # every 4th sample: skip it
                assert r.skip(4) == 4
                idx += 4
                continue
            f = r.read()
            assert f is not None and _decoded_idx(f) == idx
            got.append(idx)
            assert r.skip(3) == 3
            idx += 4
        assert got == [i for i in range(0, 96, 4) if not (i % 16 == 0
                                                          and i > 0)]
    finally:
        r.release()


def test_backward_seek_replans():
    r = StripedDecodeReader(lambda: FakeReader(60), [(0, 59)], 2,
                            workers=2, total_frames=60, block_samples=4)
    try:
        for idx in range(0, 20, 2):
            assert _decoded_idx(r.read()) == idx
            r.skip(1)
        r.seek(4)                              # interactive backward seek
        for idx in range(4, 16, 2):
            assert _decoded_idx(r.read()) == idx
            r.skip(1)
    finally:
        r.release()


def test_live_stride_change_replans():
    r = StripedDecodeReader(lambda: FakeReader(100), [(0, 99)], 2,
                            workers=2, total_frames=100, block_samples=4)
    try:
        for idx in range(0, 10, 2):
            assert _decoded_idx(r.read()) == idx
            r.skip(1)
        r.stride = 5                           # live key change (mainpass)
        idx = 10
        for _ in range(6):
            f = r.read()
            assert _decoded_idx(f) == idx
            r.skip(4)
            idx += 5
    finally:
        r.release()


def test_eof_before_metadata_total():
    """Metadata overstates the frame count: reads return None at the true
    end instead of hanging or serving wrong frames."""
    r = StripedDecodeReader(lambda: FakeReader(100, true_end=57),
                            [(0, 99)], 4, workers=3, total_frames=100,
                            block_samples=4)
    try:
        got = _walk_spans(r, [(0, 99)], 4)
        assert got == list(range(0, 57, 4))
        assert r.read() is None
    finally:
        r.release()


def test_skip_shortfall_contract_at_metadata_end():
    r = StripedDecodeReader(lambda: FakeReader(50), [(0, 49)], 2,
                            workers=2, total_frames=50, block_samples=8)
    try:
        r.seek(44)
        assert _decoded_idx(r.read()) == 44
        assert r.skip(1) == 1
        assert _decoded_idx(r.read()) == 46
        # crossing the metadata end reports the shortfall
        assert r.skip(10) == 3
    finally:
        r.release()


def test_wall_time_scales_with_workers():
    """The acceptance test from VERDICT r3 next #3: a slow fake decoder
    (4 ms/frame) and 150 samples — 3 workers must beat 1 worker clearly,
    with identical results."""
    spans = [(0, 149)]

    def run(workers):
        r = StripedDecodeReader(lambda: FakeReader(150, delay=0.004),
                                spans, 1, workers=workers,
                                total_frames=150, block_samples=8)
        try:
            t0 = time.perf_counter()
            got = _walk_spans(r, spans, 1)
            return time.perf_counter() - t0, got
        finally:
            r.release()

    t1, got1 = run(1)
    t3, got3 = run(3)
    assert got1 == got3 == _expected(spans, 1)
    # generous margin for CI noise; perfect scaling would be 3x
    assert t3 < 0.66 * t1, (t1, t3)


def test_one_reader_per_worker_and_release_joins():
    stats = {}
    r = StripedDecodeReader(lambda: FakeReader(40, stats=stats),
                            [(0, 39)], 2, workers=3, total_frames=40,
                            block_samples=4)
    try:
        _walk_spans(r, [(0, 39)], 2)
    finally:
        r.release()
    assert stats["opens"] == 3
    assert not any(th.is_alive() for th in r._gen.threads)
    # every sample decoded exactly once (no duplicate decode across
    # workers)
    assert stats["reads"] == 20


def test_meta_matches_factory():
    r = StripedDecodeReader(lambda: FakeReader(40), [(0, 39)], 2,
                            workers=2, total_frames=40)
    try:
        m = r.meta()
        assert (m.width, m.height, m.total_frames) == (2, 2, 40)
    finally:
        r.release()


def test_consumer_blocks_until_slow_block_arrives():
    """Block 0 slower than later blocks: the consumer still serves in
    order (reorder buffer holds completed later blocks)."""
    mk = {"n": 0}
    lock = threading.Lock()

    def factory():
        with lock:
            mk["n"] += 1
            first = mk["n"] == 1
        return FakeReader(60, delay=0.01 if first else 0.0)

    r = StripedDecodeReader(factory, [(0, 59)], 2, workers=2,
                            total_frames=60, block_samples=4)
    try:
        assert _walk_spans(r, [(0, 59)], 2) == _expected([(0, 59)], 2)
    finally:
        r.release()


def test_mainpass_hits_identical_pool_vs_single(tmp_path):
    """Driver-level acceptance (VERDICT r3 next #3): the REAL main pass
    over a synthetic video produces identical hit lists with the striped
    pool (3 workers) and a single prefetch reader."""
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.mainpass import run_main_pass
    from person_capture_tpu.pipeline.saver import AsyncSaver
    from person_capture_tpu.video.reader import (Cv2Reader,
                                                 StridedPrefetchReader)
    from person_capture_tpu.video.synthetic import generate_video

    path = str(tmp_path / "m.mp4")
    sv = generate_video(path, width=320, height=240, fps=30.0,
                        total_frames=160,
                        segments=[(18, 70, 0), (100, 140, 0)])
    spans = [(18, 70), (100, 140)]

    def run(reader, out_dir):
        backend = OracleBackend(sv)
        bank = RefBank(cap=8)
        bank.seed([backend.identity_feat(0)])
        cfg = SessionConfig()
        cfg.out_dir = out_dir
        cfg.frame_stride = 3
        cfg.min_gap_sec = 0.4
        cfg.tpu_batch_frames = 8
        cfg.min_box_pixels = 100
        cfg.face_quality_min = 0.0
        cfg.min_sharpness = 0.0
        try:
            with AsyncSaver(cfg.out_dir) as saver:
                res = run_main_pass(reader, backend, cfg, bank, spans,
                                    saver, batch_size=8)
        finally:
            reader.release()
        return [(h.frame, h.crop) for h in res.hits]

    single = run(StridedPrefetchReader(Cv2Reader(path), 3),
                 str(tmp_path / "a"))
    pooled = run(StripedDecodeReader(lambda: Cv2Reader(path), spans, 3,
                                     workers=3, total_frames=160,
                                     block_samples=4),
                 str(tmp_path / "b"))
    assert single and single == pooled


def test_prescan_spans_identical_pool_vs_single(tmp_path):
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.prescan import run_prescan
    from person_capture_tpu.video.reader import (Cv2Reader,
                                                 StridedPrefetchReader)
    from person_capture_tpu.video.synthetic import generate_video

    path = str(tmp_path / "p.mp4")
    sv = generate_video(path, width=320, height=240, fps=30.0,
                        total_frames=240,
                        segments=[(30, 90, 0), (150, 210, 0)])

    def run(reader):
        backend = OracleBackend(sv)
        bank = RefBank(cap=8)
        bank.seed([backend.identity_feat(0)])
        cfg = SessionConfig()
        cfg.prescan_stride = 6
        cfg.tpu_batch_frames = 8
        try:
            res = run_prescan(reader, backend, cfg, bank)
        finally:
            reader.release()
        return res.spans, res.samples

    single = run(StridedPrefetchReader(Cv2Reader(path), 6))
    pooled = run(StripedDecodeReader(lambda: Cv2Reader(path), [(0, 239)], 6,
                                     workers=3, total_frames=240,
                                     block_samples=5))
    assert single == pooled and single[0]


def test_backward_seek_after_midstream_eof_replans():
    """A consumer seek BACK to decodable frames after a mid-stream EOF
    must revive decode (review finding: the eof state was terminal)."""
    r = StripedDecodeReader(lambda: FakeReader(100, true_end=50),
                            [(0, 99)], 2, workers=2, total_frames=100,
                            block_samples=4)
    try:
        got = _walk_spans(r, [(0, 99)], 2)
        assert got == list(range(0, 50, 2))
        assert r.read() is None           # mid-stream EOF reached
        r.seek(10)                         # interactive scrub-back
        for idx in range(10, 20, 2):
            f = r.read()
            assert f is not None and _decoded_idx(f) == idx
            r.skip(1)
    finally:
        r.release()


def test_health_aggregates_update_mid_run():
    """recoveries/failed must be readable BEFORE release (the engine
    reports reader health right after the phase, pre-release)."""

    class RecoveringFake(FakeReader):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.recoveries = 2
            self.failed = False

    r = StripedDecodeReader(lambda: RecoveringFake(40), [(0, 39)], 2,
                            workers=2, total_frames=40, block_samples=4)
    try:
        got = _walk_spans(r, [(0, 39)], 2)
        assert len(got) == 20
        assert r.recoveries >= 2 and r.failed is False
    finally:
        r.release()


def test_constructor_meta_avoids_probe_spawn():
    from person_capture_tpu.video.reader import VideoMeta

    stats = {}
    m = VideoMeta(2, 2, 30.0, 40)
    r = StripedDecodeReader(lambda: FakeReader(40, stats=stats),
                            [(0, 39)], 2, workers=2, total_frames=40,
                            meta=m)
    try:
        assert r.meta() is m
        assert stats["opens"] == 2        # workers only, no meta probe
    finally:
        r.release()


def test_crashing_factory_terminates_not_spins():
    """A factory whose readers die before claiming a block deposits
    nothing: stall->replan->stall must be BOUNDED (review finding: the
    consumer read() would replan forever, pegging a core)."""

    def bad_open():
        raise RuntimeError("decoder exploded")

    r = StripedDecodeReader(bad_open, [(0, 99)], 2, workers=2,
                            total_frames=100, block_samples=4)
    try:
        t0 = time.time()
        assert r.read() is None
        assert time.time() - t0 < 30
        assert r.failed is True
        assert "decoder exploded" in (r.last_failure or "")
    finally:
        r.release()


def test_stall_counter_resets_on_progress():
    """Legitimate stalls (seek-back past a dead pool) that DO revive
    decode must not accumulate toward the no-progress bound."""
    r = StripedDecodeReader(lambda: FakeReader(100, true_end=50),
                            [(0, 99)], 2, workers=2, total_frames=100,
                            block_samples=4)
    try:
        for _ in range(4):                 # 4 > the replan bound of 2
            got = _walk_spans(r, [(0, 99)], 2)
            assert got == list(range(0, 50, 2))
            assert r.read() is None        # EOF -> pool dead
            r.seek(0)                      # scrub back revives it
    finally:
        r.release()
