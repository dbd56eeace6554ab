"""Keyframe-gated seek sampling (video/reader.py KeyframeSkipReader).

VERDICT r4 #3: prescan sampling grab-drained every intermediate frame
(cv2's grab still decodes) even though the repo already parses keyframe
indexes. The wrapper exact-seeks a skip when the index proves the seek
path decodes ≥ min_gain fewer frames; positions are identical either way.
Reference anchor: keyframe-aware ``_seek_to``, gui_app.py:3972-4104.
"""

import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.prescan import run_prescan
from person_capture_tpu.video.keyframes import read_keyframes
from person_capture_tpu.video.reader import (Cv2Reader, KeyframeSkipReader,
                                             StridedPrefetchReader)
from person_capture_tpu.video.synthetic import generate_video


class _CountingReader:
    """Fake seekable reader counting frame decodes: a drain of N frames
    costs N decodes; an exact seek to T costs T - prev_kf(T) decodes
    (what cv2's ffmpeg backend does internally)."""

    cheap_seek = True

    def __init__(self, total, keyframes):
        self.total = total
        self.keyframes = sorted(keyframes)
        self.pos = 0
        self.decodes = 0

    def _prev_kf(self, t):
        ks = [k for k in self.keyframes if k <= t]
        return ks[-1] if ks else 0

    def read(self):
        if self.pos >= self.total:
            return None
        self.decodes += 1
        self.pos += 1
        return np.full((4, 4, 3), self.pos - 1, np.uint8)

    def skip(self, count):
        done = min(max(0, count), self.total - self.pos)
        self.decodes += done
        self.pos += done
        return done

    def seek(self, target):
        target = min(int(target), self.total)
        self.decodes += target - self._prev_kf(target)
        self.pos = target

    def release(self):
        pass


def test_seek_chosen_only_when_it_saves_decodes():
    kfs = list(range(0, 1000, 10))          # GOP 10
    r = _CountingReader(1000, kfs)
    w = KeyframeSkipReader(r, kfs, total_frames=1000, min_gain=12,
                           mode="seek")

    # stride-24-style skip: target 24, prev kf 20 -> seek costs 4 decodes,
    # drain costs 24 -> gain 20 >= 12: seek
    assert w.skip(24) == 24 and w.pos == 24
    assert w.seeks == 1 and r.decodes == 4

    # short skip below min_gain always drains
    d0 = r.decodes
    assert w.skip(5) == 5
    assert w.seeks == 1 and r.decodes == d0 + 5

    # long-GOP content: no keyframe between pos and target -> drain
    r2 = _CountingReader(1000, [0, 500])
    w2 = KeyframeSkipReader(r2, [0, 500], total_frames=1000, min_gain=12,
                            mode="seek")
    w2.read()
    assert w2.skip(23) == 23
    assert w2.seeks == 0 and r2.decodes == 24   # 1 read + 23 drained

    # positions identical to a pure-drain reader across a mixed walk
    r3 = _CountingReader(1000, kfs)
    w3 = KeyframeSkipReader(r3, kfs, total_frames=1000, min_gain=12,
                            mode="seek")
    plain = _CountingReader(1000, kfs)
    for _ in range(12):
        a = w3.read()
        b = plain.read()
        assert np.array_equal(a, b)
        assert w3.skip(23) == plain.skip(23)
        assert w3.pos == plain.pos
    assert w3.seeks > 0
    assert r3.decodes < plain.decodes           # and it was cheaper


def test_eof_tail_and_uncheap_seek_fall_back_to_drain():
    kfs = list(range(0, 100, 10))
    r = _CountingReader(100, kfs)
    w = KeyframeSkipReader(r, kfs, total_frames=100, min_gain=5,
                           mode="seek")
    w.seek(80)
    # crossing the container end: must drain so the shortfall is real
    assert w.skip(30) == 20 and w.seeks == 0

    class _NoCheap(_CountingReader):
        cheap_seek = False                      # e.g. FfmpegPipeReader

    r2 = _NoCheap(1000, kfs)
    w2 = KeyframeSkipReader(r2, kfs, total_frames=1000, min_gain=5,
                            mode="seek")
    assert w2.skip(50) == 50
    assert w2.seeks == 0


def test_auto_mode_locks_the_cheaper_path():
    """The probe phase times alternating seek/drain skips and locks the
    winner: decode-bound content (seek decodes GOP/2 vs drain's full
    stride) locks seek; cheap-decode content with an expensive container
    seek (the measured mp4v case, tools_bench_seek_sampling.py) locks
    drain."""
    import time as _time

    kfs = list(range(0, 4000, 10))

    class _DecodeBound(_CountingReader):
        # 1 ms per decoded frame, seek cost == its decodes -> seek wins
        def read(self):
            _time.sleep(0.001)
            return super().read()

        def skip(self, n):
            _time.sleep(0.001 * max(0, min(n, self.total - self.pos)))
            return super().skip(n)

        def seek(self, t):
            _time.sleep(0.001 * (min(int(t), self.total)
                                 - self._prev_kf(min(int(t), self.total))))
            super().seek(t)

    class _SeekExpensive(_DecodeBound):
        def seek(self, t):                       # flat 60 ms container seek
            _time.sleep(0.06)
            _CountingReader.seek(self, t)

    for cls, expect in ((_DecodeBound, "seek"),
                        (_SeekExpensive, "drain")):
        r = cls(4000, kfs)
        w = KeyframeSkipReader(r, kfs, total_frames=4000, min_gain=12)
        assert w.mode == "auto"
        pos_trace = []
        for _ in range(10):
            w.read()
            w.skip(23)
            pos_trace.append(w.pos)
        assert w.mode == expect, (cls.__name__, w.mode)
        # and the walk stayed on the exact stride grid throughout
        assert pos_trace == [24 * (i + 1) for i in range(10)]


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "t.mp4")
    return generate_video(path, width=160, height=120, fps=30.0,
                          total_frames=240,
                          segments=[(30, 90, 0), (150, 200, 0)])


def _cfg(**kw):
    cfg = SessionConfig()
    cfg.prescan_stride = 24     # > the mp4v writer's GOP of 12
    cfg.prescan_pad_sec = 0.2
    cfg.prescan_min_segment_sec = 0.5
    cfg.prescan_bridge_gap_sec = 0.2
    cfg.prescan_exit_cooldown_sec = 0.2
    cfg.tpu_batch_frames = 8
    cfg.face_quality_min = 0.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_prescan_spans_identical_with_seek_sampling(synth):
    """Real mp4 (GOP 12 from the cv2 writer), real container keyframe
    index: seek-sampled prescan must produce byte-identical spans and
    per-sample fds vs grab-draining, while actually taking seeks."""
    kfs = read_keyframes(synth.path, 30.0, 240)
    assert kfs and len(kfs) >= 15           # writer emits ~GOP-12 mp4

    def run(wrap: bool):
        backend = OracleBackend(synth)
        bank = RefBank(cap=16)
        bank.seed([backend.identity_feat(0)])
        base = Cv2Reader(synth.path)
        wrapper = None
        if wrap:
            wrapper = KeyframeSkipReader(base, kfs, total_frames=240)
            reader = StridedPrefetchReader(wrapper, 24)
        else:
            reader = StridedPrefetchReader(base, 24)
        try:
            res = run_prescan(reader, backend, _cfg(), bank)
        finally:
            reader.release()
        return res, wrapper

    plain, _ = run(False)
    seeked, wrapper = run(True)
    assert seeked.spans == plain.spans
    assert seeked.per_sample_fd == plain.per_sample_fd
    assert seeked.samples == plain.samples
    assert wrapper.seeks > 0                # the fast path really engaged


def test_tail_guard_never_seeks_past_last_keyframe():
    """Container frame counts routinely overcount the decodable stream;
    beyond the LAST keyframe only that count vouches for frames, so a
    locked-seek reader must drain there — a seek would swallow the EOF
    shortfall the pipeline drivers key on (round-5 review finding)."""
    kfs = list(range(0, 91, 10))            # last keyframe at 90
    # claimed total 120, but the stream really ends at 95
    r = _CountingReader(95, kfs)
    w = KeyframeSkipReader(r, kfs, total_frames=120, min_gain=5,
                           mode="seek")
    w.seek(60)
    assert w.skip(25) == 25 and w.seeks == 1    # 85 < last kf: seek ok
    # next skip targets 110 >= last kf 90: must DRAIN and report the
    # true shortfall at 95 even though claimed total says 120
    assert w.skip(25) == 10
    assert w.pos == 95 and w.seeks == 1
