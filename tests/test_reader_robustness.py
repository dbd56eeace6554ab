"""Pipe-reader seek/respawn, stderr tail, soft-EOF, and seekless-reader
backward resync (reference robustness: video_io.py:1394-1399, 1580-1598,
3030-3138).

No ffmpeg exists in this image, so a deterministic fake binary stands in:
it probes like ffmpeg (consumes -ss/-i/-vf/rawvideo args), emits bgr24
frames whose every byte equals ``frame_idx % 256``, writes progress lines
to stderr, and can be told to die mid-stream.
"""

from __future__ import annotations

import os
import stat
import sys

import numpy as np
import pytest

from person_capture_tpu.video.reader import (Cv2Reader, FfmpegPipeReader,
                                             StridedPrefetchReader)
from person_capture_tpu.video.synthetic import generate_video

W, H, FPS, TOTAL = 64, 48, 30.0, 120

FAKE_FFMPEG = f"""#!{sys.executable}
import math, os, sys
args = sys.argv[1:]
ss = 0.0
pix = "bgr24"
for i, a in enumerate(args):
    if a == "-ss":
        ss = float(args[i + 1])
    if a == "-pix_fmt":
        pix = args[i + 1]
fps, W, H, total = {FPS}, {W}, {H}, {TOTAL}
sys.stderr.write("fake-ffmpeg: opened input\\n")
sys.stderr.flush()
start = math.ceil(ss * fps - 1e-6)
die_after = int(os.environ.get("FAKE_FFMPEG_DIE_AFTER", "0"))
out = sys.stdout.buffer
emitted = 0
for k in range(start, total):
    if die_after and emitted >= die_after:
        sys.stderr.write("fake-ffmpeg: corrupt packet at frame %d\\n" % k)
        sys.stderr.flush()
        sys.exit(3)
    nbytes = W * H * 3 if pix == "bgr24" else W * H * 3 // 2
    try:
        out.write(bytes([k % 256]) * nbytes)
        out.flush()
    except BrokenPipeError:
        sys.exit(0)
    emitted += 1
sys.stderr.write("fake-ffmpeg: end of stream\\n")
sys.exit(0)
"""


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "rb.mp4")
    return generate_video(path, width=W, height=H, fps=FPS,
                          total_frames=TOTAL, segments=[])


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    script = str(tmp_path / "fake_ffmpeg.py")
    with open(script, "w") as fh:
        fh.write(FAKE_FFMPEG)
    os.chmod(script, os.stat(script).st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PERSON_CAPTURE_FFMPEG", script)
    return script


def _val(frame):
    return int(frame[0, 0, 0])


def test_pipe_sequential_and_block_skip(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    assert _val(r.read()) == 0
    assert _val(r.read()) == 1
    assert r.skip(20) == 20          # block-skip drains in ≤8-frame chunks
    assert _val(r.read()) == 22
    assert r.pos == 23
    r.release()


def test_pipe_seek_forward_and_backward(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    for _ in range(5):
        r.read()
    r.seek(50)
    assert _val(r.read()) == 50 and r.pos == 51
    r.seek(10)                       # backward: decoder respawn + preroll
    assert _val(r.read()) == 10
    r.seek(0)
    assert _val(r.read()) == 0
    r.seek(1)                        # inside the preroll window
    assert _val(r.read()) == 1
    r.release()


def test_pipe_soft_eof(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    r.seek(TOTAL - 2)
    assert _val(r.read()) == TOTAL - 2
    assert _val(r.read()) == TOTAL - 1
    assert r.read() is None
    assert r.eof_reason == "eof" and not r.failed
    assert "fake-ffmpeg" in r.stderr_tail()
    r.release()


def test_pipe_decoder_death_is_distinguished(synth, fake_ffmpeg,
                                             monkeypatch):
    monkeypatch.setenv("FAKE_FFMPEG_DIE_AFTER", "10")
    r = FfmpegPipeReader(synth.path)
    n = 0
    while r.read() is not None:
        n += 1
    assert n == 10
    assert r.failed
    assert "rc=3" in r.eof_reason
    assert "corrupt packet" in r.eof_reason   # stderr tail carried along
    r.release()


def test_pipe_seek_after_eof_recovers(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    r.seek(TOTAL - 1)
    r.read()
    assert r.read() is None and r.eof_reason == "eof"
    r.seek(5)                        # respawn clears the EOF state
    assert r.eof_reason is None
    assert _val(r.read()) == 5
    r.release()


# ---- seekless-reader backward resync ----------------------------------


class SeeklessReader:
    """Cv2Reader with its seek() hidden — models a pipe-like reader."""

    def __init__(self, path):
        self._r = Cv2Reader(path)

    def read(self):
        f = self._r.read()
        self.pos = self._r.pos
        return f

    def skip(self, n):
        d = self._r.skip(n)
        self.pos = self._r.pos
        return d

    def meta(self):
        return self._r.meta()

    def release(self):
        self._r.release()

    pos = 0


def test_prefetch_backward_resync_via_reopen(synth):
    pf = StridedPrefetchReader(SeeklessReader(synth.path), stride=6,
                               reopen=lambda: SeeklessReader(synth.path))
    pf.read()
    pf.skip(5)
    pf.read()                        # frame 6
    pf.seek(2)                       # backward on a seekless reader
    f = pf.read()
    assert pf.pos == 3
    pf.release()
    direct = Cv2Reader(synth.path)
    direct.seek(2)
    np.testing.assert_array_equal(f, direct.read())
    direct.release()


def test_prefetch_backward_without_reopen_raises(synth):
    pf = StridedPrefetchReader(SeeklessReader(synth.path), stride=6)
    pf.read()
    pf.skip(5)
    pf.read()
    with pytest.raises(RuntimeError, match="seekless"):
        pf.seek(0)
    pf.release()


def test_prefetch_small_skip_behind_worker(synth):
    """skip() smaller than the speculative stride forces the worker to
    step BACK — the silent-no-op bug corrupted every later frame here."""
    pf = StridedPrefetchReader(SeeklessReader(synth.path), stride=10,
                               reopen=lambda: SeeklessReader(synth.path))
    pf.read()                        # frame 0; worker speculates to 10+
    pf.skip(2)                       # driver only wants frame 3
    f = pf.read()
    assert pf.pos == 4
    pf.release()
    direct = Cv2Reader(synth.path)
    direct.seek(3)
    np.testing.assert_array_equal(f, direct.read())
    direct.release()


def test_mainpass_backward_seek_on_seekless_reader(tmp_path):
    """VERDICT r2 'done' criterion: an interactive backward seek during the
    main pass over a seekless (pipe-like) reader must yield exactly the hit
    frames of the same run on a fully seekable reader."""
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.mainpass import run_main_pass
    from person_capture_tpu.pipeline.saver import AsyncSaver

    path = str(tmp_path / "mp.mp4")
    sv = generate_video(path, width=320, height=240, fps=30.0,
                        total_frames=150, segments=[(30, 120, 0)])

    def cfg_for(sub):
        cfg = SessionConfig()
        cfg.out_dir = str(tmp_path / sub)
        cfg.frame_stride = 3
        cfg.min_gap_sec = 0.5
        cfg.tpu_batch_frames = 8
        cfg.min_box_pixels = 100
        cfg.face_quality_min = 0.0
        cfg.min_sharpness = 0.0
        return cfg

    def seek_schedule():
        polls = {"n": 0}

        def req():
            polls["n"] += 1
            return 40 if polls["n"] == 20 else None   # backward: idx≈87→40

        return req

    def run(reader, sub, reopen=None):
        backend = OracleBackend(sv)
        bank = RefBank(cap=8)
        bank.seed([backend.identity_feat(0)])
        cfg = cfg_for(sub)
        pf = StridedPrefetchReader(reader, cfg.frame_stride, reopen=reopen)
        with AsyncSaver(cfg.out_dir) as saver:
            res = run_main_pass(pf, backend, cfg, bank, [(30, 120)], saver,
                                batch_size=8, seek_request=seek_schedule())
        pf.release()
        return [h.frame for h in res.hits]

    ref_hits = run(Cv2Reader(path), "seekable")
    got_hits = run(SeeklessReader(path), "seekless",
                   reopen=lambda: SeeklessReader(path))
    assert ref_hits, "fixture must produce hits"
    assert got_hits == ref_hits


# ---- mid-stream decode-failure recovery ---------------------------------


class FlakyReader:
    """Seekable fake that dies at a given frame until reopened past it."""

    def __init__(self, total, die_at, state):
        self.total = total
        self.die_at = die_at
        self.state = state          # shared dict: {"opens": n}
        self.pos = 0
        self.failed = False
        self.eof_reason = None

    def read(self):
        if self.pos == self.die_at and self.state["armed"]:
            self.failed = True
            self.eof_reason = "ffmpeg exited rc=3: corrupt packet"
            return None
        if self.pos >= self.total:
            self.eof_reason = "eof"
            return None
        f = np.full((4, 4, 3), self.pos % 256, np.uint8)
        self.pos += 1
        return f

    def skip(self, n):
        done = min(n, max(0, self.total - self.pos))
        self.pos += done
        return done

    def seek(self, i):
        self.pos = int(i)

    def release(self):
        pass


def test_resilient_reader_recovers_past_bad_frame():
    from person_capture_tpu.video.reader import ResilientReader

    state = {"opens": 0, "armed": True}

    def reopen():
        state["opens"] += 1
        state["armed"] = False       # fresh decoder gets past the bad spot
        return FlakyReader(20, 7, state)

    r = ResilientReader(FlakyReader(20, 7, state), reopen, total_frames=20)
    vals = []
    while True:
        f = r.read()
        if f is None:
            break
        vals.append(int(f[0, 0, 0]))
    # frame 7 poisoned: recovery resumes at 8; everything else intact
    assert vals == list(range(7)) + list(range(8, 20))
    assert r.recoveries == 1
    assert "corrupt packet" in r.last_failure
    assert state["opens"] == 1


def test_resilient_reader_does_not_retry_clean_eof():
    from person_capture_tpu.video.reader import ResilientReader

    state = {"opens": 0, "armed": False}

    def reopen():
        state["opens"] += 1
        return FlakyReader(5, -1, state)

    r = ResilientReader(FlakyReader(5, -1, state), reopen, total_frames=5)
    n = 0
    while r.read() is not None:
        n += 1
    assert n == 5
    assert r.recoveries == 0 and state["opens"] == 0


def test_resilient_reader_gives_up_on_persistent_failure():
    from person_capture_tpu.video.reader import ResilientReader

    state = {"opens": 0, "armed": True}

    class DeadReader:
        pos = 0
        failed = True
        eof_reason = "ffmpeg exited rc=3"

        def read(self):
            return None

        def skip(self, n):
            return 0

        def seek(self, i):
            self.pos = int(i)

        def release(self):
            pass

    def reopen():
        state["opens"] += 1
        return DeadReader()                 # every reopen dies immediately

    bad = FlakyReader(20, 3, state)
    r = ResilientReader(bad, reopen, total_frames=20, max_retries=2)
    vals = []
    while True:
        f = r.read()
        if f is None:
            break
        vals.append(int(f[0, 0, 0]))
    assert vals == [0, 1, 2]
    assert state["opens"] == 2          # bounded retries, no infinite loop


def test_prefetch_over_resilient_reader(synth):
    """The production stack: prefetch(resilient(base)) survives a
    mid-stream death transparently to the striding driver."""
    from person_capture_tpu.video.reader import ResilientReader

    state = {"opens": 0, "armed": True}

    def reopen():
        state["opens"] += 1
        state["armed"] = False
        return FlakyReader(60, 30, state)

    base = ResilientReader(FlakyReader(60, 30, state), reopen,
                           total_frames=60)
    pf = StridedPrefetchReader(base, stride=6)
    got = []
    while True:
        f = pf.read()
        if f is None:
            break
        got.append(int(f[0, 0, 0]))
        pf.skip(5)
    pf.release()
    # stride-6 samples 0,6,12,...,54; the death at 30 is healed (30 is a
    # sampled frame: recovery resumes at 31, later samples realign on 37+)
    assert got[:5] == [0, 6, 12, 18, 24]
    assert len(got) >= 9 and state["opens"] == 1


# ---- review regressions (round-3 self-review findings) ------------------


def test_buffered_first_frame_seek_discards_probe(synth, fake_ffmpeg):
    """_BufferedFirstFrame must implement seek itself: forwarding through
    __getattr__ left the buffered probe frame 0 to be replayed at the seek
    target with a stale pos (HDR analysis reader + span seek)."""
    from person_capture_tpu.video.reader import (FfmpegPipeReader,
                                                 _probe_first_frame)

    r = _probe_first_frame(FfmpegPipeReader(synth.path))
    assert r is not None
    r.seek(50)
    f = r.read()
    assert _val(f) == 50, "stale probe frame replayed after seek"
    assert r.pos == 51


def test_pipe_seek_past_eof_clamps_pos(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    r.seek(TOTAL + 10)
    assert r.pos == TOTAL + 10          # documented: pos = target
    assert r.read() is None
    assert r.eof_reason == "eof" and not r.failed
    r.release()


def test_pipe_small_forward_seek_drains_without_respawn(synth, fake_ffmpeg):
    """Forward gaps within FORWARD_DRAIN_MAX drain the live pipe — the
    fd9 gate and prefetch resyncs must not pay a decoder respawn each."""
    r = FfmpegPipeReader(synth.path)
    r.read()
    p0 = r.proc
    r.seek(r.pos + 10)                  # small forward: same process
    assert r.proc is p0
    assert _val(r.read()) == 11
    r.seek(r.pos + FfmpegPipeReader.FORWARD_DRAIN_MAX + 5)  # far: respawn
    assert r.proc is not p0
    r.release()


def test_resilient_reader_trusts_clean_pipe_eof_over_overcounted_total(
        synth, fake_ffmpeg):
    """Container metadata routinely overcounts frames; a decoder that
    exited cleanly (eof_reason='eof') must not trigger reopen retries."""
    from person_capture_tpu.video.reader import (FfmpegPipeReader,
                                                 ResilientReader)

    opens = {"n": 0}

    def reopen():
        opens["n"] += 1
        return FfmpegPipeReader(synth.path)

    r = ResilientReader(FfmpegPipeReader(synth.path), reopen,
                        total_frames=TOTAL + 5)   # overcounted metadata
    n = 0
    while r.read() is not None:
        n += 1
    assert n == TOTAL
    assert opens["n"] == 0 and r.recoveries == 0
    r.release()


def test_pipe_meta(synth, fake_ffmpeg):
    r = FfmpegPipeReader(synth.path)
    m = r.meta()
    assert (m.width, m.height) == (W, H)
    assert m.fps == pytest.approx(FPS, rel=0.01)
    assert m.total_frames == TOTAL
    r.release()


def test_pipe_rejects_unprobeable_dims(tmp_path, fake_ffmpeg):
    # a non-video file: cv2 and ffprobe both fail to give dimensions —
    # 0x0 must raise instead of yielding an infinite empty-frame stream
    bogus = str(tmp_path / "not_a_video.bin")
    with open(bogus, "wb") as fh:
        fh.write(b"\x00" * 256)
    with pytest.raises((IOError, OSError)):
        FfmpegPipeReader(bogus)


def test_zscale_chain_still_gets_downscale(synth, fake_ffmpeg):
    # 'zscale=' contains the substring 'scale=': the downscale-append
    # guard must match only a standalone scale FILTER
    import re

    chain = ("zscale=transfer=linear:npl=100,tonemap=mobius:desat=0.5,"
             "zscale=transfer=bt709:matrix=bt709")
    r = FfmpegPipeReader(synth.path, max_w=32, tonemap_vf=chain)
    assert re.search(r"(^|,)scale=32:", r._vf), r._vf
    r.release()
    # and a chain that already scales is left alone
    r2 = FfmpegPipeReader(synth.path, max_w=32,
                          tonemap_vf="scale=32:24:flags=area")
    assert r2._vf.count("scale=") == 1
    r2.release()


def test_prefetch_skip_reports_eof_shortfall(synth, fake_ffmpeg):
    r = StridedPrefetchReader(FfmpegPipeReader(synth.path), stride=4)
    for i in range(28):                    # samples 0, 4, ..., 108
        f = r.read()
        assert _val(f) == i * 4
        assert r.skip(3) == 3
    assert r.pos == 112
    got = r.skip(20)                       # crosses EOF at 120
    assert got == 8
    assert r.pos == 120
    assert r.read() is None
    r.release()


def test_prefetch_eof_sentinel_seek_no_deadlock(synth, fake_ffmpeg):
    # worker reaches EOF while the queue is full: the sentinel put must
    # not block while holding the worker lock (a consumer seek would
    # deadlock against it)
    import threading
    import time

    r = StridedPrefetchReader(FfmpegPipeReader(synth.path), stride=1,
                              depth=2)
    r.seek(TOTAL - 2)
    time.sleep(0.8)                        # worker fills queue + hits EOF
    got = []

    def do_seek():
        r.seek(10)
        got.append(_val(r.read()))

    t = threading.Thread(target=do_seek, daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "seek deadlocked against the EOF sentinel put"
    assert got and got[0] == 10
    r.release()


def test_pipe_nv12_mode(synth, fake_ffmpeg):
    # nv12 halves the pipe bytes; frames decode through cv2's NV12->BGR
    r = FfmpegPipeReader(synth.path, pix_fmt="nv12")
    assert r.pix_fmt == "nv12"
    assert r.frame_bytes == W * H * 3 // 2
    f = r.read()
    assert f is not None and f.shape == (H, W, 3)
    assert r.skip(5) == 5
    f2 = r.read()
    assert f2 is not None and r.pos == 7
    r.seek(TOTAL - 1)
    assert r.read() is not None
    assert r.read() is None and r.eof_reason == "eof"
    r.release()


def test_pipe_nv12_forces_bt601_limited(synth, fake_ffmpeg):
    # cv2's NV12->BGR assumes BT.601 limited: the chain must force the
    # matrix/range so 709/full-range sources aren't hue-shifted
    r = FfmpegPipeReader(synth.path, pix_fmt="nv12")
    assert "out_color_matrix=bt601" in r._vf
    assert "out_range=tv" in r._vf
    r.release()
    r2 = FfmpegPipeReader(synth.path)  # bgr24: no forced conversion
    assert "out_color_matrix" not in r2._vf
    r2.release()


def test_container_probe_cached_across_reopens(synth, fake_ffmpeg,
                                               monkeypatch):
    """ResilientReader reopen storms must not pay a cv2 container parse
    per retry (VERDICT r3 weak #7): the probe is memoized per
    (path, mtime, size) and invalidates when the file changes."""
    import person_capture_tpu.video.reader as R

    R._CONTAINER_PROBE_CACHE.clear()
    opens = []
    real_cap = R.cv2.VideoCapture

    def counting_cap(*a, **k):
        opens.append(a)
        return real_cap(*a, **k)

    monkeypatch.setattr(R.cv2, "VideoCapture", counting_cap)
    readers = [FfmpegPipeReader(synth.path) for _ in range(4)]
    for r in readers:
        assert (r.src_w, r.src_h) == (W, H)
        assert r.total_frames == TOTAL
        r.release()
    assert len(opens) == 1          # one parse, three cache hits

    # touching the file invalidates the entry
    st = os.stat(synth.path)
    os.utime(synth.path, (st.st_atime, st.st_mtime + 5))
    FfmpegPipeReader(synth.path).release()
    assert len(opens) == 2
