"""Persistent FfmpegP010Source pipe semantics (hdr/exporter.py): sequential
requests reuse one pipe; backward / far-forward requests re-seek. ffmpeg is
faked with an in-process frame generator (no binary in this image)."""

import io

import numpy as np
import pytest

from person_capture_tpu.hdr import exporter as E

W, H, FPS = 32, 16, 10.0


def _frame_bytes(idx: int) -> bytes:
    """Synthesized P010 frame whose Y plane encodes the frame index."""
    y = np.full((H, W), (idx << 6) & 0xFFFF, np.uint16)
    uv = np.full((H // 2, W // 2, 2), 512 << 6, np.uint16)
    return y.tobytes() + uv.tobytes()


class FakeProc:
    def __init__(self, start_idx: int, total: int = 1000):
        stream = b"".join(_frame_bytes(i) for i in range(start_idx, total))
        self.stdout = io.BytesIO(stream)

    def terminate(self):
        pass

    def wait(self, timeout=None):
        pass

    def kill(self):
        pass


@pytest.fixture
def source(monkeypatch):
    monkeypatch.setattr("person_capture_tpu.video.reader.find_ffmpeg",
                        lambda: "/bin/fake-ffmpeg")
    src = E.FfmpegP010Source("v.mp4", W, H, FPS, preroll_sec=0.5,
                             seq_window_sec=2.0)
    spawned = []

    def fake_popen(cmd, **kw):
        ss = float(cmd[cmd.index("-ss") + 1])
        start = int(round(ss * FPS))
        spawned.append(start)
        return FakeProc(start)

    monkeypatch.setattr(E.subprocess, "Popen", fake_popen)
    src._spawned = spawned
    return src


def _idx_of(planes) -> int:
    return int(planes[0][0, 0]) >> 6


def test_sequential_requests_share_one_pipe(source):
    assert _idx_of(source.get_planes(20)) == 20
    assert source.respawns == 1
    # ascending requests within the window: no respawn
    for idx in (25, 30, 38):
        assert _idx_of(source.get_planes(idx)) == idx
    assert source.respawns == 1


def test_backward_request_reseeks(source):
    assert _idx_of(source.get_planes(50)) == 50
    assert _idx_of(source.get_planes(10)) == 10
    assert source.respawns == 2


def test_far_forward_request_reseeks(source):
    assert _idx_of(source.get_planes(10)) == 10
    # 2 s window at 10 fps = 20 frames; jump of 500 must re-seek
    assert _idx_of(source.get_planes(510)) == 510
    assert source.respawns == 2
    # the re-seek landed near the target (preroll), not at 10
    assert source._spawned[-1] >= 500


def test_eof_returns_none(source):
    assert source.get_planes(999) is not None
    assert source.get_planes(2000) is None
