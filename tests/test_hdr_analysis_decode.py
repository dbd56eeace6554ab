"""HDR analysis decode selection (video/reader.py: build_tonemap_vf,
open_analysis_reader) — reference open_video_with_tonemap semantics
(video_io.py:1093-1160, 2245-2520): HDR sources must reach detection as
tone-mapped SDR; chain picked by capability + cfg.hdr_tonemap_pref."""

import numpy as np
import pytest

from person_capture_tpu.video import reader as R


def test_build_vf_libplacebo_preferred_when_available():
    f = frozenset({"libplacebo", "zscale", "tonemap", "scale"})
    chain, backend = R.build_tonemap_vf("auto", "bt.2390", filters=f)
    assert backend == "libplacebo"
    assert "tonemapping=bt.2390" in chain and "bt709" in chain


def test_build_vf_zscale_fallback():
    f = frozenset({"zscale", "tonemap", "scale"})
    chain, backend = R.build_tonemap_vf("auto", "bt.2390", filters=f)
    assert backend == "zscale"
    # bt.2390 rotates to a supported ffmpeg tonemap curve
    assert "tonemap=mobius" in chain
    assert "transfer=bt709" in chain


def test_build_vf_respects_explicit_pref():
    f = frozenset({"libplacebo", "zscale", "tonemap", "scale"})
    chain, backend = R.build_tonemap_vf("zscale", "hable", filters=f)
    assert backend == "zscale" and "tonemap=hable" in chain


def test_build_vf_scale_mode_and_scaling():
    f = frozenset({"scale"})
    chain, backend = R.build_tonemap_vf("scale", "bt.2390", filters=f,
                                        scale_w=384, scale_h=216)
    assert backend == "scale" and chain == "scale=384:216:flags=area"


def test_build_vf_none_when_nothing_available():
    chain, backend = R.build_tonemap_vf("auto", "bt.2390",
                                        filters=frozenset())
    assert backend == "none" and chain == ""


def test_open_analysis_reader_sdr_plain(tmp_path):
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, total_frames=8)
    r = R.open_analysis_reader(vid, hdr=False)
    try:
        assert r.read() is not None
    finally:
        r.release()


def test_open_analysis_reader_hdr_without_ffmpeg_warns(tmp_path,
                                                       monkeypatch):
    """Terminal branch: no ffmpeg chain ⇒ host tone-map wrapper (the
    reference's python-fallback analogue), not a raw washed Cv2Reader."""
    from person_capture_tpu.video.pytonemap import HostTonemapReader
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, total_frames=8)
    monkeypatch.setattr(R, "find_ffmpeg", lambda: None)
    msgs = []
    r = R.open_analysis_reader(vid, hdr=True, status=msgs.append)
    try:
        assert isinstance(r, HostTonemapReader)
        assert any("no working ffmpeg chain" in m for m in msgs)
    finally:
        r.release()


def test_open_analysis_reader_hdr_builds_tonemap_pipe(tmp_path,
                                                      monkeypatch):
    """With a (fake) ffmpeg available, the HDR analysis reader builds an
    FfmpegPipeReader carrying the tone-map chain."""
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, total_frames=8)
    captured = {}

    class FakePipe:
        pos = 0

        def __init__(self, path, max_w=0, tonemap_vf="", hwaccel="",
                     **kw):
            captured["vf"] = tonemap_vf

        def read(self):
            self.pos += 1
            return np.zeros((8, 8, 3), np.uint8)

        def skip(self, n):
            self.pos += n
            return n

        def release(self):
            pass

    monkeypatch.setattr(R, "find_ffmpeg", lambda: "/bin/true")
    monkeypatch.setattr(
        R, "probe_ffmpeg_filters",
        lambda: frozenset({"zscale", "tonemap", "scale"}))
    monkeypatch.setattr(R, "FfmpegPipeReader", FakePipe)
    msgs = []
    r = R.open_analysis_reader(vid, hdr=True, tonemap_pref="auto",
                               status=msgs.append)
    assert r.read() is not None  # probe frame replays
    assert "tonemap=" in captured["vf"]
    assert any("zscale chain" in m for m in msgs)


def test_open_analysis_reader_scale_chain_gets_host_tonemap(tmp_path,
                                                            monkeypatch):
    """ffmpeg with only `scale` (no libplacebo/zscale): auto mode wraps the
    pipe in the host tone-map instead of passing washed transfer-coded
    frames through (reference python-fallback, video_io.py:3276-3291); an
    EXPLICIT pref="scale" keeps the cheap washed mode."""
    from person_capture_tpu.video.pytonemap import HostTonemapReader
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, total_frames=8)

    class ScaleOnlyPipe:
        pos = 0
        failed = False
        recoveries = 3          # health fields must survive the wrap

        def __init__(self, path, max_w=0, tonemap_vf="", hwaccel="",
                     **kw):
            pass

        def read(self):
            self.pos += 1
            return np.full((8, 8, 3), 160, np.uint8)

        def skip(self, n):
            return n

        def release(self):
            pass

    monkeypatch.setattr(R, "find_ffmpeg", lambda: "/bin/true")
    monkeypatch.setattr(R, "probe_ffmpeg_filters",
                        lambda: frozenset({"scale"}))
    monkeypatch.setattr(R, "FfmpegPipeReader", ScaleOnlyPipe)
    msgs = []
    r = R.open_analysis_reader(vid, hdr=True, tonemap_pref="auto",
                               status=msgs.append)
    assert isinstance(r, HostTonemapReader)
    frame = r.read()
    # PQ code 160/255 is dim in linear light: the tone-mapped output must
    # differ from the washed input (raw passthrough would keep 160)
    assert frame is not None and not np.array_equal(
        frame, np.full((8, 8, 3), 160, np.uint8))
    assert r.recoveries == 3            # __getattr__ delegation
    assert any("host tone-map" in m for m in msgs)

    r2 = R.open_analysis_reader(vid, hdr=True, tonemap_pref="scale",
                                status=None)
    assert not isinstance(r2, HostTonemapReader)


def test_open_analysis_reader_chain_rotation(tmp_path, monkeypatch):
    """A chain that dies before producing a frame rotates to the next
    (reference try_fallback_chain, video_io.py:1774-2126)."""
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, total_frames=8)
    built = []

    class DeadThenAlivePipe:
        def __init__(self, path, max_w=0, tonemap_vf="", hwaccel="",
                     **kw):
            built.append(tonemap_vf)
            self.dead = "libplacebo" in tonemap_vf
            self.pos = 0

        def read(self):
            if self.dead:
                return None
            self.pos += 1
            return np.zeros((8, 8, 3), np.uint8)

        def skip(self, n):
            return n

        def release(self):
            pass

    monkeypatch.setattr(R, "find_ffmpeg", lambda: "/bin/true")
    monkeypatch.setattr(
        R, "probe_ffmpeg_filters",
        lambda: frozenset({"libplacebo", "zscale", "tonemap", "scale"}))
    monkeypatch.setattr(R, "FfmpegPipeReader", DeadThenAlivePipe)
    msgs = []
    r = R.open_analysis_reader(vid, hdr=True, tonemap_pref="auto",
                               status=msgs.append)
    assert len(built) == 2  # libplacebo failed, zscale accepted
    assert "libplacebo" in built[0] and "zscale" in built[1]
    assert r.read() is not None
    assert any("rotating: libplacebo" in m for m in msgs)
    assert any("zscale chain" in m for m in msgs)
