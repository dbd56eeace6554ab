import io
import struct

import numpy as np
import pytest

from person_capture_tpu.video import keyframes as K
from person_capture_tpu.video import probe as P
from person_capture_tpu.video.synthetic import generate_video


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _make_minimal_mp4(stss_samples, sample_count=0):
    """Hand-build an MP4 with moov/trak/mdia/{hdlr,minf/stbl/stss[,stsz]}."""
    stss_payload = (b"\x00\x00\x00\x00"
                    + struct.pack(">I", len(stss_samples))
                    + b"".join(struct.pack(">I", s) for s in stss_samples))
    stbl_payload = _box(b"stss", stss_payload)
    if sample_count:
        # stsz: version/flags + sample_size(0 = per-sample) + sample_count
        stbl_payload += _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0,
                                                                sample_count))
    stbl = _box(b"stbl", stbl_payload)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_mp4_stss_parse(tmp_path):
    # samples are 1-based in the container; output is 0-based
    data = _make_minimal_mp4([1, 31, 61, 91], sample_count=90)
    p = tmp_path / "t.mp4"
    p.write_bytes(data)
    out = K.mp4_read_stss(str(p), 90)
    assert out == [0, 30, 60, 89]   # 91 clamps into range


def test_mp4_stss_rescale_on_sample_count_mismatch(tmp_path):
    # container track says 101 samples, decoder says 200 frames -> scale ×2
    data = _make_minimal_mp4([1, 51, 101], sample_count=101)
    p = tmp_path / "t.mp4"
    p.write_bytes(data)
    out = K.mp4_read_stss(str(p), 200)
    assert out[0] <= 2 and abs(out[1] - 100) <= 2 and abs(out[2] - 199) <= 2


def test_mp4_stss_no_stretch_on_normal_gop(tmp_path):
    """A normal GOP file (sample count == frame count) must return the sync
    samples VERBATIM: the old last-keyframe-vs-total heuristic stretched
    [0,250,500,750] to [0,332,665,999] on every ordinary mp4, sending
    smart_seek to slow mid-GOP positions."""
    data = _make_minimal_mp4([1, 251, 501, 751], sample_count=1000)
    p = tmp_path / "t.mp4"
    p.write_bytes(data)
    assert K.mp4_read_stss(str(p), 1000) == [0, 250, 500, 750]


def test_mp4_no_moov(tmp_path):
    p = tmp_path / "t.mp4"
    p.write_bytes(_box(b"ftyp", b"isom"))
    assert K.mp4_read_stss(str(p), 100) == []


def _ebml_id(eid: int) -> bytes:
    # IDs are stored with their marker bits as-is
    out = []
    while eid:
        out.append(eid & 0xFF)
        eid >>= 8
    return bytes(reversed(out))


def _ebml_size(n: int) -> bytes:
    # 4-byte size encoding for simplicity
    return struct.pack(">I", n | 0x10000000)


def _ebml_elem(eid: int, payload: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(payload)) + payload


def _make_minimal_mkv(cue_times_ms):
    cues_payload = b""
    for t in cue_times_ms:
        cuetime = _ebml_elem(0xB3, struct.pack(">I", t))
        cues_payload += _ebml_elem(0xBB, cuetime)
    cues = _ebml_elem(0x1C53BB6B, cues_payload)
    info = _ebml_elem(0x1549A966,
                      _ebml_elem(0x2AD7B1, struct.pack(">I", 1_000_000)))
    segment = _ebml_elem(0x18538067, info + cues)
    ebml_hdr = _ebml_elem(0x1A45DFA3, b"")
    return ebml_hdr + segment


def test_mkv_cues_parse(tmp_path):
    p = tmp_path / "t.mkv"
    p.write_bytes(_make_minimal_mkv([0, 1000, 2000]))  # ms ticks
    out = K.mkv_read_cues(str(p), fps=30.0, total_frames=100)
    assert out == [0, 30, 60]


def test_previous_keyframe():
    kf = [0, 30, 60, 90]
    assert K.previous_keyframe(kf, 45) == 30
    assert K.previous_keyframe(kf, 30) == 30
    assert K.previous_keyframe(kf, 5) == 0
    assert K.previous_keyframe([], 45) == 45


def test_probe_fps_total_on_synthetic(tmp_path):
    pytest.importorskip("cv2")
    path = str(tmp_path / "v.mp4")
    generate_video(path, width=64, height=48, fps=25.0, total_frames=50,
                   segments=[])
    fps, total = P.probe_fps_total(path)
    assert fps == pytest.approx(25.0, rel=0.05)
    assert total == 50


def test_detect_hdr_env_overrides(tmp_path, monkeypatch):
    path = str(tmp_path / "v.mp4")
    generate_video(path, width=64, height=48, fps=25.0, total_frames=5,
                   segments=[])
    monkeypatch.setenv("PERSON_CAPTURE_FORCE_HDR", "1")
    info = P.detect_hdr(path)
    assert info.is_hdr and "env:PERSON_CAPTURE_FORCE_HDR" in info.reasons
    monkeypatch.setenv("PC_FORCE_SDR", "1")
    info2 = P.detect_hdr(path)
    assert not info2.is_hdr  # SDR override wins
    monkeypatch.delenv("PERSON_CAPTURE_FORCE_HDR")
    monkeypatch.delenv("PC_FORCE_SDR")
    info3 = P.detect_hdr(path)
    assert not info3.is_hdr  # SDR synthetic video (or no probe backend)


def test_read_keyframes_on_real_synthetic_mp4(tmp_path):
    pytest.importorskip("cv2")
    path = str(tmp_path / "v.mp4")
    generate_video(path, width=64, height=48, fps=30.0, total_frames=60,
                   segments=[])
    kf = K.read_keyframes(path, 30.0, 60)
    # cv2's mp4v writer produces a sync table (or none == all-intra);
    # either way the call must not crash and must return sorted indices
    assert kf == sorted(kf)
    assert all(0 <= f < 60 for f in kf)


def test_mp4_is_cfr_gates_seek_sampling(tmp_path):
    """Seek sampling is only eligible on provably constant-frame-rate
    mp4 (single-entry stts): cv2 frame-number seeks convert through a
    constant sample duration there and land frame-exact; VFR/mkv content
    must never engage the seek path (round-5 review finding)."""
    from person_capture_tpu.video.keyframes import mp4_is_cfr
    from person_capture_tpu.video.synthetic import generate_video

    p = str(tmp_path / "t.mp4")
    generate_video(p, width=128, height=96, fps=30.0, total_frames=40,
                   segments=[(5, 20, 0)])
    assert mp4_is_cfr(p) is True

    w = str(tmp_path / "t.webm")
    generate_video(w, width=128, height=96, fps=30.0, total_frames=30,
                   segments=[(5, 20, 0)], fourcc="vp90")
    assert mp4_is_cfr(w) is None          # not parseable as mp4

    bad = tmp_path / "junk.mp4"
    bad.write_bytes(b"this is not an mp4")
    assert mp4_is_cfr(str(bad)) is None
