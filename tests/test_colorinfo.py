"""Container color-metadata probe + host tone-map fallback.

Covers the binary-free HDR story: detect_hdr answers from the MP4
colr/mdcv/clli boxes or Matroska Colour elements when ffprobe is absent
(video/colorinfo.py), and HDR analysis frames pass through the host Hable
tone-map (video/pytonemap.py) whose math is differentially parity-tested
against the reference's own pure-Python fallback functions
(reference video_io.py:3239-3291, AST-extracted at test time).
"""

from __future__ import annotations

import ast
import os
import struct
import textwrap

import numpy as np
import pytest

from person_capture_tpu.video import colorinfo as CI
from person_capture_tpu.video import probe as PR
from person_capture_tpu.video import pytonemap as PT

REF_VIDEO_IO = "/root/reference/person_capture/video_io.py"


# ---------------------------------------------------------------------------
# crafted containers
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, payload: bytes) -> bytes:
    return _box(fourcc, b"\x00\x00\x00\x00" + payload)


def _mp4_bytes(colr: bytes = b"", extra_entry_children: bytes = b"",
               codec: bytes = b"hvc1") -> bytes:
    entry = _box(codec, b"\x00" * 78 + colr + extra_entry_children)
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    hdlr = _full_box(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"")


def _nclx(primaries: int, transfer: int, matrix: int,
          full_range: bool) -> bytes:
    return _box(b"colr", b"nclx" + struct.pack(
        ">HHH", primaries, transfer, matrix)
        + (b"\x80" if full_range else b"\x00"))


def _hvcc(bit_depth: int) -> bytes:
    body = bytearray(20)
    body[17] = 0xF8 | (bit_depth - 8)    # reserved 1s + bitDepthLumaMinus8
    return _box(b"hvcC", bytes(body))


def _ebml_el(eid: int, payload: bytes) -> bytes:
    assert len(payload) < 127
    blen = (eid.bit_length() + 7) // 8
    return eid.to_bytes(blen, "big") + bytes([0x80 | len(payload)]) + payload


def _ebml_uint(eid: int, value: int, width: int = 1) -> bytes:
    return _ebml_el(eid, value.to_bytes(width, "big"))


def _mkv_bytes(transfer: int = 16, primaries: int = 9, rng: int = 2,
               bits: int = 10, maxcll: bool = True) -> bytes:
    colour = (_ebml_uint(0x55BA, transfer) + _ebml_uint(0x55BB, primaries)
              + _ebml_uint(0x55B9, rng) + _ebml_uint(0x55B2, bits))
    if maxcll:
        colour += _ebml_uint(0x55BC, 1000, width=2)
    video = _ebml_el(0xE0, _ebml_el(0x55B0, colour))
    entry = _ebml_el(0xAE, _ebml_uint(0x83, 1)
                     + _ebml_el(0x86, b"V_MPEGH/ISO/HEVC") + video)
    tracks = _ebml_el(0x1654AE6B, entry)
    segment = _ebml_el(0x18538067, tracks)
    return _ebml_el(0x1A45DFA3, b"") + segment


@pytest.fixture(autouse=True)
def _no_ffprobe(monkeypatch):
    monkeypatch.setattr(PR, "find_ffprobe", lambda: None)
    PR.ffprobe_json.cache_clear()


def test_mp4_hdr10_detected(tmp_path):
    p = str(tmp_path / "hdr10.mp4")
    with open(p, "wb") as fh:
        fh.write(_mp4_bytes(
            colr=_nclx(9, 16, 9, False),
            extra_entry_children=_hvcc(10) + _box(b"mdcv", b"\x00" * 24)))
    info = CI.container_color_info(p)
    assert info.transfer == "smpte2084"
    assert info.primaries == "bt2020"
    assert info.matrix == "bt2020nc"
    assert info.full_range is False
    assert info.bit_depth == 10
    assert info.mastering and not info.light_level
    assert info.codec == "hvc1"
    hdr = PR.detect_hdr(p)
    assert hdr.is_hdr
    assert "container:transfer:smpte2084" in hdr.reasons
    assert "container:primaries:bt2020+10bit" in hdr.reasons
    assert "container:side_data:mastering_display" in hdr.reasons
    assert not PR.color_range_full(p)


def test_mp4_hlg_without_mastering(tmp_path):
    p = str(tmp_path / "hlg.mp4")
    with open(p, "wb") as fh:
        fh.write(_mp4_bytes(colr=_nclx(9, 18, 9, True)))
    hdr = PR.detect_hdr(p)
    assert hdr.is_hdr and hdr.transfer == "arib-std-b67"
    assert PR.color_range_full(p)


def test_mp4_sdr_not_flagged(tmp_path):
    p = str(tmp_path / "sdr.mp4")
    with open(p, "wb") as fh:
        fh.write(_mp4_bytes(colr=_nclx(1, 1, 1, False),
                            extra_entry_children=_hvcc(8)))
    hdr = PR.detect_hdr(p)
    assert not hdr.is_hdr
    # bt2020 primaries alone (8-bit) must not flag HDR either
    p2 = str(tmp_path / "sdr2020.mp4")
    with open(p2, "wb") as fh:
        fh.write(_mp4_bytes(colr=_nclx(9, 1, 9, False),
                            extra_entry_children=_hvcc(8)))
    assert not PR.detect_hdr(p2).is_hdr


def test_real_cv2_mp4_probes_sdr(tmp_path):
    """A genuine cv2-written mp4 walks the real parser end to end."""
    from person_capture_tpu.video.synthetic import generate_video

    p = str(tmp_path / "real.mp4")
    generate_video(p, width=64, height=48, fps=10.0, total_frames=5,
                   segments=[])
    hdr = PR.detect_hdr(p)
    assert not hdr.is_hdr


def test_mkv_hdr10_detected(tmp_path):
    p = str(tmp_path / "hdr.mkv")
    with open(p, "wb") as fh:
        fh.write(_mkv_bytes())
    info = CI.container_color_info(p)
    assert info.transfer == "smpte2084"
    assert info.primaries == "bt2020"
    assert info.bit_depth == 10
    assert info.full_range is True
    assert info.light_level
    assert info.codec == "V_MPEGH/ISO/HEVC"
    assert PR.detect_hdr(p).is_hdr
    assert PR.color_range_full(p)


def test_mkv_sdr_not_flagged(tmp_path):
    p = str(tmp_path / "sdr.mkv")
    with open(p, "wb") as fh:
        fh.write(_mkv_bytes(transfer=1, primaries=1, rng=1, bits=8,
                            maxcll=False))
    hdr = PR.detect_hdr(p)
    assert not hdr.is_hdr
    assert not PR.color_range_full(p)


def test_unknown_extension_and_garbage(tmp_path):
    assert CI.container_color_info(str(tmp_path / "x.avi")) is None
    p = str(tmp_path / "junk.mp4")
    with open(p, "wb") as fh:
        fh.write(os.urandom(256))
    assert PR.detect_hdr(p).is_hdr is False


# ---------------------------------------------------------------------------
# host tone-map: differential parity vs the reference's python fallback
# ---------------------------------------------------------------------------

def _ref_fallback_ns():
    src = open(REF_VIDEO_IO).read()
    tree = ast.parse(src)
    ns = {"np": np}
    names = {"_eotf_pq", "_eotf_hlg", "_oetf_bt709", "_hable_filmic",
             "_python_tonemap_to_bgr8"}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                         f"<ref:{node.name}>", "exec"), ns)
    assert names <= set(ns)
    return ns


@pytest.mark.skipif(not os.path.isfile(REF_VIDEO_IO),
                    reason="reference checkout not mounted")
@pytest.mark.parametrize("transfer", ["smpte2084", "arib-std-b67"])
def test_tonemap_matches_reference_python_fallback(transfer):
    ns = _ref_fallback_ns()
    rng = np.random.default_rng(7)
    bgr = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    rgb_coded = bgr[..., ::-1].astype(np.float64) / 255.0
    eotf = ns["_eotf_hlg"] if transfer == "arib-std-b67" else ns["_eotf_pq"]
    expected = ns["_python_tonemap_to_bgr8"](
        eotf(rgb_coded), peak_nits=1000.0, target_nits=200.0)
    got = PT.approx_tonemap_bgr8(bgr, transfer=transfer,
                                 peak_nits=1000.0, target_nits=200.0)
    diff = np.abs(got.astype(int) - expected.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()} at {transfer}"


def test_tonemap_untangles_washed_pq():
    """PQ-coded mid-gray decodes far darker once the EOTF is applied —
    the exact failure mode of feeding washed cv2 output to detection."""
    flat = np.full((8, 8, 3), 128, np.uint8)
    out = PT.approx_tonemap_bgr8(flat)
    assert out.dtype == np.uint8 and out.shape == flat.shape
    # PQ code 0.5 ≈ 92 nits ⇒ visibly below the coded value after mapping
    assert out.max() < 128


# ---------------------------------------------------------------------------
# reader wiring
# ---------------------------------------------------------------------------

def test_analysis_reader_falls_back_to_host_tonemap(tmp_path, monkeypatch):
    from person_capture_tpu.video import reader as R
    from person_capture_tpu.video.synthetic import generate_video

    p = str(tmp_path / "v.mp4")
    generate_video(p, width=64, height=48, fps=10.0, total_frames=8,
                   segments=[])
    monkeypatch.setattr(R, "find_ffmpeg", lambda: None)
    msgs = []
    r = R.open_analysis_reader(p, hdr=True, transfer="smpte2084",
                               status=msgs.append)
    assert isinstance(r, PT.HostTonemapReader)
    assert any("tone-mapped on host" in m for m in msgs)
    raw = R.Cv2Reader(p)
    f_raw = raw.read()
    f_tm = r.read()
    assert f_tm.shape == f_raw.shape and f_tm.dtype == np.uint8
    assert not np.array_equal(f_tm, f_raw)          # actually transformed
    assert np.array_equal(f_tm, PT.approx_tonemap_bgr8(f_raw))
    assert r.pos == 1
    r.seek(4)
    assert r.pos == 4
    assert r.grab()
    assert r.retrieve() is not None
    r.release()
    raw.release()


def test_host_tonemap_reader_skip_and_meta(tmp_path):
    from person_capture_tpu.video import reader as R
    from person_capture_tpu.video.synthetic import generate_video

    p = str(tmp_path / "v2.mp4")
    generate_video(p, width=64, height=48, fps=10.0, total_frames=10,
                   segments=[])
    r = PT.HostTonemapReader(R.Cv2Reader(p))
    meta = r.meta()
    assert meta.total_frames == 10 and meta.width == 64
    assert r.skip(3) == 3
    assert r.pos == 3
    r.release()
