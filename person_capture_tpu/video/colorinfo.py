"""Container-level color metadata — HDR detection with zero binaries.

The reference decides HDR-ness from ffprobe JSON stream fields and PyAV
side data (reference video_io.py:537-624 and :330-458). Neither ffprobe
nor PyAV exists on a typical TPU host, so this module recovers the same
CICP signals straight from the container bytes, reusing the box/EBML
walkers the keyframe index already ships:

- MP4/MOV: the video sample entry's ``colr`` box (``nclx``/``nclc``
  colour information), ``mdcv``/``clli`` static HDR metadata, and the
  codec's decoder-configuration record for the coded bit depth
  (``hvcC``/``av1C``/``vpcC``).
- Matroska/WebM: the ``Colour`` element tree inside the video
  ``TrackEntry`` (TransferCharacteristics / Primaries / Range /
  BitsPerChannel / MasteringMetadata / MaxCLL).

CICP code points are mapped to ffprobe-style names so ``probe.detect_hdr``
keeps a single vocabulary regardless of which probe backend answered.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

from .keyframes import (_child, _elements, _load_moov, _scan_boxes,
                        _uint_payload, _vint)

# ISO/IEC 23091-2 (CICP) code points → ffprobe names (subset that matters
# for HDR detection; unknown codes render as "cicp<N>")
_TRANSFER = {1: "bt709", 6: "smpte170m", 8: "linear", 13: "iec61966-2-1",
             14: "bt2020-10", 15: "bt2020-12", 16: "smpte2084",
             17: "smpte428", 18: "arib-std-b67"}
_PRIMARIES = {1: "bt709", 5: "bt470bg", 6: "smpte170m", 9: "bt2020",
              11: "smpte431", 12: "smpte432"}
_MATRIX = {0: "gbr", 1: "bt709", 5: "bt470bg", 6: "smpte170m",
           9: "bt2020nc", 10: "bt2020c"}


def _name(table: dict, code: int) -> str:
    if code in (0, 2):          # reserved / unspecified
        return ""
    return table.get(code, f"cicp{code}")


@dataclass
class ContainerColorInfo:
    transfer: str = ""
    primaries: str = ""
    matrix: str = ""
    full_range: Optional[bool] = None
    bit_depth: int = 0          # 0 = unknown
    mastering: bool = False     # static mastering-display metadata present
    light_level: bool = False   # content light level (MaxCLL) present
    codec: str = ""
    source: str = ""            # "mp4" | "mkv"
    reasons: List[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF
# ---------------------------------------------------------------------------

# visual sample entry: 8B sample-entry header already stripped by the box
# walker; then 6B reserved + 2B data_ref_index + 16B pre_defined/reserved +
# 2B width + 2B height + 4B+4B dpi + 4B reserved + 2B frame_count +
# 32B compressorname + 2B depth + 2B pre_defined = 78 bytes before children
_VISUAL_ENTRY_FIXED = 78


def _video_stsd(moov: bytes) -> Optional[tuple]:
    """(body, end) of the video track's ``stsd`` box."""
    from .keyframes import _video_stbl

    stbl = _video_stbl(moov)
    if stbl is None:
        return None
    return _child(moov, stbl[0], stbl[1], b"stsd")


def _parse_colr(buf: bytes, body: int, end: int, info: ContainerColorInfo):
    if body + 4 > end:
        return
    ctype = buf[body:body + 4]
    if ctype == b"nclx" and body + 10 <= end:
        info.primaries = _name(
            _PRIMARIES, int.from_bytes(buf[body + 4:body + 6], "big"))
        info.transfer = _name(
            _TRANSFER, int.from_bytes(buf[body + 6:body + 8], "big"))
        info.matrix = _name(
            _MATRIX, int.from_bytes(buf[body + 8:body + 10], "big"))
        if body + 11 <= end:
            info.full_range = bool(buf[body + 10] & 0x80)
    elif ctype == b"nclc" and body + 10 <= end:    # QuickTime, no range bit
        info.primaries = _name(
            _PRIMARIES, int.from_bytes(buf[body + 4:body + 6], "big"))
        info.transfer = _name(
            _TRANSFER, int.from_bytes(buf[body + 6:body + 8], "big"))
        info.matrix = _name(
            _MATRIX, int.from_bytes(buf[body + 8:body + 10], "big"))


def _codec_bit_depth(fourcc: bytes, buf: bytes, body: int, end: int) -> int:
    """Coded luma bit depth from the decoder configuration record."""
    n = end - body
    if fourcc == b"hvcC" and n >= 18:
        # HEVCDecoderConfigurationRecord: bitDepthLumaMinus8 lives in the
        # low 3 bits of byte 17 (version..parallelismType precede it)
        return (buf[body + 17] & 0x07) + 8
    if fourcc == b"av1C" and n >= 3:
        b2 = buf[body + 2]      # seq_tier|high_bitdepth|twelve_bit|...
        if b2 & 0x40:
            return 12 if (b2 & 0x20) else 10
        return 8
    if fourcc == b"vpcC" and n >= 7:
        # VPCodecConfigurationRecord (full box): bitDepth is the high
        # nibble of the byte after version/flags + profile + level
        return (buf[body + 6] >> 4) & 0x0F
    return 0


def mp4_color_info(path: str) -> Optional[ContainerColorInfo]:
    moov = _load_moov(path)
    if moov is None:
        return None
    stsd = _video_stsd(moov)
    if stsd is None:
        return None
    info = ContainerColorInfo(source="mp4")
    # stsd is a full box: 4B version/flags + 4B entry_count, then entries
    for fourcc, body, box_end in _scan_boxes(moov, stsd[0] + 8, stsd[1]):
        info.codec = fourcc.decode("ascii", "replace")
        kids = body + _VISUAL_ENTRY_FIXED
        if kids >= box_end:
            continue
        for name, kb, ke in _scan_boxes(moov, kids, box_end):
            if name == b"colr":
                _parse_colr(moov, kb, ke, info)
            elif name in (b"mdcv", b"SmDm"):
                info.mastering = True
            elif name in (b"clli", b"CoLL"):
                info.light_level = True
            else:
                depth = _codec_bit_depth(name, moov, kb, ke)
                if depth:
                    info.bit_depth = depth
        break                    # first (primary) sample entry decides
    return info


# ---------------------------------------------------------------------------
# Matroska / WebM
# ---------------------------------------------------------------------------

_EBML_SEGMENT = 0x18538067
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACK_ENTRY = 0xAE
_EBML_TRACK_TYPE = 0x83
_EBML_CODEC_ID = 0x86
_EBML_VIDEO = 0xE0
_EBML_COLOUR = 0x55B0
_COLOUR_MATRIX = 0x55B1
_COLOUR_BITS = 0x55B2
_COLOUR_RANGE = 0x55B9
_COLOUR_TRANSFER = 0x55BA
_COLOUR_PRIMARIES = 0x55BB
_COLOUR_MAXCLL = 0x55BC
_COLOUR_MAXFALL = 0x55BD
_COLOUR_MASTERING = 0x55D0


def _parse_colour_element(f, end: int, info: ContainerColorInfo):
    for eid, size, body in _elements(f, end):
        if eid == _COLOUR_TRANSFER:
            info.transfer = _name(_TRANSFER, _uint_payload(f, size))
        elif eid == _COLOUR_PRIMARIES:
            info.primaries = _name(_PRIMARIES, _uint_payload(f, size))
        elif eid == _COLOUR_MATRIX:
            info.matrix = _name(_MATRIX, _uint_payload(f, size))
        elif eid == _COLOUR_BITS:
            info.bit_depth = _uint_payload(f, size)
        elif eid == _COLOUR_RANGE:
            rng = _uint_payload(f, size)   # 1=broadcast 2=full
            if rng in (1, 2):
                info.full_range = rng == 2
        elif eid == _COLOUR_MASTERING:
            info.mastering = True
            f.seek(body + size)
        elif eid in (_COLOUR_MAXCLL, _COLOUR_MAXFALL):
            info.light_level = True
            f.seek(body + size)
        else:
            f.seek(body + size)


def mkv_color_info(path: str) -> Optional[ContainerColorInfo]:
    try:
        file_size = os.path.getsize(path)
    except OSError:
        return None
    with open(path, "rb") as f:
        seg = None
        for eid, size, body in _elements(f, file_size):
            if eid == _EBML_SEGMENT:
                seg = (body, min(file_size, body + size))
                break
            f.seek(body + size)
        if seg is None:
            return None
        f.seek(seg[0])
        for eid, size, body in _elements(f, seg[1]):
            if eid != _EBML_TRACKS:
                f.seek(body + size)
                continue
            for tid, tsz, tb in _elements(f, body + size):
                if tid != _EBML_TRACK_ENTRY:
                    f.seek(tb + tsz)
                    continue
                info = ContainerColorInfo(source="mkv")
                is_video = False
                for eid2, sz2, b2 in _elements(f, tb + tsz):
                    if eid2 == _EBML_TRACK_TYPE:
                        is_video = _uint_payload(f, sz2) == 1
                    elif eid2 == _EBML_CODEC_ID:
                        info.codec = f.read(sz2).decode("ascii", "replace")
                    elif eid2 == _EBML_VIDEO:
                        for vid, vsz, vb in _elements(f, b2 + sz2):
                            if vid == _EBML_COLOUR:
                                _parse_colour_element(f, vb + vsz, info)
                            f.seek(vb + vsz)
                    else:
                        f.seek(b2 + sz2)
                if is_video:
                    return info
                f.seek(tb + tsz)
            return None
    return None


# ---------------------------------------------------------------------------

_HDR_TRANSFERS = {"smpte2084", "arib-std-b67", "smpte428"}


def container_color_info(path: str) -> Optional[ContainerColorInfo]:
    """Dispatch by extension; fills ``reasons`` with the HDR evidence found
    (same taxonomy as the ffprobe path in ``probe.detect_hdr``)."""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext in (".mp4", ".m4v", ".mov"):
            info = mp4_color_info(path)
        elif ext in (".mkv", ".webm"):
            info = mkv_color_info(path)
        else:
            return None
    except (OSError, ValueError):
        return None
    if info is None:
        return None
    if info.transfer in _HDR_TRANSFERS:
        info.reasons.append(f"container:transfer:{info.transfer}")
    if info.primaries == "bt2020" and info.bit_depth >= 10:
        info.reasons.append(
            f"container:primaries:{info.primaries}+{info.bit_depth}bit")
    if info.mastering:
        info.reasons.append("container:side_data:mastering_display")
    if info.light_level:
        info.reasons.append("container:side_data:content_light_level")
    return info
