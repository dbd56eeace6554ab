"""Keyframe index from direct container parsing (fast seek support).

Provides what the reference obtains from its own container walkers
(gui_app.py:3637-3971 — MP4 sync-sample table, Matroska Cues): sorted
0-based frame indices of seekable keyframes, ``[]`` when the container has
no index (then every frame is assumed seekable, e.g. all-intra streams).

Implementation is original to this repo: the MP4 side slurps the ``moov``
box into memory once and parses it with offset arithmetic over a bytes
buffer (no file-seek walking), selects the video track via its ``hdlr``
handler type, and rescales sync samples only on a PRINCIPLED mismatch —
when the track's ``stsz`` sample count disagrees with the decoder's frame
count — instead of comparing the last keyframe number to the frame total
(which stretched indices on perfectly normal GOP files). The Matroska side
is a small element-stream scanner over EBML varints.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional, Tuple

# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF
# ---------------------------------------------------------------------------

_MOOV_MAX_BYTES = 256 * 1024 * 1024   # refuse absurd moov boxes


def _scan_boxes(buf: bytes, start: int, end: int
                ) -> Iterator[Tuple[bytes, int, int]]:
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``buf[start:end]``; tolerates 64-bit largesize and to-end boxes."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        fourcc = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off:      # corrupt: would loop forever
            return
        box_end = off + size
        if box_end > end:
            box_end = end
        yield fourcc, body, box_end
        off += size


def _child(buf: bytes, start: int, end: int, fourcc: bytes
           ) -> Optional[Tuple[int, int]]:
    for name, body, box_end in _scan_boxes(buf, start, end):
        if name == fourcc:
            return body, box_end
    return None


def _descend(buf: bytes, start: int, end: int, *path: bytes
             ) -> Optional[Tuple[int, int]]:
    span: Optional[Tuple[int, int]] = (start, end)
    for name in path:
        span = _child(buf, span[0], span[1], name)
        if span is None:
            return None
    return span


def _load_moov(path: str) -> Optional[bytes]:
    """Top-level scan of the file for the ``moov`` box; returns its body."""
    try:
        file_size = os.path.getsize(path)
    except OSError:
        return None
    with open(path, "rb") as f:
        pos = 0
        while pos + 8 <= file_size:
            f.seek(pos)
            hdr = f.read(16)
            if len(hdr) < 8:
                return None
            size = int.from_bytes(hdr[:4], "big")
            fourcc = hdr[4:8]
            body = pos + 8
            if size == 1:
                if len(hdr) < 16:
                    return None
                size = int.from_bytes(hdr[8:16], "big")
                body = pos + 16
            elif size == 0:
                size = file_size - pos
            if size < body - pos:
                return None
            if fourcc == b"moov":
                n = min(pos + size, file_size) - body
                if n <= 0 or n > _MOOV_MAX_BYTES:
                    return None
                f.seek(body)
                return f.read(n)
            pos += size
    return None


def _video_stbl(moov: bytes) -> Optional[Tuple[int, int]]:
    """Sample-table span of the first track whose handler type is video."""
    for name, body, box_end in _scan_boxes(moov, 0, len(moov)):
        if name != b"trak":
            continue
        mdia = _descend(moov, body, box_end, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(moov, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        # full box: version/flags(4) + pre_defined(4) + handler_type(4)
        handler = moov[hdlr[0] + 8:hdlr[0] + 12]
        if handler != b"vide":
            continue
        return _descend(moov, mdia[0], mdia[1], b"minf", b"stbl")
    return None


def _full_box_entries(buf: bytes, body: int, box_end: int
                      ) -> Optional[Tuple[int, int]]:
    """(entry_count, first_entry_offset) of a version-0 full box whose
    payload is a u32 count followed by entries."""
    if body + 8 > box_end:
        return None
    count = int.from_bytes(buf[body + 4:body + 8], "big")
    return count, body + 8


def mp4_read_stss(path: str, total_frames: int) -> List[int]:
    """0-based keyframe frame indices from the MP4 sync-sample table.

    Sync samples are 1-based sample numbers; when the track's ``stsz``
    sample count disagrees with the decoder's frame count the indices are
    rescaled proportionally (edit lists / dropped frames), otherwise they
    map 1:1 (clamped into range)."""
    moov = _load_moov(path)
    if moov is None:
        return []
    stbl = _video_stbl(moov)
    if stbl is None:
        return []
    stss = _child(moov, stbl[0], stbl[1], b"stss")
    if stss is None:
        return []   # no table: every sample is a sync sample

    parsed = _full_box_entries(moov, stss[0], stss[1])
    if parsed is None:
        return []
    count, off = parsed
    avail = (stss[1] - off) // 4
    count = min(count, max(0, avail))
    samples = struct.unpack_from(f">{count}I", moov, off) if count else ()
    frames = sorted({max(0, s - 1) for s in samples})
    if not frames:
        return []

    sample_count = 0
    stsz = _child(moov, stbl[0], stbl[1], b"stsz")
    if stsz is not None and stsz[0] + 12 <= stsz[1]:
        # stsz payload: version/flags(4) + sample_size(4) + sample_count(4)
        sample_count = int.from_bytes(moov[stsz[0] + 8:stsz[0] + 12], "big")

    if total_frames and sample_count and sample_count != total_frames:
        scale = float(total_frames) / float(sample_count)
        frames = sorted({
            max(0, min(total_frames - 1, int(round((s + 1) * scale)) - 1))
            for s in frames})
    elif total_frames:
        frames = [min(total_frames - 1, s) for s in frames]
    return frames


def mp4_is_cfr(path: str) -> Optional[bool]:
    """True when the video track's ``stts`` has exactly one entry (every
    sample shares one duration) — the only case where cv2 frame-number
    seeks are provably frame-exact, since the demuxer converts frame
    numbers to timestamps by multiplying a constant duration. VFR
    content (multi-entry stts) makes that conversion land off the
    counted-frame grid, so the seek-sampling fast path must never
    engage there (round-5 review finding). None = not parseable as mp4
    (treat as not provably CFR)."""
    moov = _load_moov(path)
    if moov is None:
        return None
    stbl = _video_stbl(moov)
    if stbl is None:
        return None
    stts = _child(moov, stbl[0], stbl[1], b"stts")
    if stts is None:
        return None
    parsed = _full_box_entries(moov, stts[0], stts[1])
    if parsed is None:
        return None
    count, _off = parsed
    return count == 1


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML)
# ---------------------------------------------------------------------------

_EBML_SEGMENT = 0x18538067
_EBML_INFO = 0x1549A966
_EBML_TS_SCALE = 0x2AD7B1
_EBML_CUES = 0x1C53BB6B
_EBML_CUEPOINT = 0xBB
_EBML_CUETIME = 0xB3


def _vint(f, keep_marker: bool) -> Optional[int]:
    """EBML variable-size integer. Element IDs keep the length-marker bit
    (``keep_marker``); sizes strip it."""
    head = f.read(1)
    if not head or head[0] == 0:
        return None
    # number of leading zero bits + 1 = total byte length
    width = 9 - head[0].bit_length()
    if width > 8:
        return None
    tail = f.read(width - 1)
    if len(tail) != width - 1:
        return None
    raw = int.from_bytes(head + tail, "big")
    if keep_marker:
        return raw
    return raw & ~(1 << (7 * width))


def _elements(f, end: int) -> Iterator[Tuple[int, int, int]]:
    """Yield ``(element_id, body_size, body_pos)`` until ``end``; the caller
    decides whether to descend (leave position) or skip (seek past)."""
    while f.tell() + 2 <= end:
        eid = _vint(f, keep_marker=True)
        if eid is None:
            return
        size = _vint(f, keep_marker=False)
        if size is None:
            return
        yield eid, size, f.tell()


def _uint_payload(f, size: int) -> int:
    return int.from_bytes(f.read(size), "big")


def mkv_read_cues(path: str, fps: float, total_frames: int) -> List[int]:
    """0-based keyframe frame indices from Matroska Cues: CueTime ticks ×
    TimestampScale → seconds → frames."""
    try:
        file_size = os.path.getsize(path)
    except OSError:
        return []
    ns_per_tick = 1_000_000
    ticks: List[int] = []
    with open(path, "rb") as f:
        seg: Optional[Tuple[int, int]] = None
        for eid, size, body in _elements(f, file_size):
            if eid == _EBML_SEGMENT:
                seg = (body, min(file_size, body + size))
                break
            f.seek(body + size)
        if seg is None:
            return []
        f.seek(seg[0])
        for eid, size, body in _elements(f, seg[1]):
            if eid == _EBML_INFO:
                for iid, isz, _ib in _elements(f, body + size):
                    if iid == _EBML_TS_SCALE:
                        ns_per_tick = _uint_payload(f, isz)
                    else:
                        f.seek(isz, os.SEEK_CUR)
            elif eid == _EBML_CUES:
                for cid, csz, cb in _elements(f, body + size):
                    if cid == _EBML_CUEPOINT:
                        for pid, psz, _pb in _elements(f, cb + csz):
                            if pid == _EBML_CUETIME:
                                ticks.append(_uint_payload(f, psz))
                            else:
                                f.seek(psz, os.SEEK_CUR)
                    f.seek(cb + csz)
            f.seek(body + size)

    if not ticks or fps <= 0:
        return []
    out = set()
    for t in ticks:
        frame = int(round(t * ns_per_tick / 1e9 * fps))
        if total_frames:
            frame = max(0, min(total_frames - 1, frame))
        out.add(frame)
    return sorted(out)


def read_keyframes(path: str, fps: float, total_frames: int) -> List[int]:
    """Dispatch by extension; [] means 'no index' (treat all as seekable)."""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext in (".mp4", ".m4v", ".mov"):
            return mp4_read_stss(path, total_frames)
        if ext in (".mkv", ".webm"):
            return mkv_read_cues(path, fps, total_frames)
    except (OSError, struct.error):
        return []
    return []


def previous_keyframe(keyframes: List[int], target: int) -> int:
    """Largest keyframe ≤ target (bisect); 0 when none."""
    import bisect

    if not keyframes:
        return target
    i = bisect.bisect_right(keyframes, target)
    return keyframes[i - 1] if i else 0
