"""Keyframe index from direct container parsing (fast seek support).

Host utilities mirroring the reference's parsers (gui_app.py:3637-3971):
MP4 ``moov/trak(vide)/mdia/minf/stbl/stss`` sync-sample walk and a Matroska
EBML ``Cues`` scan. Returns sorted 0-based frame indices of keyframes;
``[]`` when the container has no index (then every frame is assumed
seekable, e.g. all-intra streams).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple


def _u32(b: bytes) -> int:
    return struct.unpack(">I", b)[0]


def _u64(b: bytes) -> int:
    return struct.unpack(">Q", b)[0]


def _read_box(f, end_pos: int) -> Optional[Tuple[int, str, int, int]]:
    pos = f.tell()
    if pos + 8 > end_pos:
        return None
    hdr = f.read(8)
    if len(hdr) < 8:
        return None
    sz = _u32(hdr[:4])
    typ = hdr[4:8].decode("ascii", "ignore")
    header = 8
    if sz == 1:
        ext = f.read(8)
        if len(ext) < 8:
            return None
        sz = _u64(ext)
        header = 16
    if sz == 0:
        sz = end_pos - pos
    return pos, typ, sz, header


def _find_child(f, parent_start: int, parent_size: int,
                name: str) -> Optional[Tuple[int, int]]:
    end = parent_start + parent_size
    f.seek(parent_start + 8)
    while f.tell() + 8 <= end:
        box = _read_box(f, end)
        if not box:
            break
        pos, typ, sz, _ = box
        if typ == name:
            return (pos, sz)
        f.seek(pos + sz)
    return None


def mp4_read_stss(path: str, total_frames: int) -> List[int]:
    """0-based keyframe sample indices from the MP4 sync-sample table,
    rescaled when the container's sample count disagrees with the decoder's
    frame count (reference behavior)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return []
    with open(path, "rb") as f:
        end = size
        moov = None
        while f.tell() + 8 <= end:
            box = _read_box(f, end)
            if not box:
                break
            pos, typ, sz, _ = box
            if typ == "moov":
                moov = (pos, sz)
                break
            f.seek(pos + sz)
        if not moov:
            return []

        # find the video trak
        moov_pos, moov_sz = moov
        moov_end = moov_pos + moov_sz
        f.seek(moov_pos + 8)
        video_trak = None
        while f.tell() + 8 <= moov_end:
            box = _read_box(f, moov_end)
            if not box:
                break
            pos, typ, sz, _ = box
            if typ == "trak":
                mdia = _find_child(f, pos, sz, "mdia")
                if mdia:
                    hdlr = _find_child(f, mdia[0], mdia[1], "hdlr")
                    if hdlr:
                        f.seek(hdlr[0] + 16)
                        if f.read(4).decode("ascii", "ignore") == "vide":
                            video_trak = (pos, sz)
                            break
            f.seek(pos + sz)
        if not video_trak:
            return []

        mdia = _find_child(f, video_trak[0], video_trak[1], "mdia")
        if not mdia:
            return []
        minf = _find_child(f, mdia[0], mdia[1], "minf")
        if not minf:
            return []
        stbl = _find_child(f, minf[0], minf[1], "stbl")
        if not stbl:
            return []
        stss = _find_child(f, stbl[0], stbl[1], "stss")
        if not stss:
            return []  # no table: every sample is a sync sample

        f.seek(stss[0] + 8)
        f.read(4)  # version/flags
        cnt = f.read(4)
        if len(cnt) < 4:
            return []
        n = _u32(cnt)
        out: List[int] = []
        max_sample = 0
        for _ in range(n):
            data = f.read(4)
            if len(data) < 4:
                break
            sample = _u32(data)
            max_sample = max(max_sample, sample)
            out.append(max(sample - 1, 0))
        out.sort()
        if not out:
            return []
        if total_frames and max_sample and max_sample - 1 != total_frames:
            scale = float(total_frames) / float(max_sample)
            out = [max(0, min(total_frames - 1, int(round((s + 1) * scale) - 1)))
                   for s in out]
            out = sorted(set(out))
        elif total_frames:
            out = [min(total_frames - 1, s) for s in out]
        return out


# ---------------------------------------------------------------------------
# Matroska / EBML
# ---------------------------------------------------------------------------

_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESTAMP_SCALE = 0x2AD7B1
_ID_CUES = 0x1C53BB6B
_ID_CUEPOINT = 0xBB
_ID_CUETIME = 0xB3


def _read_vint(f, mask_marker: bool):
    """Read an EBML variable-size integer. mask_marker strips the length
    marker bit (sizes) or keeps it (IDs)."""
    first = f.read(1)
    if not first:
        return None, 0
    b0 = first[0]
    if b0 == 0:
        return None, 0
    length = 1
    probe = 0x80
    while length <= 8 and not (b0 & probe):
        probe >>= 1
        length += 1
    if length > 8:
        return None, 0
    value = b0 & (probe - 1) if mask_marker else b0
    rest = f.read(length - 1)
    if len(rest) < length - 1:
        return None, 0
    for byte in rest:
        value = (value << 8) | byte
    return value, length


def _read_ebml_id(f):
    return _read_vint(f, mask_marker=False)


def _read_ebml_size(f):
    return _read_vint(f, mask_marker=True)


def _read_uint(f, size: int) -> int:
    data = f.read(size)
    value = 0
    for b in data:
        value = (value << 8) | b
    return value


def mkv_read_cues(path: str, fps: float, total_frames: int) -> List[int]:
    """0-based keyframe frame indices from Matroska Cues (CueTime entries
    scaled by TimestampScale → seconds → frames)."""
    try:
        file_size = os.path.getsize(path)
    except OSError:
        return []
    timestamp_scale = 1_000_000  # ns per tick default
    cue_times: List[int] = []
    with open(path, "rb") as f:
        # top level: find Segment
        segment_end = file_size
        while f.tell() + 2 <= file_size:
            eid, _ = _read_ebml_id(f)
            if eid is None:
                return []
            size, _ = _read_ebml_size(f)
            if size is None:
                return []
            if eid == _ID_SEGMENT:
                segment_start = f.tell()
                segment_end = min(file_size, segment_start + size)
                break
            f.seek(size, os.SEEK_CUR)
        else:
            return []

        # walk Segment children
        while f.tell() + 2 <= segment_end:
            eid, _ = _read_ebml_id(f)
            if eid is None:
                break
            size, _ = _read_ebml_size(f)
            if size is None:
                break
            child_end = f.tell() + size
            if eid == _ID_INFO:
                while f.tell() + 2 <= child_end:
                    iid, _ = _read_ebml_id(f)
                    if iid is None:
                        break
                    isz, _ = _read_ebml_size(f)
                    if isz is None:
                        break
                    if iid == _ID_TIMESTAMP_SCALE:
                        timestamp_scale = _read_uint(f, isz)
                    else:
                        f.seek(isz, os.SEEK_CUR)
                f.seek(child_end)
            elif eid == _ID_CUES:
                while f.tell() + 2 <= child_end:
                    cid, _ = _read_ebml_id(f)
                    if cid is None:
                        break
                    csz, _ = _read_ebml_size(f)
                    if csz is None:
                        break
                    point_end = f.tell() + csz
                    if cid == _ID_CUEPOINT:
                        while f.tell() + 2 <= point_end:
                            pid, _ = _read_ebml_id(f)
                            if pid is None:
                                break
                            psz, _ = _read_ebml_size(f)
                            if psz is None:
                                break
                            if pid == _ID_CUETIME:
                                cue_times.append(_read_uint(f, psz))
                            else:
                                f.seek(psz, os.SEEK_CUR)
                        f.seek(point_end)
                    else:
                        f.seek(point_end)
                f.seek(child_end)
            else:
                f.seek(child_end)

    if not cue_times or fps <= 0:
        return []
    out = []
    for t in sorted(set(cue_times)):
        secs = t * timestamp_scale / 1e9
        frame = int(round(secs * fps))
        if total_frames:
            frame = max(0, min(total_frames - 1, frame))
        out.append(frame)
    return sorted(set(out))


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
