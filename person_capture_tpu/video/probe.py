"""Video probing: fps/total recovery chain and HDR detection.

Reference contracts: video_io.py:461-534 (fps/total recovery cv2 → duration
× fps), :153-246 + :537-624 (ffprobe JSON + HDR detection with reasons,
LRU-cached), env overrides ``PERSON_CAPTURE_FORCE_HDR`` / ``PC_FORCE_SDR``.
ffprobe is optional here — absent (typical TPU host without ffmpeg) the
HDR verdict comes from env/extension heuristics only and decode falls back
to cv2.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional, Tuple

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

HDR_TRANSFERS = {"smpte2084", "arib-std-b67", "smpte428", "smpte2086"}
HDR_PRIMARIES = {"bt2020"}


def find_ffprobe() -> Optional[str]:
    for key in ("PERSON_CAPTURE_FFPROBE", "FFPROBE"):
        p = os.environ.get(key)
        if p and os.path.isfile(p):
            return p
    return shutil.which("ffprobe")


@lru_cache(maxsize=64)
def ffprobe_json(path: str) -> Optional[dict]:
    exe = find_ffprobe()
    if exe is None:
        return None
    try:
        cp = subprocess.run(
            [exe, "-v", "error", "-print_format", "json", "-show_streams",
             "-show_format", path],
            capture_output=True, text=True, timeout=30, check=False)
        if cp.returncode != 0 or not cp.stdout:
            return None
        return json.loads(cp.stdout)
    except (OSError, subprocess.SubprocessError, json.JSONDecodeError):
        return None


def _video_stream(meta: dict) -> Optional[dict]:
    for s in meta.get("streams", []):
        if s.get("codec_type") == "video":
            return s
    return None


def probe_fps_total(path: str) -> Tuple[float, int]:
    """Recover (fps, total_frames): cv2 properties → ffprobe stream fields →
    duration × fps, in that order (reference: video_io.py:461-534)."""
    fps = 0.0
    total = 0
    if cv2 is not None:
        cap = cv2.VideoCapture(path)
        if cap.isOpened():
            fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        cap.release()
    if fps > 0 and total > 0:
        return fps, total
    meta = ffprobe_json(path)
    if meta:
        vs = _video_stream(meta)
        if vs:
            if fps <= 0:
                rate = vs.get("avg_frame_rate") or vs.get("r_frame_rate") or "0/1"
                try:
                    num, den = rate.split("/")
                    fps = float(num) / float(den) if float(den) else 0.0
                except (ValueError, ZeroDivisionError):
                    pass
            if total <= 0:
                try:
                    total = int(vs.get("nb_frames") or 0)
                except (TypeError, ValueError):
                    total = 0
        if total <= 0 and fps > 0:
            try:
                dur = float(meta.get("format", {}).get("duration") or 0.0)
                total = int(dur * fps)
            except (TypeError, ValueError):
                pass
    return (fps or 30.0), total


@dataclass
class HdrInfo:
    is_hdr: bool
    transfer: str = ""
    primaries: str = ""
    pix_fmt: str = ""
    reasons: List[str] = field(default_factory=list)


def detect_hdr(path: str) -> HdrInfo:
    """Decide HDR-ness with reasons; env overrides win
    (PERSON_CAPTURE_FORCE_HDR=1 forces HDR, PC_FORCE_SDR=1 forces SDR).

    Probe ladder: ffprobe JSON when a binary exists (reference
    video_io.py:537-624), else direct container parsing of the MP4 colr/
    mdcv/clli boxes or Matroska Colour elements (video/colorinfo.py) —
    the reference's PyAV-flags fallback (:330-458) re-expressed without
    any decoder dependency."""
    if os.environ.get("PC_FORCE_SDR") == "1":
        return HdrInfo(False, reasons=["env:PC_FORCE_SDR"])
    if os.environ.get("PERSON_CAPTURE_FORCE_HDR") == "1":
        return HdrInfo(True, reasons=["env:PERSON_CAPTURE_FORCE_HDR"])
    meta = ffprobe_json(path)
    if not meta:
        from .colorinfo import container_color_info

        info = container_color_info(path)
        if info is None:
            return HdrInfo(False, reasons=["no_probe_backend"])
        return HdrInfo(bool(info.reasons), info.transfer, info.primaries,
                       pix_fmt=(f"{info.bit_depth}bit"
                                if info.bit_depth else ""),
                       reasons=info.reasons or ["container:sdr"])
    vs = _video_stream(meta)
    if not vs:
        return HdrInfo(False, reasons=["no_video_stream"])
    transfer = str(vs.get("color_transfer") or "").lower()
    primaries = str(vs.get("color_primaries") or "").lower()
    pix_fmt = str(vs.get("pix_fmt") or "").lower()
    reasons = []
    if transfer in HDR_TRANSFERS:
        reasons.append(f"transfer:{transfer}")
    ten_bit = "10le" in pix_fmt or "12le" in pix_fmt or "p010" in pix_fmt
    if primaries in HDR_PRIMARIES and ten_bit:
        reasons.append(f"primaries:{primaries}+{pix_fmt}")
    for sd in vs.get("side_data_list", []) or []:
        t = str(sd.get("side_data_type", "")).lower()
        if "mastering" in t or "light level" in t or "dovi" in t:
            reasons.append(f"side_data:{t}")
    return HdrInfo(bool(reasons), transfer, primaries, pix_fmt, reasons)


def color_range_full(path: str) -> bool:
    meta = ffprobe_json(path)
    if not meta:
        from .colorinfo import container_color_info

        info = container_color_info(path)
        return bool(info and info.full_range)
    vs = _video_stream(meta)
    return bool(vs and str(vs.get("color_range", "")).lower()
                in ("pc", "full", "jpeg"))
