"""Host-side approximate HDR→SDR tone-map for decoder-less environments.

When an HDR source must be analyzed and no ffmpeg binary exists, cv2 still
decodes the 10-bit stream but emits 8-bit BGR with the PQ/HLG transfer
UNAPPLIED — values stay transfer-coded, which is exactly the "washed"
look. The reference keeps a pure-Python tone-map for its own terminal
fallback (reference video_io.py:3239-3291: PQ/HLG EOTF → luminance-domain
Hable filmic at peak/target nits → BT.709 OETF → BGR8); this module
applies the same chain directly to the transfer-coded 8-bit frames:

    linear = EOTF(code/255)            (256-entry per-channel LUT)
    Y      = BT.2020 luma of linear·10000 nits
    s      = hable(Y/peak)·target / Y  (exact numpy, no quantization)
    out    = OETF_709(clip(linear·10000·s, 0, target)/100)  (4096-entry LUT)

It is an approximation twice over — the 10→8-bit decode already quantized
the codes, and cv2's YCbCr matrix may not be BT.2020 — but detection-grade
SDR beats transfer-coded gray, and the math itself is parity-testable
against the reference's own fallback functions.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

# Hable filmic constants (reference video_io.py:3269-3274)
_A, _B, _C, _D, _E, _F, _W = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30, 11.2
# BT.2020 luma coefficients in RGB order (reference video_io.py:3284)
_LUMA_RGB = (0.2627, 0.6780, 0.0593)


def eotf_pq(v: np.ndarray) -> np.ndarray:
    """ST 2084 EOTF, normalized 0..1 with 1.0 ≈ 10,000 nits."""
    m1, m2 = 2610.0 / 16384.0, 2523.0 / 32.0
    c1, c2, c3 = 3424.0 / 4096.0, 2413.0 / 128.0, 2392.0 / 128.0
    v = np.clip(v, 0.0, 1.0)
    vp = np.power(v, 1.0 / m2)
    num = np.maximum(vp - c1, 0.0)
    den = c2 - c3 * vp
    den = np.where(np.abs(den) < 1e-6, 1e-6, den)
    return np.clip(np.power(num / den, 1.0 / m1), 0.0, 1.0)


def eotf_hlg(v: np.ndarray) -> np.ndarray:
    """BT.2100 HLG EOTF, normalized like :func:`eotf_pq`."""
    a, b, c = 0.17883277, 0.28466892, 0.55991073
    v = np.clip(v, 0.0, 1.0)
    return np.where(v <= 0.5, (v * v) / 3.0,
                    (np.exp((v - c) / a) + b) / 12.0)


def oetf_bt709(v: np.ndarray) -> np.ndarray:
    out = np.where(v < 0.018, 4.5 * v,
                   1.099 * np.power(np.clip(v, 0.0, None), 0.45) - 0.099)
    return np.clip(out, 0.0, 1.0)


def _hable(x: np.ndarray) -> np.ndarray:
    def h(y):
        return ((y * (_A * y + _C * _B) + _D * _E)
                / (y * (_A * y + _B) + _D * _F)) - _E / _F

    return np.clip(h(x) / h(np.float64(_W)), 0.0, 1.0)


@lru_cache(maxsize=8)
def _luts(transfer: str) -> Tuple[np.ndarray, np.ndarray]:
    """(256-entry EOTF LUT in float32, 4096-entry 709-OETF LUT in uint8)."""
    codes = np.arange(256, dtype=np.float64) / 255.0
    eotf = eotf_hlg if transfer == "arib-std-b67" else eotf_pq
    lin = eotf(codes).astype(np.float32)
    grid = np.arange(4096, dtype=np.float64) / 4095.0
    oetf = np.round(oetf_bt709(grid) * 255.0).astype(np.uint8)
    return lin, oetf


def approx_tonemap_bgr8(bgr: np.ndarray, transfer: str = "smpte2084",
                        peak_nits: float = 1000.0,
                        target_nits: float = 200.0) -> np.ndarray:
    """Transfer-coded 8-bit BGR → tone-mapped SDR BGR (same shape/dtype)."""
    lut_e, lut_o = _luts("arib-std-b67" if transfer == "arib-std-b67"
                         else "smpte2084")
    lin = lut_e[bgr]                                   # HxWx3 float32
    l_nits = lin * np.float32(10000.0)
    y = (_LUMA_RGB[0] * l_nits[..., 2] + _LUMA_RGB[1] * l_nits[..., 1]
         + _LUMA_RGB[2] * l_nits[..., 0])              # BGR order
    y_t = _hable(y / np.float32(max(peak_nits, 1e-3)))
    y_t *= np.float32(target_nits)
    s = y_t / np.maximum(y, np.float32(1e-6))
    rgb_t = np.clip(l_nits * s[..., None], 0.0, np.float32(target_nits))
    norm = np.minimum(rgb_t * np.float32(1.0 / 100.0), np.float32(1.0))
    # +0.5 = round-to-nearest; norm ≤ 1 so the index stays ≤ 4095
    idx = (norm * np.float32(4095.0) + np.float32(0.5)).astype(np.uint16)
    return lut_o[idx]


class HostTonemapReader:
    """Reader wrapper applying :func:`approx_tonemap_bgr8` to every frame.

    Engages as the terminal branch of ``open_analysis_reader`` when the
    source is HDR and every ffmpeg chain is unavailable — the analogue of
    the reference's pure-Python tonemap pipe mode (video_io.py:3005-3028,
    :3185-3192), minus the float32 pipe this image cannot spawn."""

    def __init__(self, reader, transfer: str = "smpte2084",
                 peak_nits: float = 1000.0, target_nits: float = 200.0):
        self._reader = reader
        self._transfer = transfer or "smpte2084"
        self._peak = float(peak_nits)
        self._target = float(target_nits)
        self.path = getattr(reader, "path", "")

    # position state lives in the wrapped reader
    @property
    def pos(self) -> int:
        return self._reader.pos

    @pos.setter
    def pos(self, value: int) -> None:
        self._reader.pos = value

    def _map(self, frame):
        if frame is None:
            return None
        return approx_tonemap_bgr8(frame, self._transfer,
                                   self._peak, self._target)

    def meta(self):
        return self._reader.meta()

    def grab(self) -> bool:
        return self._reader.grab()

    def retrieve(self):
        return self._map(self._reader.retrieve())

    def read(self):
        return self._map(self._reader.read())

    def seek(self, frame_idx: int) -> None:
        self._reader.seek(frame_idx)

    def skip(self, count: int) -> int:
        return self._reader.skip(count)

    def release(self) -> None:
        self._reader.release()

    def __getattr__(self, name: str):
        # decoder-health fields (recoveries/failed/eof_reason/stderr_tail)
        # and any reader-specific surface pass through to the wrapped
        # reader, so engine diagnostics survive the wrap
        if name == "_reader":            # guard pre-__init__ lookups
            raise AttributeError(name)
        return getattr(self._reader, name)
