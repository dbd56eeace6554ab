"""Native host ops: build-on-demand C++ shared object with numpy fallback.

``lib()`` compiles hostops.cpp with g++ on first use (cached next to the
source) and returns a ctypes handle, or None when no toolchain exists.
Public wrappers (:func:`p010_repack`, :func:`hamming_matrix`,
:func:`phash64_batch`) transparently fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_SO = os.path.join(_HERE, "libpc_hostops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        cp = subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            capture_output=True, text=True, timeout=120, check=False)
        return cp.returncode == 0 and os.path.isfile(_SO)
    except (OSError, subprocess.SubprocessError):
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            handle = ctypes.CDLL(_SO)
        except OSError:
            return None
        handle.pc_p010_repack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        handle.pc_hamming_matrix.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p]
        handle.pc_phash_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p]
        handle.pc_hostops_version.restype = ctypes.c_int
        _lib = handle
        return _lib


def available() -> bool:
    return lib() is not None


def p010_repack(y_strided: np.ndarray, uv_strided: np.ndarray):
    """Strided P010 planes (uint16, possibly padded rows) → contiguous
    (y, uv) uint16 arrays with codes shifted to the low 10 bits."""
    h, w = y_strided.shape[:2]
    handle = lib()
    if handle is None:
        return (y_strided[:, :w] >> 6).astype(np.uint16), \
               (uv_strided.reshape(h // 2, -1)[:, : (w // 2) * 2] >> 6) \
               .astype(np.uint16).reshape(h // 2, w // 2, 2)
    y_src = np.ascontiguousarray(y_strided, np.uint16)
    uv_src = np.ascontiguousarray(uv_strided, np.uint16).reshape(h // 2, -1)
    y_out = np.empty((h, w), np.uint16)
    uv_out = np.empty((h // 2, (w // 2) * 2), np.uint16)
    handle.pc_p010_repack(
        y_src.ctypes.data, y_src.strides[0],
        uv_src.ctypes.data, uv_src.strides[0],
        w, h, y_out.ctypes.data, uv_out.ctypes.data)
    return y_out, uv_out.reshape(h // 2, w // 2, 2)


def hamming_matrix(a, b) -> np.ndarray:
    """Pairwise Hamming distances of two uint64 hash arrays → uint8
    ``[len(a), len(b)]``."""
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    handle = lib()
    if handle is None:
        x = a[:, None] ^ b[None, :]
        return np.unpackbits(x.view(np.uint8).reshape(len(a), len(b), 8),
                             axis=-1).sum(-1).astype(np.uint8)
    out = np.empty((len(a), len(b)), np.uint8)
    handle.pc_hamming_matrix(a.ctypes.data, len(a), b.ctypes.data, len(b),
                             out.ctypes.data)
    return out


def phash64_batch(gray32: np.ndarray, zero_dc: bool = True) -> np.ndarray:
    """Batch 64-bit DCT pHash of ``[N, 32, 32]`` float32 gray images."""
    from ..core.hashing import _dct_matrix

    gray32 = np.ascontiguousarray(gray32, np.float32)
    n = gray32.shape[0]
    handle = lib()
    if handle is None:
        from ..core.hashing import dct2
        out = np.empty(n, np.uint64)
        for i in range(n):
            block = dct2(gray32[i])[:8, :8].copy()
            if zero_dc:
                block[0, 0] = 0.0
            med = np.median(block)
            bits = np.uint64(0)
            flat = block.reshape(-1) > med
            for k, v in enumerate(flat):
                if v:
                    bits |= np.uint64(1) << np.uint64(k)
            out[i] = bits
        return out
    d = np.ascontiguousarray(_dct_matrix(32), np.float32)
    out = np.empty(n, np.uint64)
    handle.pc_phash_batch(gray32.ctypes.data, n, d.ctypes.data,
                          1 if zero_dc else 0, out.ctypes.data)
    return out
