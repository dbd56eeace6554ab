"""Color science primitives (jnp, shape-agnostic, float32).

Public-standard transfer functions and matrices used by the HDR→SDR path:
SMPTE ST 2084 (PQ), ARIB STD-B67 (HLG), BT.2020/BT.709 primaries and YCbCr
(non-constant-luminance), BT.1886/sRGB encodings. These replace the color
math the reference delegates to ffmpeg/libplacebo/zscale/WIC/Vulkan
(reference: person_capture/video_io.py:3239-3291 python fallback EOTFs,
hdr_preview/pc_hdr_frag.glsl PQ/BT.2020 decode).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# ST 2084 / PQ (values normalized: 1.0 == 10000 nits)
# ---------------------------------------------------------------------------

_PQ_M1 = 2610.0 / 16384.0
_PQ_M2 = 2523.0 / 4096.0 * 128.0
_PQ_C1 = 3424.0 / 4096.0
_PQ_C2 = 2413.0 / 4096.0 * 32.0
_PQ_C3 = 2392.0 / 4096.0 * 32.0

PQ_PEAK_NITS = 10000.0


def pq_eotf(e):
    """PQ code value (0..1) → linear luminance (0..1, 1.0 = 10000 nits)."""
    e = jnp.clip(e, 0.0, 1.0).astype(jnp.float32)
    p = jnp.power(e, 1.0 / _PQ_M2)
    num = jnp.maximum(p - _PQ_C1, 0.0)
    den = _PQ_C2 - _PQ_C3 * p
    return jnp.power(num / jnp.maximum(den, 1e-10), 1.0 / _PQ_M1)


def pq_inv_eotf(y):
    """Linear (1.0 = 10000 nits) → PQ code value."""
    y = jnp.clip(y, 0.0, 1.0).astype(jnp.float32)
    p = jnp.power(y, _PQ_M1)
    return jnp.power((_PQ_C1 + _PQ_C2 * p) / (1.0 + _PQ_C3 * p), _PQ_M2)


# ---------------------------------------------------------------------------
# HLG (ARIB STD-B67); scene-linear normalized 0..1
# ---------------------------------------------------------------------------

_HLG_A = 0.17883277
_HLG_B = 1.0 - 4.0 * _HLG_A
_HLG_C = 0.5 - _HLG_A * np.log(4.0 * _HLG_A)


def hlg_oetf_inv(e):
    """HLG signal (0..1) → scene-linear (0..1 at nominal peak)."""
    e = jnp.clip(e, 0.0, 1.0).astype(jnp.float32)
    lo = (e * e) / 3.0
    hi = (jnp.exp((e - _HLG_C) / _HLG_A) + _HLG_B) / 12.0
    return jnp.where(e <= 0.5, lo, hi)


def hlg_ootf_gamma(peak_nits: float = 1000.0) -> float:
    """System gamma for the HLG OOTF at the given display peak."""
    return 1.2 + 0.42 * float(np.log10(peak_nits / 1000.0))


def hlg_to_linear(e, peak_nits: float = 1000.0):
    """HLG signal → display-linear normalized so 1.0 == peak_nits."""
    scene = hlg_oetf_inv(e)
    gamma = hlg_ootf_gamma(peak_nits)
    # luma-driven OOTF approximated per-channel (sufficient for previews)
    return jnp.power(scene, gamma)


# ---------------------------------------------------------------------------
# Primaries / gamut matrices (sRGB == BT.709 primaries)
# ---------------------------------------------------------------------------

BT2020_TO_XYZ = np.array([
    [0.6369580, 0.1446169, 0.1688810],
    [0.2627002, 0.6779981, 0.0593017],
    [0.0000000, 0.0280727, 1.0609851],
], np.float64)

BT709_TO_XYZ = np.array([
    [0.4123908, 0.3575843, 0.1804808],
    [0.2126390, 0.7151687, 0.0721923],
    [0.0193308, 0.1191948, 0.9505322],
], np.float64)

BT2020_TO_BT709 = (np.linalg.inv(BT709_TO_XYZ) @ BT2020_TO_XYZ).astype(np.float32)
BT709_TO_BT2020 = (np.linalg.inv(BT2020_TO_XYZ) @ BT709_TO_XYZ).astype(np.float32)


def apply_matrix(rgb, m):
    """Apply a 3×3 matrix to ``[..., 3]``."""
    return jnp.einsum("...c,dc->...d", rgb.astype(jnp.float32),
                      jnp.asarray(m, jnp.float32))


# ---------------------------------------------------------------------------
# YCbCr (non-constant-luminance)
# ---------------------------------------------------------------------------

def _ycbcr_matrix(kr: float, kb: float) -> np.ndarray:
    kg = 1.0 - kr - kb
    return np.array([
        [kr, kg, kb],
        [-0.5 * kr / (1 - kb), -0.5 * kg / (1 - kb), 0.5],
        [0.5, -0.5 * kg / (1 - kr), -0.5 * kb / (1 - kr)],
    ], np.float32)


YCBCR_BT2020 = _ycbcr_matrix(0.2627, 0.0593)
YCBCR_BT709 = _ycbcr_matrix(0.2126, 0.0722)
YCBCR_BT601 = _ycbcr_matrix(0.299, 0.114)


def ycbcr_to_rgb(y, cb, cr, matrix=None):
    """Y'CbCr (Y in 0..1, Cb/Cr in -0.5..0.5) → R'G'B' (0..1)."""
    m = np.linalg.inv(matrix if matrix is not None else YCBCR_BT2020)
    m = jnp.asarray(m, jnp.float32)
    r = m[0, 0] * y + m[0, 1] * cb + m[0, 2] * cr
    g = m[1, 0] * y + m[1, 1] * cb + m[1, 2] * cr
    b = m[2, 0] * y + m[2, 1] * cb + m[2, 2] * cr
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_ycbcr(rgb, matrix=None):
    m = jnp.asarray(matrix if matrix is not None else YCBCR_BT709, jnp.float32)
    return jnp.einsum("...c,dc->...d", rgb.astype(jnp.float32), m)


def ycbcr_to_bgr_u8(y, cb, cr, matrix=None):
    """Y'CbCr planes → rounded uint8 BGR image. Shared reconstruction for
    the color-match and cleanup kernels (one copy of the color math)."""
    rgb = ycbcr_to_rgb(y, cb, cr, matrix)
    return jnp.clip(jnp.round(rgb[..., ::-1] * 255.0), 0, 255) \
        .astype(jnp.uint8)


def normalize_limited(code, bits: int = 10, chroma: bool = False):
    """Limited-range code values → normalized (Y: 0..1, C: -0.5..0.5)."""
    scale = float(1 << (bits - 8))
    lo = 16.0 * scale
    span = (235.0 - 16.0) * scale if not chroma else (240.0 - 16.0) * scale
    x = (code.astype(jnp.float32) - lo) / span
    if chroma:
        return x - 0.5
    return x


def normalize_full(code, bits: int = 10, chroma: bool = False):
    maxv = float((1 << bits) - 1)
    x = code.astype(jnp.float32) / maxv
    if chroma:
        return x - 0.5
    return x


# ---------------------------------------------------------------------------
# Display encodings
# ---------------------------------------------------------------------------

def srgb_oetf(x):
    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    lo = 12.92 * x
    hi = 1.055 * jnp.power(jnp.maximum(x, 1e-10), 1.0 / 2.4) - 0.055
    return jnp.where(x <= 0.0031308, lo, hi)


def srgb_eotf(e):
    e = jnp.clip(e.astype(jnp.float32), 0.0, 1.0)
    lo = e / 12.92
    hi = jnp.power((e + 0.055) / 1.055, 2.4)
    return jnp.where(e <= 0.04045, lo, hi)


def bt1886_oetf(x, gamma: float = 2.4):
    """Inverse of the BT.1886 display EOTF (simple power law)."""
    return jnp.power(jnp.clip(x.astype(jnp.float32), 0.0, 1.0), 1.0 / gamma)


def bt709_oetf(x):
    """Camera OETF of BT.709 (rarely what you want for display; kept for
    parity with zscale's transfer=709)."""
    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    lo = 4.5 * x
    hi = 1.099 * jnp.power(jnp.maximum(x, 1e-10), 0.45) - 0.099
    return jnp.where(x < 0.018, lo, hi)
