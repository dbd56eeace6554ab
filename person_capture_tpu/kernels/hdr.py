"""Fused HDR→SDR conversion kernels.

This is the TPU replacement for the reference's entire HDR render zoo —
libplacebo/zscale ffmpeg filter graphs (video_io.py:924-1090, 2245-2520),
the WIC still path and the Vulkan preview shader (pc_hdr_frag.glsl): one
program takes P010/10-bit YCbCr or linear RGB planes and produces dithered
SDR BGR, with EOTF → tone-map → gamut map → OETF fused per pixel.

Two implementations with identical math:
  * ``*_jnp`` — reference path, runs anywhere (also the CPU test oracle);
  * ``tonemap_planes_pallas`` — Pallas TPU kernel fusing the
    transcendental-heavy per-pixel chain over (3, H, 128·k) tiles so HBM is
    touched once. Dispatch via :func:`hdr_to_sdr_bgr`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .color import (BT2020_TO_BT709, PQ_PEAK_NITS, YCBCR_BT2020,
                    hlg_to_linear, normalize_full, normalize_limited,
                    pq_eotf, srgb_oetf, ycbcr_to_rgb)
from .tonemap import apply_tonemap

_BAYER4 = (np.array([[0, 8, 2, 10],
                     [12, 4, 14, 6],
                     [3, 11, 1, 9],
                     [15, 7, 13, 5]], np.float32) + 0.5) / 16.0


def _bayer_tile(h: int, w: int):
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 4
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 4
    return jnp.asarray(_BAYER4)[ys, xs]


def p010_unpack(y_u16, uv_u16, full_range: bool = False,
                chroma_upsample: str = "linear"):
    """P010 planes → normalized Y (0..1), Cb/Cr (-0.5..0.5) at luma size.

    ``y_u16``: [H, W] uint16 with 10-bit codes in the high bits (>>6, as the
    Vulkan preview shader does); ``uv_u16``: [H/2, W/2, 2] interleaved CbCr.
    ``chroma_upsample``: "linear" (clean 444-style reconstruction) or
    "nearest" (the blockier 420 decode look of the reference's WIC/420
    accepted-color chain).
    """
    y_code = (y_u16.astype(jnp.uint16) >> 6).astype(jnp.float32)
    uv_code = (uv_u16.astype(jnp.uint16) >> 6).astype(jnp.float32)
    norm = normalize_full if full_range else normalize_limited
    y = norm(y_code, bits=10, chroma=False)
    cb = norm(uv_code[..., 0], bits=10, chroma=True)
    cr = norm(uv_code[..., 1], bits=10, chroma=True)
    h, w = y.shape
    method = "nearest" if chroma_upsample == "nearest" else "linear"
    cb = jax.image.resize(cb, (h, w), method)
    cr = jax.image.resize(cr, (h, w), method)
    return y, cb, cr


def map_gamut_709(rgb709, mode: str = "clip"):
    """Bring out-of-gamut BT.709 values in range (cfg.hdr_sdr_gamut_mapping).

    Device equivalents of libplacebo's gamut modes (same names, simplified
    curves): clip — hard clip; relative — uniform scale preserving hue;
    perceptual — desaturate toward luma until the max channel fits;
    saturation — per-channel soft knee."""
    rgb = jnp.maximum(rgb709, 0.0)
    if mode == "relative":
        m = jnp.max(rgb, axis=-1, keepdims=True)
        return rgb / jnp.maximum(m, 1.0)
    if mode == "perceptual":
        yl = (0.2126 * rgb[..., 0:1] + 0.7152 * rgb[..., 1:2]
              + 0.0722 * rgb[..., 2:3])
        m = jnp.max(rgb, axis=-1, keepdims=True)
        # exact desaturation factor that brings the max channel to 1
        t = jnp.clip((m - 1.0) / jnp.maximum(m - yl, 1e-5), 0.0, 1.0)
        out = rgb + t * (yl - rgb)
        return jnp.clip(out, 0.0, 1.0)
    if mode == "saturation":
        knee = 0.75
        soft = knee + (1.0 - knee) * jnp.tanh((rgb - knee) / (1.0 - knee))
        return jnp.where(rgb <= knee, rgb, soft)
    return jnp.minimum(rgb, 1.0)  # clip


def recover_contrast(mapped_lin, pre_lin, amount: float):
    """Restore high-frequency luma detail crushed by tone-map compression
    (cfg.hdr_sdr_contrast_recovery; libplacebo's contrast recovery): scale
    the mapped image by the pre-map local detail ratio."""
    if amount <= 0.0:
        return mapped_lin
    y_pre = (0.2627 * pre_lin[..., 0] + 0.6780 * pre_lin[..., 1]
             + 0.0593 * pre_lin[..., 2])
    h, w = y_pre.shape
    ch, cw = max(1, h // 8), max(1, w // 8)
    low = jax.image.resize(jax.image.resize(y_pre, (ch, cw), "linear"),
                           (h, w), "linear")
    detail = jnp.clip((y_pre + 1e-4) / (low + 1e-4), 0.5, 2.0)
    gain = detail ** float(amount)
    return mapped_lin * gain[..., None]


def hdr_rgb_prime_to_linear(rgb_prime, transfer: str = "pq",
                            sdr_nits: float = 100.0,
                            src_peak_nits: float = 1000.0):
    """Non-linear HDR R'G'B' (0..1) → linear RGB in SDR-peak units."""
    if transfer == "hlg":
        lin = hlg_to_linear(rgb_prime, peak_nits=src_peak_nits)
        return lin * (src_peak_nits / sdr_nits)
    lin = pq_eotf(rgb_prime) * PQ_PEAK_NITS  # nits
    return lin / sdr_nits


def sdr_encode(rgb709_lin, dither: bool = True, oetf: str = "srgb"):
    """Linear BT.709 RGB (0..1) → dithered uint8 BGR.

    ``oetf``: "srgb" (piecewise sRGB) or "gamma22" (pure 2.2 power — the
    simple-gamma response Windows decode paths apply; differs from sRGB
    mostly in shadows, which is exactly where the reference's WIC look
    diverges from the clean chain)."""
    if oetf == "gamma22":
        from .color import bt1886_oetf

        encoded = bt1886_oetf(jnp.clip(rgb709_lin, 0.0, 1.0),
                              gamma=2.2) * 255.0
    else:
        encoded = srgb_oetf(jnp.clip(rgb709_lin, 0.0, 1.0)) * 255.0
    if dither:
        h, w = encoded.shape[-3], encoded.shape[-2]
        encoded = encoded + (_bayer_tile(h, w) - 0.5)[..., None]
    u8 = jnp.clip(jnp.round(encoded), 0, 255).astype(jnp.uint8)
    return u8[..., ::-1]  # RGB → BGR


def hdr_to_sdr_core_jnp(rgb2020_lin, src_peak_nits: float = 1000.0,
                        sdr_nits: float = 100.0, algo: str = "bt.2390",
                        desat: float = 0.25, param: Optional[float] = None):
    """Linear BT.2020 RGB (SDR-peak units) → linear BT.709 RGB (0..1)."""
    peak = max(1.0 + 1e-3, float(src_peak_nits) / float(sdr_nits))
    mapped = apply_tonemap(rgb2020_lin, peak, algo=algo, desat=desat,
                           param=param, sdr_nits=sdr_nits)
    rgb709 = jnp.einsum("...c,dc->...d", mapped,
                        jnp.asarray(BT2020_TO_BT709))
    return jnp.clip(rgb709, 0.0, 1.0)


def detect_peak_nits(rgb_prime_pq, floor_nits: float = 203.0,
                     quantile: float = 0.999):
    """Scene peak luminance (nits) from PQ-coded R'G'B': a high quantile of
    the per-pixel max channel, floored at HDR reference white — the device
    replacement for libplacebo's ``peak-detect`` (cfg.hdr_sdr_peak_detect).
    Using the measured peak instead of a fixed 1000 nits keeps dim scenes
    from being over-compressed."""
    peak_code = jnp.quantile(jnp.max(rgb_prime_pq, axis=-1).reshape(-1),
                             quantile)
    nits = pq_eotf(peak_code) * PQ_PEAK_NITS
    return jnp.maximum(nits, floor_nits)


def p010_to_sdr_bgr_jnp(y_u16, uv_u16, full_range: bool = False,
                        transfer: str = "pq", src_peak_nits: float = 1000.0,
                        sdr_nits: float = 100.0, algo: str = "bt.2390",
                        desat: float = 0.25, param: Optional[float] = None,
                        dither: bool = True, peak_detect: bool = False,
                        chroma_upsample: str = "linear", oetf: str = "srgb",
                        contrast_recovery: float = 0.0,
                        gamut: str = "clip"):
    """Full P010 HDR frame → SDR BGR uint8 (jnp reference path)."""
    y, cb, cr = p010_unpack(y_u16, uv_u16, full_range, chroma_upsample)
    rgb_prime = jnp.clip(ycbcr_to_rgb(y, cb, cr, YCBCR_BT2020), 0.0, 1.0)
    if peak_detect and transfer == "pq":
        # dynamic peak: tone-map relative to the measured scene peak
        peak_nits = detect_peak_nits(rgb_prime)
        lin = pq_eotf(rgb_prime) * PQ_PEAK_NITS / sdr_nits
        peak_ratio = jnp.maximum(peak_nits / sdr_nits, 1.0 + 1e-3)
        mapped = apply_tonemap(lin, peak_ratio, algo=algo, desat=desat,
                               param=param, sdr_nits=sdr_nits)
        mapped = recover_contrast(mapped, lin, contrast_recovery)
        rgb709 = map_gamut_709(jnp.einsum("...c,dc->...d", mapped,
                                          jnp.asarray(BT2020_TO_BT709)),
                               gamut)
        return sdr_encode(rgb709, dither, oetf)
    lin = hdr_rgb_prime_to_linear(rgb_prime, transfer, sdr_nits,
                                  src_peak_nits)
    peak = max(1.0 + 1e-3, float(src_peak_nits) / float(sdr_nits))
    mapped = apply_tonemap(lin, peak, algo=algo, desat=desat, param=param,
                           sdr_nits=sdr_nits)
    mapped = recover_contrast(mapped, lin, contrast_recovery)
    rgb709 = map_gamut_709(jnp.einsum("...c,dc->...d", mapped,
                                      jnp.asarray(BT2020_TO_BT709)), gamut)
    return sdr_encode(rgb709, dither, oetf)


# ---------------------------------------------------------------------------
# Pallas fused per-pixel chain
# ---------------------------------------------------------------------------

def _core_math(r, g, b, peak, algo, desat, param, sdr_nits):
    """Per-pixel chain on plane blocks: PQ EOTF → tonemap → 2020→709 →
    sRGB OETF. Shared by the Pallas kernel body (shapes [TH, TW])."""
    rgb = jnp.stack([r, g, b], axis=-1)
    lin = pq_eotf(rgb) * (PQ_PEAK_NITS / sdr_nits)
    mapped = apply_tonemap(lin, peak, algo=algo, desat=desat, param=param,
                           sdr_nits=sdr_nits)
    m = BT2020_TO_BT709
    r2 = m[0, 0] * mapped[..., 0] + m[0, 1] * mapped[..., 1] + m[0, 2] * mapped[..., 2]
    g2 = m[1, 0] * mapped[..., 0] + m[1, 1] * mapped[..., 1] + m[1, 2] * mapped[..., 2]
    b2 = m[2, 0] * mapped[..., 0] + m[2, 1] * mapped[..., 1] + m[2, 2] * mapped[..., 2]
    out = [srgb_oetf(jnp.clip(c, 0.0, 1.0)) for c in (r2, g2, b2)]
    return out


def tonemap_planes_pallas(rgb_prime_planar, src_peak_nits: float = 1000.0,
                          sdr_nits: float = 100.0, algo: str = "bt.2390",
                          desat: float = 0.25, param: Optional[float] = None,
                          tile_h: int = 8, tile_w: int = 256,
                          interpret: Optional[bool] = None):
    """Fused PQ→tonemap→gamut→OETF on planar R'G'B' ``[3, H, W]`` float32.

    Returns encoded (non-linear) planar RGB in 0..1. H/W are padded to tile
    multiples internally. ``interpret`` defaults to True off-TPU so tests run
    on the CPU mesh with identical semantics.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    peak = max(1.0 + 1e-3, float(src_peak_nits) / float(sdr_nits))

    _, h, w = rgb_prime_planar.shape
    ph = -(-h // tile_h) * tile_h
    pw = -(-w // tile_w) * tile_w
    x = jnp.pad(rgb_prime_planar, ((0, 0), (0, ph - h), (0, pw - w)))

    def kernel(in_ref, out_ref):
        r = in_ref[0]
        g = in_ref[1]
        b = in_ref[2]
        r2, g2, b2 = _core_math(r, g, b, peak, algo, desat, param, sdr_nits)
        out_ref[0] = r2
        out_ref[1] = g2
        out_ref[2] = b2

    grid = (ph // tile_h, pw // tile_w)
    spec = pl.BlockSpec((3, tile_h, tile_w),
                        index_map=lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, ph, pw), jnp.float32),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(x.astype(jnp.float32))
    return out[:, :h, :w]


def hdr_to_sdr_bgr(y_u16, uv_u16, full_range: bool = False,
                   transfer: str = "pq", src_peak_nits: float = 1000.0,
                   sdr_nits: float = 100.0, algo: str = "bt.2390",
                   desat: float = 0.25, param: Optional[float] = None,
                   dither: bool = True, use_pallas: Optional[bool] = None):
    """P010 planes → SDR BGR uint8 for the PLAIN tone-map configuration
    (no peak-detect/contrast-recovery/gamut-map): Pallas-fused on TPU, the
    jnp chain elsewhere. The stills renderer (hdr/stills._get_render_fn)
    dispatches this path when params allow — e.g. the "fast" quality
    preset; richer configurations stay on p010_to_sdr_bgr_jnp."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas or transfer != "pq":
        return p010_to_sdr_bgr_jnp(y_u16, uv_u16, full_range, transfer,
                                   src_peak_nits, sdr_nits, algo, desat,
                                   param, dither)
    y, cb, cr = p010_unpack(y_u16, uv_u16, full_range)
    rgb_prime = jnp.clip(ycbcr_to_rgb(y, cb, cr, YCBCR_BT2020), 0.0, 1.0)
    planar = jnp.moveaxis(rgb_prime, -1, 0)
    encoded = tonemap_planes_pallas(planar, src_peak_nits, sdr_nits, algo,
                                    desat, param)
    encoded = jnp.moveaxis(encoded, 0, -1) * 255.0
    if dither:
        h, w = encoded.shape[0], encoded.shape[1]
        encoded = encoded + (_bayer_tile(h, w) - 0.5)[..., None]
    u8 = jnp.clip(jnp.round(encoded), 0, 255).astype(jnp.uint8)
    return u8[..., ::-1]
