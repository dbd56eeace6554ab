"""Tone-mapping curves (HDR→SDR luminance compression).

Device re-implementations of the algorithms the reference reaches through
ffmpeg (libplacebo ``tonemapping=`` / zscale+``tonemap=`` — reference:
person_capture/video_io.py:1214 algo ladder bt.2390→mobius→hable→clip,
gui_app.py:12598 still-export ladders). All curves act on linear luminance
normalized so 1.0 == SDR peak; input may exceed 1.0 up to ``peak`` (source
peak / SDR peak ratio).
"""

from __future__ import annotations

import jax.numpy as jnp


def tm_clip(x, peak: float):
    return jnp.clip(x, 0.0, 1.0)


def tm_reinhard(x, peak: float, contrast: float = 0.5):
    offset = (1.0 - contrast) / contrast
    gain = (peak + offset) / peak
    return jnp.clip(x * gain / (x + offset), 0.0, 1.0)


def tm_mobius(x, peak: float, param: float = 0.3):
    """Mobius: linear below the knee ``param``, hyperbolic roll-off above —
    matches libplacebo's formulation."""
    j = jnp.float32(param)
    peak = jnp.maximum(jnp.asarray(peak, jnp.float32), 1.0 + 1e-6)
    a = -j * j * (peak - 1.0) / jnp.maximum(j * j - 2.0 * j + peak, 1e-6)
    b = (j * j - 2.0 * j * peak + peak) / jnp.maximum(peak - 1.0, 1e-6)
    mapped = (b * b + 2.0 * b * j + j * j) / (b - a) * (x + a) / (x + b)
    return jnp.clip(jnp.where(x <= j, x, mapped), 0.0, 1.0)


def _hable_partial(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def tm_hable(x, peak: float):
    """Hable/Uncharted-2 filmic curve normalized to the source peak."""
    norm = _hable_partial(jnp.asarray(peak, jnp.float32))
    return jnp.clip(_hable_partial(x) / jnp.maximum(norm, 1e-6), 0.0, 1.0)


def tm_bt2390(x, peak: float, sdr_nits: float = 100.0):
    """BT.2390 EETF: hermite-spline knee in normalized-PQ space (ITU-R
    BT.2390-3 §5.4). ``x`` is linear in SDR-peak units; the source peak is
    ``peak`` (ratio), target display max is 1.0 (== sdr_nits)."""
    from .color import pq_eotf, pq_inv_eotf

    peak = jnp.maximum(jnp.asarray(peak, jnp.float32), 1.0 + 1e-6)
    # absolute PQ signal, normalized so source peak maps to 1.0
    src_max_pq = pq_inv_eotf(peak * sdr_nits / 10000.0)
    e1 = pq_inv_eotf(jnp.clip(x, 0.0, peak) * sdr_nits / 10000.0) / src_max_pq
    max_lum = pq_inv_eotf(jnp.float32(sdr_nits) / 10000.0) / src_max_pq

    ks = 1.5 * max_lum - 0.5
    t = (e1 - ks) / jnp.maximum(1.0 - ks, 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    p = ((2 * t ** 3 - 3 * t ** 2 + 1) * ks
         + (t ** 3 - 2 * t ** 2 + t) * (1.0 - ks)
         + (-2 * t ** 3 + 3 * t ** 2) * max_lum)
    e2 = jnp.where(e1 < ks, e1, p)
    out_nits = pq_eotf(e2 * src_max_pq) * 10000.0
    return jnp.clip(out_nits / sdr_nits, 0.0, 1.0)


TONEMAPPERS = {
    "clip": tm_clip,
    "reinhard": tm_reinhard,
    "mobius": tm_mobius,
    "hable": tm_hable,
    "bt.2390": tm_bt2390,
    "bt2390": tm_bt2390,
    "auto": tm_bt2390,
    "spline": tm_bt2390,        # mapped: libplacebo spline ≈ bt2390 shape
    "st2094-40": tm_bt2390,     # mapped until dynamic metadata lands
}


def apply_tonemap(rgb_lin, peak: float, algo: str = "bt.2390",
                  desat: float = 0.25, param: float | None = None,
                  sdr_nits: float = 100.0):
    """Tone-map linear RGB (1.0 == SDR peak) with luma-driven desaturation.

    Maps max(R,G,B) through the curve and scales the pixel, preserving hue;
    ``desat`` blends toward per-channel mapping in highlights to avoid hue
    shifts at the clip point (the reference exposes this as ``tm_desat``).
    ``sdr_nits`` anchors the BT.2390 knee at the pipeline's actual SDR peak
    (the caller normalized 1.0 == sdr_nits; defaulting the curve to 100
    would shift the knee whenever cfg.sdr_nits differs).
    """
    fn = TONEMAPPERS.get(algo, tm_bt2390)
    kwargs = {}
    if param is not None and fn is tm_mobius:
        kwargs["param"] = param
    if fn is tm_bt2390:
        kwargs["sdr_nits"] = sdr_nits
    lum = jnp.maximum(jnp.max(rgb_lin, axis=-1, keepdims=True), 1e-6)
    mapped_lum = fn(lum, peak, **kwargs)
    scaled = rgb_lin * (mapped_lum / lum)
    if desat and desat > 0.0:
        per_channel = fn(rgb_lin, peak, **kwargs)
        overshoot = jnp.clip((lum - 1.0) / jnp.maximum(peak - 1.0, 1e-6),
                             0.0, 1.0)
        w = desat * overshoot
        scaled = scaled * (1.0 - w) + per_channel * w
    return jnp.clip(scaled, 0.0, 1.0)
