"""YCbCr color-match repair.

Device re-implementation of the reference's WIC yuv444 color-match
(person_capture/gui_app.py:9487-9878 + torch-CUDA variant 10061): transfer
the *color response* of a reference rendering (the accepted yuv420/full
"WIC/Paint look") onto a clean rendering (yuv444/limited texture) —
  * luma: 33-point quantile LUT from clean→reference distribution,
  * chroma: per-side gain around the neutral axis (Cb/Cr sign preserved),
  * shadow protection ramps that keep clean shadow texture/neutrality.

Everything is jnp (sorts + interp + elementwise) so full-resolution stills
match in one device program instead of the reference's CPU numpy / optional
CUDA split.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .color import YCBCR_BT601, rgb_to_ycbcr


def _to_ycbcr(bgr):
    rgb = bgr[..., ::-1].astype(jnp.float32) / 255.0
    ycc = rgb_to_ycbcr(rgb, YCBCR_BT601)
    return ycc[..., 0], ycc[..., 1], ycc[..., 2]


def _from_ycbcr(y, cb, cr):
    m = jnp.asarray(np.linalg.inv(YCBCR_BT601), jnp.float32)
    r = m[0, 0] * y + m[0, 1] * cb + m[0, 2] * cr
    g = m[1, 0] * y + m[1, 1] * cb + m[1, 2] * cr
    b = m[2, 0] * y + m[2, 1] * cb + m[2, 2] * cr
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(jnp.round(rgb[..., ::-1] * 255.0), 0, 255).astype(jnp.uint8)


def fit_quantile_lut(clean, ref, n_points: int = 33):
    """Fit a monotone LUT mapping the ``clean`` distribution onto ``ref``.

    Returns (xs, ys): LUT nodes at evenly spaced quantiles. Spike/outlier
    resistance comes from quantile (not moment) matching.
    """
    qs = jnp.linspace(0.0, 1.0, n_points)
    xs = jnp.quantile(clean.reshape(-1), qs)
    ys = jnp.quantile(ref.reshape(-1), qs)
    # enforce strict monotonicity of xs for interp stability
    xs = jnp.maximum.accumulate(xs + jnp.arange(n_points) * 1e-7)
    ys = jnp.maximum.accumulate(ys)
    return xs, ys


def apply_lut(x, xs, ys):
    return jnp.interp(x, xs, ys)


def fit_chroma_side_gains(clean_c, ref_c, hi_q: float = 0.90,
                          max_gain: float = 2.5):
    """Per-side chroma gains pinned at the neutral axis: positive and
    negative halves each get gain = ref_q/clean_q of the |value|
    distribution's high quantile. Keeps neutral pixels neutral."""
    def side_gain(c_sel, r_sel):
        cq = jnp.quantile(c_sel, hi_q)
        rq = jnp.quantile(r_sel, hi_q)
        g = rq / jnp.maximum(cq, 1e-5)
        return jnp.clip(g, 1.0 / max_gain, max_gain)

    c = clean_c.reshape(-1)
    r = ref_c.reshape(-1)
    pos_g = side_gain(jnp.maximum(c, 0.0), jnp.maximum(r, 0.0))
    neg_g = side_gain(jnp.maximum(-c, 0.0), jnp.maximum(-r, 0.0))
    return pos_g, neg_g


def shadow_protect_weight(y, protect: float, knee: float = 0.18):
    """0..1 multiplier reducing match strength in dark regions: 1 above the
    knee, ramping to (1 - protect) at black."""
    ramp = jnp.clip(y / jnp.maximum(knee, 1e-5), 0.0, 1.0)
    return 1.0 - float(protect) * (1.0 - ramp)


def lowfreq_residual(out_c, ref_c, amount: float, weight,
                     grid: int = 24):
    """Low-frequency chroma residual transfer (reference
    ``hdr_wic_yuv444_color_match_lowfreq``, gui_app.py:9487-9878): the
    global side-gain match cannot reproduce spatially varying casts, so the
    coarse-grid difference ref−matched is added back. ``ref_c`` may be a
    reduced-resolution rendering — both sides are pooled onto a common
    coarse grid before differencing."""
    import jax

    h, w = out_c.shape
    gh, gw = min(grid, h), min(grid, w)
    low_out = jax.image.resize(out_c, (gh, gw), "linear")
    low_ref = jax.image.resize(ref_c, (gh, gw), "linear")
    resid = jax.image.resize(low_ref - low_out, (h, w), "linear")
    return out_c + float(amount) * weight * resid


def color_match_bgr(clean_bgr, ref_bgr, strength: float = 1.0,
                    luma_strength: float = 0.45,
                    chroma_strength: float = 0.85,
                    shadow_luma_protect: float = 0.85,
                    shadow_chroma_protect: float = 0.80,
                    n_points: int = 33, lowfreq: float = 0.0):
    """Match ``clean_bgr`` to ``ref_bgr``'s color response.

    ``ref_bgr`` may be a reduced-resolution rendering (statistics only —
    mirrors ``ref_max_side`` in the reference); output is full resolution.
    ``lowfreq`` > 0 additionally transfers the coarse spatial chroma field.
    """
    y_c, cb_c, cr_c = _to_ycbcr(jnp.asarray(clean_bgr))
    y_r, cb_r, cr_r = _to_ycbcr(jnp.asarray(ref_bgr))

    s = float(strength)
    # --- luma: quantile LUT with shadow protection -----------------------
    xs, ys = fit_quantile_lut(y_c, y_r, n_points)
    y_mapped = apply_lut(y_c, xs, ys)
    w_y = s * float(luma_strength) * shadow_protect_weight(
        y_c, shadow_luma_protect)
    y_out = y_c + w_y * (y_mapped - y_c)

    # --- chroma: neutral-pinned side gains with shadow protection --------
    out_c = []
    for c_clean, c_ref in ((cb_c, cb_r), (cr_c, cr_r)):
        pos_g, neg_g = fit_chroma_side_gains(c_clean, c_ref)
        mapped = jnp.where(c_clean >= 0, c_clean * pos_g, c_clean * neg_g)
        w_c = s * float(chroma_strength) * shadow_protect_weight(
            y_c, shadow_chroma_protect)
        matched = c_clean + w_c * (mapped - c_clean)
        if lowfreq > 0.0:
            matched = lowfreq_residual(matched, c_ref, s * lowfreq, w_c)
        out_c.append(matched)

    return _from_ycbcr(y_out, out_c[0], out_c[1])
