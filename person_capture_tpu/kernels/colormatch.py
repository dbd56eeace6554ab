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

from .color import YCBCR_BT601, rgb_to_ycbcr, ycbcr_to_bgr_u8


def _to_ycbcr(bgr):
    rgb = bgr[..., ::-1].astype(jnp.float32) / 255.0
    ycc = rgb_to_ycbcr(rgb, YCBCR_BT601)
    return ycc[..., 0], ycc[..., 1], ycc[..., 2]


def _from_ycbcr(y, cb, cr):
    return ycbcr_to_bgr_u8(y, cb, cr, YCBCR_BT601)


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


def _masked_percentile(vals, sel, q: float):
    """Linear-interpolated percentile of ``vals[sel]`` with fixed shapes
    (no boolean indexing under jit): unselected values sort to +inf, the
    percentile interpolates inside the selected prefix — same estimator as
    np.percentile/jnp.quantile, matching the reference and the all-pixel
    fallback below. Returns (percentile, n_selected); +inf when empty."""
    n = jnp.sum(sel)
    v = jnp.sort(jnp.where(sel, vals, jnp.inf))
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, vals.shape[0] - 1)
    hi = jnp.clip(jnp.minimum(lo + 1, jnp.maximum(n - 1, 0)),
                  0, vals.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    return v[lo] * (1.0 - frac) + v[hi] * frac, n


def fit_chroma_side_gains(clean_c, ref_c, max_gain: float = 2.25,
                          min_gain: float = 0.40, min_side_px: int = 256):
    """Per-side chroma gains pinned at the neutral axis (reference
    ``_neutral_chroma_gain_lut``, gui_app.py:9641-9692): each side's gain is
    the p75 ratio of deviations over pixels where EITHER rendering actually
    excursions past ~1 8-bit code unit. A side with too few such pixels (or
    a near-neutral clean p75) falls back to the all-pixel gain, then to 1.0
    — never to the clip floor, which the old full-array quantile hit on
    sparsely-populated sides (one-sided casts desaturated by ~2x).

    ``clean_c``/``ref_c`` must be the same shape (the caller resizes the
    clean plane onto the statistics reference when it is reduced-res)."""
    unit = 1.0 / 255.0  # one 8-bit code unit in normalized chroma
    c = clean_c.reshape(-1)
    r = ref_c.reshape(-1)
    if c.shape[0] < 1024:  # reference bails without enough pixels
        one = jnp.float32(1.0)
        return one, one

    def side(sign: float):
        cd, rd = sign * c, sign * r
        sel = (cd > unit) | (rd > unit)
        cp, n_sel = _masked_percentile(cd, sel, 0.75)
        rp, _ = _masked_percentile(rd, sel, 0.75)
        valid = ((n_sel >= min_side_px) & jnp.isfinite(cp)
                 & jnp.isfinite(rp) & (cp >= unit))
        g = jnp.clip(rp / jnp.maximum(cp, 1e-6), min_gain, max_gain)
        return jnp.where(valid, g, jnp.nan), valid

    # all-pixel fallback gain (reference fallback_gain)
    cpa = jnp.quantile(jnp.abs(c), 0.75)
    rpa = jnp.quantile(jnp.abs(r), 0.75)
    fb = jnp.where(cpa >= unit,
                   jnp.clip(rpa / jnp.maximum(cpa, 1e-6),
                            min_gain, max_gain),
                   1.0)
    pos_g, pos_ok = side(1.0)
    neg_g, neg_ok = side(-1.0)
    return jnp.where(pos_ok, pos_g, fb), jnp.where(neg_ok, neg_g, fb)


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
    def _fit_view(c_clean, c_ref):
        # the side-gain fit pairs pixels (deviation-union selection), so a
        # reduced-res statistics reference needs the clean plane on its
        # grid — NEAREST, not linear: averaging would shrink the clean
        # side's deviation distribution (the strided reference stays sharp)
        # and bias every gain upward on high-frequency content
        if c_clean.shape != c_ref.shape:
            import jax

            return jax.image.resize(c_clean, c_ref.shape, "nearest")
        return c_clean

    out_c = []
    for c_clean, c_ref in ((cb_c, cb_r), (cr_c, cr_r)):
        pos_g, neg_g = fit_chroma_side_gains(_fit_view(c_clean, c_ref),
                                             c_ref)
        mapped = jnp.where(c_clean >= 0, c_clean * pos_g, c_clean * neg_g)
        w_c = s * float(chroma_strength) * shadow_protect_weight(
            y_c, shadow_chroma_protect)
        matched = c_clean + w_c * (mapped - c_clean)
        if lowfreq > 0.0:
            matched = lowfreq_residual(matched, c_ref, s * lowfreq, w_c)
        out_c.append(matched)

    return _from_ycbcr(y_out, out_c[0], out_c[1])
