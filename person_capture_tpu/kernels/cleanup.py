"""Speckle / artifact cleanup kernels.

Device replacement for the reference's saturated-speckle repair
(person_capture/gui_app.py:10950-11305): HDR still renders can contain
isolated saturated blue/red/magenta pixels in dark regions; detect the
impossible outliers (high chroma + dark + isolated) and replace them with a
neighborhood median. Pure elementwise + shift ops — XLA fuses it into the
still-export program.
"""

from __future__ import annotations

import jax.numpy as jnp

from .color import YCBCR_BT601, rgb_to_ycbcr


def _shift2d(x, dy: int, dx: int):
    """Edge-replicated shift of [..., H, W]."""
    if dy > 0:
        x = jnp.concatenate([x[..., :1, :].repeat(dy, -2), x[..., :-dy, :]], -2)
    elif dy < 0:
        x = jnp.concatenate([x[..., -dy:, :], x[..., -1:, :].repeat(-dy, -2)], -2)
    if dx > 0:
        x = jnp.concatenate([x[..., :, :1].repeat(dx, -1), x[..., :, :-dx]], -1)
    elif dx < 0:
        x = jnp.concatenate([x[..., :, -dx:], x[..., :, -1:].repeat(-dx, -1)], -1)
    return x


def neighborhood_median3(x):
    """3×3 median of [..., H, W] via sorting the 9 shifted planes."""
    planes = jnp.stack([_shift2d(x, dy, dx)
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
    return jnp.sort(planes, axis=0)[4]


def detect_speckles(bgr, dark_y: float = 0.22, chroma_thresh: float = 0.18,
                    isolation_delta: float = 0.10):
    """Boolean mask of saturated-speckle pixels: strong chroma far above the
    local chroma median (isolated — real colored objects have coherent
    neighborhoods), inside a dark *neighborhood* (the speckle pixel itself
    is bright; its surroundings are what's dark)."""
    rgb = bgr[..., ::-1].astype(jnp.float32) / 255.0
    ycc = rgb_to_ycbcr(rgb, YCBCR_BT601)
    y = ycc[..., 0]
    local_y = neighborhood_median3(y)
    chroma = jnp.sqrt(ycc[..., 1] ** 2 + ycc[..., 2] ** 2)
    local = neighborhood_median3(chroma)
    return (local_y < dark_y) & (chroma > chroma_thresh) \
        & (chroma - local > isolation_delta)


def despeckle_bgr(bgr, dark_y: float = 0.22, chroma_thresh: float = 0.18,
                  isolation_delta: float = 0.10):
    """Replace detected speckles with the per-channel 3×3 median."""
    x = jnp.asarray(bgr)
    mask = detect_speckles(x, dark_y, chroma_thresh, isolation_delta)
    med = jnp.stack([neighborhood_median3(x[..., c].astype(jnp.float32))
                     for c in range(3)], axis=-1)
    out = jnp.where(mask[..., None], med, x.astype(jnp.float32))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8), mask


def shadow_deblob_bgr(bgr, strength: float = 0.5, dark_y: float = 0.16,
                      grid_div: int = 8):
    """Suppress chroma blobs in deep shadows (reference shadow deblob,
    gui_app.py:9344-9467: dark regions of the WIC render show coherent
    multi-pixel chroma clouds that the single-pixel despeckler leaves
    alone). Chroma in sub-``dark_y`` luma is pulled toward its low-frequency
    field by up to ``strength``; luma and lit regions are untouched."""
    import jax

    from .color import ycbcr_to_bgr_u8

    x = jnp.asarray(bgr)
    rgb = x[..., ::-1].astype(jnp.float32) / 255.0
    ycc = rgb_to_ycbcr(rgb, YCBCR_BT601)
    y = ycc[..., 0]
    h, w = y.shape
    gh, gw = max(1, h // grid_div), max(1, w // grid_div)
    darkness = jnp.clip(1.0 - y / jnp.maximum(float(dark_y), 1e-5), 0.0, 1.0)
    pull = float(strength) * darkness
    out_c = [ycc[..., 0]]
    for c in (ycc[..., 1], ycc[..., 2]):
        low = jax.image.resize(jax.image.resize(c, (gh, gw), "linear"),
                               (h, w), "linear")
        out_c.append(c + pull * (low - c))
    return ycbcr_to_bgr_u8(out_c[0], out_c[1], out_c[2], YCBCR_BT601)


def guide_cleanup_bgr(bgr, guide_bgr, strength: float = 1.0,
                      dark_y: float = 0.20, delta: float = 0.12):
    """Guide-masked artifact cleanup (reference guide-mask cleanup,
    gui_app.py:10737-10949): pixels that disagree strongly with the guide
    render in dark regions are artifacts of the primary chain (the guide
    was rendered through an independent chain) — pull them toward the
    guide. ``guide_bgr`` may be reduced resolution; it is upsampled."""
    import jax

    x = jnp.asarray(bgr).astype(jnp.float32)
    g = jnp.asarray(guide_bgr).astype(jnp.float32)
    if g.shape != x.shape:
        g = jax.image.resize(g, x.shape, "linear")
    ycc = rgb_to_ycbcr(x[..., ::-1] / 255.0, YCBCR_BT601)
    y = ycc[..., 0]
    diff = jnp.abs(x - g).max(-1) / 255.0
    dark = jnp.clip(1.0 - y / jnp.maximum(float(dark_y), 1e-5), 0.0, 1.0)
    bad = jnp.clip((diff - float(delta)) / max(float(delta), 1e-5), 0.0, 1.0)
    w = (float(strength) * dark * bad)[..., None]
    out = x + w * (g - x)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
