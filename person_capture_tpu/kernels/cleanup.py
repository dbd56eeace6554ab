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
