"""Image quality metrics.

Chip quality = variance of the Laplacian response, matching the reference's
``cv2.Laplacian(gray, CV_64F).var()`` (person_capture/face_embedder.py:
1274-1276) — 3×3 kernel [[0,1,0],[1,-4,1],[0,1,0]], REFLECT_101 border.
Batched over chips so one XLA call scores a whole face batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bgr_to_gray_jnp(bgr):
    """BT.601 luma of a float/uint8 BGR array ``[..., 3]``, unrounded —
    callers emulating cv2's uint8 gray plane round separately (see
    ``chip_quality``)."""
    b = bgr[..., 0].astype(jnp.float32)
    g = bgr[..., 1].astype(jnp.float32)
    r = bgr[..., 2].astype(jnp.float32)
    y = 0.114 * b + 0.587 * g + 0.299 * r
    return y


def laplacian_response(gray):
    """Laplacian filter response of ``[..., H, W]`` with REFLECT_101 border
    (cv2 default)."""
    g = gray.astype(jnp.float32)
    up = jnp.concatenate([g[..., 1:2, :], g[..., :-1, :]], axis=-2)
    down = jnp.concatenate([g[..., 1:, :], g[..., -2:-1, :]], axis=-2)
    left = jnp.concatenate([g[..., :, 1:2], g[..., :, :-1]], axis=-1)
    right = jnp.concatenate([g[..., :, 1:], g[..., :, -2:-1]], axis=-1)
    return up + down + left + right - 4.0 * g


def laplacian_variance(gray):
    """Variance of the Laplacian response over the trailing two dims."""
    resp = laplacian_response(gray)
    mean = resp.mean(axis=(-1, -2), keepdims=True)
    return ((resp - mean) ** 2).mean(axis=(-1, -2))


def chip_quality(chips_bgr):
    """Quality score for ``[..., H, W, 3]`` BGR chips (Laplacian variance of
    the rounded uint8-style gray plane, matching the host path)."""
    y = bgr_to_gray_jnp(chips_bgr)
    # cv2's fixed-point BGR→gray rounds half UP (away from zero for the
    # non-negative luma); jnp.round would round half to even and disagree
    # with the host oracle by 1 LSB exactly on .5 values
    y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
    return laplacian_variance(y)


def laplacian_variance_np(gray: np.ndarray) -> float:
    """Host reference implementation (for tests / no-device paths)."""
    g = np.asarray(gray, np.float64)
    padded = np.pad(g, 1, mode="reflect")  # REFLECT_101
    resp = (padded[:-2, 1:-1] + padded[2:, 1:-1] +
            padded[1:-1, :-2] + padded[1:-1, 2:] - 4.0 * g)
    return float(resp.var())
