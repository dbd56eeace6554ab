"""5-point face alignment: canonical ordering, similarity solve, affine warp.

Replaces the reference's ``cv2.estimateAffinePartial2D(LMEDS)`` +
``cv2.warpAffine`` path (person_capture/face_embedder.py:1430-1473) with a
deterministic closed-form umeyama similarity solve and a batched bilinear
warp that runs on device. With 5 clean correspondences LMEDS degenerates to
the least-squares similarity, so the closed form is decision-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ArcFace 112×112 landmark template (LFW standard, public constant)
ARC_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)

ARC_SIZE = 112


def canon_5pts(pts: np.ndarray) -> Optional[np.ndarray]:
    """Sort 5 landmarks into [l_eye, r_eye, nose, l_mouth, r_mouth]; None if
    the configuration is not face-like (nose must sit between eye and mouth
    rows; left must be left)."""
    if pts is None or getattr(pts, "shape", None) != (5, 2):
        return None
    pts = np.asarray(pts, dtype=np.float32)
    if not np.isfinite(pts).all():
        return None
    order_y = np.argsort(pts[:, 1])
    eyes = pts[order_y[:2]]
    nose = pts[order_y[2]]
    mouth = pts[order_y[3:]]
    leye, reye = eyes[np.argsort(eyes[:, 0])]
    lmouth, rmouth = mouth[np.argsort(mouth[:, 0])]
    if not (leye[0] < reye[0] and lmouth[0] < rmouth[0]):
        return None
    if not (max(leye[1], reye[1]) < nose[1] < min(lmouth[1], rmouth[1])):
        return None
    return np.stack([leye, reye, nose, lmouth, rmouth], axis=0)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (uniform scale + rotation +
    translation) mapping ``src`` → ``dst``. Returns a 2×3 matrix M such that
    ``dst ≈ M @ [src, 1]``. Closed-form Umeyama (1991)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    sign = np.diag([1.0, d])
    r = u @ sign @ vt
    var_s = (sc ** 2).sum() / src.shape[0]
    scale = (s * np.diag(sign)).sum() / var_s if var_s > 0 else 1.0
    t = mu_d - scale * (r @ mu_s)
    m = np.zeros((2, 3), np.float64)
    m[:, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def umeyama_similarity_jnp(src, dst):
    """Batched device version of :func:`umeyama_similarity`.

    Args:  src ``[..., P, 2]``, dst ``[P, 2]`` or ``[..., P, 2]``.
    Returns ``[..., 2, 3]`` float32.
    """
    src = src.astype(jnp.float32)
    dst = jnp.broadcast_to(dst.astype(jnp.float32), src.shape)
    p = src.shape[-2]
    mu_s = src.mean(-2, keepdims=True)
    mu_d = dst.mean(-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    cov = jnp.einsum("...pi,...pj->...ij", dc, sc) / p
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    sign = jnp.stack([jnp.ones_like(det), jnp.sign(det)], axis=-1)
    r = jnp.einsum("...ij,...j,...jk->...ik", u, sign, vt)
    var_s = (sc ** 2).sum((-1, -2)) / p
    scale = (s * sign).sum(-1) / jnp.maximum(var_s, 1e-12)
    a = scale[..., None, None] * r
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", a, mu_s[..., 0, :])
    return jnp.concatenate([a, t[..., None]], axis=-1)


def invert_affine(m):
    """Invert a 2×3 affine (batched): returns M' with M'([M x + t]) = x."""
    a = m[..., :2, :2]
    t = m[..., :2, 2]
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([a[..., 1, 1], -a[..., 0, 1]], -1),
        jnp.stack([-a[..., 1, 0], a[..., 0, 0]], -1),
    ], -2) / det[..., None, None]
    ti = -jnp.einsum("...ij,...j->...i", inv, t)
    return jnp.concatenate([inv, ti[..., None]], axis=-1)


def _reflect_index(idx, n):
    """cv2.BORDER_REFLECT (edge included): ...cba|abcd|dcb..."""
    period = 2 * n
    idx = jnp.mod(idx, period)
    idx = jnp.where(idx < 0, idx + period, idx)
    return jnp.where(idx < n, idx, period - 1 - idx)


def warp_affine_jnp(img, m_fwd, out_h: int, out_w: int):
    """Bilinear affine warp of ``img [H, W, C]`` with forward 2×3 matrix
    ``m_fwd`` (src→dst), producing ``[out_h, out_w, C]``, reflect border —
    matching ``cv2.warpAffine(..., INTER_LINEAR, BORDER_REFLECT)``."""
    h, w = img.shape[0], img.shape[1]
    inv = invert_affine(m_fwd)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        yy = _reflect_index(yy, h)
        xx = _reflect_index(xx, w)
        return img[yy, xx]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def align_chips_jnp(frame, kps, valid, out_size: int = ARC_SIZE):
    """Batched ArcFace chip extraction from one frame.

    Args:
      frame: ``[H, W, 3]`` float32 (BGR or RGB — passthrough).
      kps:   ``[F, 5, 2]`` landmark coordinates in frame space.
      valid: ``[F]`` bool.
    Returns:
      ``[F, out_size, out_size, 3]`` chips (zeros where invalid).
    """
    dst = jnp.asarray(ARC_DST)
    ms = umeyama_similarity_jnp(kps, dst)

    def one(m, v):
        chip = warp_affine_jnp(frame, m, out_size, out_size)
        return jnp.where(v, chip, jnp.zeros_like(chip))

    return jax.vmap(one)(ms, valid)
