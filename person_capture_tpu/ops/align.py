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


def warp_affine_inv_jnp(img, m_inv, out_h: int, out_w: int,
                        reflect: bool = True):
    """Like :func:`warp_affine_jnp` but takes the dst→src matrix directly."""
    h, w = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    sx = m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]
    sy = m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        if reflect:
            yy = _reflect_index(yy, h)
            xx = _reflect_index(xx, w)
        else:
            yy = jnp.clip(yy, 0, h - 1)
            xx = jnp.clip(xx, 0, w - 1)
        return img[yy, xx]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _extract_window_separable(frame, cx, cy, half, window: int):
    """Axis-aligned bilinear window extraction via two single-axis gathers
    (row-take then column-take). Much faster on TPU than a 2-D gather from
    the full frame. Returns ``[window, window, C]`` and the scale ``s`` such
    that src = s·(win + 0.5) + (c − half) − 0.5·s … i.e. src = off + s·win
    with off = c − half + 0.5·s − … (see caller for the exact compose)."""
    h, w = frame.shape[0], frame.shape[1]
    s = 2.0 * half / window
    idx = (jnp.arange(window, dtype=jnp.float32) + 0.5) * s
    ys = cy - half + idx - 0.5
    xs = cx - half + idx - 0.5
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    rows = (jnp.take(frame, y0i, axis=0) * (1 - fy)
            + jnp.take(frame, y0i + 1, axis=0) * fy)
    out = (jnp.take(rows, x0i, axis=1) * (1 - fx)
           + jnp.take(rows, x0i + 1, axis=1) * fx)
    return out, s


def _hat(pos, n: int):
    """Bilinear 'hat' interpolation weights: W[..., v] = max(0, 1-|v-pos|)
    over v = 0..n-1, with positions clamped to the valid range (replicate
    border). pos: [...]; returns [..., n] float32."""
    p = jnp.clip(pos.astype(jnp.float32), 0.0, n - 1.0)
    v = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(v - p[..., None]))


def align_chips_matmul_jnp(frame, kps, valid, out_size: int = ARC_SIZE,
                           window: int = 128, compute_dtype=None):
    """Gather-free ArcFace chip extraction: every resampling step is a
    batched matmul with on-the-fly bilinear hat weights.

    TPU gathers serialize (~350 ms for a 512-face batch); this version runs
    the same warp as matmuls on the MXU in single-digit ms:
      1. axis-aligned window extraction (rows-then-cols hat matmuls),
      2. the rotational similarity warp via the Catmull–Smith two-pass
         affine decomposition — each pass a per-row/col 1-D resample with
         positions affine in the indices, again as hat matmuls.

    Degenerate near ±90° roll (the two-pass needs |m11| bounded away from
    0); detected faces are canonically upright so this matches the
    reference's operating envelope.

    Args/returns: same as :func:`align_chips_jnp`.
    """
    if compute_dtype is None:
        # hat weights are in [0,1] and pixels in [0,255]: bf16 matmuls halve
        # the dominant HBM traffic at ≤1 gray level of rounding — right for
        # detector/embedder ingress on TPU; CPU tests keep fp32 exactness
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    f = kps.shape[0]
    h, w = frame.shape[0], frame.shape[1]
    dst = jnp.asarray(ARC_DST) * (out_size / float(ARC_SIZE))
    ms = umeyama_similarity_jnp(kps, dst)          # src -> chip
    minv = invert_affine(ms)                        # chip -> src (frame)

    # window covering the inverse-mapped chip quad
    corners = jnp.asarray([[0.0, 0.0], [out_size - 1.0, 0.0],
                           [0.0, out_size - 1.0],
                           [out_size - 1.0, out_size - 1.0]])
    src_corners = jnp.einsum("fij,cj->fci", minv[:, :, :2], corners) \
        + minv[:, None, :, 2]
    lo = src_corners.min(axis=1)
    hi = src_corners.max(axis=1)
    center = 0.5 * (lo + hi)
    half = 0.5 * jnp.max(hi - lo, axis=1) * 1.02 + 2.0
    half = jnp.maximum(half, 4.0)

    # ---- axis-aligned window extraction as two hat matmuls -------------
    s = 2.0 * half / window                                   # [F]
    idx = jnp.arange(window, dtype=jnp.float32) + 0.5         # [W]
    py = center[:, 1:2] - half[:, None] + idx[None] * s[:, None] - 0.5
    px = center[:, 0:1] - half[:, None] + idx[None] * s[:, None] - 0.5
    wr = _hat(py, h).astype(compute_dtype)                    # [F, W, H]
    wc = _hat(px, w).astype(compute_dtype)                    # [F, W, Wsrc]
    rows = jnp.einsum("fry,yxc->frxc", wr, frame.astype(compute_dtype),
                      preferred_element_type=jnp.float32).astype(compute_dtype)
    win = jnp.einsum("frxc,fwx->frwc", rows, wc,
                     preferred_element_type=jnp.float32).astype(compute_dtype)

    # chip -> window affine: win = (src - off) / s
    offx = center[:, 0] - half + 0.5 * s - 0.5
    offy = center[:, 1] - half + 0.5 * s - 0.5
    inv_s = 1.0 / s
    m00 = minv[:, 0, 0] * inv_s
    m01 = minv[:, 0, 1] * inv_s
    m02 = (minv[:, 0, 2] - offx) * inv_s
    m10 = minv[:, 1, 0] * inv_s
    m11 = minv[:, 1, 1] * inv_s
    m12 = (minv[:, 1, 2] - offy) * inv_s

    # two-pass affine (Catmull–Smith): guard m11 away from 0
    m11 = jnp.where(jnp.abs(m11) < 1e-3, 1e-3, m11)
    alpha = m00 - m01 * m10 / m11
    beta = m01 / m11
    gamma = m02 - m01 * m12 / m11

    xs = jnp.arange(out_size, dtype=jnp.float32)
    ys = jnp.arange(out_size, dtype=jnp.float32)
    us = jnp.arange(window, dtype=jnp.float32)

    # pass 1: tmp[f,u,x] = win[f,u,v] sampled at v = αx + βu + γ
    vx = (alpha[:, None, None] * xs[None, None, :]
          + beta[:, None, None] * us[None, :, None]
          + gamma[:, None, None])                             # [F,W,X]
    h1 = _hat(vx, window).astype(compute_dtype)               # [F,W,X,W]
    tmp = jnp.einsum("fuvc,fuxv->fuxc", win, h1,
                     preferred_element_type=jnp.float32).astype(compute_dtype)

    # pass 2: chip[f,y,x] = tmp[f,u,x] sampled at u = m10·x + m11·y + m12
    uy = (m10[:, None, None] * xs[None, None, :]
          + m11[:, None, None] * ys[None, :, None]
          + m12[:, None, None])                               # [F,Y,X]
    h2 = _hat(uy, window).astype(compute_dtype)               # [F,Y,X,W]
    chip = jnp.einsum("fuxc,fyxu->fyxc", tmp, h2,
                      preferred_element_type=jnp.float32)
    return jnp.where(valid[:, None, None, None], chip,
                     jnp.zeros_like(chip))


def align_chips_jnp(frame, kps, valid, out_size: int = ARC_SIZE,
                    window: int = 128):
    """Batched ArcFace chip extraction from one frame.

    Two-stage TPU-friendly warp: (1) separable axis-aligned extraction of a
    ``window``² region covering the inverse-mapped chip quad (single-axis
    gathers — fast), then (2) the rotational similarity warp gathers only
    from that small window instead of the full frame. Equivalent to a
    direct full-frame warp up to the window's resampling (sub-LSB for
    typical faces).

    Args:
      frame: ``[H, W, 3]`` float32 (BGR or RGB — passthrough).
      kps:   ``[F, 5, 2]`` landmark coordinates in frame space.
      valid: ``[F]`` bool.
    Returns:
      ``[F, out_size, out_size, 3]`` chips (zeros where invalid).
    """
    dst = jnp.asarray(ARC_DST) * (out_size / float(ARC_SIZE))
    ms = umeyama_similarity_jnp(kps, dst)          # src -> chip
    minv = invert_affine(ms)                        # chip -> src

    # chip corner positions in source space
    corners = jnp.asarray([[0.0, 0.0], [out_size - 1.0, 0.0],
                           [0.0, out_size - 1.0],
                           [out_size - 1.0, out_size - 1.0]])
    src_corners = jnp.einsum("fij,cj->fci", minv[:, :, :2], corners) \
        + minv[:, None, :, 2]
    lo = src_corners.min(axis=1)
    hi = src_corners.max(axis=1)
    center = 0.5 * (lo + hi)
    half = 0.5 * jnp.max(hi - lo, axis=1) * 1.02 + 2.0
    half = jnp.maximum(half, 4.0)

    def one(m_inv, cx, cy, hf, v):
        win, s = _extract_window_separable(frame, cx, cy, hf, window)
        # compose chip->window: window pixel w holds src = off + s*w with
        # off = c - hf + 0.5*s - 0.5, so win = (src - off) / s
        offx = cx - hf + 0.5 * s - 0.5
        offy = cy - hf + 0.5 * s - 0.5
        inv_s = 1.0 / s
        m2 = jnp.stack([
            jnp.stack([m_inv[0, 0] * inv_s, m_inv[0, 1] * inv_s,
                       (m_inv[0, 2] - offx) * inv_s]),
            jnp.stack([m_inv[1, 0] * inv_s, m_inv[1, 1] * inv_s,
                       (m_inv[1, 2] - offy) * inv_s]),
        ])
        chip = warp_affine_inv_jnp(win, m2, out_size, out_size,
                                   reflect=False)
        return jnp.where(v, chip, jnp.zeros_like(chip))

    return jax.vmap(one)(minv, center[:, 0], center[:, 1], half, valid)
