"""Device-side image preprocessing: resize, letterbox, normalize.

Replaces the per-frame cv2 resize/letterbox calls of the reference detector
ingress (person_capture/face_embedder.py:2163-2208, detectors.py:271-296)
with batched XLA ops that fuse into the model forward pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def resize_bilinear(img, out_h: int, out_w: int):
    """Bilinear resize of ``[..., H, W, C]``; half-pixel centers (matches
    cv2.INTER_LINEAR up to border handling)."""
    *lead, h, w, c = img.shape
    out = jax.image.resize(img.astype(jnp.float32),
                           (*lead, out_h, out_w, c), method="linear")
    return out


def resize_bicubic(img, out_h: int, out_w: int):
    """Bicubic resize of ``[..., H, W, C]`` (torchvision BICUBIC analogue —
    the open_clip preprocess the ReID reference uses resizes bicubic)."""
    *lead, h, w, c = img.shape
    out = jax.image.resize(img.astype(jnp.float32),
                           (*lead, out_h, out_w, c), method="cubic")
    return out


def letterbox_topleft(img, size: int, scale: float | None = None):
    """SCRFD-style letterbox: scale to fit in ``size×size`` preserving aspect,
    place at top-left, zero-fill the rest.

    Args:
      img: ``[H, W, C]`` float32.
    Returns:
      (padded ``[size, size, C]``, det_scale float — multiply detector output
      coords by ``1/det_scale`` to map back to input space).
    """
    h, w = img.shape[0], img.shape[1]
    im_ratio = h / w
    if im_ratio > 1.0:
        new_h = size
        new_w = int(round(size / im_ratio))
    else:
        new_w = size
        new_h = int(round(size * im_ratio))
    det_scale = new_h / h
    if (new_h, new_w) == (h, w):
        resized = img.astype(jnp.float32)
    else:
        resized = resize_bilinear(img, new_h, new_w)
    if (new_h, new_w) == (size, size):
        # full-canvas case: the pad write would be a degenerate
        # whole-shape dynamic-update-slice (XLA CPU check-fails on the
        # fusion it produces at low optimization levels)
        return resized, det_scale
    out = jnp.zeros((size, size, img.shape[2]), resized.dtype)
    out = out.at[:new_h, :new_w].set(resized)
    return out, det_scale


def normalize_scrfd(img_bgr):
    """SCRFD input normalization: (x - 127.5) / 128, BGR→RGB."""
    rgb = img_bgr[..., ::-1]
    return (rgb.astype(jnp.float32) - 127.5) / 128.0


def normalize_arcface(chip_bgr):
    """ArcFace input normalization: BGR→RGB then x/127.5 - 1
    (reference: face_embedder.py:1281-1288)."""
    rgb = chip_bgr[..., ::-1]
    return rgb.astype(jnp.float32) / 127.5 - 1.0


def normalize_yolo(img_bgr):
    """Ultralytics YOLO ingress: BGR→RGB, x/255."""
    rgb = img_bgr[..., ::-1]
    return rgb.astype(jnp.float32) / 255.0


def normalize_clip(img_bgr):
    """OpenCLIP normalization (BGR input → RGB, CLIP mean/std)."""
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
    rgb = img_bgr[..., ::-1].astype(jnp.float32) / 255.0
    return (rgb - mean) / std


@partial(jax.jit, static_argnames=("size",))
def batch_letterbox_topleft(frames, size: int):
    """Batched top-left letterbox for same-shaped frames ``[B, H, W, C]``.
    Because all frames share a shape, the scale is static per call."""
    def one(f):
        return letterbox_topleft(f, size)
    padded, scales = jax.vmap(one)(frames)
    return padded, scales


def crop_and_resize(frame, box_xyxy, out_h: int, out_w: int):
    """Differentiable fixed-size crop+resize of a dynamic box (bilinear).

    Currently unused by the production pipeline: lock-ROI probes and
    person-box face extraction crop on HOST (pipeline/mainpass.py) because
    the boxes are data-dependent and the gather-based device formulation
    serializes on TPU (~15 ns/element — CLAUDE.md). Kept as the
    device-side building block for co-located hosts where the transfer,
    not the gather, dominates.

    Args:
      frame: ``[H, W, C]``.
      box_xyxy: ``[4]`` float (may be fractional; clamped to frame).
    """
    h, w = frame.shape[0], frame.shape[1]
    x1, y1, x2, y2 = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    x1 = jnp.clip(x1, 0.0, w - 2.0)
    y1 = jnp.clip(y1, 0.0, h - 2.0)
    x2 = jnp.clip(x2, x1 + 1.0, w - 1.0)
    y2 = jnp.clip(y2, y1 + 1.0, h - 1.0)
    ys = y1 + (y2 - y1) * (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h - 0.5
    xs = x1 + (x2 - x1) * (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    v00 = frame[y0][:, x0]
    v01 = frame[y0][:, x0 + 1]
    v10 = frame[y0 + 1][:, x0]
    v11 = frame[y0 + 1][:, x0 + 1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
