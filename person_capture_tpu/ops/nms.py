"""Fixed-shape masked NMS for XLA.

The reference runs OpenCV-style greedy NMS on variable-length box lists
(person_capture/face_embedder.py:2484-2502). On TPU everything is fixed
shape: we keep the top-K candidates per frame, compute the K×K IoU matrix
once (a small matmul-free VPU op), then do a greedy suppression sweep with
``lax.fori_loop`` over K slots. Outputs are masks, not ragged lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU of xyxy boxes ``[N, 4]`` × ``[M, 4]`` → ``[N, M]``."""
    a = boxes_a.astype(jnp.float32)
    b = boxes_b.astype(jnp.float32)
    ix1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    iw = jnp.maximum(0.0, ix2 - ix1)
    ih = jnp.maximum(0.0, iy2 - iy1)
    inter = iw * ih
    area_a = jnp.maximum(0.0, a[:, 2] - a[:, 0]) * jnp.maximum(0.0, a[:, 3] - a[:, 1])
    area_b = jnp.maximum(0.0, b[:, 2] - b[:, 0]) * jnp.maximum(0.0, b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes, scores, valid, iou_thresh: float = 0.45):
    """Greedy NMS keep-mask over fixed-size candidate sets.

    Args:
      boxes:  ``[K, 4]`` xyxy.
      scores: ``[K]``; invalid slots should already carry -inf or be masked.
      valid:  ``[K]`` bool.
      iou_thresh: suppress boxes with IoU > thresh vs an already-kept box.
    Returns:
      ``[K]`` bool keep mask (subset of ``valid``).
    """
    k = boxes.shape[0]
    order = jnp.argsort(jnp.where(valid, scores, -jnp.inf))[::-1]
    sboxes = boxes[order]
    svalid = valid[order]
    ious = iou_matrix(sboxes, sboxes)

    def body(i, keep):
        # slot i survives if valid and not suppressed by any kept earlier slot
        earlier = (jnp.arange(k) < i) & keep
        suppressed = jnp.any(earlier & (ious[i] > iou_thresh))
        keep_i = svalid[i] & ~suppressed
        return keep.at[i].set(keep_i)

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    # scatter back to original order
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


def nms_select(boxes, scores, valid, max_out: int, iou_thresh: float = 0.45):
    """NMS then densely pack the top ``max_out`` survivors by score.

    Returns (indices ``[max_out]`` into the input slots, mask ``[max_out]``).
    Invalid output slots point at index 0 with mask False.
    """
    keep = nms_mask(boxes, scores, valid, iou_thresh)
    eff = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(eff, max_out)
    mask = jnp.isfinite(top_scores)
    return jnp.where(mask, idx, 0), mask


def batched_nms_select(boxes, scores, valid, max_out: int,
                       iou_thresh: float = 0.45):
    """vmap of :func:`nms_select` over a leading batch dim."""
    return jax.vmap(lambda b, s, v: nms_select(b, s, v, max_out, iou_thresh))(
        boxes, scores, valid)
