"""SCRFD face detector in JAX (NHWC, fixed-shape, fused decode).

Re-implements the semantics of the reference's SCRFD ONNX path
(person_capture/face_embedder.py:2163-2482: anchor-based 3-level FPN with
2 anchors/location, per-level sigmoid scores, ltrb stride-unit box
distances and 5-point landmark offsets, cross-level NMS) as one jittable
program: letterbox → backbone → PAFPN → shared head → decode → top-k → NMS,
returning fixed-size padded detections so frame batches shard cleanly.

Architecture is a clean ResNet/PAFPN equivalent, not a copy of insightface's
exact graph; the ``.npz`` checkpoint format in tools/convert_weights.py maps
compatible backbones when real weights are provided.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (ConvBN, ResBasicBlock, distance2bbox, distance2kps,
                     make_anchor_centers, upsample2x)
from ..ops.nms import nms_select
from ..ops.preprocess import normalize_scrfd


@dataclass(frozen=True)
class SCRFDConfig:
    name: str = "scrfd_2.5g"
    stem: int = 32
    stage_channels: Tuple[int, ...] = (32, 64, 128, 256)   # strides 4,8,16,32
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    fpn_channels: int = 64
    head_stacks: int = 2
    num_anchors: int = 2
    strides: Tuple[int, ...] = (8, 16, 32)
    # detection-time settings
    max_candidates: int = 256     # per level pre-NMS top-k
    max_faces: int = 32           # post-NMS output slots
    nms_iou: float = 0.4


TINY = SCRFDConfig(name="scrfd_tiny", stem=8, stage_channels=(8, 16, 24, 32),
                   stage_blocks=(1, 1, 1, 1), fpn_channels=16, head_stacks=1,
                   max_candidates=64, max_faces=8)

SCRFD_2_5G = SCRFDConfig(name="scrfd_2.5g")

SCRFD_10G = SCRFDConfig(name="scrfd_10g", stem=64,
                        stage_channels=(64, 128, 256, 512),
                        stage_blocks=(3, 4, 6, 3), fpn_channels=128,
                        head_stacks=3)

CONFIGS = {c.name: c for c in (TINY, SCRFD_2_5G, SCRFD_10G)}


class _Backbone(nn.Module):
    cfg: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = ConvBN(c.stem, 3, 2, dtype=self.dtype)(x, train)   # stride 2
        feats = []
        for si, (ch, nblocks) in enumerate(zip(c.stage_channels, c.stage_blocks)):
            for bi in range(nblocks):
                stride = 2 if bi == 0 else 1
                x = ResBasicBlock(ch, stride, dtype=self.dtype)(x, train)
            feats.append(x)  # strides 4, 8, 16, 32
        return feats[1], feats[2], feats[3]


class _PAFPN(nn.Module):
    cfg: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5, train: bool = False):
        ch = self.cfg.fpn_channels
        p5 = ConvBN(ch, 1, act=None, dtype=self.dtype)(c5, train)
        p4 = ConvBN(ch, 1, act=None, dtype=self.dtype)(c4, train) + upsample2x(p5)
        p3 = ConvBN(ch, 1, act=None, dtype=self.dtype)(c3, train) + upsample2x(p4)
        # smooth
        p3 = ConvBN(ch, 3, dtype=self.dtype)(p3, train)
        p4 = ConvBN(ch, 3, dtype=self.dtype)(p4, train)
        p5 = ConvBN(ch, 3, dtype=self.dtype)(p5, train)
        # bottom-up aggregation
        n4 = p4 + ConvBN(ch, 3, 2, act=None, dtype=self.dtype)(p3, train)
        n5 = p5 + ConvBN(ch, 3, 2, act=None, dtype=self.dtype)(n4, train)
        n4 = ConvBN(ch, 3, dtype=self.dtype)(n4, train)
        n5 = ConvBN(ch, 3, dtype=self.dtype)(n5, train)
        return p3, n4, n5


class _Head(nn.Module):
    """Shared detection head applied per level (weights shared across levels
    like SCRFD): stacked convs + GroupNorm, then cls/bbox/kps projections."""
    cfg: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        c = self.cfg
        x = feat
        for _ in range(c.head_stacks):
            x = nn.Conv(c.fpn_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(16, c.fpn_channels),
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        a = c.num_anchors
        cls = nn.Conv(a, (3, 3), padding=1, dtype=self.dtype,
                      bias_init=nn.initializers.constant(-4.6))(x)  # prior ~1%
        bbox = nn.Conv(4 * a, (3, 3), padding=1, dtype=self.dtype)(x)
        kps = nn.Conv(10 * a, (3, 3), padding=1, dtype=self.dtype)(x)
        return cls, bbox, kps


class SCRFD(nn.Module):
    cfg: SCRFDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: normalized ``[B, S, S, 3]``. Returns per-level raw maps."""
        c3, c4, c5 = _Backbone(self.cfg, self.dtype)(x, train)
        p3, p4, p5 = _PAFPN(self.cfg, self.dtype)(c3, c4, c5, train)
        head = _Head(self.cfg, self.dtype)
        return [head(p, train) for p in (p3, p4, p5)]


def init_scrfd(key, cfg: SCRFDConfig, size: int = 640, dtype=jnp.float32):
    from .layers import fast_init

    deepest = max(cfg.strides)
    if size % deepest:
        # the PAFPN adds upsample2x(p5) to p4: any size not divisible by
        # the deepest stride fails later as an opaque XLA broadcast error
        raise ValueError(
            f"SCRFD det size must be a multiple of {deepest}, got {size} "
            f"(adjust --det-size / face_fullframe_imgsz)")
    model = SCRFD(cfg, dtype)
    variables = fast_init(model, key, (1, size, size, 3), dtype)
    return model, variables


def decode_level(cls_map, bbox_map, kps_map, stride: int, num_anchors: int):
    """Flatten one level's raw maps to per-anchor (scores, boxes, kps) in
    letterboxed-image pixels."""
    b, h, w, _ = cls_map.shape
    a = num_anchors
    scores = jax.nn.sigmoid(cls_map.astype(jnp.float32)).reshape(b, h * w * a)
    dists = bbox_map.astype(jnp.float32).reshape(b, h * w * a, 4)
    offs = kps_map.astype(jnp.float32).reshape(b, h * w * a, 10)
    centers = make_anchor_centers(h, w, stride, a)[None]
    boxes = distance2bbox(centers, dists, float(stride))
    kps = distance2kps(centers, offs, float(stride))
    return scores, boxes, kps


def make_detect_fn(model: SCRFD, variables, max_faces: int | None = None):
    """Return a jitted ``(frames_bgr, det_scales, score_thresh) -> dict``
    detection function with the variables closed over (weights stay resident
    on device across calls)."""
    mf = int(max_faces or model.cfg.max_faces)

    @jax.jit
    def fn(frames_bgr, det_scales, score_thresh):
        return detect_faces(model, variables, frames_bgr, det_scales,
                            score_thresh, mf)

    return fn


def select_detections(level_scores, level_boxes, level_kps, det_scales,
                      score_thresh, max_faces: int, nms_iou: float,
                      max_candidates: int):
    """Shared SCRFD selection tail: per-level top-k → concat → NMS →
    fixed-slot output, mapped back to original-frame coordinates.

    Args:
      level_scores/boxes/kps: per-level lists ``[B, N]`` / ``[B, N, 4]`` /
        ``[B, N, 5, 2]`` in letterboxed-image pixels (any decoder — the
        native flax model or an executed ONNX graph — produces these).
    """
    all_scores, all_boxes, all_kps = [], [], []
    for s, bx, kp in zip(level_scores, level_boxes, level_kps):
        # per-level top-k keeps the concat small and static
        k = min(max_candidates, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, k)
        bi = jnp.arange(s.shape[0])[:, None]
        all_scores.append(top_s)
        all_boxes.append(bx[bi, top_i])
        all_kps.append(kp[bi, top_i])

    scores = jnp.concatenate(all_scores, axis=1)
    boxes = jnp.concatenate(all_boxes, axis=1)
    kps = jnp.concatenate(all_kps, axis=1)
    valid = scores >= score_thresh

    def per_frame(s, b, kp, v):
        idx, mask = nms_select(b, s, v, max_faces, nms_iou)
        return s[idx], b[idx], kp[idx], mask

    s_out, b_out, k_out, m_out = jax.vmap(per_frame)(scores, boxes, kps, valid)
    inv = 1.0 / jnp.maximum(det_scales.astype(jnp.float32), 1e-9)
    b_out = b_out * inv[:, None, None]
    k_out = k_out * inv[:, None, None, None]
    return {"boxes": b_out, "kps": k_out, "scores": s_out, "mask": m_out}


def detect_faces(model: SCRFD, variables, frames_bgr, det_scales,
                 score_thresh: float = 0.5, max_faces: int | None = None):
    """Fused SCRFD detection over a pre-letterboxed batch.

    Args:
      frames_bgr: ``[B, S, S, 3]`` float32 BGR, already letterboxed top-left.
      det_scales: ``[B]`` letterbox scales (output coords divided by these).
      score_thresh: candidate threshold.
    Returns dict with fixed shapes:
      boxes ``[B, F, 4]`` (original-frame coords), kps ``[B, F, 5, 2]``,
      scores ``[B, F]``, mask ``[B, F]``.
    """
    cfg = model.cfg
    max_faces = int(max_faces or cfg.max_faces)
    x = normalize_scrfd(frames_bgr).astype(model.dtype)
    levels = model.apply(variables, x)

    level_scores, level_boxes, level_kps = [], [], []
    for (cls_map, bbox_map, kps_map), stride in zip(levels, cfg.strides):
        s, bx, kp = decode_level(cls_map, bbox_map, kps_map, stride,
                                 cfg.num_anchors)
        level_scores.append(s)
        level_boxes.append(bx)
        level_kps.append(kp)
    return select_detections(level_scores, level_boxes, level_kps,
                             det_scales, score_thresh, max_faces,
                             cfg.nms_iou, cfg.max_candidates)
