"""YOLOv8 person detector in JAX (NHWC, fused decode, person class only).

Re-implements the semantics of the reference's Ultralytics path
(person_capture/detectors.py:271-296: classes=[0], imgsz=640, iou=0.45,
max_det=40, conf from cfg): CSP backbone with C2f blocks + SPPF, PAN neck,
decoupled heads with DFL box regression, sigmoid class scores, NMS —
as one jittable program over a frame batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import nms_select
from ..ops.preprocess import normalize_yolo
from .layers import upsample2x


@dataclass(frozen=True)
class YoloConfig:
    name: str = "yolov8n"
    width: Tuple[int, ...] = (16, 32, 64, 128, 256)   # stem + 4 stages
    depth: Tuple[int, ...] = (1, 2, 2, 1)             # C2f bottleneck counts
    reg_max: int = 16
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32)
    max_candidates: int = 256
    max_det: int = 40
    nms_iou: float = 0.45
    # (n_points, n_dims) pose-style keypoint head; (0, 0) = detection only.
    # YOLOv8-face = nc=1 + kpt_shape=(5, 3) — the reference's alternate
    # face detector (face_embedder.py:36-51 yolov8n-face mirrors)
    kpt_shape: Tuple[int, int] = (0, 0)


TINY = YoloConfig(name="yolo_tiny", width=(8, 8, 16, 24, 32),
                  depth=(1, 1, 1, 1), max_candidates=64, max_det=8)
YOLOV8N = YoloConfig(name="yolov8n")
YOLOV8S = YoloConfig(name="yolov8s", width=(32, 64, 128, 256, 512))
TINY_FACE = YoloConfig(name="yolo_face_tiny", width=(8, 8, 16, 24, 32),
                       depth=(1, 1, 1, 1), num_classes=1, kpt_shape=(5, 3),
                       max_candidates=64, max_det=8)
YOLOV8N_FACE = YoloConfig(name="yolov8n_face", num_classes=1,
                          kpt_shape=(5, 3))

CONFIGS = {c.name: c for c in (TINY, YOLOV8N, YOLOV8S, TINY_FACE,
                               YOLOV8N_FACE)}


class ConvSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvSiLU(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvSiLU(self.features, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8's core block)."""
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvSiLU(self.features, 1, dtype=self.dtype)(x, train)
        y1, y2 = y[..., :c], y[..., c:]
        outs = [y1, y2]
        h = y2
        for _ in range(self.n):
            h = Bottleneck(c, self.shortcut, dtype=self.dtype)(h, train)
            outs.append(h)
        return ConvSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train)


class SPPF(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvSiLU(c, 1, dtype=self.dtype)(x, train)
        p1 = nn.max_pool(y, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([y, p1, p2, p3], axis=-1), train)


class YoloV8(nn.Module):
    cfg: YoloConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        w0, w1, w2, w3, w4 = c.width
        d1, d2, d3, d4 = c.depth
        # backbone
        x = ConvSiLU(w0, 3, 2, dtype=self.dtype)(x, train)          # /2
        x = ConvSiLU(w1, 3, 2, dtype=self.dtype)(x, train)          # /4
        x = C2f(w1, d1, dtype=self.dtype)(x, train)
        x = ConvSiLU(w2, 3, 2, dtype=self.dtype)(x, train)          # /8
        p3 = C2f(w2, d2, dtype=self.dtype)(x, train)
        x = ConvSiLU(w3, 3, 2, dtype=self.dtype)(p3, train)         # /16
        p4 = C2f(w3, d3, dtype=self.dtype)(x, train)
        x = ConvSiLU(w4, 3, 2, dtype=self.dtype)(p4, train)         # /32
        x = C2f(w4, d4, dtype=self.dtype)(x, train)
        p5 = SPPF(w4, dtype=self.dtype)(x, train)
        # PAN neck
        u4 = C2f(w3, d1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([upsample2x(p5), p4], axis=-1), train)
        u3 = C2f(w2, d1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([upsample2x(u4), p3], axis=-1), train)
        d4_ = C2f(w3, d1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([ConvSiLU(w2, 3, 2, dtype=self.dtype)(u3, train),
                             u4], axis=-1), train)
        d5_ = C2f(w4, d1, shortcut=False, dtype=self.dtype)(
            jnp.concatenate([ConvSiLU(w3, 3, 2, dtype=self.dtype)(d4_, train),
                             p5], axis=-1), train)
        # decoupled heads (separate weights per level); channel formulas
        # match ultralytics Detect so real checkpoints map 1:1:
        #   box c2 = max(16, ch[0]//4, 4*reg_max); cls c3 = max(ch[0],
        #   min(nc, 100))
        c2 = max(16, w2 // 4, 4 * c.reg_max)
        c3 = max(w2, min(c.num_classes, 100))
        nk = c.kpt_shape[0] * c.kpt_shape[1]
        c4 = max(w2 // 4, nk)       # ultralytics Pose head width formula
        outs = []
        for feat in (u3, d4_, d5_):
            box = ConvSiLU(c2, 3, dtype=self.dtype)(feat, train)
            box = ConvSiLU(c2, 3, dtype=self.dtype)(box, train)
            box = nn.Conv(4 * c.reg_max, (1, 1), dtype=self.dtype)(box)
            cls = ConvSiLU(c3, 3, dtype=self.dtype)(feat, train)
            cls = ConvSiLU(c3, 3, dtype=self.dtype)(cls, train)
            cls = nn.Conv(c.num_classes, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.6))(cls)
            if nk:
                kps = ConvSiLU(c4, 3, dtype=self.dtype)(feat, train)
                kps = ConvSiLU(c4, 3, dtype=self.dtype)(kps, train)
                kps = nn.Conv(nk, (1, 1), dtype=self.dtype)(kps)
                outs.append((box, cls, kps))
            else:
                outs.append((box, cls))
        return outs


def init_yolo(key, cfg: YoloConfig, size: int = 640, dtype=jnp.float32):
    from .layers import fast_init

    deepest = max(cfg.strides)
    if size % deepest:
        # PAN top-down/bottom-up adds across stride-8/16/32 levels: sizes
        # not divisible by the deepest stride fail later as an opaque XLA
        # broadcast error
        raise ValueError(
            f"YOLOv8 det size must be a multiple of {deepest}, got {size} "
            f"(adjust --det-size / yolo_imgsz)")
    model = YoloV8(cfg, dtype)
    variables = fast_init(model, key, (1, size, size, 3), dtype)
    return model, variables


def decode_level(box_map, cls_map, stride: int, reg_max: int):
    """DFL decode: softmax over reg_max bins → expected ltrb distance in
    stride units from the cell center (+0.5 offset)."""
    b, h, w, _ = box_map.shape
    box = box_map.astype(jnp.float32).reshape(b, h * w, 4, reg_max)
    probs = jax.nn.softmax(box, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    dist = (probs * bins).sum(-1)                       # [B, HW, 4] ltrb
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = gx.reshape(-1)[None]
    cy = gy.reshape(-1)[None]
    d = dist * stride
    boxes = jnp.stack([cx - d[..., 0], cy - d[..., 1],
                       cx + d[..., 2], cy + d[..., 3]], -1)
    scores = jax.nn.sigmoid(cls_map.astype(jnp.float32)).reshape(
        b, h * w, -1)
    return boxes, scores


def decode_kpts_level(kps_map, stride: int, n_pts: int, n_dims: int):
    """Ultralytics pose decode: per cell, ``x = (tx*2 + grid_x)*stride``
    (anchors are cell+0.5 so anchors-0.5 is the 0-based cell index);
    visibility stays a raw logit. Returns ``[B, HW, n_pts, 2]`` plus
    sigmoid visibility ``[B, HW, n_pts]``."""
    b, h, w, _ = kps_map.shape
    t = kps_map.astype(jnp.float32).reshape(b, h * w, n_pts, n_dims)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cx = gx.reshape(-1)[None, :, None]
    cy = gy.reshape(-1)[None, :, None]
    px = (t[..., 0] * 2.0 + cx) * stride
    py = (t[..., 1] * 2.0 + cy) * stride
    pts = jnp.stack([px, py], axis=-1)
    vis = jax.nn.sigmoid(t[..., 2]) if n_dims >= 3 else jnp.ones_like(px)
    return pts, vis


def detect_faces_yolo(model: YoloV8, variables, frames_bgr, det_scales,
                      score_thresh: float = 0.35,
                      max_faces: int | None = None):
    """YOLOv8-face detection over a letterboxed batch — the reference's
    alternate face backend (face_embedder.py:36-51); same output contract
    as models/scrfd.detect_faces so the fused face pipeline is
    backend-agnostic: boxes ``[B, F, 4]``, kps ``[B, F, 5, 2]``, scores,
    mask (original-frame coordinates)."""
    from .scrfd import select_detections

    cfg = model.cfg
    assert cfg.kpt_shape[0] == 5, "face model needs a 5-point kpt head"
    max_faces = int(max_faces or cfg.max_det)
    x = normalize_yolo(frames_bgr).astype(model.dtype)
    levels = model.apply(variables, x)

    level_scores, level_boxes, level_kps = [], [], []
    for (box_map, cls_map, kps_map), stride in zip(levels, cfg.strides):
        boxes, scores = decode_level(box_map, cls_map, stride, cfg.reg_max)
        pts, _ = decode_kpts_level(kps_map, stride, *cfg.kpt_shape)
        level_scores.append(scores[..., 0])
        level_boxes.append(boxes)
        level_kps.append(pts)
    return select_detections(level_scores, level_boxes, level_kps,
                             det_scales, score_thresh, max_faces,
                             cfg.nms_iou, cfg.max_candidates)


def detect_persons(model: YoloV8, variables, frames_bgr, det_scales,
                   conf: float = 0.35, max_det: int | None = None,
                   clip_hw: Tuple[int, int] | None = None):
    """Fused person detection over a letterboxed batch.

    Returns dict: boxes ``[B, K, 4]`` (original coords), scores ``[B, K]``,
    mask ``[B, K]`` — person (class 0) only, like the reference detector.
    ``clip_hw`` (source frame height/width) clamps boxes to frame bounds
    like the ultralytics ``scale_boxes`` path the reference goes through
    (detectors.py:271-296 → res.boxes.xyxy): edge-of-frame regressions
    must not report out-of-frame extents, or downstream area/IoU/ratio
    logic diverges from the reference.
    """
    cfg = model.cfg
    max_det = int(max_det or cfg.max_det)
    x = normalize_yolo(frames_bgr).astype(model.dtype)
    levels = model.apply(variables, x)

    all_boxes, all_scores = [], []
    for (box_map, cls_map), stride in zip(levels, cfg.strides):
        boxes, scores = decode_level(box_map, cls_map, stride, cfg.reg_max)
        person = scores[..., 0]
        k = min(cfg.max_candidates, person.shape[1])
        top_s, top_i = jax.lax.top_k(person, k)
        bi = jnp.arange(person.shape[0])[:, None]
        all_scores.append(top_s)
        all_boxes.append(boxes[bi, top_i])
    scores = jnp.concatenate(all_scores, axis=1)
    boxes = jnp.concatenate(all_boxes, axis=1)
    valid = scores >= conf

    def per_frame(b, s, v):
        idx, mask = nms_select(b, s, v, max_det, cfg.nms_iou)
        return b[idx], s[idx], mask

    b_out, s_out, m_out = jax.vmap(per_frame)(boxes, scores, valid)
    inv = 1.0 / jnp.maximum(det_scales.astype(jnp.float32), 1e-9)
    b_out = b_out * inv[:, None, None]
    if clip_hw is not None:
        h, w = clip_hw
        lim = jnp.asarray([w, h, w, h], jnp.float32)
        b_out = jnp.clip(b_out, 0.0, lim)
    return {"boxes": b_out, "scores": s_out, "mask": m_out}
