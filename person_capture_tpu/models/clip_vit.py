"""CLIP ViT image tower in JAX — the ReID embedder.

Re-implements the reference's OpenCLIP usage (person_capture/
reid_embedder.py:10-57: ViT-L-14 image encoding of person crops,
L2-normalized float32 output) as a batched jittable program: patch-embed
conv → class token + learned positions → pre-LN transformer → final LN →
projection. The MXU sees a handful of large matmuls per layer — ideal TPU
shape. Weight conversion from open_clip checkpoints maps 1:1 onto these
parameter names.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.preprocess import normalize_clip, resize_bicubic


@dataclass(frozen=True)
class ClipVitConfig:
    name: str = "ViT-L-14"
    image_size: int = 224
    patch: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768          # projection output


TINY = ClipVitConfig(name="clip_tiny", image_size=32, patch=8, width=32,
                     layers=2, heads=2, embed_dim=16)
# compact tower for the bundled synthetic-trained ReID embedder — this
# image has no egress for open_clip checkpoints, so "auto" resolution
# ships this instead (train/clip_reid_synth.py), like the face models
REID_S = ClipVitConfig(name="clip_reid_s", image_size=96, patch=8,
                       width=128, layers=5, heads=4, embed_dim=128)
VIT_B_32 = ClipVitConfig(name="ViT-B-32", patch=32, width=768, layers=12,
                         heads=12, embed_dim=512)
VIT_L_14 = ClipVitConfig(name="ViT-L-14")

CONFIGS = {c.name: c for c in (TINY, REID_S, VIT_B_32, VIT_L_14)}


class MHA(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(*t.shape[:-1], self.heads, d).swapaxes(-3, -2)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = jnp.einsum("...hqd,...hkd->...hqk", q, k,
                         preferred_element_type=jnp.float32) / jnp.sqrt(d)
        att = nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", att, v)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], self.width)
        return nn.Dense(self.width, dtype=self.dtype)(out)


class Block(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + MHA(self.width, self.heads, self.dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype)(y)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype)(h)


class ClipViT(nn.Module):
    cfg: ClipVitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        n = c.image_size // c.patch
        x = nn.Conv(c.width, (c.patch, c.patch),
                    strides=(c.patch, c.patch), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(x.shape[0], n * n, c.width)
        cls = self.param("class_token", nn.initializers.normal(0.02),
                         (1, 1, c.width), jnp.float32).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, c.width)),
                             x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n * n + 1, c.width), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(c.layers):
            x = Block(c.width, c.heads, self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.width, c.embed_dim), jnp.float32)
        return x @ proj.astype(x.dtype)


def init_clip(key, cfg: ClipVitConfig, dtype=jnp.float32):
    from .layers import fast_init

    model = ClipViT(cfg, dtype)
    s = cfg.image_size
    variables = fast_init(model, key, (1, s, s, 3), dtype)
    return model, variables


def encode_images(model: ClipViT, variables, crops_bgr):
    """Embed BGR uint8/float crops ``[N, H, W, 3]`` (any size; ingested to
    the tower's input like the reference's open_clip preprocess — shortest
    side resized to ``image_size`` then center-cropped, reid_embedder.py:34)
    → L2-normalized float32 ``[N, D]``. Shapes are static per compiled
    program, so the aspect-preserving branch stays jittable."""
    s = model.cfg.image_size
    x = crops_bgr.astype(jnp.float32)
    h, w = int(x.shape[1]), int(x.shape[2])
    if (h, w) != (s, s):
        scale = s / min(h, w)
        nh, nw = max(s, int(h * scale)), max(s, int(w * scale))
        # bicubic to match open_clip's torchvision Resize(BICUBIC) — the
        # thresholds were tuned against that preprocess (reid_embedder.py:34)
        x = resize_bicubic(x, nh, nw)
        y0 = int(round((nh - s) / 2.0))
        x0 = int(round((nw - s) / 2.0))
        x = x[:, y0:y0 + s, x0:x0 + s]
    x = normalize_clip(x).astype(model.dtype)
    emb = model.apply(variables, x).astype(jnp.float32)
    norm = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-10)
    return emb / norm
