"""ArcFace identity embedder (iResNet) in JAX.

Replaces the reference's glintr100/w600k_r50 ONNX-through-TensorRT path
(person_capture/face_embedder.py:1290-1389): 112×112 BGR chip → RGB,
x/127.5-1 → iResNet → 512-D embedding, with optional flip-TTA
(embed(x) + embed(mirror(x)), then L2-normalize). Runs as one batched XLA
program; flip-TTA doubles the batch instead of looping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import IBasicBlock, PReLU
from ..ops.preprocess import normalize_arcface


@dataclass(frozen=True)
class ArcFaceConfig:
    name: str = "w600k_r50"
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    stage_blocks: Tuple[int, ...] = (3, 4, 14, 3)     # iresnet50
    embed_dim: int = 512
    input_size: int = 112


TINY = ArcFaceConfig(name="arcface_tiny", stage_channels=(8, 16, 24, 32),
                     stage_blocks=(1, 1, 1, 1), embed_dim=64, input_size=112)

# compact embedder for the in-repo synthetic-identity weights (the real
# r50/r100 checkpoints are user-supplied; this one ships trained)
SYNTH_R18 = ArcFaceConfig(name="arcface_synth",
                          stage_channels=(24, 48, 96, 192),
                          stage_blocks=(2, 2, 2, 2), embed_dim=256)

W600K_R50 = ArcFaceConfig(name="w600k_r50")

GLINTR100 = ArcFaceConfig(name="glintr100", stage_blocks=(3, 13, 30, 3))

CONFIGS = {c.name: c for c in (TINY, SYNTH_R18, W600K_R50, GLINTR100)}


class IResNet(nn.Module):
    cfg: ArcFaceConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = nn.Conv(c.stage_channels[0], (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        for ch, nblocks in zip(c.stage_channels, c.stage_blocks):
            for bi in range(nblocks):
                stride = 2 if bi == 0 else 1
                x = IBasicBlock(ch, stride, dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(c.embed_dim, dtype=self.dtype)(x)
        # final 'features' BatchNorm1d is affine in the official iresnet
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return x


def init_arcface(key, cfg: ArcFaceConfig, dtype=jnp.float32):
    from .layers import fast_init

    model = IResNet(cfg, dtype)
    s = cfg.input_size
    variables = fast_init(model, key, (1, s, s, 3), dtype)
    return model, variables


def encode_chips(model: IResNet, variables, chips_bgr, flip_tta: bool = True):
    """Embed ``[N, 112, 112, 3]`` BGR chips → L2-normalized ``[N, D]``.

    flip_tta sums the embedding of the chip and its mirror before
    normalization (reference: face_embedder.py:1290-1389); disabled in the
    fast pre-scan path.
    """
    x = normalize_arcface(chips_bgr).astype(model.dtype)
    if flip_tta:
        x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
    emb = model.apply(variables, x).astype(jnp.float32)
    if flip_tta:
        n = emb.shape[0] // 2
        emb = emb[:n] + emb[n:]
    norm = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-10)
    return emb / norm
