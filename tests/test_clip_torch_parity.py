"""Weight-mapping parity for the CLIP ViT visual tower: a torch
implementation with the open_clip state-dict layout must produce identical
embeddings through our flax model after conversion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import torch.nn as tnn  # noqa: E402

from person_capture_tpu.models import clip_vit as CV  # noqa: E402
from person_capture_tpu.models.loaders import load_clip_torch  # noqa: E402


class TorchBlock(tnn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(w)
        self.attn = tnn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(w)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(w, 4 * w))
        self.mlp.add_module("gelu", tnn.GELU())
        self.mlp.add_module("c_proj", tnn.Linear(4 * w, w))

    def forward(self, x):
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchVisual(tnn.Module):
    """open_clip-layout visual tower (state-dict-compatible naming)."""

    def __init__(self, cfg):
        super().__init__()
        w = cfg.width
        n = cfg.image_size // cfg.patch
        self.conv1 = tnn.Conv2d(3, w, cfg.patch, cfg.patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(w) * 0.02)
        self.positional_embedding = tnn.Parameter(
            torch.randn(n * n + 1, w) * 0.02)
        self.ln_pre = tnn.LayerNorm(w)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchBlock(w, cfg.heads) for _ in range(cfg.layers)])
        self.ln_post = tnn.LayerNorm(w)
        self.proj = tnn.Parameter(torch.randn(w, cfg.embed_dim) * 0.02)

    def forward(self, x):
        x = self.conv1(x)
        x = x.flatten(2).transpose(1, 2)  # [B, N, W]
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.ln_post(x[:, 0])
        return x @ self.proj


def test_torch_to_flax_clip_parity():
    cfg = CV.TINY
    tm = TorchVisual(cfg).eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model, variables = CV.init_clip(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float32)
    loaded = load_clip_torch(variables, cfg, state, strict=True)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(model.apply(loaded, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_clip_loader_strict_missing():
    cfg = CV.TINY
    model, variables = CV.init_clip(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float32)
    with pytest.raises(KeyError, match="missing"):
        load_clip_torch(variables, cfg, {}, strict=True)