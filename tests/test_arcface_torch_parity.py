"""End-to-end weight-mapping parity: a torch iresnet (the official
insightface architecture, reimplemented here from its public definition)
with random weights must produce the same embeddings as our flax model
loaded from its converted state dict."""

import numpy as np
import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import torch.nn as tnn  # noqa: E402

from person_capture_tpu.models import arcface as AF  # noqa: E402
from person_capture_tpu.models.loaders import (arcface_required_names,  # noqa: E402
                                               load_arcface_torch)


class TorchIBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inplanes, eps=1e-5)
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.bn1(x)
        out = self.conv1(out)
        out = self.bn2(out)
        out = self.prelu(out)
        out = self.conv2(out)
        out = self.bn3(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class TorchIResNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.stage_channels
        self.conv1 = tnn.Conv2d(3, chans[0], 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(chans[0], eps=1e-5)
        self.prelu = tnn.PReLU(chans[0])
        inplanes = chans[0]
        for stage, (planes, nblocks) in enumerate(
                zip(chans, cfg.stage_blocks), start=1):
            blocks = []
            for bi in range(nblocks):
                stride = 2 if bi == 0 else 1
                ds = None
                if stride != 1 or inplanes != planes:
                    ds = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes, eps=1e-5))
                blocks.append(TorchIBasicBlock(inplanes, planes, stride, ds))
                inplanes = planes
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))
        self.bn2 = tnn.BatchNorm2d(chans[-1], eps=1e-5)
        s = cfg.input_size // 16
        self.fc = tnn.Linear(chans[-1] * s * s, cfg.embed_dim)
        self.features = tnn.BatchNorm1d(cfg.embed_dim, eps=1e-5)

    def forward(self, x):
        x = self.conv1(x)
        x = self.bn1(x)
        x = self.prelu(x)
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        x = self.fc(x)
        return self.features(x)


def _randomize(model):
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("cfg", [AF.TINY,
                                 AF.ArcFaceConfig(name="mini",
                                                  stage_channels=(8, 12, 16, 24),
                                                  stage_blocks=(2, 1, 2, 1),
                                                  embed_dim=32)])
def test_torch_to_flax_arcface_parity(cfg):
    tm = TorchIResNet(cfg).eval()
    _randomize(tm)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()
             if "num_batches_tracked" not in k}
    # checkpoint covers every required tensor
    assert set(arcface_required_names(cfg)) <= set(state)

    model, variables = AF.init_arcface(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
    loaded = load_arcface_torch(variables, cfg, state, strict=True)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg.input_size, cfg.input_size, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(model.apply(loaded, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_loader_rejects_missing_tensors():
    cfg = AF.TINY
    model, variables = AF.init_arcface(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
    with pytest.raises(KeyError, match="missing"):
        load_arcface_torch(variables, cfg, {"conv1.weight":
                                            np.zeros((8, 3, 3, 3))},
                           strict=True)