"""Weight-mapping parity for YOLOv8: a torch model with the ultralytics
state-dict layout (Conv/C2f/SPPF/Detect, public architecture) must produce
the same raw head maps as our flax model after conversion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import torch.nn as tnn  # noqa: E402

from person_capture_tpu.models import yolov8 as Y  # noqa: E402
from person_capture_tpu.models.loaders import (load_yolov8_torch,  # noqa: E402
                                               yolov8_required_names)


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut)
                                for _ in range(n))
        self.cv2 = TConv((2 + n) * self.c, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TYolo(tnn.Module):
    """yolov8 graph with ultralytics 'model.{idx}' naming."""

    def __init__(self, cfg):
        super().__init__()
        w0, w1, w2, w3, w4 = cfg.width
        d1, d2, d3, d4 = cfg.depth
        nc, rm = cfg.num_classes, cfg.reg_max
        layers = {
            0: TConv(3, w0, 3, 2), 1: TConv(w0, w1, 3, 2),
            2: TC2f(w1, w1, d1), 3: TConv(w1, w2, 3, 2),
            4: TC2f(w2, w2, d2), 5: TConv(w2, w3, 3, 2),
            6: TC2f(w3, w3, d3), 7: TConv(w3, w4, 3, 2),
            8: TC2f(w4, w4, d4), 9: TSPPF(w4, w4),
            12: TC2f(w4 + w3, w3, d1, False),
            15: TC2f(w3 + w2, w2, d1, False),
            16: TConv(w2, w2, 3, 2),
            18: TC2f(w2 + w3, w3, d1, False),
            19: TConv(w3, w3, 3, 2),
            21: TC2f(w3 + w4, w4, d1, False),
        }
        self.model = tnn.ModuleDict({str(k): v for k, v in layers.items()})
        c2 = max(16, w2 // 4, 4 * rm)
        c3 = max(w2, min(nc, 100))
        det = tnn.Module()
        det.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * rm, 1))
            for ch in (w2, w3, w4))
        det.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(ch, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1))
            for ch in (w2, w3, w4))
        self.model["22"] = det
        self.up = tnn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, x):
        m = self.model
        x = m["1"](m["0"](x))
        x = m["2"](x)
        x = m["3"](x)
        p3 = m["4"](x)
        x = m["5"](p3)
        p4 = m["6"](x)
        x = m["7"](p4)
        x = m["8"](x)
        p5 = m["9"](x)
        u4 = m["12"](torch.cat([self.up(p5), p4], 1))
        u3 = m["15"](torch.cat([self.up(u4), p3], 1))
        d4 = m["18"](torch.cat([m["16"](u3), u4], 1))
        d5 = m["21"](torch.cat([m["19"](d4), p5], 1))
        det = m["22"]
        outs = []
        for lvl, feat in enumerate((u3, d4, d5)):
            outs.append((det.cv2[lvl](feat), det.cv3[lvl](feat)))
        return outs


def test_torch_to_flax_yolo_parity():
    cfg = Y.TINY
    tm = TYolo(cfg).eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()
             if "num_batches_tracked" not in k}
    assert set(yolov8_required_names(cfg)) <= set(state)

    model, variables = Y.init_yolo(jax.random.PRNGKey(0), cfg, size=64,
                                   dtype=jnp.float32)
    loaded = load_yolov8_torch(variables, cfg, state, strict=True)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = model.apply(loaded, jnp.asarray(x))
    for (rb, rc), (ob, oc, _unused) in zip(ref, [(*o, None) for o in ours]):
        # torch NCHW → NHWC
        rb = np.transpose(rb.numpy(), (0, 2, 3, 1))
        rc = np.transpose(rc.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ob), rb, atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(oc), rc, atol=3e-4, rtol=1e-3)


def test_yolo_loader_strict_missing():
    cfg = Y.TINY
    model, variables = Y.init_yolo(jax.random.PRNGKey(0), cfg, size=64,
                                   dtype=jnp.float32)
    with pytest.raises(KeyError, match="missing"):
        load_yolov8_torch(variables, cfg, {}, strict=True)