"""Shared building blocks for the model zoo (flax.linen, NHWC)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    """Conv → BatchNorm → optional activation, NHWC."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2,
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class PReLU(nn.Module):
    """Channelwise PReLU (ArcFace iResNet uses it throughout)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class DWConvBN(nn.Module):
    """Depthwise conv + BN + act."""
    kernel: int = 3
    stride: int = 1
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        return ConvBN(c, self.kernel, self.stride, groups=c, act=self.act,
                      dtype=self.dtype)(x, train)


class ResBasicBlock(nn.Module):
    """Post-activation ResNet basic block (used by the SCRFD backbone)."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act=None, dtype=self.dtype)(y, train)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = ConvBN(self.features, 1, self.stride, act=None,
                              dtype=self.dtype)(identity, train)
        return nn.relu(y + identity)


class IBasicBlock(nn.Module):
    """ArcFace iResNet block: BN → Conv3x3 → BN → PReLU → Conv3x3(s) → BN,
    residual with a 1x1-conv downsample when shape changes (pre-activation
    'improved ResNet' of the ArcFace paper)."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(x)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(y)
        y = PReLU(dtype=self.dtype)(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype)(y)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    epsilon=1e-5, dtype=self.dtype)(identity)
        return y + identity


def fast_init(model: nn.Module, key, input_shape, dtype) -> Any:
    """Initialize model variables on the CPU backend and transfer once.

    On remote/tunneled accelerators (axon), per-parameter init programs cost
    a round trip each — hundreds of round trips per model. CPU init +
    one bulk device_put turns minutes into seconds.
    """
    import jax

    def _init():
        return model.init(key, jnp.zeros(input_shape, dtype))

    if jax.default_backend() == "cpu":
        return _init()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return _init()
    with jax.default_device(cpu):
        variables = _init()
    return jax.device_put(variables, jax.devices()[0])


def upsample2x(x):
    """Nearest 2× upsample (FPN top-down path)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def make_anchor_centers(feat_h: int, feat_w: int, stride: int,
                        num_anchors: int) -> jnp.ndarray:
    """SCRFD-style anchor centers ``[h*w*A, 2]`` in input-image pixels
    (x, y = grid * stride; anchors share the center)."""
    ys = jnp.arange(feat_h, dtype=jnp.float32) * stride
    xs = jnp.arange(feat_w, dtype=jnp.float32) * stride
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([grid_x.reshape(-1), grid_y.reshape(-1)], -1)
    return jnp.repeat(centers, num_anchors, axis=0)


def distance2bbox(centers, distances, stride: float):
    """Decode ltrb stride-unit distances to xyxy boxes."""
    d = distances * stride
    x1 = centers[..., 0] - d[..., 0]
    y1 = centers[..., 1] - d[..., 1]
    x2 = centers[..., 0] + d[..., 2]
    y2 = centers[..., 1] + d[..., 3]
    return jnp.stack([x1, y1, x2, y2], -1)


def distance2kps(centers, offsets, stride: float):
    """Decode (dx, dy)*5 stride-unit offsets to landmark coordinates
    ``[..., 5, 2]``."""
    o = offsets * stride
    pts = o.reshape(*o.shape[:-1], 5, 2)
    return pts + centers[..., None, :]
