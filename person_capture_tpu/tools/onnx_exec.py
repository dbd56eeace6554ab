"""Dependency-free ONNX graph executor → jittable JAX function.

The reference runs its face stack from ONNX checkpoints through
onnxruntime/TensorRT (person_capture/face_embedder.py:967-1197). TPU hosts
have neither; this module executes the ONNX graph *directly in JAX*: parse
with tools/onnx_lite.parse_onnx, then interpret the node list with XLA ops.
The resulting callable is pure (params passed explicitly), jit-compatible,
and runs the *exact* insightface/arcface graphs when their .onnx files are
provided — closing the "clean arch ≠ exact graph" gap for real checkpoints
(scrfd_*_bnkps.onnx, w600k_r50.onnx) without the `onnx` package.

Design notes (TPU):
- Shape-feeding inputs (Reshape shapes, Resize scales/sizes, Slice indices…)
  are constant-folded on host: any chain of host-constant values executes in
  numpy, so reshapes/resizes stay static under jit. Float weights are NOT
  baked into the trace — they are explicit arguments (resident on device,
  castable to bf16) so compile time and HBM use stay sane.
- Layout is ONNX-native NCHW inside the graph. XLA re-lays out for the MXU;
  this path is for checkpoint-exact inference, the production hot path
  remains the native NHWC flax models.
- Data-dependent ops (NonZero, NonMaxSuppression, dynamic TopK) are
  rejected with a clear error: detection decode/NMS live outside the graph
  (ops/nms.py), exactly as insightface's python decode does.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .onnx_lite import OnnxGraph, OnnxNode, _DTYPES, parse_onnx

__all__ = ["OnnxModule", "build_module", "load_onnx_module"]


def _is_host(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _xp(*vals):
    if all(_is_host(v) for v in vals):
        return np
    import jax.numpy as jnp

    return jnp


def _s(attr, default: str = "") -> str:
    """Attribute string (stored as bytes) → str."""
    if attr is None:
        return default
    if isinstance(attr, bytes):
        return attr.decode("utf-8")
    return str(attr)


def _ints(v) -> List[int]:
    if v is None:
        return []
    if isinstance(v, np.ndarray):
        return [int(x) for x in v.reshape(-1)]
    if isinstance(v, (list, tuple)):
        return [int(x) for x in v]
    return [int(v)]


# ---------------------------------------------------------------------------
# op implementations: fn(node, vals) -> value | tuple(values)
# vals are the resolved inputs (None for absent optional inputs)
# ---------------------------------------------------------------------------

_OPS: Dict[str, Callable] = {}


def _op(*names):
    def deco(fn):
        for n in names:
            _OPS[n] = fn
        return fn
    return deco


def _require_host(node: OnnxNode, val, what: str) -> np.ndarray:
    if not _is_host(val):
        raise ValueError(
            f"{node.op_type} '{node.name}': {what} must be a host constant "
            f"(static under jit); got a traced value")
    return np.asarray(val)


@_op("Constant")
def _constant(node, vals):
    for key in ("value", "value_float", "value_int", "value_floats",
                "value_ints"):
        if key in node.attrs:
            v = node.attrs[key]
            return v if isinstance(v, np.ndarray) else np.asarray(v)
    raise ValueError(f"Constant '{node.name}' carries no value")


@_op("Identity")
def _identity(node, vals):
    return vals[0]


@_op("Dropout")
def _dropout(node, vals):
    if len(node.outputs) > 1:
        xp = _xp(vals[0])
        return vals[0], xp.ones(vals[0].shape, bool)
    return vals[0]


@_op("Cast")
def _cast(node, vals):
    code = int(node.attrs["to"])
    dtype = _DTYPES.get(code)
    if dtype is None:
        raise NotImplementedError(
            f"Cast node '{node.name}' targets unsupported ONNX dtype "
            f"code {code}")
    x = vals[0]
    if _is_host(x):
        return np.asarray(x).astype(dtype)
    return x.astype(dtype)


@_op("Shape")
def _shape(node, vals):
    shape = np.asarray(vals[0].shape, np.int64)
    start = int(node.attrs.get("start", 0))
    end = node.attrs.get("end")
    return shape[start:None if end is None else int(end)]


@_op("Size")
def _size(node, vals):
    return np.int64(int(np.prod(vals[0].shape)))


@_op("Gather")
def _gather(node, vals):
    x, idx = vals
    axis = int(node.attrs.get("axis", 0))
    xp = _xp(x)
    idx_arr = np.asarray(idx) if _is_host(idx) else idx
    dim = x.shape[axis]
    idx_arr = xp.where(idx_arr < 0, idx_arr + dim, idx_arr) \
        if not _is_host(idx) else np.where(idx_arr < 0, idx_arr + dim, idx_arr)
    return xp.take(x, idx_arr, axis=axis)


@_op("Squeeze")
def _squeeze(node, vals):
    x = vals[0]
    axes = _ints(node.attrs.get("axes")) if "axes" in node.attrs else (
        _ints(_require_host(node, vals[1], "axes")) if len(vals) > 1
        and vals[1] is not None else [])
    xp = _xp(x)
    if not axes:
        return xp.squeeze(x)
    axes = tuple(a % x.ndim for a in axes)
    return xp.squeeze(x, axis=axes)


@_op("Unsqueeze")
def _unsqueeze(node, vals):
    x = vals[0]
    axes = _ints(node.attrs.get("axes")) if "axes" in node.attrs else \
        _ints(_require_host(node, vals[1], "axes"))
    out_rank = (np.asarray(x).ndim if _is_host(x) else x.ndim) + len(axes)
    axes = sorted(a % out_rank for a in axes)
    xp = _xp(x)
    for a in axes:
        x = xp.expand_dims(x, a)
    return x


@_op("Concat")
def _concat(node, vals):
    axis = int(node.attrs["axis"])
    xp = _xp(*vals)
    return xp.concatenate([np.atleast_1d(v) if _is_host(v) else v
                           for v in vals], axis=axis)


@_op("Reshape")
def _reshape(node, vals):
    x = vals[0]
    shape = _ints(_require_host(node, vals[1], "shape"))
    in_shape = x.shape
    out = []
    for i, d in enumerate(shape):
        if d == 0 and not int(node.attrs.get("allowzero", 0)):
            out.append(in_shape[i])
        else:
            out.append(d)
    if -1 in out:
        known = int(np.prod([d for d in out if d != -1]))
        out[out.index(-1)] = int(np.prod(in_shape)) // max(known, 1)
    return x.reshape(tuple(out))


@_op("Flatten")
def _flatten(node, vals):
    x = vals[0]
    axis = int(node.attrs.get("axis", 1)) % (x.ndim + 1)
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    return x.reshape(lead, -1)


@_op("Transpose")
def _transpose(node, vals):
    x = vals[0]
    perm = _ints(node.attrs.get("perm")) or list(range(x.ndim))[::-1]
    xp = _xp(x)
    return xp.transpose(x, perm)


@_op("Expand")
def _expand(node, vals):
    x = vals[0]
    shape = tuple(_ints(_require_host(node, vals[1], "shape")))
    target = np.broadcast_shapes(tuple(x.shape), shape)
    xp = _xp(x)
    return xp.broadcast_to(x, target)


@_op("Tile")
def _tile(node, vals):
    reps = _ints(_require_host(node, vals[1], "repeats"))
    xp = _xp(vals[0])
    return xp.tile(vals[0], reps)


@_op("Slice")
def _slice(node, vals):
    x = vals[0]
    if len(vals) > 1 and vals[1] is not None:          # opset >= 10
        starts = _ints(_require_host(node, vals[1], "starts"))
        ends = _ints(_require_host(node, vals[2], "ends"))
        axes = _ints(_require_host(node, vals[3], "axes")) \
            if len(vals) > 3 and vals[3] is not None else list(range(len(starts)))
        steps = _ints(_require_host(node, vals[4], "steps")) \
            if len(vals) > 4 and vals[4] is not None else [1] * len(starts)
    else:                                               # opset < 10: attrs
        starts = _ints(node.attrs["starts"])
        ends = _ints(node.attrs["ends"])
        axes = _ints(node.attrs.get("axes")) or list(range(len(starts)))
        steps = [1] * len(starts)
    slicers: List[Any] = [slice(None)] * x.ndim
    int64_max = (1 << 63) - 1
    for start, end, axis, step in zip(starts, ends, axes, steps):
        axis = axis % x.ndim
        dim = x.shape[axis]
        if start < 0:
            start += dim
        if end < 0 and end > -int64_max:
            end += dim
        if step > 0:
            start = int(np.clip(start, 0, dim))
            end = int(np.clip(end, 0, dim))
            slicers[axis] = slice(start, end, step)
        else:
            start = int(np.clip(start, 0, dim - 1))
            end = int(np.clip(end, -1, dim - 1))
            slicers[axis] = slice(start, None if end < 0 else end, step)
    return x[tuple(slicers)]


@_op("Split")
def _split(node, vals):
    x = vals[0]
    axis = int(node.attrs.get("axis", 0)) % x.ndim
    if "split" in node.attrs:
        sizes = _ints(node.attrs["split"])
    elif len(vals) > 1 and vals[1] is not None:
        sizes = _ints(_require_host(node, vals[1], "split"))
    else:
        # no explicit sizes: ONNX (opset 18) uses ceil(dim/n)-sized chunks
        # with only the LAST chunk smaller for non-divisible dims — e.g.
        # dim 7 into 3 → [3, 3, 1] (not numpy array_split's [3, 2, 2])
        n = len(node.outputs)
        dim = int(x.shape[axis])
        chunk = -(-dim // n)
        sizes = [chunk] * (n - 1) + [dim - chunk * (n - 1)]
        if sizes[-1] <= 0:
            raise NotImplementedError(
                f"Split node '{node.name}': {n} outputs cannot cover "
                f"dim {dim}")
    outs = []
    off = 0
    for sz in sizes:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(off, off + sz)
        outs.append(x[tuple(sl)])
        off += sz
    return tuple(outs)


@_op("Pad")
def _pad(node, vals):
    x = vals[0]
    mode = _s(node.attrs.get("mode"), "constant")
    if "pads" in node.attrs:                            # opset < 11
        pads = _ints(node.attrs["pads"])
        cval = float(node.attrs.get("value", 0.0))
    else:
        pads = _ints(_require_host(node, vals[1], "pads"))
        cval = 0.0
        if len(vals) > 2 and vals[2] is not None:
            cval = float(np.asarray(vals[2]).reshape(-1)[0]) \
                if _is_host(vals[2]) else vals[2]
    n = x.ndim
    begin, end = pads[:n], pads[n:]
    # negative pads crop
    sl = tuple(slice(max(0, -b), None if e >= 0 else e)
               for b, e in zip(begin, end))
    x = x[sl]
    pos = [(max(0, b), max(0, e)) for b, e in zip(begin, end)]
    xp = _xp(x)
    mode_map = {"constant": "constant", "reflect": "reflect", "edge": "edge"}
    if mode == "constant":
        return xp.pad(x, pos, mode="constant", constant_values=cval)
    return xp.pad(x, pos, mode=mode_map[mode])


@_op("ConstantOfShape")
def _const_of_shape(node, vals):
    shape = tuple(_ints(_require_host(node, vals[0], "shape")))
    value = node.attrs.get("value")
    if value is None:
        return np.zeros(shape, np.float32)
    v = np.asarray(value).reshape(-1)[0]
    return np.full(shape, v, np.asarray(value).dtype)


@_op("Range")
def _range(node, vals):
    start, limit, delta = (_require_host(node, v, "range arg") for v in vals)
    return np.arange(start.item(), limit.item(), delta.item(),
                     dtype=np.asarray(start).dtype)


@_op("Where")
def _where(node, vals):
    xp = _xp(*vals)
    return xp.where(vals[0], vals[1], vals[2])


def _binary(fn_np, fn_jnp=None):
    def impl(node, vals):
        a, b = vals
        if _is_host(a) and _is_host(b):
            return fn_np(np.asarray(a), np.asarray(b))
        import jax.numpy as jnp  # noqa: F401
        return (fn_jnp or fn_np)(a, b)
    return impl


def _div_impl(a, b):
    ak = getattr(a, "dtype", np.dtype(np.float64)).kind
    bk = getattr(b, "dtype", np.dtype(np.float64)).kind
    if ak == "f" or bk == "f":
        return a / b
    # ONNX integer Div truncates toward zero (shape arithmetic is
    # non-negative in practice; implement the spec anyway for host values)
    if _is_host(a) and _is_host(b):
        return np.trunc(np.asarray(a) / np.asarray(b)).astype(
            np.result_type(a, b))
    return a // b


_OPS["Add"] = _binary(lambda a, b: a + b)
_OPS["Sub"] = _binary(lambda a, b: a - b)
_OPS["Mul"] = _binary(lambda a, b: a * b)
_OPS["Div"] = _binary(_div_impl)
_OPS["Pow"] = _binary(lambda a, b: a ** b)
_OPS["Equal"] = _binary(lambda a, b: a == b)
_OPS["Greater"] = _binary(lambda a, b: a > b)
_OPS["Less"] = _binary(lambda a, b: a < b)
_OPS["And"] = _binary(lambda a, b: a & b)
_OPS["Or"] = _binary(lambda a, b: a | b)


@_op("Min", "Max", "Sum", "Mean")
def _variadic(node, vals):
    xp = _xp(*vals)
    out = vals[0]
    for v in vals[1:]:
        if node.op_type == "Min":
            out = xp.minimum(out, v)
        elif node.op_type == "Max":
            out = xp.maximum(out, v)
        else:
            out = out + v
    if node.op_type == "Mean":
        out = out / len(vals)
    return out


def _unary(np_fn, jnp_name=None):
    def impl(node, vals):
        x = vals[0]
        if _is_host(x):
            return np_fn(np.asarray(x))
        import jax.numpy as jnp
        return getattr(jnp, jnp_name)(x) if jnp_name else np_fn(x)
    return impl


_OPS["Neg"] = _unary(lambda x: -x)
_OPS["Abs"] = _unary(np.abs, "abs")
_OPS["Sqrt"] = _unary(np.sqrt, "sqrt")
_OPS["Exp"] = _unary(np.exp, "exp")
_OPS["Log"] = _unary(np.log, "log")
_OPS["Floor"] = _unary(np.floor, "floor")
_OPS["Ceil"] = _unary(np.ceil, "ceil")
_OPS["Not"] = _unary(np.logical_not, "logical_not")
_OPS["Reciprocal"] = _unary(lambda x: 1.0 / x)
_OPS["Tanh"] = _unary(np.tanh, "tanh")


@_op("Sigmoid")
def _sigmoid(node, vals):
    x = vals[0]
    if _is_host(x):
        return 1.0 / (1.0 + np.exp(-np.asarray(x, np.float32)))
    import jax
    return jax.nn.sigmoid(x)


@_op("Relu")
def _relu(node, vals):
    xp = _xp(vals[0])
    return xp.maximum(vals[0], 0)


@_op("LeakyRelu")
def _leaky_relu(node, vals):
    alpha = float(node.attrs.get("alpha", 0.01))
    xp = _xp(vals[0])
    return xp.where(vals[0] >= 0, vals[0], alpha * vals[0])


@_op("PRelu")
def _prelu(node, vals):
    x, slope = vals
    s = np.asarray(slope) if _is_host(slope) else slope
    if s.ndim == 1 and x.ndim >= 2 and s.shape[0] == x.shape[1]:
        # channel vector on an NCHW tensor: align to the C axis
        s = s.reshape((s.shape[0],) + (1,) * (x.ndim - 2))
    xp = _xp(x)
    return xp.where(x >= 0, x, x * s)


@_op("Elu")
def _elu(node, vals):
    alpha = float(node.attrs.get("alpha", 1.0))
    xp = _xp(vals[0])
    return xp.where(vals[0] >= 0, vals[0], alpha * (xp.exp(vals[0]) - 1.0))


@_op("HardSigmoid")
def _hard_sigmoid(node, vals):
    alpha = float(node.attrs.get("alpha", 0.2))
    beta = float(node.attrs.get("beta", 0.5))
    xp = _xp(vals[0])
    return xp.clip(alpha * vals[0] + beta, 0.0, 1.0)


@_op("HardSwish")
def _hard_swish(node, vals):
    xp = _xp(vals[0])
    return vals[0] * xp.clip(vals[0] / 6.0 + 0.5, 0.0, 1.0)


@_op("Softplus")
def _softplus(node, vals):
    xp = _xp(vals[0])
    return xp.logaddexp(vals[0], 0.0)


@_op("Clip")
def _clip(node, vals):
    x = vals[0]
    lo = node.attrs.get("min")
    hi = node.attrs.get("max")
    if lo is None and len(vals) > 1 and vals[1] is not None:
        lo = vals[1]
    if hi is None and len(vals) > 2 and vals[2] is not None:
        hi = vals[2]
    xp = _xp(x)
    if lo is not None:
        x = xp.maximum(x, lo)
    if hi is not None:
        x = xp.minimum(x, hi)
    return x


@_op("Softmax")
def _softmax(node, vals, opset_holder={"opset": 13}):
    x = vals[0]
    import jax

    opset = opset_holder["opset"]
    if opset >= 13:
        axis = int(node.attrs.get("axis", -1))
        return jax.nn.softmax(x, axis=axis)
    # opset < 13: softmax over the flattened trailing dims from `axis`
    axis = int(node.attrs.get("axis", 1)) % x.ndim
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    flat = x.reshape(lead, -1)
    out = jax.nn.softmax(flat, axis=-1)
    return out.reshape(x.shape)


@_op("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd")
def _reduce(node, vals):
    x = vals[0]
    axes = _ints(node.attrs.get("axes")) if "axes" in node.attrs else (
        _ints(_require_host(node, vals[1], "axes"))
        if len(vals) > 1 and vals[1] is not None else [])
    keepdims = bool(int(node.attrs.get("keepdims", 1)))
    if not axes:
        if int(node.attrs.get("noop_with_empty_axes", 0)):
            return x
        axes = list(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    xp = _xp(x)
    fn = {"ReduceMean": "mean", "ReduceSum": "sum", "ReduceMax": "max",
          "ReduceMin": "min", "ReduceProd": "prod"}[node.op_type]
    return getattr(xp, fn)(x, axis=axes, keepdims=keepdims)


@_op("MatMul")
def _matmul(node, vals):
    xp = _xp(*vals)
    return xp.matmul(vals[0], vals[1])


@_op("Gemm")
def _gemm(node, vals):
    a, b = vals[0], vals[1]
    alpha = float(node.attrs.get("alpha", 1.0))
    beta = float(node.attrs.get("beta", 1.0))
    if int(node.attrs.get("transA", 0)):
        a = a.T
    if int(node.attrs.get("transB", 0)):
        b = b.T
    xp = _xp(*[v for v in vals if v is not None])
    out = alpha * xp.matmul(a, b)
    if len(vals) > 2 and vals[2] is not None:
        out = out + beta * vals[2]
    return out


def _conv_pads(node, x_shape, k_shape, strides, dilations) -> List[Tuple[int, int]]:
    spatial = len(x_shape) - 2
    auto = _s(node.attrs.get("auto_pad"), "NOTSET")
    if auto in ("", "NOTSET"):
        pads = _ints(node.attrs.get("pads")) or [0] * (2 * spatial)
        return [(pads[i], pads[i + spatial]) for i in range(spatial)]
    if auto == "VALID":
        return [(0, 0)] * spatial
    out_pads = []
    for i in range(spatial):
        in_dim = x_shape[2 + i]
        k = (k_shape[2 + i] - 1) * dilations[i] + 1
        out_dim = math.ceil(in_dim / strides[i])
        total = max(0, (out_dim - 1) * strides[i] + k - in_dim)
        if auto == "SAME_UPPER":
            out_pads.append((total // 2, total - total // 2))
        else:  # SAME_LOWER
            out_pads.append((total - total // 2, total // 2))
    return out_pads


@_op("Conv")
def _conv(node, vals):
    import jax.lax as lax

    x, w = vals[0], vals[1]
    if x.ndim != 4:
        raise NotImplementedError(
            f"Conv '{node.name}': only 2-D convolutions supported "
            f"(input rank {x.ndim})")
    spatial = 2
    strides = _ints(node.attrs.get("strides")) or [1] * spatial
    dilations = _ints(node.attrs.get("dilations")) or [1] * spatial
    group = int(node.attrs.get("group", 1))
    pads = _conv_pads(node, x.shape, w.shape, strides, dilations)
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    if len(vals) > 2 and vals[2] is not None:
        out = out + vals[2].reshape(1, -1, 1, 1)
    return out


@_op("BatchNormalization")
def _batch_norm(node, vals):
    x, scale, bias, mean, var = vals[:5]
    eps = float(node.attrs.get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    import jax.numpy as jnp

    inv = jnp.asarray(scale).reshape(shape) / jnp.sqrt(
        jnp.asarray(var).reshape(shape) + eps)
    return x * inv + (jnp.asarray(bias).reshape(shape)
                      - jnp.asarray(mean).reshape(shape) * inv)


def _pool_prep(node, x):
    spatial = x.ndim - 2
    kernel = _ints(node.attrs["kernel_shape"])
    strides = _ints(node.attrs.get("strides")) or [1] * spatial
    dilations = _ints(node.attrs.get("dilations")) or [1] * spatial
    pads = _ints(node.attrs.get("pads")) or [0] * (2 * spatial)
    pairs = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    auto = _s(node.attrs.get("auto_pad"), "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        pairs = []
        for i in range(spatial):
            in_dim = x.shape[2 + i]
            k = (kernel[i] - 1) * dilations[i] + 1
            out_dim = math.ceil(in_dim / strides[i])
            total = max(0, (out_dim - 1) * strides[i] + k - in_dim)
            pairs.append((total // 2, total - total // 2) if auto ==
                         "SAME_UPPER" else (total - total // 2, total // 2))
    if int(node.attrs.get("ceil_mode", 0)):
        new_pairs = []
        for i in range(spatial):
            in_dim = x.shape[2 + i] + pairs[i][0] + pairs[i][1]
            k = (kernel[i] - 1) * dilations[i] + 1
            out_ceil = math.ceil(max(0, in_dim - k) / strides[i]) + 1
            need = (out_ceil - 1) * strides[i] + k - in_dim
            new_pairs.append((pairs[i][0], pairs[i][1] + max(0, need)))
        pairs = new_pairs
    return kernel, strides, dilations, pairs


@_op("MaxPool")
def _max_pool(node, vals):
    import jax.lax as lax
    import jax.numpy as jnp

    x = vals[0]
    kernel, strides, dilations, pairs = _pool_prep(node, x)
    out = lax.reduce_window(
        x, -jnp.inf if x.dtype.kind == "f" else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 1, *kernel),
        window_strides=(1, 1, *strides),
        window_dilation=(1, 1, *dilations),
        padding=[(0, 0), (0, 0), *pairs])
    return out


@_op("AveragePool")
def _avg_pool(node, vals):
    import jax.lax as lax
    import jax.numpy as jnp

    x = vals[0]
    kernel, strides, dilations, pairs = _pool_prep(node, x)
    window = (1, 1, *kernel)
    wstrides = (1, 1, *strides)
    wdil = (1, 1, *dilations)
    wpad = [(0, 0), (0, 0), *pairs]
    sums = lax.reduce_window(x, 0.0, lax.add, window, wstrides,
                             window_dilation=wdil, padding=wpad)
    if int(node.attrs.get("count_include_pad", 0)):
        return sums / float(np.prod(kernel))
    ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
    counts = lax.reduce_window(ones, 0.0, lax.add, window, wstrides,
                               window_dilation=wdil, padding=wpad)
    return sums / counts


@_op("GlobalAveragePool")
def _global_avg_pool(node, vals):
    x = vals[0]
    axes = tuple(range(2, x.ndim))
    return x.mean(axis=axes, keepdims=True)


@_op("GlobalMaxPool")
def _global_max_pool(node, vals):
    x = vals[0]
    axes = tuple(range(2, x.ndim))
    return x.max(axis=axes, keepdims=True)


def _resize_axis_indices(in_dim: int, out_dim: int, scale: float,
                         coord_mode: str, nearest_mode: str,
                         linear: bool):
    """Source coordinates for one resized axis (ONNX Resize semantics)."""
    x = np.arange(out_dim, dtype=np.float64)
    if coord_mode == "half_pixel":
        src = (x + 0.5) / scale - 0.5
    elif coord_mode == "pytorch_half_pixel":
        src = (x + 0.5) / scale - 0.5 if out_dim > 1 else np.zeros_like(x)
    elif coord_mode == "asymmetric":
        src = x / scale
    elif coord_mode == "align_corners":
        src = x * (in_dim - 1) / max(out_dim - 1, 1)
    elif coord_mode == "tf_half_pixel_for_nn":
        src = (x + 0.5) / scale
    else:
        raise NotImplementedError(f"Resize coord mode {coord_mode!r}")
    if linear:
        lo = np.clip(np.floor(src), 0, in_dim - 1).astype(np.int64)
        hi = np.clip(lo + 1, 0, in_dim - 1)
        w = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
        return lo, hi, w
    if nearest_mode == "floor":
        idx = np.floor(src)
    elif nearest_mode == "ceil":
        idx = np.ceil(src)
    elif nearest_mode == "round_prefer_ceil":
        idx = np.floor(src + 0.5)
    else:  # round_prefer_floor (default)
        idx = np.ceil(src - 0.5)
    return np.clip(idx, 0, in_dim - 1).astype(np.int64), None, None


@_op("Resize", "Upsample")
def _resize(node, vals):
    x = vals[0]
    mode = _s(node.attrs.get("mode"), "nearest")
    if node.op_type == "Upsample":
        coord_mode, nearest_mode = "asymmetric", "floor"
        scales_v = node.attrs.get("scales")
        if scales_v is None and len(vals) > 1:
            scales_v = _require_host(node, vals[1], "scales")
        scales = [float(s) for s in np.asarray(scales_v).reshape(-1)]
        sizes = None
    else:
        coord_mode = _s(node.attrs.get("coordinate_transformation_mode"),
                        "half_pixel")
        nearest_mode = _s(node.attrs.get("nearest_mode"),
                          "round_prefer_floor")
        scales = None
        sizes = None
        if len(vals) == 2 and vals[1] is not None:
            # opset-10 Resize signature: (X, scales) — later opsets move
            # scales to input 2 (input 1 becomes roi). Opset-10 had NO
            # coordinate/nearest attributes and fixed asymmetric+floor
            # semantics (same as Upsample); keeping the opset-11 defaults
            # would shift every resample half a pixel
            scales = [float(s) for s in np.asarray(
                _require_host(node, vals[1], "scales")).reshape(-1)]
            if "coordinate_transformation_mode" not in node.attrs:
                coord_mode = "asymmetric"
            if "nearest_mode" not in node.attrs:
                nearest_mode = "floor"
        if len(vals) > 2 and vals[2] is not None and np.size(
                _require_host(node, vals[2], "scales")):
            scales = [float(s) for s in np.asarray(vals[2]).reshape(-1)]
        if len(vals) > 3 and vals[3] is not None:
            sizes = _ints(_require_host(node, vals[3], "sizes"))
    in_shape = list(x.shape)
    if sizes is not None:
        out_shape = list(sizes)
        scales = [o / i for o, i in zip(out_shape, in_shape)]
    else:
        out_shape = [int(math.floor(i * s))
                     for i, s in zip(in_shape, scales)]
    if mode not in ("nearest", "linear"):
        raise NotImplementedError(f"Resize mode {mode!r}")

    import jax.numpy as jnp

    out = x
    float_path = jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    for axis in range(x.ndim):
        if out_shape[axis] == in_shape[axis] and scales[axis] == 1.0:
            continue
        lo, hi, w = _resize_axis_indices(
            in_shape[axis], out_shape[axis], scales[axis],
            coord_mode, nearest_mode, linear=(mode == "linear"))
        n_in, n_out = in_shape[axis], out_shape[axis]
        if float_path:
            # hat-weight matmul resample (CLAUDE.md: TPU gathers serialize
            # at ~15 ns/element — never resample with advanced indexing on
            # the device path). The per-axis interpolation weights are a
            # static [out, in] matrix; the resize becomes one MXU matmul
            # per axis, same formulation as ops/align.align_chips_matmul_jnp
            W = np.zeros((n_out, n_in), np.float32)
            if w is None:
                W[np.arange(n_out), lo] = 1.0
            else:
                np.add.at(W, (np.arange(n_out), lo), 1.0 - w)
                np.add.at(W, (np.arange(n_out), hi), w)
            out = jnp.tensordot(out, jnp.asarray(W), axes=[[axis], [1]])
            out = jnp.moveaxis(out, -1, axis)
        elif w is None:
            # integer nearest: keep the exact dtype (a float matmul would
            # round large ints); these tensors are small host-shape data
            out = jnp.take(out, lo, axis=axis)
        else:
            a = jnp.take(out, lo, axis=axis)
            b = jnp.take(out, hi, axis=axis)
            bshape = [1] * out.ndim
            bshape[axis] = len(w)
            wj = jnp.asarray(w).reshape(bshape)
            out = a * (1.0 - wj) + b * wj
    if float_path:
        out = out.astype(x.dtype)  # Resize preserves T (matmul promoted)
    return out


# inputs that must stay host constants (baked, never traced):
# (op_type, input index)
_HOST_INPUTS = {
    ("Reshape", 1), ("Resize", 1), ("Resize", 2), ("Resize", 3),
    ("Upsample", 1), ("Slice", 1), ("Slice", 2), ("Slice", 3), ("Slice", 4),
    ("Pad", 1), ("Expand", 1), ("ConstantOfShape", 0), ("Tile", 1),
    ("Squeeze", 1), ("Unsqueeze", 1), ("Split", 1),
    ("Range", 0), ("Range", 1), ("Range", 2),
    ("ReduceMean", 1), ("ReduceSum", 1), ("ReduceMax", 1), ("ReduceMin", 1),
    ("ReduceProd", 1), ("Gather", 1),
}


class OnnxModule:
    """Executable ONNX graph: ``module(params, *inputs) -> outputs``.

    ``params`` is the dict of float weight arrays (pass through
    ``jax.device_put`` once and reuse); host-constant tensors (shapes,
    indices, scales) are baked into the trace so every reshape/resize stays
    static. Instances are pure and safe to wrap in ``jax.jit``.
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        self.input_names = list(graph.input_names)
        self.output_names = list(graph.output_names)
        baked_names = self._baked_names(graph)
        self.constants: Dict[str, np.ndarray] = {
            k: v for k, v in graph.initializers.items() if k in baked_names}
        self.params: Dict[str, np.ndarray] = {
            k: v for k, v in graph.initializers.items()
            if k not in baked_names}
        unknown = sorted({n.op_type for n in graph.nodes} - set(_OPS))
        if unknown:
            raise NotImplementedError(
                f"ONNX ops not supported by the executor: {unknown}")

    @staticmethod
    def _baked_names(graph: OnnxGraph) -> set:
        """Initializers consumed (anywhere) through a host-only input slot,
        plus every non-float initializer (indices/shapes/masks)."""
        baked = {k for k, v in graph.initializers.items()
                 if v.dtype.kind in "iub"}
        for node in graph.nodes:
            for idx, name in enumerate(node.inputs):
                if (node.op_type, idx) in _HOST_INPUTS and \
                        name in graph.initializers:
                    baked.add(name)
        return baked

    def __call__(self, params: Dict[str, Any], *inputs):
        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"expected {len(self.input_names)} inputs "
                f"({self.input_names}), got {len(inputs)}")
        env: Dict[str, Any] = dict(self.constants)
        env.update(params)
        env.update(zip(self.input_names, inputs))
        opset = self.graph.opset
        for node in self.graph.nodes:
            fn = _OPS[node.op_type]
            vals = [env.get(n) if n else None for n in node.inputs]
            if node.op_type == "Softmax":
                out = fn(node, vals, {"opset": opset})
            else:
                out = fn(node, vals)
            if isinstance(out, tuple):
                for name, v in zip(node.outputs, out):
                    if name:
                        env[name] = v
            else:
                env[node.outputs[0]] = out
        outs = tuple(env[n] for n in self.output_names)
        return outs if len(outs) > 1 else outs[0]


def build_module(graph: OnnxGraph) -> OnnxModule:
    return OnnxModule(graph)


def load_onnx_module(path: str) -> OnnxModule:
    """Parse an .onnx file and return an executable :class:`OnnxModule`."""
    return build_module(parse_onnx(path))
