"""Checkpoint name-mapping: official torch layouts → our flax trees.

The converter (tools/convert_weights.py) dumps source tensors under
``src/<original name>`` with layouts already re-oriented (conv OIHW→HWIO,
dense [out,in]→[in,out]). This module maps those names onto the flax module
tree so real checkpoints load:

  * ArcFace: the official insightface ``iresnet`` torch layout
    (conv1/bn1/prelu, layer{1..4}.{i}.{bn1,conv1,bn2,prelu,conv2,bn3,
    downsample.{0,1}}, bn2, fc, features).
  * CLIP ViT: the open_clip visual tower layout.

Shapes are validated against the target tree; a clear error lists any
mismatch instead of silently mis-loading.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _bn(prefix: str) -> Dict[str, str]:
    """torch BatchNorm tensor names for a given prefix."""
    return {"scale": f"{prefix}.weight", "bias": f"{prefix}.bias",
            "mean": f"{prefix}.running_mean", "var": f"{prefix}.running_var"}


def arcface_name_map(cfg) -> Dict[Tuple[str, ...], str]:
    """flax path (tuple under params/batch_stats collections prefixed by the
    collection name) → torch source name."""
    m: Dict[Tuple[str, ...], str] = {}

    def add_bn(flax_scope: str, torch_prefix: str):
        names = _bn(torch_prefix)
        m[("params", flax_scope, "scale")] = names["scale"]
        m[("params", flax_scope, "bias")] = names["bias"]
        m[("batch_stats", flax_scope, "mean")] = names["mean"]
        m[("batch_stats", flax_scope, "var")] = names["var"]

    # stem
    m[("params", "Conv_0", "kernel")] = "conv1.weight"
    add_bn("BatchNorm_0", "bn1")
    m[("params", "PReLU_0", "alpha")] = "prelu.weight"

    # blocks (flax numbers IBasicBlock sequentially across stages)
    k = 0
    for stage, nblocks in enumerate(cfg.stage_blocks, start=1):
        for bi in range(nblocks):
            t = f"layer{stage}.{bi}"
            scope = f"IBasicBlock_{k}"
            add_bn(f"{scope}/BatchNorm_0", f"{t}.bn1")
            m[("params", f"{scope}/Conv_0", "kernel")] = f"{t}.conv1.weight"
            add_bn(f"{scope}/BatchNorm_1", f"{t}.bn2")
            m[("params", f"{scope}/PReLU_0", "alpha")] = f"{t}.prelu.weight"
            m[("params", f"{scope}/Conv_1", "kernel")] = f"{t}.conv2.weight"
            add_bn(f"{scope}/BatchNorm_2", f"{t}.bn3")
            if bi == 0:  # downsample on the first block of each stage
                m[("params", f"{scope}/Conv_2", "kernel")] = \
                    f"{t}.downsample.0.weight"
                add_bn(f"{scope}/BatchNorm_3", f"{t}.downsample.1")
            k += 1

    # head: bn2 → BatchNorm_1, fc → Dense_0, features → BatchNorm_2
    add_bn("BatchNorm_1", "bn2")
    m[("params", "Dense_0", "kernel")] = "fc.weight"
    m[("params", "Dense_0", "bias")] = "fc.bias"
    add_bn("BatchNorm_2", "features")
    return m


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _flatten_scope(path_str: str):
    return tuple(path_str.split("/"))


def load_arcface_torch(variables, cfg, src: Dict[str, np.ndarray],
                       strict: bool = True):
    """Fill our flax variables from a converted torch state dict.

    ``src`` keys may carry the converter's ``src/`` prefix. Conv kernels must
    already be HWIO and dense kernels [in, out] (the converter re-orients);
    raw torch layouts are detected by shape and re-oriented here as well.
    The fc kernel additionally permutes its input dim from torch's C·H·W
    flattening to our H·W·C flattening.
    """
    import jax

    src = {k[4:] if k.startswith("src/") else k: np.asarray(v)
           for k, v in src.items()}
    out = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    name_map = arcface_name_map(cfg)
    missing = []
    for path, torch_name in name_map.items():
        if torch_name not in src:
            missing.append(torch_name)
            continue
        w = src[torch_name]
        coll, scope, leaf = path[0], _flatten_scope(path[1]), path[2]
        full = (coll,) + scope + (leaf,)
        try:
            target = _get_path(out, full)
        except KeyError as e:
            raise KeyError(f"flax path not found: {full}") from e
        w = _orient(w, np.asarray(target), torch_name, cfg)
        if w.shape != np.asarray(target).shape:
            raise ValueError(
                f"shape mismatch for {torch_name} -> {full}: "
                f"{w.shape} vs {np.asarray(target).shape}")
        _set_path(out, full, w.astype(np.asarray(target).dtype))
    if strict and missing:
        raise KeyError(f"missing tensors in checkpoint: {missing[:8]}"
                       f"{'…' if len(missing) > 8 else ''}")
    return out


def _orient(w: np.ndarray, target: np.ndarray, name: str, cfg) -> np.ndarray:
    """Re-orient a source tensor into the target's layout."""
    if w.ndim == 4 and w.shape != target.shape:
        # torch OIHW → flax HWIO
        w = np.transpose(w, (2, 3, 1, 0))
    if name == "fc.weight":
        d = cfg.embed_dim
        if w.shape[0] == d:          # raw torch [out, in]
            w = np.transpose(w, (1, 0))
        # permute input dim: torch flattens NCHW (c·h·w), flax NHWC (h·w·c)
        in_dim = w.shape[0]
        c = in_dim // 49
        idx = np.arange(in_dim).reshape(c, 7, 7)     # torch order (c, h, w)
        perm = np.transpose(idx, (1, 2, 0)).reshape(-1)  # flax order (h, w, c)
        w = w[perm]
    return w


def arcface_required_names(cfg):
    return sorted(set(arcface_name_map(cfg).values()))
