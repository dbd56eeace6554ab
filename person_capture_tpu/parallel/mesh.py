"""Device mesh + sharding for the fused pipeline programs.

The reference is a single-process single-GPU app (SURVEY.md §2.3); its
TPU-native parallelism story is new architecture: the frame batch is data-
parallel over the mesh's ``data`` axis, while wide model layers (ArcFace
embedding head, detector head channels) shard over an optional ``model``
axis. XLA inserts the collectives (psum for partial matmuls, all-gathers at
program edges) — no hand-written NCCL analogue exists or is needed.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: str) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
    """Parse ``"data:4,model:2"`` → (("data","model"), (4,2))."""
    names, sizes = [], []
    for part in (spec or "").split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"(\w+):(\d+)", part)
        if not m:
            raise ValueError(f"bad mesh spec element: {part!r}")
        names.append(m.group(1))
        sizes.append(int(m.group(2)))
    return tuple(names), tuple(sizes)


def make_mesh(spec: str = "", devices=None) -> Mesh:
    """Build a Mesh from a spec string; default: all devices on one
    ``data`` axis."""
    devices = devices if devices is not None else jax.devices()
    if not spec:
        return Mesh(np.asarray(devices), ("data",))
    names, sizes = parse_mesh_spec(spec)
    need = int(np.prod(sizes))
    if need > len(devices):
        raise ValueError(f"mesh {spec} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(arr, names)


def shard_params_for_tp(variables, mesh: Mesh, model_axis: str = "model"):
    """Place model variables on the mesh: Dense/Conv kernels whose output
    channel dim divides the model-axis size shard on that axis (tensor
    parallelism); everything else replicates."""
    if model_axis not in mesh.axis_names:
        return jax.device_put(variables, NamedSharding(mesh, P()))
    tp = mesh.shape[model_axis]

    def place(path, x):
        x = jnp.asarray(x)
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf == "kernel" and x.ndim >= 2 and x.shape[-1] % tp == 0:
            spec = P(*([None] * (x.ndim - 1) + [model_axis]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, variables)


def shard_batch(mesh: Mesh, data_axis: str = "data"):
    """NamedSharding putting a leading batch dim on the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def build_sharded_prescan_step(mesh: Mesh, scrfd_cfg=None, arcface_cfg=None,
                               det_size: int = 640, max_faces: int = 8,
                               dtype=None, seed: int = 0,
                               scrfd_vars=None, arcface_vars=None,
                               replicate_outputs: Optional[bool] = None):
    """Create the fused pre-scan step jitted over a mesh.

    Step signature: ``(frames_u8 [B,H,W,3], bank [K,D], bank_mask [K],
    score_thresh) -> (best_fd [B], per-face outputs)``. Frames shard over
    ``data``; the bank replicates; ArcFace wide kernels shard over ``model``
    when that axis exists.

    ``replicate_outputs`` gathers every output to all devices at the
    program edge (an XLA all-gather of the small per-frame results).
    Defaults to on exactly when the mesh spans multiple processes, where
    the host replay needs full results on every host (parallel/multihost).
    """
    from ..core.bank import fd_min_batch_jnp
    from ..models import arcface as AF
    from ..models import scrfd as SD
    from ..ops import align as AL
    from ..ops import quality as Q
    from ..ops.preprocess import letterbox_topleft

    scrfd_cfg = scrfd_cfg or SD.SCRFD_2_5G
    arcface_cfg = arcface_cfg or AF.W600K_R50
    dtype = dtype or jnp.bfloat16

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    from ..models import yolov8 as YV
    from ..models.onnx_zoo import (OnnxArcFaceEncoder, OnnxScrfdDetector,
                                   is_onnx_path)

    if is_onnx_path(scrfd_vars):
        # checkpoint-exact execution of the reference's own SCRFD .onnx —
        # the graph runs unchanged inside the sharded program, its params
        # replicated over the mesh (ONNX tensor names carry no TP layout)
        onnx_det = OnnxScrfdDetector(scrfd_vars, det_size=det_size,
                                     max_faces=max_faces)
        sv = onnx_det.params
        def detect_fn(vars_, padded, scales, st):
            return onnx_det.apply(vars_, padded, scales, st)
    elif isinstance(scrfd_cfg, YV.YoloConfig):
        # alternate YOLOv8-face detector (same output contract as SCRFD —
        # reference face_embedder.py:36-51); the step body is shared
        face_model, sv = YV.init_yolo(k1, scrfd_cfg, size=det_size,
                                      dtype=dtype)
        if scrfd_vars is not None:
            sv = scrfd_vars
        def detect_fn(vars_, padded, scales, st):
            return YV.detect_faces_yolo(face_model, vars_, padded, scales,
                                        st, max_faces)
    else:
        face_model, sv = SD.init_scrfd(k1, scrfd_cfg, size=det_size,
                                       dtype=dtype)
        if scrfd_vars is not None:
            sv = scrfd_vars
        def detect_fn(vars_, padded, scales, st):
            return SD.detect_faces(face_model, vars_, padded, scales,
                                   st, max_faces)

    if is_onnx_path(arcface_vars):
        onnx_enc = OnnxArcFaceEncoder(arcface_vars, flip_tta=False)
        av = onnx_enc.params
        embed_dim = onnx_enc.embed_dim
        def encode_fn(vars_, flat):
            return onnx_enc.apply(vars_, flat)
    else:
        arc_model, av = AF.init_arcface(k2, arcface_cfg, dtype=dtype)
        if arcface_vars is not None:
            av = arcface_vars
        embed_dim = arcface_cfg.embed_dim
        def encode_fn(vars_, flat):
            return AF.encode_chips(arc_model, vars_, flat, flip_tta=False)
    sv = shard_params_for_tp(sv, mesh)
    av = shard_params_for_tp(av, mesh)

    data_sh = shard_batch(mesh)
    repl = replicated(mesh)
    if replicate_outputs is None:
        from .multihost import is_multiprocess

        replicate_outputs = is_multiprocess()
    out_sh = repl if replicate_outputs else data_sh

    def step(scrfd_vars_, arc_vars_, frames_u8, bank, bank_mask, score_thresh):
        frames = frames_u8.astype(jnp.float32)
        padded, scales = jax.vmap(lambda f: letterbox_topleft(f, det_size))(frames)
        det = detect_fn(scrfd_vars_, padded, scales, score_thresh)
        chips = jax.vmap(
            lambda fr, kp, m: AL.align_chips_matmul_jnp(fr, kp, m))(
            frames, det["kps"], det["mask"])
        b, f = chips.shape[0], chips.shape[1]
        flat = chips.reshape(b * f, *chips.shape[2:])
        feats = encode_fn(arc_vars_, flat).reshape(b, f, -1)
        quality = Q.chip_quality(flat).reshape(b, f)
        per_face_fd, best_fd = fd_min_batch_jnp(feats, det["mask"], bank,
                                                bank_mask)
        return {"best_fd": best_fd, "per_face_fd": per_face_fd,
                "boxes": det["boxes"], "kps": det["kps"],
                "scores": det["scores"], "mask": det["mask"],
                "feats": feats, "quality": quality}

    jit_step = jax.jit(
        step,
        in_shardings=(None, None, data_sh, repl, repl, repl),
        out_shardings={"best_fd": out_sh, "per_face_fd": out_sh,
                       "boxes": out_sh, "kps": out_sh, "scores": out_sh,
                       "mask": out_sh, "feats": out_sh, "quality": out_sh},
    )

    from .multihost import make_global_batch, make_replicated

    def run(frames_u8, bank, bank_mask, score_thresh=0.5):
        # multi-process: each host uploads only the frame rows its devices
        # own; the bank replicates. Single-process: pass-throughs.
        frames_u8 = make_global_batch(mesh, frames_u8)
        bank = make_replicated(mesh, bank)
        bank_mask = make_replicated(mesh, bank_mask)
        return jit_step(sv, av, frames_u8, bank, bank_mask,
                        jnp.float32(score_thresh))

    run.scrfd_vars = sv
    run.arcface_vars = av
    run.mesh = mesh
    run.embed_dim = embed_dim
    return run


def build_sharded_fullframe_detect(mesh: Mesh, scrfd_cfg=None,
                                   det_size: int = 1408, max_faces: int = 8,
                                   dtype=None, seed: int = 0,
                                   scrfd_vars=None,
                                   spatial_axis: str = "model"):
    """SPATIALLY-sharded heavy-canvas SCRFD detection.

    The reference's heavy passes run the detector at imgsz 1408–2048 on one
    GPU (face_embedder.py:2204-2208 heavy_cap, gui_app.py:523 full-frame
    1408). The TPU-native scaling story for those canvases is spatial
    partitioning: the padded canvas batch [B, S, S, 3] shards over ``data``
    (B) AND the H dimension over ``spatial_axis``, so one huge frame's conv
    FLOPs split across chips with XLA-SPMD-inserted halo exchanges — no
    hand-written communication. Model params replicate (the canvas, not
    the weights, is what doesn't fit a single chip's step budget).

    Returns ``run(padded [B,S,S,3] float32, scales [B], score_thresh)`` →
    detection dict, all outputs sharded over ``data``.
    """
    from ..models import scrfd as SD

    scrfd_cfg = scrfd_cfg or SD.SCRFD_2_5G
    dtype = dtype or jnp.bfloat16
    model, sv = SD.init_scrfd(jax.random.PRNGKey(seed), scrfd_cfg,
                              size=det_size, dtype=dtype)
    if scrfd_vars is not None:
        sv = scrfd_vars
    sv = jax.device_put(sv, replicated(mesh))

    has_spatial = spatial_axis in mesh.axis_names
    frames_spec = P("data", spatial_axis) if has_spatial else P("data")
    frames_sh = NamedSharding(mesh, frames_spec)
    data_sh = shard_batch(mesh)
    repl = replicated(mesh)
    from .multihost import is_multiprocess, make_global_batch

    out_sh = repl if is_multiprocess() else data_sh

    def step(vars_, padded, scales, score_thresh):
        return SD.detect_faces(model, vars_, padded, scales, score_thresh,
                               max_faces)

    jit_step = jax.jit(
        step,
        in_shardings=(None, frames_sh, data_sh, repl),
        out_shardings={"boxes": out_sh, "kps": out_sh,
                       "scores": out_sh, "mask": out_sh})

    def run(padded, scales, score_thresh=0.5):
        if is_multiprocess():
            arr = np.asarray(padded)
            padded = jax.make_array_from_callback(
                arr.shape, frames_sh, lambda idx: arr[idx])
            scales = make_global_batch(mesh, scales)
        return jit_step(sv, padded, scales, jnp.float32(score_thresh))

    run.scrfd_vars = sv
    run.mesh = mesh
    run.spatial = has_spatial
    return run


def build_sharded_train_step(mesh: Mesh, scrfd_cfg=None, size: int = 128,
                             lr: float = 1e-3, seed: int = 0,
                             dtype=None):
    """SCRFD training step jitted over a mesh: the scene batch (images +
    dense targets) shards over ``data``; params/optimizer state shard wide
    kernels over ``model`` when present. XLA inserts the gradient psum over
    the data axis and the activation collectives for the tp-sharded
    kernels — the SPMD analogue of a DDP+TP trainer, with no hand-written
    collectives (SURVEY.md §2.3).

    Returns ``(step, state)`` with
    ``step(state, images_u8 [B,S,S,3], targets) -> (state, metrics)``.
    """
    import optax

    from ..models import scrfd as SD
    from ..train.scrfd_synth import make_loss_fn

    scrfd_cfg = scrfd_cfg or SD.TINY
    dtype = dtype or jnp.float32
    model, variables = SD.init_scrfd(jax.random.PRNGKey(seed), scrfd_cfg,
                                     size=size, dtype=dtype)
    tx = optax.adamw(lr, weight_decay=1e-4)
    params = shard_params_for_tp(variables["params"], mesh)
    batch_stats = jax.device_put(variables["batch_stats"],
                                 replicated(mesh))
    opt_state = jax.device_put(tx.init(jax.device_get(variables["params"])),
                               replicated(mesh))
    state = {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state}

    loss_fn = make_loss_fn(model)
    data_sh = shard_batch(mesh)

    def step(st, images_u8, targets):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st["params"], st["batch_stats"], images_u8, targets)
        updates, opt_state_ = tx.update(grads, st["opt_state"], st["params"])
        import optax as _optax

        new_params = _optax.apply_updates(st["params"], updates)
        new_state = {"params": new_params,
                     "batch_stats": aux["batch_stats"],
                     "opt_state": opt_state_}
        return new_state, {"loss": loss, "npos": aux["npos"]}

    target_sh = {"labels": data_sh, "box_t": data_sh, "kps_t": data_sh,
                 "pos": data_sh}
    jit_step = jax.jit(
        step,
        in_shardings=(None, data_sh, [target_sh] * len(scrfd_cfg.strides)),
        donate_argnums=(0,))
    return jit_step, state, model
