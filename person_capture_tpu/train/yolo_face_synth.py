"""Train the YOLOv8-face detector (5-point landmarks) on synthetic scenes.

The reference's alternate face backend is a YOLOv8-face ONNX
(person_capture/face_embedder.py:36-51); this trainer produces bundled
weights for the clean flax equivalent (models/yolov8.py kpt head) using
the same synthetic face scenes as train/scrfd_synth.py: DFL box loss +
focal single-class score + L1 landmark regression in the pose-decode
parameterization + visibility BCE.

CLI:
    python -m person_capture_tpu.train.yolo_face_synth \
        --cfg yolov8n_face --size 256 --batch 32 --steps 1500 \
        --out person_capture_tpu/weights/yolov8n_face_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict

import numpy as np

from .scenes import sample_batch
from .yolo_synth import build_targets


def make_loss_fn(model):
    import jax
    import jax.numpy as jnp
    import optax

    reg_max = model.cfg.reg_max
    n_pts, n_dims = model.cfg.kpt_shape

    def dfl_loss(box_logits, target):
        tl = jnp.floor(target)
        tr = tl + 1.0
        wl = tr - target
        wr = target - tl
        logp = jax.nn.log_softmax(box_logits, axis=-1)
        il = tl.astype(jnp.int32)
        ir = jnp.minimum(il + 1, reg_max - 1)
        ll = jnp.take_along_axis(logp, il[..., None], -1)[..., 0]
        lr = jnp.take_along_axis(logp, ir[..., None], -1)[..., 0]
        return -(wl * ll + wr * lr).mean(-1)

    def loss_fn(params, batch_stats, images_u8, targets):
        from ..ops.preprocess import normalize_yolo

        x = normalize_yolo(images_u8.astype(jnp.float32))
        levels, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.astype(model.dtype), train=True, mutable=["batch_stats"])
        total_pos = sum(t["pos"].sum() for t in targets)
        denom = jnp.maximum(total_pos.astype(jnp.float32), 1.0)
        cls_loss = box_loss = kps_loss = 0.0
        for (box_map, cls_map, kps_map), t in zip(levels, targets):
            bsz, h, w, _ = cls_map.shape
            logits = cls_map.astype(jnp.float32).reshape(bsz, h * w)
            cls_loss += optax.sigmoid_focal_loss(
                logits, t["labels"], alpha=0.25, gamma=2.0).sum()
            boxl = box_map.astype(jnp.float32).reshape(
                bsz, h * w, 4, reg_max)
            posf = t["pos"].astype(jnp.float32)
            box_loss += (dfl_loss(boxl, t["box_t"]) * posf).sum()
            kpl = kps_map.astype(jnp.float32).reshape(
                bsz, h * w, n_pts, n_dims)
            l1 = jnp.abs(kpl[..., :2] - t["kps_t"]).mean((-1, -2))
            kps_loss += (l1 * posf).sum()
            if n_dims >= 3:
                # synthetic landmarks are always visible → target 1
                vis_bce = optax.sigmoid_binary_cross_entropy(
                    kpl[..., 2], jnp.ones_like(kpl[..., 2])).mean(-1)
                kps_loss += 0.2 * (vis_bce * posf).sum()
        loss = (cls_loss + 1.5 * box_loss + 4.0 * kps_loss) / denom
        return loss, {"batch_stats": mut["batch_stats"],
                      "cls": cls_loss / denom, "box": box_loss / denom,
                      "kps": kps_loss / denom, "npos": total_pos}

    return loss_fn


def evaluate(model, variables, rng, size: int, batches: int = 4,
             batch: int = 16, conf: float = 0.35) -> Dict[str, float]:
    import jax.numpy as jnp

    from ..models.yolov8 import detect_faces_yolo

    from .common import match_detections

    tp = fp = fn = 0
    kp_err = []
    for _ in range(batches):
        data = sample_batch(rng, batch, size)
        det = detect_faces_yolo(
            model, variables, jnp.asarray(data["images"].astype(np.float32)),
            jnp.ones(batch, np.float32), conf)
        btp, bfp, bfn, errs = match_detections(
            np.asarray(det["boxes"]), np.asarray(det["mask"]),
            data["boxes"], data["gt_mask"], iou_thresh=0.5,
            kps=np.asarray(det["kps"]), gt_kps=data["kps"])
        tp += btp
        fp += bfp
        fn += bfn
        kp_err.extend(errs)
    return {"recall": tp / max(tp + fn, 1),
            "precision": tp / max(tp + fp, 1),
            "kps_err": float(np.mean(kp_err)) if kp_err else 9.0}


def train(cfg_name: str = "yolov8n_face", size: int = 256, batch: int = 32,
          steps: int = 1500, lr: float = 2e-3, seed: int = 0,
          out: str = "", log_every: int = 50, eval_every: int = 250,
          dtype_name: str = "float32", ckpt_dir: str = "",
          ckpt_every: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import yolov8 as Y
    from ..tools.weights import save_npz_variables

    cfg = Y.CONFIGS[cfg_name]
    assert cfg.kpt_shape[0], f"{cfg_name} has no keypoint head"
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model, variables = Y.init_yolo(jax.random.PRNGKey(seed), cfg,
                                   size=size, dtype=dtype)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1),
        decay_steps=steps, end_value=lr * 0.02)
    tx = optax.adamw(sched, weight_decay=1e-4)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    loss_fn = make_loss_fn(model)

    @jax.jit
    def step_fn(state, images_u8, targets):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], images_u8, targets)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "batch_stats": aux["batch_stats"],
                 "opt_state": opt_state},
                {"loss": loss, "cls": aux["cls"], "box": aux["box"],
                 "kps": aux["kps"], "npos": aux["npos"]})

    from .ckpt import (latest_checkpoint, restore_checkpoint,
                       save_checkpoint, step_rng)

    start_step = 0
    if ckpt_dir:
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            ck_step, ck_path = latest
            state = restore_checkpoint(ck_path, state)
            start_step = ck_step
            print(f"resumed from {ck_path} (step {start_step})", flush=True)

    eval_rng = np.random.default_rng(seed + 10_000)
    t0 = time.time()
    for i in range(start_step, steps):
        data = sample_batch(step_rng(seed, i), batch, size)
        targets = build_targets(data["boxes"], data["gt_mask"], size,
                                cfg.strides, cfg.reg_max, kps=data["kps"])
        state, metrics = step_fn(state, data["images"], targets)
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i + 1}/{steps} loss={m['loss']:.4f} "
                  f"cls={m['cls']:.4f} box={m['box']:.4f} "
                  f"kps={m['kps']:.4f} npos={m['npos']:.0f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if eval_every and (i + 1) % eval_every == 0:
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}
            ev = evaluate(model, variables, eval_rng, size)
            print(f"  eval: recall={ev['recall']:.3f} "
                  f"precision={ev['precision']:.3f} "
                  f"kps_err={ev['kps_err']:.4f}", flush=True)
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, i + 1, state)

    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    final = evaluate(model, variables, eval_rng, size)
    print(f"final eval: {final}", flush=True)
    if out:
        host = jax.device_get(variables)
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), host)
        save_npz_variables(out, host)
        print(f"saved {out}")
    return variables, final


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="yolo_face_synth")
    ap.add_argument("--cfg", default="yolov8n_face")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--platform", default="")
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--ckpt-every", type=int, default=250)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    train(args.cfg, args.size, args.batch, args.steps, args.lr, args.seed,
          args.out, dtype_name=args.dtype, ckpt_dir=args.ckpt_dir,
          ckpt_every=args.ckpt_every)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
