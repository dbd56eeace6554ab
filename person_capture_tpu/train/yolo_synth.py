"""Train the YOLOv8 person detector on synthetic person scenes.

Same recipe as train/scrfd_synth.py, adapted to the YOLOv8 head
(models/yolov8.py): anchor-free one-point-per-cell assignment with center
sampling and FCOS level ranges, distribution-focal-loss (DFL) on the
per-side bin distributions the DFL decode expects, focal loss on the
80-class sigmoid scores (person = class 0; the class count stays at 80 so
real ultralytics checkpoints keep mapping 1:1).

CLI:
    python -m person_capture_tpu.train.yolo_synth \
        --cfg yolov8n --size 256 --batch 32 --steps 1500 \
        --out person_capture_tpu/weights/yolov8n_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, List, Sequence

import numpy as np

from .scenes import sample_person_batch

LEVEL_HI = (64.0, 128.0, 1e9)


def build_targets(boxes: np.ndarray, gt_mask: np.ndarray, size: int,
                  strides: Sequence[int] = (8, 16, 32),
                  reg_max: int = 16, center_radius: float = 1.5,
                  kps: np.ndarray = None
                  ) -> List[Dict[str, np.ndarray]]:
    """Per-level dense targets. Cell centers at (i+0.5)*stride (matching
    models/yolov8.decode_level). Returns per level: ``labels [B, L]``,
    ``box_t [B, L, 4]`` ltrb in stride units (clipped to the DFL bin
    range), ``pos [B, L]``; with ``kps [B, G, 5, 2]`` given, also
    ``kps_t [B, L, 5, 2]`` in the pose-decode parameterization
    ``t = ((p - center)/stride + 0.5) / 2`` (models/yolov8.
    decode_kpts_level inverts this)."""
    b, g = gt_mask.shape
    gx1, gy1, gx2, gy2 = (boxes[..., i] for i in range(4))
    gcx, gcy = (gx1 + gx2) / 2, (gy1 + gy2) / 2
    areas = np.where(gt_mask, (gx2 - gx1) * (gy2 - gy1), np.inf)
    maxdim = np.maximum(gx2 - gx1, gy2 - gy1)
    out = []
    for li, s in enumerate(strides):
        lo = 0.0 if li == 0 else LEVEL_HI[li - 1]
        hi = LEVEL_HI[li]
        n = size // s
        ys, xs = np.meshgrid((np.arange(n) + 0.5) * s,
                             (np.arange(n) + 0.5) * s, indexing="ij")
        cx = xs.reshape(-1).astype(np.float32)
        cy = ys.reshape(-1).astype(np.float32)
        l = cx[None, :, None] - gx1[:, None, :]
        t = cy[None, :, None] - gy1[:, None, :]
        r = gx2[:, None, :] - cx[None, :, None]
        btm = gy2[:, None, :] - cy[None, :, None]
        ltrb = np.stack([l, t, r, btm], -1)
        inside = ltrb.min(-1) > 0.01
        maxd = ltrb.max(-1)
        in_range = (maxd > lo) & (maxd <= hi)
        in_center = ((np.abs(cx[None, :, None] - gcx[:, None, :])
                      <= center_radius * s)
                     & (np.abs(cy[None, :, None] - gcy[:, None, :])
                        <= center_radius * s))
        cand = inside & in_range & in_center & gt_mask[:, None, :]
        cost = np.where(cand, areas[:, None, :], np.inf)
        g_best = cost.argmin(-1)
        pos = cand.any(-1)

        gt_level = (maxdim > lo) & (maxdim <= hi) & gt_mask
        has_pos = np.zeros((b, g), bool)
        bi = np.arange(b)[:, None]
        np.logical_or.at(has_pos, (np.repeat(bi, pos.shape[1], 1)[pos],
                                   g_best[pos]), True)
        need = gt_level & ~has_pos
        if need.any():
            d2 = ((cx[None, :, None] - gcx[:, None, :]) ** 2
                  + (cy[None, :, None] - gcy[:, None, :]) ** 2)
            nearest = d2.argmin(1)
            for bb, gg in zip(*np.nonzero(need)):
                loc = nearest[bb, gg]
                pos[bb, loc] = True
                g_best[bb, loc] = gg

        box_t = np.take_along_axis(
            ltrb, g_best[:, :, None, None].repeat(4, -1), 2)[:, :, 0] / s
        box_t = np.clip(box_t, 0.0, reg_max - 1 - 1e-3)
        level = {
            "labels": pos.astype(np.float32),
            "box_t": box_t.astype(np.float32),
            "pos": pos,
        }
        if kps is not None:
            bi_full = np.arange(b)[:, None]
            kp_sel = kps[bi_full, g_best]                 # [B, L, 5, 2]
            center = np.stack([cx, cy], -1)[None, :, None, :]
            level["kps_t"] = (((kp_sel - center) / s + 0.5) / 2.0
                              ).astype(np.float32)
        out.append(level)
    return out


def make_loss_fn(model):
    import jax
    import jax.numpy as jnp
    import optax

    reg_max = model.cfg.reg_max

    def dfl_loss(box_logits, target):
        """Distribution focal loss: CE toward the two bins bracketing the
        continuous ltrb target (per side)."""
        # box_logits [N, 4, reg_max]; target [N, 4] in [0, reg_max-1)
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
        cls_loss = box_loss = 0.0
        for (box_map, cls_map), t in zip(levels, targets):
            bsz, h, w, _ = cls_map.shape
            logits = cls_map.astype(jnp.float32).reshape(bsz, h * w, -1)
            person = logits[..., 0]
            focal = optax.sigmoid_focal_loss(person, t["labels"],
                                             alpha=0.25, gamma=2.0)
            # non-person classes trained to 0 (weak weight keeps them dead)
            bg = optax.sigmoid_binary_cross_entropy(
                logits[..., 1:], jnp.zeros_like(logits[..., 1:])).mean(-1)
            cls_loss += focal.sum() + 0.02 * bg.sum()
            boxl = box_map.astype(jnp.float32).reshape(
                bsz, h * w, 4, model.cfg.reg_max)
            posf = t["pos"].astype(jnp.float32)
            box_loss += (dfl_loss(boxl, t["box_t"]) * posf).sum()
        loss = (cls_loss + 1.5 * box_loss) / denom
        return loss, {"batch_stats": mut["batch_stats"],
                      "cls": cls_loss / denom, "box": box_loss / denom,
                      "npos": total_pos}

    return loss_fn


def evaluate(model, variables, rng, size: int, batches: int = 4,
             batch: int = 16, conf: float = 0.35) -> Dict[str, float]:
    import jax.numpy as jnp

    from ..models.yolov8 import detect_persons

    from .common import match_detections

    tp = fp = fn = 0
    for _ in range(batches):
        data = sample_person_batch(rng, batch, size)
        det = detect_persons(model, variables,
                             jnp.asarray(data["images"].astype(np.float32)),
                             jnp.ones(batch, np.float32), conf)
        btp, bfp, bfn, _ = match_detections(
            np.asarray(det["boxes"]), np.asarray(det["mask"]),
            data["boxes"], data["gt_mask"], iou_thresh=0.5)
        tp += btp
        fp += bfp
        fn += bfn
    return {"recall": tp / max(tp + fn, 1),
            "precision": tp / max(tp + fp, 1)}


def train(cfg_name: str = "yolov8n", size: int = 256, batch: int = 32,
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
                 "npos": aux["npos"]})

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
        data = sample_person_batch(step_rng(seed, i), batch, size)
        targets = build_targets(data["boxes"], data["gt_mask"], size,
                                cfg.strides, cfg.reg_max)
        state, metrics = step_fn(state, data["images"], targets)
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i + 1}/{steps} loss={m['loss']:.4f} "
                  f"cls={m['cls']:.4f} box={m['box']:.4f} "
                  f"npos={m['npos']:.0f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if eval_every and (i + 1) % eval_every == 0:
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}
            ev = evaluate(model, variables, eval_rng, size)
            print(f"  eval: recall={ev['recall']:.3f} "
                  f"precision={ev['precision']:.3f}", flush=True)
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
    ap = argparse.ArgumentParser(prog="yolo_synth")
    ap.add_argument("--cfg", default="yolov8n")
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
