"""Train the SCRFD face detector on synthetic scenes.

FCOS/SCRFD-style training for the clean flax SCRFD (models/scrfd.py):
anchor-free center-sampled assignment over the 3 FPN levels, focal loss on
the per-anchor sigmoid scores, smooth-L1 on stride-normalized ltrb box
distances and 5-pt landmark offsets — matching the decode semantics the
inference path already implements (models/layers.py:distance2bbox/
distance2kps, reference face_embedder.py:2163-2482).

The train step is one jitted program (forward + grads + adamw update +
batch-stats update); with a mesh it runs data-parallel via shardings
(parallel/mesh.py:build_sharded_train_step). Host-side scene generation
(train/scenes.py) overlaps with device compute through JAX async dispatch.

CLI:
    python -m person_capture_tpu.train.scrfd_synth \
        --cfg scrfd_2.5g --size 256 --batch 32 --steps 1500 \
        --out person_capture_tpu/weights/scrfd_2.5g_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .scenes import MAX_GT, sample_batch

LEVEL_HI = (64.0, 128.0, 1e9)  # FCOS ranges on max ltrb distance (pixels)


# ---------------------------------------------------------------- targets

def build_targets(boxes: np.ndarray, kps: np.ndarray, gt_mask: np.ndarray,
                  size: int, strides: Sequence[int] = (8, 16, 32),
                  num_anchors: int = 2, center_radius: float = 1.5
                  ) -> List[Dict[str, np.ndarray]]:
    """Per-level dense targets for a batch of scenes.

    Anchor order matches models/scrfd.decode_level: row-major (y, x) grid,
    ``num_anchors`` consecutive slots per location.

    Returns per level: ``labels [B, L]`` float {0,1}, ``box_t [B, L, 4]``
    ltrb in stride units, ``kps_t [B, L, 10]`` offsets in stride units,
    ``pos [B, L]`` bool — L = (size/s)^2 * num_anchors.
    """
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
        ys, xs = np.meshgrid(np.arange(n) * s, np.arange(n) * s,
                             indexing="ij")
        cx = xs.reshape(-1).astype(np.float32)  # [L0] locations (no anchors)
        cy = ys.reshape(-1).astype(np.float32)
        l = cx[None, :, None] - gx1[:, None, :]          # [B, L0, G]
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
        g_best = cost.argmin(-1)                          # [B, L0]
        pos = cand.any(-1)

        # rescue: a GT whose scale belongs to this level but that captured
        # no location (sub-grid faces / lost argmin) gets its nearest center
        gt_level = (maxdim > lo) & (maxdim <= hi) & gt_mask
        has_pos = np.zeros((b, g), bool)
        bi = np.arange(b)[:, None]
        np.logical_or.at(has_pos, (np.repeat(bi, pos.shape[1], 1)[pos],
                                   g_best[pos]), True)
        need = gt_level & ~has_pos
        if need.any():
            d2 = ((cx[None, :, None] - gcx[:, None, :]) ** 2
                  + (cy[None, :, None] - gcy[:, None, :]) ** 2)
            nearest = d2.argmin(1)                        # [B, G]
            for bb, gg in zip(*np.nonzero(need)):
                loc = nearest[bb, gg]
                pos[bb, loc] = True
                g_best[bb, loc] = gg

        sel = g_best                                      # [B, L0]
        box_t = np.take_along_axis(
            ltrb, sel[:, :, None, None].repeat(4, -1), 2)[:, :, 0] / s
        kp_sel = kps[bi, sel]                             # [B, L0, 5, 2]
        kp_off = (kp_sel - np.stack([cx, cy], -1)[None, :, None, :]) / s
        kps_t = kp_off.reshape(b, -1, 10)

        a = num_anchors
        out.append({
            "labels": np.repeat(pos.astype(np.float32), a, 1),
            "box_t": np.repeat(box_t.astype(np.float32), a, 1),
            "kps_t": np.repeat(kps_t.astype(np.float32), a, 1),
            "pos": np.repeat(pos, a, 1),
        })
    return out


# ----------------------------------------------------------------- losses

def make_loss_fn(model):
    import jax.numpy as jnp
    import optax

    a = model.cfg.num_anchors

    def loss_fn(params, batch_stats, images_u8, targets):
        from ..ops.preprocess import normalize_scrfd

        x = normalize_scrfd(images_u8.astype(jnp.float32))
        levels, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.astype(model.dtype), train=True, mutable=["batch_stats"])
        total_pos = sum(t["pos"].sum() for t in targets)
        denom = jnp.maximum(total_pos.astype(jnp.float32), 1.0)
        cls_loss = box_loss = kps_loss = 0.0
        for (cls_map, bbox_map, kps_map), t in zip(levels, targets):
            bsz, h, w, _ = cls_map.shape
            logits = cls_map.astype(jnp.float32).reshape(bsz, h * w * a)
            dists = bbox_map.astype(jnp.float32).reshape(bsz, h * w * a, 4)
            offs = kps_map.astype(jnp.float32).reshape(bsz, h * w * a, 10)
            focal = optax.sigmoid_focal_loss(logits, t["labels"],
                                             alpha=0.25, gamma=2.0)
            cls_loss += focal.sum()
            posf = t["pos"].astype(jnp.float32)
            box_loss += (optax.huber_loss(dists, t["box_t"], delta=1.0)
                         .mean(-1) * posf).sum()
            kps_loss += (optax.huber_loss(offs, t["kps_t"], delta=1.0)
                         .mean(-1) * posf).sum()
        loss = (cls_loss + 2.0 * box_loss + 0.4 * kps_loss) / denom
        aux = {"batch_stats": mut["batch_stats"], "cls": cls_loss / denom,
               "box": box_loss / denom, "kps": kps_loss / denom,
               "npos": total_pos}
        return loss, aux

    return loss_fn


def make_train_step(model, tx):
    import jax

    loss_fn = make_loss_fn(model)

    @jax.jit
    def step(state, images_u8, targets):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], images_u8, targets)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        import optax
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "batch_stats": aux["batch_stats"],
                     "opt_state": opt_state}
        metrics = {"loss": loss, "cls": aux["cls"], "box": aux["box"],
                   "kps": aux["kps"], "npos": aux["npos"]}
        return new_state, metrics

    return step


# ------------------------------------------------------------------- eval

def evaluate(model, variables, rng, size: int, batches: int = 4,
             batch: int = 16, score_thresh: float = 0.5,
             iou_thresh: float = 0.5) -> Dict[str, float]:
    """Recall / precision / kps error on held-out scenes."""
    import jax.numpy as jnp

    from ..models.scrfd import detect_faces

    from .common import match_detections

    tp = fp = fn = 0
    kp_err: List[float] = []
    for _ in range(batches):
        data = sample_batch(rng, batch, size)
        det = detect_faces(model, variables,
                           jnp.asarray(data["images"].astype(np.float32)),
                           jnp.ones(batch, np.float32), score_thresh)
        btp, bfp, bfn, errs = match_detections(
            np.asarray(det["boxes"]), np.asarray(det["mask"]),
            data["boxes"], data["gt_mask"], iou_thresh=iou_thresh,
            kps=np.asarray(det["kps"]), gt_kps=data["kps"])
        tp += btp
        fp += bfp
        fn += bfn
        kp_err.extend(errs)
    return {
        "recall": tp / max(tp + fn, 1),
        "precision": tp / max(tp + fp, 1),
        "kps_err": float(np.mean(kp_err)) if kp_err else 9.0,
    }


# ------------------------------------------------------------------ train

def train(cfg_name: str = "scrfd_2.5g", size: int = 256, batch: int = 32,
          steps: int = 1500, lr: float = 2e-3, seed: int = 0,
          out: str = "", log_every: int = 50, eval_every: int = 250,
          dtype_name: str = "float32", ckpt_dir: str = "",
          ckpt_every: int = 0) -> Tuple[dict, Dict[str, float]]:
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import scrfd as SD
    from ..tools.weights import save_npz_variables

    cfg = SD.CONFIGS[cfg_name]
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model, variables = SD.init_scrfd(jax.random.PRNGKey(seed), cfg,
                                     size=size, dtype=dtype)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1),
        decay_steps=steps, end_value=lr * 0.02)
    tx = optax.adamw(sched, weight_decay=1e-4)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    step_fn = make_train_step(model, tx)

    # checkpoint/resume: restore the full train state (params + bn stats +
    # optimizer) and continue at the saved step; the per-step data rng
    # keeps the sample stream identical to the uninterrupted run
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
    pending = None
    for i in range(start_step, steps):
        data = sample_batch(step_rng(seed, i), batch, size)
        targets = build_targets(data["boxes"], data["kps"], data["gt_mask"],
                                size, cfg.strides, cfg.num_anchors)
        state, metrics = step_fn(state, data["images"], targets)
        if (i + 1) % log_every == 0:
            # fetching metrics syncs the device; do it rarely
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i + 1}/{steps} loss={m['loss']:.4f} "
                  f"cls={m['cls']:.4f} box={m['box']:.4f} "
                  f"kps={m['kps']:.4f} npos={m['npos']:.0f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
        if eval_every and (i + 1) % eval_every == 0:
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}
            ev = evaluate(model, variables, eval_rng, size)
            print(f"  eval: recall={ev['recall']:.3f} "
                  f"precision={ev['precision']:.3f} "
                  f"kps_err={ev['kps_err']:.4f}", flush=True)
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, i + 1, state)
        pending = metrics

    del pending
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
    ap = argparse.ArgumentParser(prog="scrfd_synth")
    ap.add_argument("--cfg", default="scrfd_2.5g")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--platform", default="",
                    help="force jax platform (e.g. cpu) before backend init")
    ap.add_argument("--ckpt-dir", default="",
                    help="orbax checkpoint dir; resumes automatically from "
                         "the latest step when present")
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
