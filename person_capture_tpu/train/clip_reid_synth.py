"""Train the CLIP ReID tower on synthetic person identities.

The reference's ReID embedder is a pretrained OpenCLIP ViT-L-14
(person_capture/reid_embedder.py:10-57) matching PERSON CROPS by cosine
distance. No egress exists here for open_clip checkpoints, so — exactly
like the face models — the zoo bundles a compact tower trained in-repo on
synthetic persons (video/synthetic.py:draw_person schema: torso + legs +
face head), where identity = clothing/leg/face colors and body build, and
the nuisance factors are crop framing, scale, partial visibility,
brightness, noise, blur and occlusion. The margin-softmax head mirrors
train/arcface_synth.py; evaluation is verification on HELD-OUT identities
(ReID must generalize to a never-seen target person).

CLI:
    python -m person_capture_tpu.train.clip_reid_synth \
        --steps 1200 --out person_capture_tpu/weights/clip_reid_s_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def make_identities(rng, n: int) -> Dict[str, np.ndarray]:
    """Identity factor table for schematic persons."""
    return {
        "clothing": rng.integers(40, 220, (n, 3)).astype(np.int32),
        "leg_drop": rng.integers(30, 90, n).astype(np.int32),
        "face": np.clip(rng.integers(40, 256, (n, 3)) + 30, 0,
                        255).astype(np.int32),
        "build": rng.uniform(0.25, 0.45, n).astype(np.float32),  # torso pad
        "torso_len": rng.uniform(2.0, 2.8, n).astype(np.float32),
    }


def render_person_crop(rng, ident: Dict[str, np.ndarray], idx: int,
                       size: int) -> np.ndarray:
    """One augmented person crop, preprocessed exactly like the production
    path (shortest side → ``size``, center crop — ClipReidBackend.extract)."""
    fw = float(rng.uniform(14, 26))
    fh = fw * float(rng.uniform(0.9, 1.15))
    build = float(ident["build"][idx])
    tlen = float(ident["torso_len"][idx])
    # canvas big enough for head + torso + legs with jittered margins
    ph = int(fh * (1.0 + tlen + 1.9) + rng.uniform(8, 26))
    pw = int(fw * (1.0 + 2 * build) + rng.uniform(10, 28))
    img = np.full((ph, pw, 3), int(rng.integers(15, 115)), np.uint8)
    img += rng.integers(0, 16, (ph, pw, 3), dtype=np.uint8)

    x1 = pw / 2 - fw / 2 + float(rng.uniform(-3, 3))
    y1 = float(rng.uniform(1, 6))
    x2, y2 = x1 + fw, y1 + fh
    clothing = tuple(int(v) for v in ident["clothing"][idx])
    drop = int(ident["leg_drop"][idx])
    dark = tuple(max(0, c - drop) for c in clothing)
    # torso + legs (video/synthetic.py:draw_person geometry, identity build)
    tx1, ty1 = int(x1 - build * fw), int(y2)
    tx2, ty2 = int(x2 + build * fw), int(min(ph, y2 + tlen * fh))
    cv2.rectangle(img, (tx1, ty1), (tx2, ty2), clothing, -1)
    ly2 = int(min(ph, y2 + (tlen + 1.8) * fh))
    mid = (tx1 + tx2) // 2
    cv2.rectangle(img, (tx1 + 1, ty2), (mid - 1, ly2), dark, -1)
    cv2.rectangle(img, (mid + 1, ty2), (tx2 - 1, ly2), dark, -1)
    # face head
    face = tuple(int(v) for v in ident["face"][idx])
    cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
    cv2.ellipse(img, (cx, cy), (max(2, int(fw / 2)), max(2, int(fh / 2))),
                0, 0, 360, face, -1)

    # nuisance: framing jitter (sloppy person boxes), partial visibility
    jy0 = int(rng.uniform(0, 0.12) * ph)
    jy1 = ph - int(rng.uniform(0, 0.25) * ph)
    jx0 = int(rng.uniform(0, 0.15) * pw)
    jx1 = pw - int(rng.uniform(0, 0.15) * pw)
    img = img[jy0:max(jy0 + 24, jy1), jx0:max(jx0 + 16, jx1)]
    if rng.random() < 0.25:  # occluder
        h, w = img.shape[:2]
        ox, oy = int(rng.integers(0, w)), int(rng.integers(0, h))
        s = int(rng.integers(4, max(6, w // 3)))
        cv2.rectangle(img, (ox, oy), (ox + s, oy + s),
                      tuple(int(v) for v in rng.integers(0, 256, 3)), -1)
    gain = float(rng.uniform(0.7, 1.3))
    bias = float(rng.uniform(-18, 18))
    img = np.clip(img.astype(np.float32) * gain + bias, 0, 255)
    img += rng.normal(0, 4, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if rng.random() < 0.3:
        img = cv2.GaussianBlur(img, (3, 3), 0)

    # production ingest: shortest side → size, center crop (backends.py)
    h, w = img.shape[:2]
    scale = size / min(h, w)
    nw, nh = max(size, int(w * scale)), max(size, int(h * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
    y0 = int(round((nh - size) / 2.0))
    x0 = int(round((nw - size) / 2.0))
    return img[y0:y0 + size, x0:x0 + size]


def sample_crop_batch(rng, ident, batch: int, size: int):
    n = len(ident["build"])
    labels = rng.integers(0, n, batch)
    crops = np.stack([render_person_crop(rng, ident, int(k), size)
                      for k in labels])
    return crops, labels.astype(np.int32)


def make_train_step(model, tx, num_classes: int, margin: float = 0.25,
                    scale: float = 20.0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..ops.preprocess import normalize_clip

    def loss_fn(params, wclass, crops_u8, labels):
        x = normalize_clip(crops_u8.astype(jnp.float32))
        emb = model.apply({"params": params},
                          x.astype(model.dtype)).astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1,
                                                keepdims=True), 1e-10)
        w = wclass / jnp.maximum(jnp.linalg.norm(wclass, axis=-1,
                                                 keepdims=True), 1e-10)
        cos = emb @ w.T
        theta = jnp.arccos(jnp.clip(cos, -1 + 1e-6, 1 - 1e-6))
        onehot = jax.nn.one_hot(labels, num_classes)
        logits = scale * jnp.where(onehot > 0, jnp.cos(theta + margin), cos)
        loss = optax.softmax_cross_entropy(logits, onehot).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, {"acc": acc}

    @jax.jit
    def step(state, crops_u8, labels):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state["params"], state["wclass"], crops_u8, labels)
        updates, opt_state = tx.update(
            {"params": grads[0], "wclass": grads[1]}, state["opt_state"],
            {"params": state["params"], "wclass": state["wclass"]})
        import optax as _optax

        new = _optax.apply_updates({"params": state["params"],
                                    "wclass": state["wclass"]}, updates)
        return ({"params": new["params"], "wclass": new["wclass"],
                 "opt_state": opt_state},
                {"loss": loss, "acc": aux["acc"]})

    return step


def evaluate(model, variables, rng, n_ident: int = 20,
             crops_per: int = 6) -> Dict[str, float]:
    """Verification on held-out identities: intra/inter cosine separation
    and the equal-error threshold on cosine DISTANCE (the pipeline's rd)."""
    from ..models.clip_vit import encode_images

    size = model.cfg.image_size
    ident = make_identities(rng, n_ident)
    feats = []
    for i in range(n_ident):
        crops = np.stack([render_person_crop(rng, ident, i, size)
                          for _ in range(crops_per)])
        feats.append(np.asarray(encode_images(model, variables, crops)))
    intra, inter = [], []
    for i in range(n_ident):
        f = feats[i]
        iu = np.triu_indices(crops_per, 1)
        intra.extend((f @ f.T)[iu].tolist())
        for j in range(i + 1, n_ident):
            inter.extend((f @ feats[j].T).reshape(-1).tolist())
    intra, inter = np.asarray(intra), np.asarray(inter)
    best_t, best_err = 0.5, 1.0
    for t in np.linspace(0.0, 1.0, 201):
        far = float((1.0 - inter <= t).mean())
        frr = float((1.0 - intra > t).mean())
        if max(far, frr) < best_err:
            best_err, best_t = max(far, frr), float(t)
    return {"intra_cos": float(intra.mean()),
            "inter_cos": float(inter.mean()),
            "eer": best_err, "rd_threshold": best_t}


def train(cfg_name: str = "clip_reid_s", batch: int = 48,
          steps: int = 1200, lr: float = 1e-3, seed: int = 0,
          num_ident: int = 256, out: str = "", log_every: int = 50,
          eval_every: int = 300, dtype_name: str = "float32",
          ckpt_dir: str = "", ckpt_every: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import clip_vit as CV
    from ..tools.weights import save_npz_variables

    cfg = CV.CONFIGS[cfg_name]
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model, variables = CV.init_clip(jax.random.PRNGKey(seed), cfg,
                                    dtype=dtype)
    rng = np.random.default_rng(seed)
    ident = make_identities(rng, num_ident)
    wclass = (rng.normal(size=(num_ident, cfg.embed_dim)) * 0.05
              ).astype(np.float32)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1),
        decay_steps=steps, end_value=lr * 0.02)
    tx = optax.adamw(sched, weight_decay=5e-5)
    state = {"params": variables["params"],
             "wclass": jnp.asarray(wclass),
             "opt_state": tx.init({"params": variables["params"],
                                   "wclass": jnp.asarray(wclass)})}
    step_fn = make_train_step(model, tx, num_ident)

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

    size = cfg.image_size
    eval_rng = np.random.default_rng(seed + 77)
    t0 = time.time()
    for i in range(start_step, steps):
        crops, labels = sample_crop_batch(step_rng(seed, i), ident, batch,
                                          size)
        state, metrics = step_fn(state, crops, labels)
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i + 1}/{steps} loss={m['loss']:.4f} "
                  f"acc={m['acc']:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if eval_every and (i + 1) % eval_every == 0:
            ev = evaluate(model, {"params": state["params"]}, eval_rng)
            print(f"  eval: {ev}", flush=True)
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, i + 1, state)

    variables = {"params": state["params"]}
    final = evaluate(model, variables, eval_rng)
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
    ap = argparse.ArgumentParser(prog="clip_reid_synth")
    ap.add_argument("--cfg", default="clip_reid_s")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--idents", type=int, default=256)
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
    train(args.cfg, args.batch, args.steps, args.lr, args.seed,
          args.idents, args.out, dtype_name=args.dtype,
          ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
