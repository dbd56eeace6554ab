"""Train the face embedder on synthetic identities (ArcFace margin loss).

Identities are parameterized renderings (face color, dot color, ellipse
aspect); chips are augmented with shift/scale/rotation/brightness/noise/
blur so the embedding keys on identity factors, not nuisance ones. The
margin head follows the ArcFace formulation the reference's checkpoints
were trained with (additive angular margin on normalized logits); the
embedding path is the production one (models/arcface.encode_chips
semantics: same normalization, same arch family).

CLI:
    python -m person_capture_tpu.train.arcface_synth \
        --cfg arcface_synth --steps 1500 \
        --out person_capture_tpu/weights/arcface_synth.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CHIP = 112


def make_identities(rng, n: int) -> Dict[str, np.ndarray]:
    """Identity factor table: face color, dot color, aspect."""
    colors = rng.integers(40, 256, (n, 3))
    keep = colors.sum(1) >= 220
    colors[~keep] += 60
    return {
        "color": np.clip(colors, 0, 255).astype(np.int32),
        "dot": rng.integers(0, 60, (n, 3)).astype(np.int32),
        "aspect": rng.uniform(0.85, 1.2, n).astype(np.float32),
    }


def render_chip(rng, ident: Dict[str, np.ndarray], idx: int) -> np.ndarray:
    """One augmented 112×112 BGR chip of identity ``idx``."""
    from .scenes import kps_from_box

    img = np.full((CHIP, CHIP, 3), int(rng.integers(15, 110)), np.uint8)
    img += rng.integers(0, 16, (CHIP, CHIP, 3), dtype=np.uint8)
    s = float(rng.uniform(0.70, 1.00)) * CHIP
    cx = CHIP / 2 + float(rng.uniform(-6, 6))
    cy = CHIP / 2 + float(rng.uniform(-6, 6))
    a = float(ident["aspect"][idx])
    fw, fh = s, s * a
    box = np.array([cx - fw / 2, cy - fh / 2, cx + fw / 2, cy + fh / 2],
                   np.float32)
    color = tuple(int(v) for v in ident["color"][idx])
    dot = tuple(int(v) for v in ident["dot"][idx])
    x1, y1, x2, y2 = (int(round(v)) for v in box)
    ax, ay = max(2, (x2 - x1) // 2), max(2, (y2 - y1) // 2)
    cv2.ellipse(img, (int(cx), int(cy)), (ax, ay), 0, 0, 360, color, -1)
    for px, py in kps_from_box(box):
        cv2.circle(img, (int(px), int(py)), max(1, ax // 8), dot, -1)
    # nuisance augmentation
    if rng.random() < 0.5:
        ang = float(rng.uniform(-12, 12))
        m = cv2.getRotationMatrix2D((CHIP / 2, CHIP / 2), ang, 1.0)
        img = cv2.warpAffine(img, m, (CHIP, CHIP),
                             borderMode=cv2.BORDER_REFLECT)
    if rng.random() < 0.4:
        img = cv2.GaussianBlur(img, (3, 3), 0)
    gain = float(rng.uniform(0.7, 1.3))
    bias = float(rng.uniform(-20, 20))
    img = np.clip(img.astype(np.float32) * gain + bias, 0, 255)
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def sample_chip_batch(rng, ident, batch: int):
    n = len(ident["aspect"])
    labels = rng.integers(0, n, batch)
    chips = np.stack([render_chip(rng, ident, int(k)) for k in labels])
    return chips, labels.astype(np.int32)


def make_train_step(model, tx, num_classes: int, margin: float = 0.3,
                    scale: float = 24.0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..ops.preprocess import normalize_arcface

    def loss_fn(params, wclass, batch_stats, chips_u8, labels):
        x = normalize_arcface(chips_u8.astype(jnp.float32))
        emb, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.astype(model.dtype), train=True, mutable=["batch_stats"])
        emb = emb.astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1,
                                                keepdims=True), 1e-10)
        w = wclass / jnp.maximum(jnp.linalg.norm(wclass, axis=-1,
                                                 keepdims=True), 1e-10)
        cos = emb @ w.T                       # [B, C]
        theta = jnp.arccos(jnp.clip(cos, -1 + 1e-6, 1 - 1e-6))
        onehot = jax.nn.one_hot(labels, num_classes)
        logits = scale * jnp.where(onehot > 0, jnp.cos(theta + margin), cos)
        loss = optax.softmax_cross_entropy(logits, onehot).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, {"batch_stats": mut["batch_stats"], "acc": acc}

    @jax.jit
    def step(state, chips_u8, labels):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state["params"], state["wclass"], state["batch_stats"],
            chips_u8, labels)
        updates, opt_state = tx.update(
            {"params": grads[0], "wclass": grads[1]}, state["opt_state"],
            {"params": state["params"], "wclass": state["wclass"]})
        import optax as _optax
        new = _optax.apply_updates({"params": state["params"],
                                    "wclass": state["wclass"]}, updates)
        return ({"params": new["params"], "wclass": new["wclass"],
                 "batch_stats": aux["batch_stats"],
                 "opt_state": opt_state},
                {"loss": loss, "acc": aux["acc"]})

    return step


def evaluate(model, variables, rng, n_ident: int = 24,
             chips_per: int = 6) -> Dict[str, float]:
    """Intra vs inter identity cosine separation on held-out identities."""
    from ..models.arcface import encode_chips

    ident = make_identities(rng, n_ident)
    feats = []
    for i in range(n_ident):
        chips = np.stack([render_chip(rng, ident, i)
                          for _ in range(chips_per)])
        feats.append(np.asarray(encode_chips(model, variables, chips,
                                             flip_tta=False)))
    intra, inter = [], []
    for i in range(n_ident):
        f = feats[i]
        sims = f @ f.T
        iu = np.triu_indices(chips_per, 1)
        intra.extend(sims[iu].tolist())
        for j in range(i + 1, n_ident):
            inter.extend((f @ feats[j].T).reshape(-1).tolist())
    intra = np.asarray(intra)
    inter = np.asarray(inter)
    # threshold on cosine DISTANCE (1 - cos), as the pipeline's fd
    thresholds = np.linspace(0.0, 1.0, 201)
    best_t, best_err = 0.5, 1.0
    for t in thresholds:
        far = float((1.0 - inter <= t).mean())   # impostors accepted
        frr = float((1.0 - intra > t).mean())    # genuine rejected
        err = max(far, frr)
        if err < best_err:
            best_err, best_t = err, float(t)
    return {"intra_cos": float(intra.mean()),
            "inter_cos": float(inter.mean()),
            "eer": best_err, "fd_threshold": best_t}


def train(cfg_name: str = "arcface_synth", batch: int = 48,
          steps: int = 1500, lr: float = 1e-3, seed: int = 0,
          num_ident: int = 256, out: str = "", log_every: int = 50,
          eval_every: int = 300, dtype_name: str = "float32",
          ckpt_dir: str = "", ckpt_every: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import arcface as AF
    from ..tools.weights import save_npz_variables

    cfg = AF.CONFIGS[cfg_name]
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model, variables = AF.init_arcface(jax.random.PRNGKey(seed), cfg,
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
             "batch_stats": variables["batch_stats"],
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

    eval_rng = np.random.default_rng(seed + 77)
    t0 = time.time()
    for i in range(start_step, steps):
        chips, labels = sample_chip_batch(step_rng(seed, i), ident, batch)
        state, metrics = step_fn(state, chips, labels)
        if (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i + 1}/{steps} loss={m['loss']:.4f} "
                  f"acc={m['acc']:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if eval_every and (i + 1) % eval_every == 0:
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}
            ev = evaluate(model, variables, eval_rng)
            print(f"  eval: {ev}", flush=True)
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, i + 1, state)

    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
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
    ap = argparse.ArgumentParser(prog="arcface_synth")
    ap.add_argument("--cfg", default="arcface_synth")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=1500)
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
