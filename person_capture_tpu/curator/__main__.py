"""Curator CLI — mirrors the reference's ``dataset_curator._main``
(dataset_curator.py:1718): curate a pool of crops against a reference photo.

    python -m person_capture_tpu.curator --pool DIR --out DIR --ref IMG \
        [--max-images N] [--fd-gate F] [--lambda F]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="person_capture_tpu.curator")
    ap.add_argument("--pool", required=True, help="directory of crops")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ref", required=True, help="reference photo(s), ';'-sep")
    ap.add_argument("--max-images", type=int, default=200)
    ap.add_argument("--fd-gate", type=float, default=0.45)
    ap.add_argument("--lambda", dest="lam", type=float, default=0.70)
    ap.add_argument("--no-clip", action="store_true",
                    help="skip CLIP background embeddings")
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--scrfd-weights", default="auto",
                    help=".npz checkpoint | auto (bundled) | random")
    ap.add_argument("--arcface-weights", default="auto",
                    help=".npz checkpoint | auto (bundled) | random")
    args = ap.parse_args(argv)

    import numpy as np

    from ..core.bank import RefBank
    from ..models import arcface as AF
    from ..models.zoo import bundled_weights_path, resolve_weights
    from ..pipeline.backends import ClipReidBackend, ScrfdArcFaceBackend
    from .core import Curator

    # real weights like the main CLI (main.py resolve path) — a silent
    # random-init SCRFD/ArcFace can never find or identify the reference
    # face, so the zoo resolution is mandatory here too
    arc_name = ("arcface_synth" if bundled_weights_path("arcface_synth")
                else "w600k_r50")
    backend = ScrfdArcFaceBackend(
        arcface_cfg=AF.CONFIGS.get(arc_name, AF.W600K_R50),
        det_size=args.det_size,
        scrfd_weights=resolve_weights(args.scrfd_weights, "scrfd_2.5g"),
        arcface_weights=resolve_weights(args.arcface_weights, arc_name))
    if args.no_clip:
        clip_backend = None
    else:
        # bundled trained tower via the shared zoo resolution — a
        # random-init ViT-L made CLIP scene clustering noise
        from ..main import resolve_reid

        reid_cfg, reid_w = resolve_reid("ViT-L-14", "auto")
        clip_backend = ClipReidBackend(cfg=reid_cfg, weights=reid_w)

    bank = RefBank(cap=16)
    import cv2
    for p in args.ref.split(";"):
        if not p:
            continue
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            print(f"cannot read reference: {p}", file=sys.stderr)
            return 1
        from ..pipeline.backends import extract_single_image

        out = extract_single_image(backend, img)
        mask = out["mask"][0]
        if mask.any():
            j = int(np.argmax(np.where(mask, out["quality"][0], -1.0)))
            bank.update(out["feats"][0][j], float(out["quality"][0][j]))
    if bank.size == 0:
        print("no face found in reference photo(s)", file=sys.stderr)
        return 1

    cur = Curator(backend, bank, clip_backend=clip_backend,
                  progress=lambda phase, done, total:
                  print(f"[curate] {phase} {done}/{total}"))
    res = cur.run(args.pool, args.out, max_images=args.max_images,
                  fd_gate=args.fd_gate, lam=args.lam)
    m = res["metrics"]
    print(f"selected {m['selected']}/{m['pool']} "
          f"(scenes={m['scenes']}, mean_q={m['mean_quality']:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
