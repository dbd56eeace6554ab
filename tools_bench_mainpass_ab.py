"""A/B harness for the main-pass levers (VERDICT r3 next #1).

Runs the REAL ``Engine.run`` main pass (same fixture + config as
``bench.py``'s ``mainpass_realtime_x``) under several candidate configs,
interleaved round-robin so tunnel drift hits every variant equally, with
``tpu_profile`` per-stage timings captured per run.

Variants (selectable via --variants):
  base      832-wide analysis, batch 16, combined face+person program
  w704/w640 analysis upload width A/B (detector letterboxes to 640 anyway;
            only ArcFace chip fidelity is at stake — hits are reported so
            fd regressions show up as hit-count changes)
  noperson  face-only program (upper bound for host-gated person dispatch)
  b32       batch 32 at 832 (RPC amortization vs latency)
  slots2    embed_slots=2 on the combined program (VERDICT r3 next #1a)

Usage: python tools_bench_mainpass_ab.py [--reps 3] [--variants base,w640,...]
"""

from __future__ import annotations

import argparse
import json
import re
import tempfile
import time

import numpy as np

import bench  # fixture generator + phase logging


def _seed_bank_and_warm(backend, person, ref_png: str, analysis_w: int,
                        analysis_h: int, batch: int, use_person: bool):
    """Seed the identity bank through the exact program each variant
    dispatches (doubles as the compile warmup for that shape)."""
    import cv2

    from person_capture_tpu.core.bank import RefBank

    ref = cv2.imread(ref_png, cv2.IMREAD_COLOR)
    side = analysis_h
    ref_s = cv2.resize(ref, (side, side), interpolation=cv2.INTER_AREA)
    canvas = np.full((analysis_h, analysis_w, 3), 60, np.uint8)
    x0 = (analysis_w - side) // 2
    canvas[:, x0:x0 + side] = ref_s
    frames = np.repeat(canvas[None], batch, axis=0)
    valid = np.ones(batch, bool)
    if use_person:
        out, _ = backend.submit_wire_with_person(person, frames, valid)()
    else:
        out = backend.submit_batch(frames, valid)()
    mask = np.asarray(out["mask"][0])
    bank = RefBank(cap=64)
    if mask.any():
        j = int(np.argmax(np.where(mask, np.asarray(out["quality"][0]),
                                   -1.0)))
        bank.seed(np.asarray(out["feats"][0][j])[None])
    else:
        bench._phase("WARNING: no face in warm frame — bank empty")
    return bank


def run_variant(video: str, backend, person, bank, *, analysis_w: int,
                batch: int, use_person: bool):
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.pipeline.engine import Engine

    msgs = []
    with tempfile.TemporaryDirectory() as out_dir:
        cfg = SessionConfig(video=video, ref="", out_dir=out_dir)
        cfg.prescan_enable = False
        cfg.curate_enable = False
        cfg.tpu_batch_frames = batch
        cfg.min_gap_sec = 0.5
        cfg.face_det_conf = 0.3
        cfg.face_thresh = 0.9
        cfg.prescan_cache_mode = "off"
        cfg.tpu_mainpass_analysis_max_w = analysis_w
        cfg.tpu_profile = True
        eng = Engine(cfg, backend,
                     person_backend=person if use_person else None,
                     status=msgs.append, progress=lambda p: None)
        t0 = time.perf_counter()
        res = eng.run(bank=bank)
        dt = time.perf_counter() - t0
    if not res.ok or res.mainpass is None:
        return {"x": 0.0, "hits": 0, "err": res.error[:300]}
    profile = {}
    for m in msgs:
        if m.startswith("profile:"):
            for line in m.splitlines()[1:]:
                mm = re.match(r"(\S+)\s+([0-9.]+)s\s+n=(\d+)", line.strip())
                if mm:
                    profile[mm.group(1)] = {"total_s": float(mm.group(2)),
                                            "n": int(mm.group(3))}
    return {"x": round(bench.TOTAL_FRAMES / bench.FPS / dt, 3),
            "wall_s": round(dt, 2),
            "hits": len(res.mainpass.hits), "profile": profile}


VARIANTS = {
    # name: (analysis_w, batch, use_person, embed_slots)
    "base": (832, 16, True, 0),
    "w704": (704, 16, True, 0),
    "w640": (640, 16, True, 0),
    "noperson": (832, 16, False, 0),
    "b32": (832, 32, True, 0),
    "slots2": (832, 16, True, 2),
    # combos on the new 640 default
    "w640slots2": (640, 16, True, 2),
    "w640noperson": (640, 16, False, 0),
    "w640b32": (640, 32, True, 0),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="base,w704,w640,noperson")
    args = ap.parse_args()
    names = [v.strip() for v in args.variants.split(",") if v.strip()]

    import os

    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import (ScrfdArcFaceBackend,
                                                      YoloPersonBackend)

    bench._wait_for_device()
    td = tempfile.mkdtemp()
    video = os.path.join(td, "bench1080.mp4")
    ref_png = os.path.join(td, "ref.png")
    bench._phase("encoding synthetic 1080p mp4")
    bench._make_video(video, ref_png)

    bench._phase("building backends")
    scrfd_w = resolve_weights("auto", "scrfd_2.5g")
    yolo_w = resolve_weights("auto", "yolov8n")
    backends = {}   # embed_slots -> backend
    person = YoloPersonBackend(conf=0.35, weights=yolo_w)

    def get_backend(slots: int):
        if slots not in backends:
            backends[slots] = ScrfdArcFaceBackend(
                det_size=640, score_thresh=0.3, max_faces=8,
                host_align=False, scrfd_weights=scrfd_w, embed_slots=slots)
        return backends[slots]

    banks = {}
    for name in names:
        w, b, use_p, slots = VARIANTS[name]
        h = int(round(1080 * w / 1920))
        h -= h % 2
        bench._phase(f"warm {name} (w={w} batch={b} person={use_p} "
                     f"slots={slots})")
        banks[name] = _seed_bank_and_warm(get_backend(slots), person,
                                          ref_png, w, h, b, use_p)

    results = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            w, b, use_p, slots = VARIANTS[name]
            r = run_variant(video, get_backend(slots), person, banks[name],
                            analysis_w=w, batch=b, use_person=use_p)
            results[name].append(r)
            bench._phase(f"rep{rep} {name}: {r.get('x')}x "
                         f"hits={r.get('hits')}")

    summary = {}
    for name in names:
        xs = [r["x"] for r in results[name]]
        summary[name] = {"median_x": round(float(np.median(xs)), 3),
                         "xs": xs,
                         "hits": [r["hits"] for r in results[name]]}
    print(json.dumps({"summary": summary, "runs": results}, indent=1))


if __name__ == "__main__":
    main()
