"""On-chip A/B: embed_slots FLOP cut vs full-slot embedding.

ARCHITECTURE.md round-4 item 5: ``tpu_embed_slots=K`` embeds only the K
highest-score NMS slots (the ArcFace r50 encoder dominates step FLOPs at
~6 GFLOP/slot and most slots are empty in real footage). Decision
equivalence is CI-tested (tests/test_embed_slots.py); this script
quantifies the throughput win on the real chip at the production prescan
shape (batch 128, det 416, 384x216 frames, depth-2 pipeline).

Tunnel throughput varies ~3x run-to-run (CLAUDE.md), so the two variants
are interleaved block-by-block (A B A B ...) and medians reported.

Usage: python tools_bench_embed_slots.py [n_rounds]
"""

from __future__ import annotations

import statistics
import sys
import time
from collections import deque

import numpy as np


def _mk_frames(batch: int = 128) -> tuple[np.ndarray, np.ndarray]:
    import tempfile

    import cv2

    from person_capture_tpu.video.synthetic import generate_video

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/v.mp4"
        generate_video(path, width=384, height=216, fps=24, total_frames=16,
                       segments=[(0, 15, 0)], moving=True, seed=3)
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        cap.release()
    frames = np.stack(frames)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(frames), batch)
    return frames[idx], np.ones(batch, bool)


def _measure(backend, frames, valid, n_steps: int = 8,
             depth: int = 2) -> float:
    q = deque()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        q.append(backend.submit_batch(frames, valid))
        if len(q) > depth:
            q.popleft()()
    while q:
        q.popleft()()
    dt = time.perf_counter() - t0
    return n_steps * len(frames) / dt


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    frames, valid = _mk_frames()
    w = resolve_weights("auto", "scrfd_2.5g")
    kw = dict(det_size=416, score_thresh=0.5, max_faces=8,
              host_align=False, scrfd_weights=w)
    full = ScrfdArcFaceBackend(**kw)
    topk = ScrfdArcFaceBackend(embed_slots=2, **kw)

    # compile + sanity: detections agree on the top slots
    of = full.extract_batch(frames, valid)
    ot = topk.extract_batch(frames, valid)
    nf = int(np.asarray(of["mask"]).sum())
    nt = int(np.asarray(ot["mask"]).sum())
    print(f"faces/batch full={nf} topk={nt}", flush=True)

    full_fps, topk_fps = [], []
    for r in range(n_rounds):
        full_fps.append(_measure(full, frames, valid))
        topk_fps.append(_measure(topk, frames, valid))
        print(f"round {r}: full={full_fps[-1]:8.1f} f/s   "
              f"topk={topk_fps[-1]:8.1f} f/s   "
              f"ratio={topk_fps[-1] / full_fps[-1]:.2f}x", flush=True)

    mf = statistics.median(full_fps)
    mt = statistics.median(topk_fps)
    print(f"median: full={mf:.1f} f/s  topk(K=2)={mt:.1f} f/s  "
          f"speedup={mt / mf:.2f}x")


if __name__ == "__main__":
    main()
