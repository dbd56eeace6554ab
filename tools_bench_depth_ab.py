"""A/B the fused prescan device-path throughput across (batch, depth).

Same measurement as bench.py's headline (pipelined submit/fetch over
decoded-video 384x216 frames, det 416, all 8 face slots), swept over
(tpu_batch_frames, tpu_pipeline_depth) arms. The tunneled link's RTT is
30-300 ms (CLAUDE.md): deeper submit pipelines keep more batches in
flight and could hide RTT on slow-relay days — unless the link is
BANDWIDTH-bound (16 MB of i420 per 128-batch), where depth buys nothing.
Interleaved rounds so tunnel drift hits all arms equally.

Usage: python tools_bench_depth_ab.py [b:d ...]   (default arms below)
"""
import sys
import time

import numpy as np


def main():
    from collections import deque
    import cv2
    import os
    import tempfile

    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend
    from person_capture_tpu.video.synthetic import generate_video

    arms = [tuple(int(x) for x in a.split(":"))
            for a in (sys.argv[1:] or ["128:2", "128:4", "128:8", "256:2"])]
    with tempfile.TemporaryDirectory() as td:
        video = os.path.join(td, "v.mp4")
        generate_video(video, width=1920, height=1080, fps=24,
                       total_frames=48, segments=[(0, 47, 0)],
                       moving=True, seed=3)
        cap = cv2.VideoCapture(video)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(f, (384, 216),
                                     interpolation=cv2.INTER_AREA))
        cap.release()
        src = np.stack(frames)

    backend = ScrfdArcFaceBackend(det_size=416, score_thresh=0.5,
                                  max_faces=8, host_align=False,
                                  scrfd_weights=resolve_weights(
                                      "auto", "scrfd_2.5g"))

    def run_arm(batch, depth, n_steps):
        idx = np.arange(batch) % len(src)
        fb = src[idx]
        valid = np.ones(batch, bool)
        q = deque()
        t0 = time.perf_counter()
        for _ in range(n_steps):
            q.append(backend.submit_batch(fb, valid))
            if len(q) > depth:
                q.popleft()()
        while q:
            q.popleft()()
        return n_steps * batch / (time.perf_counter() - t0)

    for b in sorted({b for b, _ in arms}):
        t0 = time.perf_counter()
        run_arm(b, 2, 1)
        print(f"[ab] batch {b} compiled+first in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    results = {a: [] for a in arms}
    for rnd in range(5):
        for b, d in arms:
            steps = max(4, 1280 // b)
            results[(b, d)].append(run_arm(b, d, steps))
        print(f"[ab] round {rnd}: "
              + " ".join(f"b{b}:d{d}={results[(b, d)][-1]:.0f}f/s"
                         for b, d in arms), flush=True)
    for b, d in arms:
        r = results[(b, d)]
        med = sorted(r)[len(r) // 2]
        print(f"batch {b} depth {d}: median {med:.0f} frames/s "
              f"(band {min(r):.0f}-{max(r):.0f})")


if __name__ == "__main__":
    main()
