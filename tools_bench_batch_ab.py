"""A/B the fused prescan device-path throughput across batch sizes.

Same measurement as bench.py's headline (depth-2 pipelined submit/fetch,
decoded-video 384x216 frames, det 416, all 8 face slots), swept over
tpu_batch_frames candidates. Interleaved rounds so tunnel drift hits all
arms equally."""
import sys
import time

import numpy as np


def main():
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend
    from person_capture_tpu.video.synthetic import generate_video
    import cv2, tempfile, os
    from collections import deque

    batches = [int(b) for b in (sys.argv[1:] or ["128", "256"])]
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

    def run_arm(batch, n_steps):
        idx = np.arange(batch) % len(src)
        fb = src[idx]
        valid = np.ones(batch, bool)
        q = deque()
        t0 = time.perf_counter()
        for _ in range(n_steps):
            q.append(backend.submit_batch(fb, valid))
            if len(q) > 2:
                q.popleft()()
        while q:
            q.popleft()()
        return n_steps * batch / (time.perf_counter() - t0)

    # compile each shape once
    for b in batches:
        t0 = time.perf_counter()
        run_arm(b, 1)
        print(f"[ab] batch {b} compiled+first in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    results = {b: [] for b in batches}
    for rnd in range(5):
        for b in batches:
            steps = max(4, 1280 // b)
            results[b].append(run_arm(b, steps))
        print(f"[ab] round {rnd}: "
              + " ".join(f"b{b}={results[b][-1]:.0f}f/s" for b in batches),
              flush=True)
    for b in batches:
        med = sorted(results[b])[len(results[b]) // 2]
        print(f"batch {b}: median {med:.0f} frames/s "
              f"({med * 24 / 24:.0f}x-rt-equivalent at stride 24: "
              f"{med * 24 / 24:.0f})")


if __name__ == "__main__":
    main()
