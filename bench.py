"""Benchmark: pre-scan pipeline throughput on the available chip.

Measures the production backend path — ONE fused device program per batch:
letterbox → SCRFD detect (backbone/decode/NMS) → matmul-based 5-pt warp →
ArcFace embed + quality — plus the host-side bank distance, over
1080p-sourced pre-scan batches (decode width 384, analysis 416, the
reference solidpreset values). Reports the effective realtime multiple for
1080p pre-scan at stride 24 / 24 fps against BASELINE.json's 30×-realtime
driver target (the reference publishes no numbers of its own — BASELINE.md).

All 8 face slots per frame are computed unconditionally (fixed shapes), so
the number suffers no detection-count flattery.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    batch = 64
    decode_w, decode_h = 384, 216      # prescan_decode_max_w on 1080p video
    det_size = 416                     # prescan_max_width analysis size
    stride = 24
    fps = 24.0
    target_realtime_x = 30.0           # BASELINE.json north star

    backend = ScrfdArcFaceBackend(det_size=det_size, score_thresh=0.5,
                                  max_faces=8, host_align=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, decode_h, decode_w, 3),
                          dtype=np.uint8)
    valid = np.ones(batch, bool)
    bank = RefBank(cap=64)
    bank.seed(rng.normal(size=(16, 512)).astype(np.float32))
    bank_mat = bank.matrix()

    # warmup/compile
    out = backend.extract_batch(frames, valid)
    n_faces = int(out["mask"].sum())

    def consume(out):
        # host bank distance, as the pre-scan driver computes it
        feats = out["feats"][out["mask"]]
        if feats.size:
            _ = 1.0 - (feats @ bank_mat.T).max(axis=1)

    # depth-1 software pipeline (matches the pre-scan driver): submit batch
    # i+1 before fetching batch i so compute overlaps the host round trip
    n_steps = 10
    t0 = time.perf_counter()
    pending = backend.submit_batch(frames, valid)
    for _ in range(n_steps - 1):
        nxt = backend.submit_batch(frames, valid)
        consume(pending())
        pending = nxt
    consume(pending())
    dt = time.perf_counter() - t0

    sampled_fps = n_steps * batch / dt
    realtime_x = sampled_fps * stride / fps
    print(json.dumps({
        "metric": "prescan_1080p_realtime_x",
        "value": round(realtime_x, 2),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_x / target_realtime_x, 3),
        "detail": {
            "sampled_frames_per_s": round(sampled_fps, 2),
            "batch": batch, "det_size": det_size,
            "faces_per_batch": n_faces,
            "stride": stride, "assumed_fps": fps,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
