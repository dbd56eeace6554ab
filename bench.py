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

    batch = 128
    decode_w, decode_h = 384, 216      # prescan_decode_max_w on 1080p video
    det_size = 416                     # prescan_max_width analysis size
    stride = 24
    fps = 24.0
    target_realtime_x = 30.0           # BASELINE.json north star

    from person_capture_tpu.models.zoo import resolve_weights

    backend = ScrfdArcFaceBackend(det_size=det_size, score_thresh=0.5,
                                  max_faces=8, host_align=False,
                                  scrfd_weights=resolve_weights(
                                      "auto", "scrfd_2.5g"))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, decode_h, decode_w, 3),
                          dtype=np.uint8)
    # draw real synthetic faces so the trained detector populates face
    # slots (throughput is detection-count independent — fixed shapes —
    # but faces_per_batch now reflects a working detector)
    try:
        import cv2  # noqa: F401

        from person_capture_tpu.video.synthetic import (FacePlacement,
                                                        draw_face)

        for i in range(batch):
            n = int(rng.integers(1, 3))
            for j in range(n):
                fw = float(rng.uniform(30, 90))
                cx = float(rng.uniform(fw, decode_w - fw))
                cy = float(rng.uniform(fw, decode_h - fw))
                draw_face(frames[i], FacePlacement(
                    i, j, (cx - fw / 2, cy - fw / 2,
                           cx + fw / 2, cy + fw / 2)))
    except ImportError:
        pass
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

    # secondary metric: full-res HDR→SDR still exports/sec (4K source,
    # ~1440×1920 crop, color-match + despeckle through the device kernel —
    # the reference's WIC path took seconds per export, gui_app README)
    hdr_rate = _bench_hdr_exports()

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
            "hdr_png_exports_per_s": hdr_rate,
            "device": str(jax.devices()[0]),
        },
    }))


def _bench_hdr_exports() -> float:
    """Time full-res HDR→SDR crop renders (kernel + color match +
    despeckle + PNG encode) from a 4K P010 source."""
    import tempfile

    from person_capture_tpu.hdr.stills import (HdrExportParams,
                                               render_sdr_crop_from_p010,
                                               save_sdr_still,
                                               submit_sdr_crop_render)

    rng = np.random.default_rng(1)
    h, w = 2160, 3840
    # video-like content, not per-pixel noise: PNG encode time (the host
    # bottleneck) depends heavily on entropy, and real HDR frames are
    # smooth. Low-res luma upsampled to 4K + film-grain-scale noise.
    import cv2

    base = rng.integers(150, 900, (h // 32, w // 32)).astype(np.float32)
    luma = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    luma = luma + rng.normal(0.0, 3.0, (h, w)).astype(np.float32)
    y = (np.clip(luma, 64, 940).astype(np.uint16) << 6)
    cb = cv2.resize(rng.integers(440, 580, (h // 64, w // 64))
                    .astype(np.float32), (w // 2, h // 2),
                    interpolation=cv2.INTER_CUBIC)
    cr = cv2.resize(rng.integers(440, 580, (h // 64, w // 64))
                    .astype(np.float32), (w // 2, h // 2),
                    interpolation=cv2.INTER_CUBIC)
    uv = (np.clip(np.stack([cb, cr], axis=-1), 64, 960)
          .astype(np.uint16) << 6)
    crop = (960, 360, 2880, 1800)  # 1920x1440
    params = HdrExportParams(color_match=True, speckle_cleanup=True)

    # warm (compile)
    _ = render_sdr_crop_from_p010(y, uv, crop, params)
    # depth-1 export pipeline, exactly as the saver thread runs it
    # (pipeline/saver.py): dispatch render i+1 before PNG-encoding i
    n = 5
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        pending = submit_sdr_crop_render(y, uv, crop, params)
        for i in range(n):
            nxt = submit_sdr_crop_render(y, uv, crop, params) \
                if i + 1 < n else None
            save_sdr_still(pending(), f"{td}/f{i}.png")
            pending = nxt
    return round(n / (time.perf_counter() - t0), 2)


if __name__ == "__main__":
    main()
