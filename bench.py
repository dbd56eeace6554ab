"""Benchmark: fused pre-scan step throughput on the available chip.

Measures the flagship device program — letterbox → SCRFD-2.5G → 5-pt align →
ArcFace-r50 → bank distance — over 1080p-sourced pre-scan batches (decode
width 384, analysis 416, reference solidpreset values), and reports the
effective realtime multiple for 1080p pre-scan at stride 24 / 24 fps.

Baseline: BASELINE.json's driver target of 30×-realtime 1080p pre-scan
(the reference publishes no numbers of its own — BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from person_capture_tpu.core.bank import fd_min_batch_jnp
    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.ops import align as AL
    from person_capture_tpu.ops import quality as Q
    from person_capture_tpu.ops.preprocess import letterbox_topleft

    batch = 64
    decode_w, decode_h = 384, 216      # prescan_decode_max_w on 1080p video
    det_size = 416                     # prescan_max_width analysis size
    max_faces = 8
    stride = 24
    fps = 24.0
    target_realtime_x = 30.0           # BASELINE.json north star

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    scrfd_model, sv = SD.init_scrfd(k1, SD.SCRFD_2_5G, size=det_size,
                                    dtype=jnp.bfloat16)
    arc_model, av = AF.init_arcface(k2, AF.W600K_R50, dtype=jnp.bfloat16)

    @jax.jit
    def step(frames_u8, bank, bank_mask):
        frames = frames_u8.astype(jnp.float32)
        padded, scales = jax.vmap(lambda f: letterbox_topleft(f, det_size))(frames)
        det = SD.detect_faces(scrfd_model, sv, padded, scales,
                              jnp.float32(0.5), max_faces)
        chips = jax.vmap(lambda fr, kp, m: AL.align_chips_jnp(fr, kp, m))(
            frames, det["kps"], det["mask"])
        b, f = chips.shape[0], chips.shape[1]
        flat = chips.reshape(b * f, *chips.shape[2:])
        feats = AF.encode_chips(arc_model, av, flat,
                                flip_tta=False).reshape(b, f, -1)
        quality = Q.chip_quality(flat).reshape(b, f)
        _, best_fd = fd_min_batch_jnp(feats, det["mask"], bank, bank_mask)
        return best_fd, quality

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, decode_h, decode_w, 3),
                                      dtype=np.uint8))
    bank = rng.normal(size=(64, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    bank = jnp.asarray(bank)
    bank_mask = jnp.ones(64, bool)

    # warmup/compile
    out = step(frames, bank, bank_mask)
    jax.block_until_ready(out)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(frames, bank, bank_mask)
    jax.block_until_ready(out)
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
            "stride": stride, "assumed_fps": fps,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
