"""Benchmark: pre-scan + main-pass throughput on the available chip.

Three measurements, all fed from a real synthetic 1080p mp4 generated and
DECODED by this script (no pre-staged tensors for the end-to-end numbers):

1. ``prescan_1080p_device_path_x`` (headline): the fused pre-scan device
   program — letterbox → SCRFD detect → matmul 5-pt warp → ArcFace embed +
   quality — over decoded-video 384×216 batches with the depth-4
   submit/fetch pipeline the pre-scan driver uses. Decode happens once
   outside the timed loop: this is the framework's device-path ceiling, the
   number that scales with chips. All 8 face slots per frame are computed
   unconditionally (fixed shapes), so it suffers no detection-count
   flattery.
2. ``prescan_e2e_x`` (detail): the same sampling with the mp4 decode INSIDE
   the timed loop (grab-skip at stride 24, retrieve+downscale to 384 px,
   batch, submit). On this image's 1-core host with no hwaccel/ffmpeg the
   cv2 1080p decode tops out ~150 src f/s, so this number is decode-bound
   (environmental), which is why it is reported alongside rather than as
   the headline — see BASELINE.md.
3. ``mainpass_realtime_x`` (detail): the REAL main-pass driver
   (``Engine.run`` → ``pipeline/mainpass.py``) at reference
   ``frame_stride=2`` — decode + prefetch, analysis downscale to the
   default ``tpu_mainpass_analysis_max_w`` (640), fused face program at
   det 640 (the CLI default), depth-4 pipelining, locks, crop composition,
   smart-crop, and async JPEG saves at ``min_gap_sec=0.5``, saver drain
   included. The backend compiles outside the timed region (a sweep's
   steady state). ≥1.0 means the full main pass keeps up with the video
   in real time over the tunneled link (BASELINE.json: "pre-scan + main
   pass").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from types import SimpleNamespace

import numpy as np

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)

FPS = 24.0
TOTAL_FRAMES = 240
PRESCAN_STRIDE = 24
PRESCAN_DECODE_W, PRESCAN_DECODE_H = 384, 216  # prescan_decode_max_w @1080p
MAIN_STRIDE = 2
MAIN_ANALYSIS_W, MAIN_ANALYSIS_H = 640, 360    # tpu_mainpass_analysis_max_w


def _make_video(path: str, ref_png: str) -> None:
    """Synthetic 1080p clip with moving faces (same generator the CLI smoke
    uses), encoded through cv2 — the only decoder in this image — plus a
    rendered reference photo of the clip's identity so the main-pass bench
    exercises real matches/saves."""
    import cv2

    from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                    generate_video)

    generate_video(path, width=1920, height=1080, fps=int(FPS),
                   total_frames=TOTAL_FRAMES,
                   segments=[(0, TOTAL_FRAMES - 1, 0)], moving=True, seed=3)
    ref = np.full((400, 400, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (80, 80, 320, 320)))
    cv2.imwrite(ref_png, ref)


def _decode_all_resized(path: str, w: int, h: int) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(frames)


def _bench_prescan_device_path(backend, frames_384: np.ndarray,
                               bank_mat: np.ndarray, n_runs: int = 3):
    """Depth-4 pipelined device path over pre-decoded video batches.
    Median of ``n_runs`` measurements (tunnel throughput varies ~3×
    run-to-run — one capture moved 249→381× across rounds with no code
    change on this path; VERDICT r4 Weak #4)."""
    batch = 128
    idx = np.arange(batch) % len(frames_384)
    frames = frames_384[idx]
    valid = np.ones(batch, bool)

    out = backend.extract_batch(frames, valid)  # warmup/compile
    n_faces = int(np.asarray(out["mask"]).sum())

    def consume(o):
        feats = np.asarray(o["feats"])[np.asarray(o["mask"])]
        if feats.size:
            _ = 1.0 - (feats @ bank_mat.T).max(axis=1)

    from collections import deque

    n_steps = 10
    depth = 4                  # production tpu_pipeline_depth default
    runs = []
    for _ in range(max(1, int(n_runs))):
        q = deque()
        t0 = time.perf_counter()
        for _ in range(n_steps):
            q.append(backend.submit_batch(frames, valid))
            if len(q) > depth:
                consume(q.popleft()())
        while q:
            consume(q.popleft()())
        dt = time.perf_counter() - t0
        sampled_fps = n_steps * batch / dt
        runs.append(sampled_fps * PRESCAN_STRIDE / FPS)
    runs.sort()
    return runs[len(runs) // 2], runs, n_faces


def _bench_prescan_e2e(backend, video: str, bank_mat: np.ndarray,
                       n_passes: int = 2):
    """Pre-scan with the mp4 decode inside the timed loop: grab-skip at
    stride 24, retrieve+downscale sampled frames, pad to the production
    batch shape, submit. Decode-bound on this 1-core host."""
    import cv2

    batch = 128
    t0 = time.perf_counter()
    src_covered = 0
    pending = None
    for _ in range(n_passes):
        cap = cv2.VideoCapture(video)
        samples = []
        i = 0
        while True:
            if not cap.grab():
                break
            if i % PRESCAN_STRIDE == 0:
                ok, f = cap.retrieve()
                if ok:
                    samples.append(cv2.resize(
                        f, (PRESCAN_DECODE_W, PRESCAN_DECODE_H),
                        interpolation=cv2.INTER_AREA))
            i += 1
        cap.release()
        src_covered += i
        n = len(samples)
        frames = np.stack(samples)
        if n < batch:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], batch - n, axis=0)], 0)
        valid = np.zeros(batch, bool)
        valid[:n] = True
        if pending is not None:
            out = pending()
            feats = np.asarray(out["feats"])[np.asarray(out["mask"])]
            if feats.size:
                _ = 1.0 - (feats @ bank_mat.T).max(axis=1)
        pending = backend.submit_batch(frames, valid)
    if pending is not None:
        pending()
    dt = time.perf_counter() - t0
    decode_fps = src_covered / dt
    return decode_fps / FPS, decode_fps


def _build_mainpass_backends():
    """Backend pair the main-pass bench (and the MFU report) share."""
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import (ScrfdArcFaceBackend,
                                                      YoloPersonBackend)

    backend = ScrfdArcFaceBackend(det_size=640, score_thresh=0.3,
                                  max_faces=8, host_align=False,
                                  scrfd_weights=resolve_weights(
                                      "auto", "scrfd_2.5g"))
    # the CLI default builds the person detector for body-aware compose
    # association (compose_detect_person_for_face) — the metric must pay
    # for it too
    person = YoloPersonBackend(conf=0.35,
                               weights=resolve_weights("auto", "yolov8n"))
    return backend, person


def _bench_mainpass_e2e(video: str, ref_png: str, backend, person,
                        n_runs: int = 1):
    """Main pass through the REAL product driver: ``Engine.run`` over the
    1080p mp4 with the production defaults — decode + prefetch inside the
    timed region, analysis downscale to ``tpu_mainpass_analysis_max_w``
    (640), fused face program at the CLI-default det 640, depth-4
    pipelining, locks/compose/smart-crop/async JPEG saves at
    ``min_gap_sec=0.5``, saver drain included. The backend (and its
    compiles) builds OUTSIDE the timed region, exactly like a sweep's
    second video (sweep.py runtime reuse).

    Returns a list of (x_realtime, src_fps, hits), one per run (the
    engine, weights, and compiles are shared across runs — the steady
    state a sweep reaches from its second video on)."""
    import tempfile

    import cv2

    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.engine import Engine

    batch = 16
    # seed the identity bank through the batch programs at the EXACT
    # analysis shape the main pass uses (640x360), via the same
    # shared-upload dispatch — this doubles as the warmup compile for
    # BOTH programs; a different-shaped seeding extract would trigger a
    # second ~2-min compile over the tunnel for no measurement value
    ref = cv2.imread(ref_png, cv2.IMREAD_COLOR)
    side = MAIN_ANALYSIS_H                  # ref face at video-like scale
    ref_s = cv2.resize(ref, (side, side), interpolation=cv2.INTER_AREA)
    canvas = np.full((MAIN_ANALYSIS_H, MAIN_ANALYSIS_W, 3), 60, np.uint8)
    x0 = (MAIN_ANALYSIS_W - side) // 2
    canvas[:, x0:x0 + side] = ref_s
    frames = np.repeat(canvas[None], batch, axis=0)
    # the engine's main pass dispatches the combined WIRE program (one
    # upload, one dispatch, one download) — warm exactly that one
    out, _ = backend.submit_wire_with_person(
        person, frames, np.ones(batch, bool))()
    mask = np.asarray(out["mask"][0])
    bank = RefBank(cap=64)
    if mask.any():
        j = int(np.argmax(np.where(mask, np.asarray(out["quality"][0]),
                                   -1.0)))
        bank.seed(np.asarray(out["feats"][0][j])[None])
    else:
        _phase("WARNING: no face detected in the bench ref — "
               "mainpass metric will report 0")

    runs = []
    for _ in range(max(1, int(n_runs))):
        with tempfile.TemporaryDirectory() as out_dir:
            cfg = SessionConfig(video=video, ref="", out_dir=out_dir)
            cfg.prescan_enable = False      # measure the main pass alone
            cfg.curate_enable = False
            cfg.tpu_batch_frames = batch
            cfg.min_gap_sec = 0.5           # reference solidpreset band
            cfg.face_det_conf = 0.3         # synthetic-face fixture values
            cfg.face_thresh = 0.9           # (verify-recipe thresholds)
            cfg.prescan_cache_mode = "off"
            eng = Engine(cfg, backend, person_backend=person,
                         status=lambda m: None,
                         progress=lambda p: None)
            t0 = time.perf_counter()
            res = eng.run(bank=bank)
            dt = time.perf_counter() - t0
        if not res.ok or res.mainpass is None:
            runs.append((0.0, 0.0, 0))
        else:
            src_fps = TOTAL_FRAMES / dt
            runs.append((src_fps / FPS, src_fps, len(res.mainpass.hits)))
    return runs


def _mfu_for_prescan(backend, frames_384: np.ndarray) -> dict:
    """XLA cost model + amortized device time for the fused prescan
    program (wire u8 b128 → letterbox → SCRFD-2.5G det416 → matmul warp →
    ArcFace r50 ×8 slots → packed) — VERDICT r4 #2: perf claims must
    carry FLOP accounting, not just wall clock."""
    import jax

    from person_capture_tpu.utils.mfu import mfu_report

    idx = np.arange(128) % len(frames_384)
    wire = backend._prepare_transfer(frames_384[idx])
    dev = jax.device_put(wire)
    jnp = backend._jnp
    rep = mfu_report(backend._fused,
                     (dev, jnp.float32(backend.score_thresh)),
                     n=10, reps=3)
    # if the link were free: how fast could THIS program alone sample?
    covered_s = 128 * PRESCAN_STRIDE / FPS
    rep["compute_ceiling_x_realtime"] = round(
        covered_s / (rep["ms_per_step"] / 1e3), 1)
    return rep


def _mfu_for_mainpass(backend, person) -> dict:
    """Same accounting for the combined wire-format face+person program
    (b16 @ analysis 640×360, det 640, SCRFD-2.5G + r50 + YOLOv8n)."""
    import jax

    from person_capture_tpu.utils.mfu import mfu_report

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255,
                          (16, MAIN_ANALYSIS_H, MAIN_ANALYSIS_W, 3),
                          np.uint8)
    wire = backend._prepare_transfer(frames)
    dev = jax.device_put(wire)
    jnp = backend._jnp
    combo = backend._combined_wire_with(person)
    rep = mfu_report(combo, (dev, jnp.float32(backend.score_thresh),
                             jnp.float32(person.conf)), n=10, reps=3)
    covered_s = 16 * MAIN_STRIDE / FPS
    rep["compute_ceiling_x_realtime"] = round(
        covered_s / (rep["ms_per_step"] / 1e3), 1)
    return rep


def _wait_for_device(deadline_s: float = 1800.0) -> None:
    """The tunneled chip enters transient bad states where even a trivial
    matmul hangs (CLAUDE.md). Probe it in a SUBPROCESS — a hung in-process
    backend init cannot be interrupted — and retry until the deadline, so
    a driver bench run launched during a recovering relay still completes
    instead of hanging in its first compile. (Shared with the sweep
    daemon's outage defense: person_capture_tpu/utils/device.py.)"""
    from person_capture_tpu.utils.device import wait_for_device

    if not wait_for_device(deadline_s=deadline_s, status=_phase):
        _phase("proceeding anyway (expect a hang or backend error)")


def main() -> None:
    # Probe FIRST, before any in-process jax/backend touch bench itself
    # controls: during a relay hiccup early init can wedge
    # uninterruptibly for tens of minutes (observed r5: bench sat ~25
    # min before its first output while fresh subprocess probes
    # succeeded — on THIS image that wedge lives in sitecustomize's
    # interpreter-startup jax preload, which no ordering inside bench
    # can dodge, but on hosts without the preload this ordering keeps
    # the first backend touch behind a hang-proof subprocess probe).
    _wait_for_device()

    import jax

    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    target_realtime_x = 30.0           # BASELINE.json north star
    # default-on persistent compile cache: reruns skip the first-batch
    # compile phases (the axon plugin serves executables from disk,
    # tools_compile_cache_probe.py). Timed regions never include compiles,
    # so the metric is unaffected either way.
    from person_capture_tpu.main import maybe_enable_compile_cache

    maybe_enable_compile_cache(SimpleNamespace(tpu_compile_cache_dir="auto"))

    rng = np.random.default_rng(0)
    bank = RefBank(cap=64)
    bank.seed(rng.normal(size=(16, 512)).astype(np.float32))
    bank_mat = bank.matrix()

    with tempfile.TemporaryDirectory() as td:
        video = os.path.join(td, "bench1080.mp4")
        ref_png = os.path.join(td, "ref.png")
        _phase("encoding synthetic 1080p mp4")
        _make_video(video, ref_png)
        _phase("decoding prescan frames")
        frames_384 = _decode_all_resized(video, PRESCAN_DECODE_W,
                                         PRESCAN_DECODE_H)

        _phase("building prescan backend (compile on first batch)")
        backend = ScrfdArcFaceBackend(det_size=416, score_thresh=0.5,
                                      max_faces=8, host_align=False,
                                      scrfd_weights=resolve_weights(
                                          "auto", "scrfd_2.5g"))
        device_x, device_runs, n_faces = _bench_prescan_device_path(
            backend, frames_384, bank_mat)
        _phase(f"prescan device path done (median {device_x:.0f}x of "
               f"{[round(x) for x in device_runs]})")
        prescan_mfu = _mfu_for_prescan(backend, frames_384)
        _phase(f"prescan program MFU {prescan_mfu.get('mfu')}")
        e2e_x, decode_fps = _bench_prescan_e2e(backend, video, bank_mat)
        _phase(f"prescan e2e done ({e2e_x:.1f}x)")
        # tunnel throughput varies ~3x run-to-run (BASELINE.md): one
        # capture under- or over-states the same binary. Three runs of the
        # SAME engine (compiles + weights paid once, like a sweep's steady
        # state), report the median; the full band goes in detail.
        main_backend, person = _build_mainpass_backends()
        main_runs = _bench_mainpass_e2e(video, ref_png, main_backend,
                                        person, n_runs=3)
        main_xs = sorted(r[0] for r in main_runs)
        main_x = main_xs[len(main_xs) // 2]
        mid = [r for r in main_runs if r[0] == main_x][0]
        main_src_fps, main_hits = mid[1], mid[2]
        _phase(f"mainpass done (median {main_x:.2f}x of {main_xs}, "
               f"{main_hits} hits)")
        mainpass_mfu = _mfu_for_mainpass(main_backend, person)
        _phase(f"mainpass program MFU {mainpass_mfu.get('mfu')}")
    hdr_rate, hdr_rates, hdr_mfu = _bench_hdr_exports()
    _phase(f"hdr exports done (median {hdr_rate}/s of {hdr_rates}; "
           f"render MFU {hdr_mfu.get('mfu')})")

    print(json.dumps({
        "metric": "prescan_1080p_device_path_x",
        "value": round(device_x, 2),
        "unit": "x_realtime",
        "vs_baseline": round(device_x / target_realtime_x, 3),
        "detail": {
            "prescan_device_runs_x": [round(x, 1) for x in device_runs],
            "prescan_e2e_x": round(e2e_x, 2),
            "prescan_e2e_note": ("decode inside timed loop; 1-core host "
                                 "cv2 1080p decode is the bound "
                                 f"({decode_fps:.0f} src f/s, no hwaccel "
                                 "in this image)"),
            "mainpass_realtime_x": round(main_x, 2),
            "mainpass_runs_x": [round(x, 2) for x in main_xs],
            "mainpass_src_fps": round(main_src_fps, 1),
            "mainpass_hits": main_hits,
            "mainpass_config": ("REAL Engine.run: stride 2, analysis cap "
                                "640 (default), det 640, batch 16, locks+"
                                "compose+smartcrop+saves @min_gap 0.5, "
                                "decode+saver drain in the timed region"),
            "faces_per_batch": n_faces,
            "prescan_batch": 128, "prescan_det_size": 416,
            "prescan_stride": PRESCAN_STRIDE, "assumed_fps": FPS,
            "hdr_png_exports_per_s": hdr_rate,
            "hdr_exports_runs_per_s": hdr_rates,
            # MFU per production program (utils/mfu.py): XLA cost-model
            # flops / amortized device seconds / chip peak bf16.
            # compute_ceiling_x_realtime = throughput if the tunneled link
            # cost nothing (the other roofline axis; the gap between it
            # and the measured pipeline x is link+host, not compute).
            "mfu": {
                "prescan_fused_b128_det416": prescan_mfu,
                "mainpass_combo_b16_det640": mainpass_mfu,
                "hdr_render_1920x1440": hdr_mfu,
            },
            "device": str(jax.devices()[0]),
        },
    }))


def _bench_hdr_exports(n_runs: int = 3, depth: int = 3, mfu: bool = True):
    """Time full-res HDR→SDR crop renders (kernel + color match +
    despeckle + PNG encode) from a 4K P010 source. Median of ``n_runs``
    (symmetric with the other metrics — VERDICT r4 Weak #4), plus the
    render program's MFU report."""
    import tempfile

    from person_capture_tpu.hdr.stills import (HdrExportParams,
                                               _get_render_fn,
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
    # depth-`depth` export pipeline with SAVER semantics (pipeline/saver.py
    # hdr_depth): while item i is being fetched+encoded, `depth` later
    # renders are in flight — so the queue refills to depth+1 BEFORE the
    # pop. (An earlier revision refilled only to `depth`, i.e. depth-1 in
    # flight during the encode: its "depth 1" row measured a fully SERIAL
    # loop — round-5 review finding.)
    from collections import deque

    n = 5
    depth = max(0, int(depth))
    rates = []
    encode_ms = []
    for _r in range(max(1, int(n_runs))):
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            q = deque()
            submitted = 0
            for i in range(n):
                while submitted < n and len(q) < depth + 1:
                    q.append(submit_sdr_crop_render(y, uv, crop, params))
                    submitted += 1
                bgr = q.popleft()()
                te = time.perf_counter()
                save_sdr_still(bgr, f"{td}/f{i}.png")
                encode_ms.append((time.perf_counter() - te) * 1e3)
        rates.append(round(n / (time.perf_counter() - t0), 2))
    rates.sort()
    encode_ms.sort()

    rep = {}
    if mfu:
        # render-program MFU (device side only; PNG encode is host) — at
        # the shape_bucket-PADDED crop shape the export path actually
        # compiles and runs (submit_sdr_crop_render edge-pads 1440→1472
        # rows at the default bucket 64; lowering the unpadded shape
        # would measure a program the pipeline never executes AND pay an
        # extra multi-minute tunnel compile — round-5 review finding)
        import jax

        from person_capture_tpu.hdr.stills import bucketed_crop_arrays
        from person_capture_tpu.utils.mfu import mfu_report

        y_c, uv_c, _trim = bucketed_crop_arrays(y, uv, crop, params)
        y_dev = jax.device_put(y_c)
        uv_dev = jax.device_put(uv_c)
        render = _get_render_fn(params)
        rep = mfu_report(render, (y_dev, uv_dev), n=8, reps=3)
    # host PNG-encode floor: with renders fully hidden by the depth-K
    # pipeline, exports/s cannot exceed 1000/encode_ms
    rep = dict(rep)
    rep["png_encode_ms_median"] = round(
        encode_ms[len(encode_ms) // 2], 1) if encode_ms else None
    return rates[len(rates) // 2], rates, rep


if __name__ == "__main__":
    main()
