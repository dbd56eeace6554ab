"""Session engine: orchestrates pre-scan → main pass → export.

Processor-equivalent API surface (reference: gui_app.py:654-13489) without
the Qt dependency: ``Engine(cfg)`` with ``run()``, pause/seek/update_cfg
commands, and callback hooks for status/progress/hits, so a GUI or service
can drive it the way MainWindow drives the reference Processor.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..config import LIVE_KEYS, SessionConfig
from ..core.bank import RefBank
from . import cache as prescan_cache
from .mainpass import MainPassResult, run_main_pass
from .prescan import PrescanResult, run_prescan
from .saver import AsyncSaver


@dataclass
class EngineResult:
    ok: bool
    spans: List[Tuple[int, int]]
    prescan: Optional[PrescanResult]
    mainpass: Optional[MainPassResult]
    error: str = ""


class Engine:
    """Drives one capture session. Thread-safe command queue mirrors the
    reference's ``update_cfg/pause/stop`` surface."""

    def __init__(self, cfg: SessionConfig, backend,
                 person_backend=None, reid_backend=None,
                 fullframe_backend=None,
                 status: Optional[Callable[[str], None]] = None,
                 progress: Optional[Callable[[float], None]] = None,
                 on_hit: Optional[Callable[[object], None]] = None,
                 on_preview: Optional[Callable] = None,
                 hdr_source_factory: Optional[Callable] = None):
        self.cfg = cfg
        self.backend = backend
        # (video, width, height, fps) -> P010 plane source; default is the
        # ffmpeg pipe. Injectable so HDR runs are testable without ffmpeg
        # (ArrayP010Source) — called once for the exporter and once for the
        # preview pump (each consumer owns its own stream).
        self.hdr_source_factory = hdr_source_factory
        self.person_backend = person_backend
        self.reid_backend = reid_backend
        self.fullframe_backend = fullframe_backend
        from ..utils.logging import StatusLogger

        self._status_cb = StatusLogger(status or (lambda msg: None),
                                       default_interval=cfg.log_interval_sec)
        self._progress_cb = progress or (lambda p: None)
        self._on_hit = on_hit or (lambda h: None)
        self._on_preview = on_preview
        self._cmd_q: "queue.Queue[Tuple[str, object]]" = queue.Queue()
        self._stop = threading.Event()
        self._pause = threading.Event()
        self._steps = 0
        self._speed = 0.0
        self._fps = 0.0
        self._last_frame_t = 0.0

    # ---- commands -------------------------------------------------------
    def stop(self) -> None:
        self._stop.set()

    def pause(self, value: bool = True) -> None:
        if value:
            self._pause.set()
        else:
            self._pause.clear()

    def step(self) -> None:
        """While paused, advance exactly one frame then re-pause
        (reference Processor 'step' command, gui_app.py:3543-3593)."""
        self._steps += 1

    def set_speed(self, speed: float) -> None:
        """Throttle processing to ``speed``× realtime; 0 disables the
        throttle (reference 'set_speed'). Takes effect immediately."""
        self._speed = max(0.0, float(speed))

    def update_cfg(self, **kv) -> None:
        self._cmd_q.put(("cfg", kv))

    def seek(self, frame_idx: int) -> None:
        """Jump the main pass to (the span containing) ``frame_idx``
        (reference: Processor seek_frame command)."""
        self._cmd_q.put(("seek", int(frame_idx)))

    # ---- internals ------------------------------------------------------
    def _drain_cmds(self) -> None:
        while True:
            try:
                kind, payload = self._cmd_q.get_nowait()
            except queue.Empty:
                break
            if kind == "cfg":
                for k, v in payload.items():
                    if k in LIVE_KEYS and hasattr(self.cfg, k):
                        setattr(self.cfg, k, v)
            elif kind == "seek":
                self._seek_target = int(payload)

    def _poll_seek(self):
        self._drain_cmds()
        target = getattr(self, "_seek_target", None)
        self._seek_target = None
        return target

    def _should_stop(self) -> bool:
        self._drain_cmds()
        while self._pause.is_set() and not self._stop.is_set():
            if self._steps > 0:         # single-step while paused
                self._steps -= 1
                break
            time.sleep(0.05)
        if self._speed > 0.0 and self._fps > 0.0 and not self._stop.is_set():
            # playback-speed throttle: this callback fires once per
            # PROCESSED frame, and each processed frame advances the video
            # by the phase's frame stride — so the per-callback interval is
            # stride / (speed × fps). Sleep in slices so stop/pause stay
            # responsive at very low speeds.
            stride = max(1, int(getattr(self, "_throttle_stride", 1)))
            interval = stride / (self._speed * self._fps)
            deadline = self._last_frame_t + interval
            while not self._stop.is_set():
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                time.sleep(min(wait, 0.2))
            self._last_frame_t = time.monotonic()
        return self._stop.is_set()

    def _decode_workers(self) -> int:
        """Resolved decode-worker count (cfg.tpu_decode_workers, 0=auto)."""
        from ..video.decodepool import auto_decode_workers

        v = int(getattr(self.cfg, "tpu_decode_workers", 1) or 0)
        return v if v > 0 else auto_decode_workers()

    def _report_reader_health(self, reader, phase: str) -> None:
        """Surface decoder recoveries/deaths in the status stream (the
        reference logs the pipe's stderr tail in its fallback diagnostics,
        gui_app.py:4884-4895)."""
        try:
            recoveries = int(getattr(reader, "recoveries", 0) or 0)
            failed = bool(getattr(reader, "failed", False))
            reason = getattr(reader, "last_failure", None) \
                or getattr(reader, "eof_reason", None)
        except Exception:
            return
        if recoveries:
            self._status_cb(f"{phase}: decoder recovered {recoveries}x "
                            f"mid-stream (last failure: {reason})",
                            key="phase")
        elif failed and reason and reason != "eof":
            tail = ""
            try:
                tail = reader.stderr_tail(500)
            except Exception:
                pass
            self._status_cb(f"{phase}: decoder died: {reason}"
                            + (f" | {tail}" if tail else ""),
                            key="phase")

    def seed_bank(self, ref_paths: List[str]) -> RefBank:
        """Embed the reference photos (plus horizontal flips, as the
        reference does at gui_app.py:4519-4556) into a fresh bank."""
        import cv2

        cfg = self.cfg
        bank = RefBank(cap=cfg.prescan_bank_max,
                       dedup_cos=cfg.prescan_diversity_dedup_cos,
                       replace_margin=cfg.prescan_replace_margin,
                       weights=tuple(cfg.prescan_weights),
                       dim=getattr(self.backend, "embed_dim", None))
        from .backends import extract_single_image

        det = int(getattr(self.backend, "det_size", 0) or 640)
        for p in ref_paths:
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(f"Cannot read reference image: {p}")
            # high-res reference photos keep face detail at seeding: use a
            # 2× canvas when the photo out-resolves the detector size (the
            # reference embeds refs at full det size with the recovery
            # ladder, gui_app.py:4519-4556; VERDICT r1 weak #9). One extra
            # compiled shape total, reused across refs.
            canvas = det * 2 if max(img.shape[:2]) > det else det
            for candidate in (img, img[:, ::-1].copy()):
                out = extract_single_image(self.backend, candidate,
                                           canvas=canvas)
                mask = out["mask"][0]
                if not mask.any():
                    continue
                # highest-quality face wins
                j = int(np.argmax(np.where(mask, out["quality"][0], -1.0)))
                bank.update(out["feats"][0][j], float(out["quality"][0][j]))
        return bank

    def run(self, bank: Optional[RefBank] = None) -> EngineResult:
        cfg = self.cfg
        self._last_frame_t = 0.0
        # per-stage wall-time profile (tpu_profile): decode / device fetch /
        # host replay per phase, reported in the status stream at run end
        from ..utils.timing import StepTimer

        self._timer = StepTimer() if getattr(cfg, "tpu_profile", False) \
            else None
        # tpu_jax_profile_dir: capture a jax.profiler trace of the whole
        # run (device timelines + XLA HLO, viewable in TensorBoard/XProf)
        # alongside the host-side StepTimer stage profile — together they
        # are the rebuild's answer to SURVEY §5 "JAX profiler traces +
        # per-stage step timing". No-op when unset.
        from ..utils.timing import profile_trace

        with profile_trace(getattr(cfg, "tpu_jax_profile_dir", "") or ""):
            return self._run_inner(cfg, bank)

    def _run_inner(self, cfg, bank: Optional[RefBank]) -> EngineResult:
        try:
            ref_paths = [p for p in str(cfg.ref).split(";") if p] if cfg.ref else []
            if bank is None:
                bank = self.seed_bank(ref_paths)
            if bank.size == 0:
                return EngineResult(False, [], None, None,
                                    "no reference embeddings")

            from ..video.probe import detect_hdr as _detect_hdr
            from ..video.reader import open_analysis_reader

            hdr_info = _detect_hdr(cfg.video)
            src_is_hdr = hdr_info.is_hdr

            def _open_analysis(max_w=0, prefer_ffmpeg=False):
                # HDR sources reach the detectors tone-mapped (reference
                # open_video_with_tonemap, video_io.py:1093-1160)
                return open_analysis_reader(
                    cfg.video, max_w=max_w, prefer_ffmpeg=prefer_ffmpeg,
                    hdr=src_is_hdr, tonemap_pref=cfg.hdr_tonemap_pref,
                    tonemap_algo=cfg.hdr_sdr_tonemap,
                    allow_inaccurate=cfg.hdr_sdr_allow_inaccurate_fallback,
                    # NVDEC doesn't exist on TPU hosts; other hwaccels
                    # (vaapi, auto, …) pass through to the decoder
                    hwaccel="" if cfg.ff_hwaccel in ("", "none", "cuda")
                    else cfg.ff_hwaccel,
                    status=self._status_cb,
                    pix_fmt=getattr(cfg, "ff_pipe_pixfmt", "bgr24"),
                    transfer=hdr_info.transfer,
                    sdr_nits=float(cfg.sdr_nits or 200.0))

            # resources that must be released on BOTH success and failure
            # paths (decoder processes, prefetch threads, P010 pipes) —
            # drained by _release_run_resources, called from the success
            # path below and from the except handler
            self._run_resources: List = []

            main_reader = _open_analysis()
            reader_holder = {"r": main_reader}
            self._run_resources.append(
                lambda: reader_holder["r"].release())
            meta = main_reader.meta()
            if meta.fps <= 0 or meta.total_frames <= 0:
                # cv2 reports 0 fps/frames on some MKV/stream files; run
                # the recovery chain (cv2 → ffprobe → duration×fps) like
                # the reference repairs BEFORE setup (video_io.py:461-534,
                # gui_app.py:4931-4947) — total=0 would otherwise collapse
                # the whole run to a single-frame span
                from ..video.probe import probe_fps_total

                r_fps, r_total = probe_fps_total(cfg.video)
                if meta.fps <= 0 and r_fps > 0:
                    meta.fps = r_fps
                if meta.total_frames <= 0 and r_total > 0:
                    meta.total_frames = r_total
                self._status_cb(
                    f"repaired stream metadata: fps={meta.fps} "
                    f"total_frames={meta.total_frames}", key="phase")
            self._fps = float(meta.fps or 0.0)
            # keyframe index BEFORE prescan (container parse, no decode):
            # it powers span-jump seeks in the main pass AND the
            # seek-sampling skip gate in both pipelines
            from ..video.keyframes import mp4_is_cfr, read_keyframes

            keyframes = read_keyframes(cfg.video, meta.fps,
                                       meta.total_frames)
            # seek sampling is only safe where frame-number seeks are
            # provably frame-exact: constant-frame-rate mp4 (single-entry
            # stts). VFR/mkv content silently lands off the counted-frame
            # grid under cv2's timestamp conversion, which would shift
            # which frames get sampled — never eligible.
            seek_sampling_ok = bool(getattr(cfg, "tpu_seek_sampling",
                                            True)) \
                and bool(keyframes) \
                and mp4_is_cfr(cfg.video) is True  # parse only if enabled
            pres: Optional[PrescanResult] = None
            if cfg.prescan_enable:
                self._status_cb("pre-scan", key="phase")

                def _reopen():
                    return _open_analysis(max_w=cfg.prescan_decode_max_w)

                def _run():
                    from ..video.reader import (KeyframeSkipReader,
                                                ResilientReader,
                                                StridedPrefetchReader)

                    self._throttle_stride = cfg.prescan_stride

                    def _open_base():
                        return _open_analysis(
                            max_w=cfg.prescan_decode_max_w,
                            prefer_ffmpeg=True)

                    def _resilient():
                        r = ResilientReader(
                            _open_base(), _open_base,
                            total_frames=meta.total_frames)
                        if seek_sampling_ok:
                            return KeyframeSkipReader(
                                r, keyframes,
                                total_frames=meta.total_frames)
                        return r

                    workers = self._decode_workers()
                    if workers > 1 and meta.total_frames > 1:
                        # striped multi-worker decode: N readers over the
                        # full-range sample plan (video/decodepool.py)
                        from ..video.decodepool import StripedDecodeReader

                        r = StripedDecodeReader(
                            _resilient, [(0, meta.total_frames - 1)],
                            cfg.prescan_stride, workers=workers,
                            total_frames=meta.total_frames, meta=meta)
                    else:
                        r = StridedPrefetchReader(_resilient(),
                                                  cfg.prescan_stride,
                                                  reopen=_open_base)
                    try:
                        p = run_prescan(r, self.backend, cfg, bank, meta=None,
                                        reopen_reader=_reopen,
                                        progress=self._progress_cb,
                                        should_stop=self._should_stop,
                                        seek_request=self._poll_seek,
                                        on_preview=self._on_preview,
                                        source_is_hdr=src_is_hdr,
                                        timer=self._timer)
                    finally:
                        self._report_reader_health(r, "pre-scan")
                        r.release()
                    self._last_prescan = p
                    return p.spans, p.bank

                # model identity WITHOUT the wrapper class name: the same
                # weights behind LazyBackend (GUI) and
                # RecoveringFaceBackend (CLI) must share a cache entry
                backend_id = (f"{getattr(self.backend, 'det_size', 0)}:"
                              f"{getattr(self.backend, 'embed_dim', 0)}:"
                              f"{getattr(self.backend, 'max_faces', 0)}")
                (spans, bank2), cached = prescan_cache.get_or_run(
                    cfg, cfg.video, ref_paths, meta.fps, meta.total_frames,
                    _run,
                    skip_save=lambda: bool(getattr(
                        getattr(self, "_last_prescan", None), "perturbed",
                        False)),
                    extra=backend_id)
                bank = bank2
                pres = getattr(self, "_last_prescan", None) if not cached else None
                self._status_cb(f"pre-scan spans: {spans} (cached={cached})",
                                key="prescan_cache")
            else:
                spans = [(0, max(0, meta.total_frames - 1))]

            hdr_exporter = None
            preview_p010 = None
            # hdr_info probed once above — re-probing here could disagree
            # mid-run if a force env var changed between the two calls
            if hdr_info.is_hdr and cfg.hdr_screencap_fullres:
                try:
                    from ..hdr.exporter import (FfmpegP010Source,
                                                HdrStillExporter)
                    from ..hdr.stills import HdrExportParams

                    if self.hdr_source_factory is not None:
                        src = self.hdr_source_factory(
                            cfg.video, meta.width, meta.height, meta.fps)
                    else:
                        src = FfmpegP010Source(
                            cfg.video, meta.width, meta.height, meta.fps,
                            preroll_sec=cfg.hdr_wic_yuv444_color_match_preroll_sec,
                            timeout_sec=cfg.hdr_export_timeout_sec)
                    archive_dir = (os.path.join(cfg.out_dir, "hdr_crops")
                                   if cfg.hdr_archive_crops else None)
                    diag_dir = None
                    if cfg.hdr_speckle_diag:
                        diag_dir = (cfg.hdr_speckle_diag_dir
                                    or os.path.join(cfg.out_dir,
                                                    "hdr_speckle_diag"))
                    from ..video.probe import color_range_full

                    hdr_exporter = HdrStillExporter(
                        src, HdrExportParams.from_cfg(
                            cfg, transfer=hdr_info.transfer,
                            full_range=color_range_full(cfg.video)),
                        out_format=cfg.hdr_sdr_output_format,
                        archive_dir=archive_dir,
                        archive_fmt=cfg.hdr_crop_format,
                        diag_dir=diag_dir,
                        block_guard_mode=cfg.hdr_wic_block_corruption_guard_mode,
                        archive_timeout_sec=cfg.hdr_archive_timeout_sec,
                        archive_pix_fmt=cfg.hdr_wic_avif_pixfmt,
                        archive_range=cfg.hdr_wic_avif_range,
                        display_compat=cfg.hdr_avif_wic_display_compat)
                    self._status_cb(
                        f"HDR source ({', '.join(hdr_info.reasons)}); "
                        f"full-res SDR stills enabled", key="hdr_state")
                    if self._on_preview is not None:
                        # dedicated P010 stream for the preview pump — the
                        # exporter's pipe belongs to the saver thread
                        # (reference preview reader, video_io.py:841-921)
                        try:
                            if self.hdr_source_factory is not None:
                                preview_p010 = self.hdr_source_factory(
                                    cfg.video, meta.width, meta.height,
                                    meta.fps)
                            else:
                                preview_p010 = FfmpegP010Source(
                                    cfg.video, meta.width, meta.height,
                                    meta.fps,
                                    preroll_sec=0.2,
                                    timeout_sec=cfg.hdr_export_timeout_sec)
                        except RuntimeError:
                            preview_p010 = None
                except RuntimeError as e:
                    self._status_cb(f"HDR stills unavailable: {e}", key="hdr_state")
            self._status_cb(f"main pass (keyframes: {len(keyframes)})",
                            key="phase")
            from ..video.reader import (KeyframeSkipReader, ResilientReader,
                                        StridedPrefetchReader)

            def _kf_wrap(r):
                return KeyframeSkipReader(
                    r, keyframes, total_frames=meta.total_frames) \
                    if seek_sampling_ok else r

            workers = self._decode_workers()
            if workers > 1 and meta.total_frames > 1 and spans:
                # striped multi-worker decode over the SPAN plan: each
                # worker owns a decoder; samples serve in exact span-walk
                # order (video/decodepool.py)
                from ..video.decodepool import StripedDecodeReader

                main_reader.release()      # superseded by pool readers

                def _resilient_main():
                    return _kf_wrap(
                        ResilientReader(_open_analysis(), _open_analysis,
                                        total_frames=meta.total_frames))

                main_reader = StripedDecodeReader(
                    _resilient_main, spans, cfg.frame_stride,
                    workers=workers, total_frames=meta.total_frames,
                    meta=meta)
            else:
                main_reader = ResilientReader(main_reader, _open_analysis,
                                              total_frames=meta.total_frames)
                main_reader = StridedPrefetchReader(_kf_wrap(main_reader),
                                                    cfg.frame_stride,
                                                    reopen=_open_analysis)
            reader_holder["r"] = main_reader
            if preview_p010 is not None:
                self._run_resources.append(preview_p010.release)
            if hdr_exporter is not None:
                src_rel = getattr(hdr_exporter.source, "release", None)
                if src_rel is not None:
                    self._run_resources.append(src_rel)
            with AsyncSaver(cfg.out_dir, jpg_quality=cfg.jpg_quality,
                            fsync=cfg.save_fsync,
                            async_save=cfg.async_save,
                            workers=int(getattr(cfg, "tpu_save_workers", 1)
                                        or 0),
                            hdr_depth=int(getattr(
                                cfg, "tpu_hdr_pipeline_depth", 3)),
                            render_timeout_sec=cfg.hdr_export_timeout_sec
                            if hdr_exporter is not None else 0.0) as saver:
                if hdr_exporter is not None:
                    # archive encodes ride the dedicated backpressured queue
                    hdr_exporter.archive_sink = saver.submit_archive
                ref_reid = self._seed_reid_ref(ref_paths) \
                    if self.reid_backend is not None else None
                self._throttle_stride = cfg.frame_stride
                mp = run_main_pass(main_reader, self.backend, cfg, bank,
                                   spans, saver, meta=meta,
                                   keyframes=keyframes,
                                   hdr_exporter=hdr_exporter,
                                   person_backend=self.person_backend,
                                   reid_backend=self.reid_backend,
                                   fullframe_backend=self.fullframe_backend,
                                   ref_reid_feat=ref_reid,
                                   progress=self._progress_cb,
                                   on_preview=self._on_preview,
                                   should_stop=self._should_stop,
                                   seek_request=self._poll_seek,
                                   preview_hdr_source=preview_p010,
                                   on_hit=self._on_hit,
                                   timer=self._timer)
            self._report_reader_health(main_reader, "main pass")
            self._release_run_resources()
            if self._timer is not None:
                self._status_cb("profile:\n" + self._timer.report(),
                                key="phase", force=True)
            if cfg.curate_enable and mp.hits:
                self._run_curator(bank)
            return EngineResult(True, list(spans), pres, mp)
        except Exception as e:  # noqa: BLE001 — surfaced like finished(ok=False)
            import traceback
            self._release_run_resources()
            return EngineResult(False, [], None, None,
                                f"{e}\n{traceback.format_exc()}")
        finally:
            # reset per-run command state ON EXIT: an Engine is reusable
            # across runs (see _release_run_resources), so a stop()/step()
            # from this run must not make the next one exit immediately.
            # Clearing on exit (not entry) keeps a stop() issued
            # concurrently with start() effective. pause (like speed) is a
            # persistent toggle — a run may start pre-paused and be stepped
            self._stop.clear()
            self._steps = 0
            self._seek_target = None

    def _release_run_resources(self) -> None:
        """Release decoder processes / prefetch threads / P010 pipes opened
        by run(); idempotent, exception-safe (a GUI session that runs the
        engine repeatedly must not leak a process per failed run)."""
        for rel in reversed(getattr(self, "_run_resources", [])):
            try:
                rel()
            except Exception:
                pass
        self._run_resources = []

    def _seed_reid_ref(self, ref_paths: List[str]) -> Optional[np.ndarray]:
        """ReID reference: embed the largest person in the reference photo,
        falling back to the whole image (reference: main.py:181-191)."""
        import cv2

        if not ref_paths or self.reid_backend is None:
            return None
        img = cv2.imread(ref_paths[0], cv2.IMREAD_COLOR)
        if img is None:
            return None
        crop = img
        if self.person_backend is not None:
            out = self.person_backend.detect_batch(img[None],
                                                   np.ones(1, bool))
            idxs = np.flatnonzero(out["mask"][0])
            if idxs.size:
                areas = [(out["boxes"][0][k][2] - out["boxes"][0][k][0])
                         * (out["boxes"][0][k][3] - out["boxes"][0][k][1])
                         for k in idxs]
                k = idxs[int(np.argmax(areas))]
                x1, y1, x2, y2 = (int(v) for v in out["boxes"][0][k])
                h, w = img.shape[:2]
                x1, y1 = max(0, x1), max(0, y1)
                x2, y2 = min(w, x2), min(h, y2)
                if x2 > x1 + 2 and y2 > y1 + 2:
                    crop = img[y1:y2, x1:x2]
        feats = self.reid_backend.extract([crop])
        return feats[0] if len(feats) else None

    def run_curator(self, bank: RefBank, pool: str = "",
                    out: str = "") -> None:
        """Curate a crop pool (reference Processor.run_curator,
        gui_app.py:4289); defaults to this session's crops/dataset_out."""
        self._run_curator(bank, pool, out)

    def _run_curator(self, bank: RefBank, pool: str = "",
                     out: str = "") -> None:
        from ..curator import Curator

        cfg = self.cfg
        pool = pool or os.path.join(cfg.out_dir, "crops")
        out = out or os.path.join(cfg.out_dir, "dataset_out")
        if not os.path.isdir(pool):
            return
        self._status_cb("curating", key="phase")
        canvas = int(getattr(self.backend, "det_size", 0) or 640)
        from ..curator.core import phash_sim_to_hamm

        cur = Curator(self.backend, bank, clip_backend=self.reid_backend,
                      canvas=canvas, batch=cfg.tpu_batch_frames)
        res = cur.run(pool, out, max_images=cfg.curate_max_images,
                      fd_gate=cfg.curate_fd_gate, lam=cfg.curate_lambda,
                      dedup_hamm=phash_sim_to_hamm(cfg.curate_phash_dedup),
                      cos_face_dedup=cfg.curate_cos_face_dedup,
                      weights=cfg.curate_weights,
                      bucket_quota=cfg.curate_bucket_quota,
                      use_yaw_quota=cfg.curate_use_yaw_quota)
        self._status_cb(
            f"curated {res['metrics']['selected']}/{res['metrics']['pool']}",
            key="curate_done")
