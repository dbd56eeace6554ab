"""Session configuration.

Field names and defaults are kept verbatim-compatible with the reference
``SessionConfig`` (reference: person_capture/gui_app.py:296-638) so that the
reference's preset JSON files load unchanged.  Fields that only make sense on
the reference's CUDA/TensorRT/Windows stack (``trt_*``, ``hdr_wic_*``,
``ff_hwaccel``) are accepted and preserved for preset round-trips but are
interpreted by the TPU runtime as no-ops or mapped onto the XLA equivalents
documented per-field below.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields
from typing import Tuple

_PATH_KEYS = ("video", "ref", "out_dir")


@dataclass
class SessionConfig:
    # ---- inputs / outputs ----
    video: str = ""
    ref: str = ""
    out_dir: str = "output"

    # ---- seek behavior ----
    seek_fast: bool = True
    seek_max_grabs: int = 12

    # ---- sampling / matching core ----
    ratio: str = "1:1,2:3,3:4"
    frame_stride: int = 2
    min_det_conf: float = 0.35
    face_thresh: float = 0.45
    ff_hwaccel: str = "cuda"  # ignored on TPU hosts (no NVDEC); kept for presets
    # external-ffmpeg pipe wire format: bgr24 | nv12 (nv12 halves the pipe
    # bytes; reference env PC_PIPE_PIXFMT, video_io.py:1225, made explicit)
    ff_pipe_pixfmt: str = "bgr24"
    # per-stage wall-time profile (decode/device/replay/save) surfaced in
    # the status stream at run end — the reference has no profiler
    # (SURVEY.md §5); TPU-extra observability knob
    tpu_profile: bool = False
    # jax.profiler trace directory for the whole run (device timelines +
    # XLA HLO, TensorBoard/XProf-viewable); "" = off. Complements
    # tpu_profile's host-side stage timers (SURVEY.md §5 tracing).
    tpu_jax_profile_dir: str = ""
    # JAX persistent compilation cache directory. "auto" (default) =
    # $XDG_CACHE_HOME/person_capture_tpu/xla; ""/"off" = disabled; else an
    # explicit directory. Compiled executables are serialized to disk so a
    # RESTARTED process (sweep daemon restart, repeated CLI runs) skips
    # the first-video compile cost instead of re-tracing + re-compiling
    # every program — probed supported on the axon PJRT plugin
    # (tools_compile_cache_probe.py: 0.64 s -> 0.07 s second-process
    # compile). The reference's analogue is ORT/TRT engine caching
    # (face_embedder.py session reuse); here it is one jax.config switch
    # applied before the first compile (main.maybe_enable_compile_cache).
    tpu_compile_cache_dir: str = "auto"
    # embed only the K highest-score face slots per frame (0 = all slots).
    # The ArcFace embedder dominates step FLOPs (~6 GFLOP/slot for r50)
    # and most slots are empty in real footage; decision-equivalence is
    # CI-tested (tests/test_embed_slots.py). Opt-in FLOP cut for
    # co-located production hosts.
    tpu_embed_slots: int = 0
    reid_thresh: float = 0.42
    combine: str = "min"  # min | avg | face_priority
    match_mode: str = "face_only"  # either | both | face_only | reid_only
    only_best: bool = True
    min_sharpness: float = 0.0
    min_gap_sec: float = 1.5
    min_box_pixels: int = 8000
    auto_crop_borders: bool = True

    # ---- HDR preview / export ----
    hdr_passthrough: bool = False
    hdr_screencap_fullres: bool = True
    hdr_archive_crops: bool = False
    hdr_crop_format: str = "avif"
    hdr_sdr_output_format: str = "png"
    # "windows_wic" selects the WIC-look color response, reproduced on TPU by
    # the color-match kernel (kernels/colormatch.py); "ffmpeg" selects the
    # plain tone-map kernel chain (kernels/hdr.py).
    hdr_sdr_conversion: str = "windows_wic"
    hdr_wic_speckle_cleanup: bool = True
    wic_shadow_deblob_strength: float = 0.0
    hdr_wic_avif_pixfmt: str = "yuv420p10le"
    hdr_wic_avif_range: str = "full"
    hdr_wic_experimental_primary: bool = False
    hdr_wic_yuv444_color_match: bool = True
    hdr_wic_block_corruption_guard_mode: str = "reject"  # reject | log | off
    hdr_wic_yuv444_color_match_clean_range: str = "limited"
    hdr_wic_yuv444_color_match_strength: float = 1.0
    hdr_wic_yuv444_color_match_luma_strength: float = 0.45
    hdr_wic_yuv444_color_match_chroma_strength: float = 0.85
    hdr_wic_yuv444_color_match_shadow_luma_protect: float = 0.85
    hdr_wic_yuv444_color_match_shadow_chroma_protect: float = 0.80
    hdr_wic_yuv444_color_match_lowfreq: float = 0.0
    hdr_wic_yuv444_color_match_ref_max_side: int = 960
    hdr_wic_yuv444_color_match_gpu_mode: str = "auto"  # auto | off | on (TPU device path)
    hdr_wic_yuv444_color_match_gpu_auto_min_pixels: int = 1_000_000
    hdr_wic_yuv444_color_match_preroll_sec: float = 0.50
    hdr_wic_yuv444_guide_cleanup: bool = False
    hdr_avif_wic_display_compat: bool = True
    # madvr_like | resolve_like | balanced | fast. Reference maps these to
    # libplacebo parameter presets (gui_app.py:12598+); this chain has no
    # libplacebo, so instead: madvr_like/resolve_like = full device chain,
    # balanced = color match fitted at half-res statistics reference,
    # fast = color match/speckle/peak-detect/dither off (documented
    # divergence; see hdr/stills.py HdrExportParams.from_cfg).
    hdr_sdr_quality: str = "madvr_like"
    hdr_sdr_tonemap: str = "auto"  # auto | bt.2390 | spline | st2094-40 | mobius | hable
    hdr_sdr_gamut_mapping: str = "clip"  # clip | perceptual | relative | saturation
    hdr_sdr_contrast_recovery: float = 0.30
    hdr_sdr_peak_detect: bool = True
    hdr_sdr_allow_inaccurate_fallback: bool = False
    hdr_export_timeout_sec: int = 300
    hdr_archive_timeout_sec: int = 90

    # ---- logging / lock ----
    log_interval_sec: float = 1.0
    lock_after_hits: int = 1
    lock_face_thresh: float = 0.28
    lock_reid_thresh: float = 0.30
    lock_face_roi_enable: bool = True
    lock_face_roi_pad: float = 1.25
    lock_face_roi_max_misses: int = 8
    score_margin: float = 0.03
    iou_gate: float = 0.05

    # ---- HDR tonemap tuning ----
    sdr_nits: float = 100.0
    tm_desat: float = 0.25
    tm_param: float = 0.40
    hdr_tonemap_pref: str = "auto"  # auto | libplacebo | zscale | scale

    # ---- model selection ----
    reid_backbone: str = "ViT-L-14"
    reid_pretrained: str = "laion2b_s32b_b82k"
    clip_face_backbone: str = "ViT-L-14"
    clip_face_pretrained: str = "laion2b_s32b_b82k"
    use_arcface: bool = True

    # ---- crop scoring ----
    face_target_close: float = 0.38
    face_target_upper: float = 0.20
    face_target_cowboy: float = 0.08
    face_target_body: float = 0.03
    face_target_tolerance: float = 0.04
    face_target_close_min_frac: float = 0.10
    w_close: float = 1.10
    w_upper: float = 1.00
    w_cowboy: float = 0.70
    w_body: float = 0.50
    lambda_facefrac: float = 2.0
    crop_center_weight: float = 0.8
    area_gamma: float = 0.60
    area_face_scale_weight: float = 0.70
    square_pull_face_min: float = 0.16
    square_pull_weight: float = 1.10
    tight_face_relax_thresh: float = 0.48
    tight_face_relax_scale: float = 0.5

    # ---- runtime / device ----
    device: str = "tpu"  # tpu | cpu (reference accepted cuda | cpu)
    yolo_model: str = "yolov8n.pt"
    face_model: str = "scrfd_10g_bnkps"
    save_annot: bool = False
    preview_every: int = 3

    # ---- I/O ----
    async_save: bool = True
    async_save_wait: bool = False
    save_fsync: bool = False
    jpg_quality: int = 85

    # ---- face fallback / gating ----
    face_fullframe_cadence: int = 12
    prefer_face_when_available: bool = True
    face_quality_min: float = 70.0
    face_visible_uses_quality: bool = True
    face_det_conf: float = 0.5
    face_det_pad: float = 0.08
    face_margin_min: float = 0.05
    require_face_if_visible: bool = True
    drop_reid_if_any_face_match: bool = True
    learn_bank_runtime: bool = False

    # ---- crop placement heuristics ----
    crop_face_side_margin_frac: float = 0.30
    crop_top_headroom_max_frac: float = 0.15
    crop_bottom_min_face_heights: float = 1.5
    crop_penalty_weight: float = 3.0
    crop_head_side_pad_frac: float = 0.88
    crop_head_top_pad_frac: float = 0.95
    crop_head_bottom_pad_frac: float = 0.30
    wide_face_aspect_penalty_weight: float = 10.0
    wide_face_min_frame_frac: float = 0.12
    wide_face_aspect_limit: float = 1.05
    side_guard_drop_enable: bool = True
    side_guard_drop_factor: float = 0.66
    face_anchor_down_frac: float = 1.1

    # ---- compose profiles ----
    compose_crop_enable: bool = True
    # body-aware composition: bind matched faces to an OWNING person box
    # (scored pick, core/geometry.find_person_box_for_face) so crops
    # anchor to the body, not just a face-derived proxy. Gates like the
    # reference (gui_app.py:5920-5938): face height ≤ assoc_max always
    # associates, cadence frames always associate. With this on (default)
    # the CLI builds the person detector even in face_only mode — its
    # program rides the submit pipeline, hidden behind host decode/replay
    compose_detect_person_for_face: bool = True
    compose_close_face_h_frac: float = 0.34
    compose_portrait_close_face_h_frac: float = 0.43
    compose_upper_face_h_frac: float = 0.22
    compose_body_face_h_frac: float = 0.085
    compose_wide_context_enable: bool = True
    compose_wide_context_face_h_frac: float = 0.16
    compose_wide_context_max_frame_face_frac: float = 0.18
    compose_wide_context_min_side_face_heights: float = 1.20
    compose_wide_context_prior: float = 0.18
    compose_wide_context_every_n: int = 5
    compose_landscape_face_penalty: float = 5.0
    compose_body_every_n: int = 6
    compose_person_assoc_max_face_frac: float = 0.30
    compose_person_detect_cadence: int = 6
    border_threshold: int = 22
    border_scan_frac: float = 0.25

    # ---- smart crop ----
    smart_crop_enable: bool = True
    smart_crop_steps: int = 6
    smart_crop_side_search_frac: float = 0.35
    smart_crop_use_grad: bool = True

    # ---- anti-zoom guards ----
    face_max_frac_in_crop: float = 0.42
    face_min_frac_in_crop: float = 0.18
    crop_min_height_frac: float = 0.28

    # ---- face-only controls ----
    disable_reid: bool = True
    face_fullframe_when_missed: bool = True
    face_fullframe_imgsz: int = 1408
    rot_adaptive: bool = True
    rot_every_n: int = 12
    rot_after_hit_frames: int = 8
    fast_no_face_imgsz: int = 512

    # ---- debug / diagnostics ----
    hdr_speckle_diag: bool = False
    hdr_speckle_diag_dir: str = ""
    debug_dump: bool = True
    debug_dir: str = "debug"
    overlay_scores: bool = False
    overlay_face_fd: bool = True
    lock_momentum: float = 0.7
    suppress_negatives: bool = False
    neg_tolerance: float = 0.35
    max_negatives: int = 5

    # ---- preview ----
    preview_max_dim: int = 1280
    preview_fps_cap: int = 20
    seek_preview_peek_every: int = 16

    # ---- faceless fallback ----
    allow_faceless_when_locked: bool = True
    faceless_reid_thresh: float = 0.40
    faceless_iou_min: float = 0.30
    faceless_persist_frames: int = 0
    faceless_min_area_frac: float = 0.03
    faceless_max_area_frac: float = 0.55
    faceless_center_max_frac: float = 0.12
    faceless_min_motion_frac: float = 0.02

    # ---- pre-scan ----
    prescan_enable: bool = True
    prescan_stride: int = 24
    prescan_max_width: int = 416
    prescan_decode_max_w: int = 384
    prescan_hdr_preview: bool = False
    prescan_face_conf: float = 0.5
    prescan_fd_enter: float = 0.45
    prescan_fd_add: float = 0.22
    prescan_fd_exit: float = 0.52
    prescan_add_cooldown_samples: int = 5
    prescan_rot_probe_period: int = 3
    prescan_probe_imgsz: int = 512
    prescan_no_upscale_det: bool = True
    prescan_probe_conf: float = 0.03
    prescan_heavy_90: int = 1536
    prescan_heavy_180: int = 1280
    prescan_min_segment_sec: float = 1.0
    prescan_pad_sec: float = 1.5
    prescan_bridge_gap_sec: float = 1.0
    prescan_exit_cooldown_sec: float = 0.50
    prescan_boundary_refine_sec: float = 0.75
    prescan_refine_stride_min: int = 3
    prescan_trim_pad: bool = True
    prescan_skip_trailing_refine: bool = True
    prescan_refine_budget_sec: float = 1.5
    prescan_bank_max: int = 64
    prescan_diversity_dedup_cos: float = 0.968
    prescan_replace_margin: float = 0.010
    prescan_fd9_skip: bool = True
    prescan_fd9_grace: int = 1
    prescan_fd9_probe_period: int = 2
    prescan_weights: Tuple[float, float, float] = (0.70, 0.25, 0.05)
    prescan_cache_mode: str = "auto"  # auto | refresh | off
    prescan_cache_dir: str = "prescan_cache"

    # ---- reference-stack knobs kept for preset compatibility (no-ops on TPU;
    #      the XLA equivalents are jit caches and donated device buffers) ----
    trt_lib_dir: str = ""
    trt_fp16_enable: bool = True
    trt_timing_cache_enable: bool = True
    trt_engine_cache_enable: bool = True
    trt_cache_root: str = "trt_cache"
    trt_builder_optimization_level: int = 5
    trt_cuda_graph_enable: bool = True
    trt_context_memory_sharing_enable: bool = True
    trt_auxiliary_streams: int = -1
    cuda_use_tf32: bool = True

    # ---- speed controls ----
    skip_yolo_when_faceonly: bool = True

    # ---- curator ----
    curate_enable: bool = True
    curate_max_images: int = 200
    curate_fd_gate: float = 0.45
    curate_cos_face_dedup: float = 0.985
    curate_phash_dedup: float = 0.92
    curate_lambda: float = 0.70
    curate_weights: Tuple[float, float, float] = (0.60, 0.35, 0.05)
    curate_bucket_quota: Tuple[float, float, float] = (0.50, 0.25, 0.25)
    curate_use_yaw_quota: bool = True

    # ---- TPU-native additions (not in the reference) ----
    # Frame batch size for the fused pre-scan / main-pass XLA programs.
    tpu_batch_frames: int = 128
    # Compute dtype for model forward passes ("bfloat16" | "float32").
    tpu_compute_dtype: str = "bfloat16"
    # Device mesh spec, e.g. "data:8" or "data:4,model:2"; "" = single chip.
    tpu_mesh: str = ""
    # Max detected faces kept per frame in fixed-shape device programs.
    tpu_max_faces: int = 8
    # Software-pipeline depth for the pre-scan/main-pass drivers: how many
    # submitted batches may be in flight before the oldest is fetched.
    # Depth 2 hides one full host↔device round trip behind compute —
    # measured 2.1× end-to-end on tunneled links (162→340 f/s) — and an
    # interleaved 5-round A/B at the production prescan shape measured a
    # further ~11% median win at depth 4 (310→344 f/s, relay-RTT jitter
    # absorbed by the extra in-flight batches; depth 8 added nothing).
    # Results are depth-independent (batches replay in submission order);
    # only the fd9 gate's skip decisions lag by `depth` batches instead
    # of one.
    tpu_pipeline_depth: int = 4
    # Decode workers (0 = auto: cores-1 capped at 8 — cap measured
    # via tools_bench_decodepool_workers.py; 1 on this 1-core
    # image). >1 stripes the span/sample plan over N reader threads each
    # owning its own decoder process (video/decodepool.py) — results are
    # order-identical to a single reader; decode throughput scales with
    # cores. The reference leans on decoder threading/NVDEC instead
    # (PC_FF_THREADS, PC_HWACCEL — video_io.py:1277-1282).
    tpu_decode_workers: int = 0
    # Keyframe-gated seek sampling (prescan + main pass skips). A
    # skip(count) normally grab-drains count frames (cv2's grab still
    # DECODES each one); when the container keyframe index shows an
    # exact seek would decode ≥12 fewer frames, the reader PROBES both
    # paths under a timer on the first eligible skips and locks the
    # cheaper one for the stream (video/reader.py KeyframeSkipReader).
    # Measured (tools_bench_seek_sampling.py, stride 24 / GOP 12):
    # cv2's exact-position seek loses to draining on BOTH mp4v (177 vs
    # 160 src f/s) and VP9 (19.0 vs 17.3) — its container seek + decoder
    # flush costs more than the saved decodes at this stride — and the
    # probe locks drain within 3 samples, holding wall-clock parity
    # (168.5 drain vs 168.8 auto). The seek path pays off only where the
    # underlying reader seeks cheaply relative to its decode (e.g. a
    # future in-process PyAV reader, or strides >> GOP); the probe makes
    # that an automatic, per-content decision instead of a config bet.
    # Long-GOP content (keyint > stride) never qualifies. Sample
    # positions are identical on every path (parity-tested on forced-GOP
    # synthetics). False = always drain (reference behavior:
    # gui_app.py:1640-1647 drains stride-1 grabs per sample).
    tpu_seek_sampling: bool = True
    # Encode workers behind the async saver (0 = auto: cores-1 capped at
    # 8; 1 on this 1-core image). PNG/AVIF encode is the reference's
    # documented CPU bottleneck (README.md:258-265, single saver thread);
    # K workers keep CSV submission order and per-item render-timeout/
    # cancel semantics (pipeline/saver.py).
    tpu_save_workers: int = 0
    # HDR export pipeline depth (single saver worker): device renders
    # in flight DURING each host PNG encode. Measured on the real chip
    # (tools_bench_hdr_depth.py, interleaved medians): 0.72 serial,
    # 0.96/1.62/1.75 exports/s at depth 1/2/3 — each slot hides one
    # more render + 8 MB download behind the encode. Memory cost ≈
    # depth full-crop BGR buffers on device.
    tpu_hdr_pipeline_depth: int = 3
    # Analysis-resize workers (0 = auto: cores-1 capped at 8; 1 on this
    # 1-core image = inline, no thread). When
    # tpu_mainpass_analysis_max_w is active, the per-frame host downscale
    # is the next driver-serialized stage after decode (profiled as the
    # bulk of main.submit); >1 resizes frames on a small thread pool AS
    # THEY ARRIVE from the reader, overlapping the downscale with the
    # submit/decode pipeline on multi-core hosts (cv2.resize releases the
    # GIL). Per-frame resize is deterministic, so results are
    # worker-count-independent.
    tpu_resize_workers: int = 0
    # Main-pass analysis upload width cap (0 = off). When set, the frame
    # batch is downscaled on host before the face/person programs —
    # detection/embedding run on the smaller frames, coordinates map back
    # to full reader resolution, and crops still save from the full-res
    # frames. On link-bound topologies the full-res upload dominates the
    # main pass (BASELINE.md); the reference letterboxes to imgsz anyway
    # (it never analyzes above imgsz 640/1408 — gui_app.py det sizes), so
    # detection content is equivalent for widths ≥ the detector size.
    # Default 640 = the CLI-default det size: the detector letterboxes to
    # 640 anyway, so detection content is unchanged and only ArcFace chip
    # fidelity for faces wider than ~112 px at 640 is at stake — measured
    # decision-identical (same 20/20 hits) vs 832 on the bench fixture
    # while 2.3× faster end-to-end on a slow tunnel (tools_bench_mainpass
    # _ab.py, BASELINE.md r4). Set 0 to upload full res.
    tpu_mainpass_analysis_max_w: int = 640

    # -- serialization (preset compatible with the reference's to/from_json) --
    def to_json(self, include_paths: bool = False) -> str:
        d = asdict(self)
        if not include_paths:
            for k in _PATH_KEYS:
                d.pop(k, None)
        return json.dumps(d, indent=2)

    @staticmethod
    def from_json(s: str, ignore_paths_in_json: bool = True) -> "SessionConfig":
        d = json.loads(s)
        c = SessionConfig()
        names = {f.name for f in fields(SessionConfig)}
        for k, v in d.items():
            if ignore_paths_in_json and k in _PATH_KEYS:
                continue
            if k in names:
                setattr(c, k, _coerce(c, k, v))
        return c


def _coerce(cfg: SessionConfig, key: str, value):
    """Coerce JSON scalars/lists back to the annotated field type."""
    cur = getattr(cfg, key)
    if isinstance(cur, tuple) and isinstance(value, (list, tuple)):
        return tuple(value)
    return value


# Keys the engine may update live mid-run (reference: gui_app.py LIVE set).
LIVE_KEYS = frozenset({
    "face_thresh", "reid_thresh", "match_mode", "combine", "only_best",
    "min_sharpness", "min_gap_sec", "min_box_pixels", "score_margin",
    "iou_gate", "lock_face_thresh", "lock_reid_thresh", "lock_after_hits",
    "preview_every", "preview_max_dim", "preview_fps_cap",
    "face_det_conf", "face_det_pad", "face_quality_min",
    "require_face_if_visible", "prefer_face_when_available",
    "frame_stride", "debug_dump", "overlay_scores", "overlay_face_fd",
    "smart_crop_enable", "compose_crop_enable",
    "prescan_fd_enter", "prescan_fd_exit",
})


# ---------------------------------------------------------------------------
# Documented no-op keys.
#
# Every SessionConfig field either changes runtime behavior (grep the
# package for its name) or appears here with the reason it cannot / must
# not on TPU. tests/test_config_wiring.py enforces the invariant — a new
# key that is neither consumed nor registered fails CI.
# ---------------------------------------------------------------------------
NOOP_KEYS = {
    "face_det_pad": (
        "reference pads a PERSON crop and re-runs face detection on it "
        "(gui_app.py:6273-6293); the TPU design detects on full frames in "
        "one batched program, so there is no per-person re-extract to pad"),
    "fast_no_face_imgsz": (
        "reference shrinks the detector imgsz during no-face streaks "
        "(face_embedder.py:489-497); XLA programs are fixed-shape — "
        "adaptivity moved to the recovery policy (pipeline/recovery.py) "
        "and the fd9 decode-skip gate instead"),
    "hdr_passthrough": (
        "reference streams P010 to a Vulkan HDR swapchain "
        "(pc_hdr_vulkan.cpp); TPU hosts have no display — previews are "
        "tone-mapped SDR frames (SURVEY.md §2.2 sanctions the collapse)"),
    "hdr_wic_experimental_primary": (
        "selects an experimental Windows-WIC decoder; no WIC exists off "
        "Windows — kernels/hdr.py replaces the WIC decode entirely"),
    "hdr_wic_yuv444_color_match_gpu_mode": (
        "reference chooses CPU-numpy vs torch-CUDA for the color match "
        "(gui_app.py:10041-10061); the match is always part of the fused "
        "device program here — there is no split to configure"),
    "hdr_wic_yuv444_color_match_gpu_auto_min_pixels": (
        "threshold for the gpu_mode auto split above; same rationale"),
    "reid_pretrained": (
        "names the OpenCLIP checkpoint family; consumed by the offline "
        "converter workflow (tools/convert_weights.py), not at runtime — "
        "runtime weights load from explicit .npz paths"),
    "clip_face_pretrained": (
        "same as reid_pretrained, for the CLIP face-embedding fallback"),
    "trt_lib_dir": "TensorRT plumbing; XLA compiled programs replace TRT "
                   "engines (kept for preset round-trip compatibility)",
    "trt_fp16_enable": "see trt_lib_dir; bf16 compute is the TPU analogue "
                       "(tpu_compute_dtype)",
    "trt_timing_cache_enable": "see trt_lib_dir; XLA's compilation cache "
                               "is the analogue",
    "trt_engine_cache_enable": "see trt_lib_dir",
    "trt_cache_root": "see trt_lib_dir",
    "trt_builder_optimization_level": "see trt_lib_dir",
    "trt_cuda_graph_enable": "see trt_lib_dir; jit-compiled programs are "
                             "already replayable graphs",
    "trt_context_memory_sharing_enable": "see trt_lib_dir",
    "trt_auxiliary_streams": "see trt_lib_dir",
    "cuda_use_tf32": "CUDA matmul precision knob; TPU equivalent is "
                     "tpu_compute_dtype=bfloat16",
}
