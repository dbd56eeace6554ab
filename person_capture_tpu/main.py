"""CLI — argument-compatible with the reference ``person_capture.main``
(person_capture/main.py:146-161), driving the TPU pipeline:

    python -m person_capture_tpu.main --video V --ref R --out OUT [...]

Extra TPU-era flags: --prescan, --batch, --det-size, --face-det-conf,
--match-mode, --mesh, --compute-dtype, and --scrfd-weights /
--arcface-weights checkpoints (flax .npz or converted torch layouts; see
models/loaders.py and tools/convert_weights.py).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser(require_video: bool = True) -> argparse.ArgumentParser:
    """``require_video=False`` lets corpus frontends (sweep.py) reuse the
    full flag surface while supplying videos their own way."""
    ap = argparse.ArgumentParser(prog="person_capture_tpu.main")
    ap.add_argument("--video", required=require_video, default="",
                    help="path to video file")
    ap.add_argument("--ref", required=True, action="append",
                    help="reference image(s) of the target person; "
                         "repeatable and/or ';'-separated")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ratio", default="2:3", help="crop aspect ratio W:H")
    ap.add_argument("--frame-stride", type=int, default=2)
    ap.add_argument("--min-det-conf", type=float, default=0.35)
    ap.add_argument("--face-thresh", type=float, default=0.32)
    ap.add_argument("--reid-thresh", type=float, default=0.38)
    ap.add_argument("--combine", default="min",
                    choices=["min", "avg", "face_priority"])
    ap.add_argument("--match-mode", default="face_only",
                    choices=["face_only", "either", "both", "reid_only"])
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu", "cuda"])
    ap.add_argument("--save-annot", action="store_true")
    ap.add_argument("--yolo", default="yolov8n.pt")
    ap.add_argument("--min-sharpness", type=float, default=0.0)
    # TPU-era additions
    ap.add_argument("--prescan", dest="prescan", action="store_true",
                    default=False, help="enable span pre-scan")
    ap.add_argument("--batch", type=int, default=64,
                    help="frames per fused device step")
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--min-gap-sec", type=float, default=0.0)
    ap.add_argument("--face-det-conf", type=float, default=0.5,
                    help="face detector candidate threshold")
    ap.add_argument("--scrfd-weights", default="auto",
                    help=".npz checkpoint | auto (bundled synthetic "
                         "weights) | random")
    ap.add_argument("--arcface-weights", default="auto",
                    help=".npz checkpoint | auto (bundled synthetic "
                         "weights) | random")
    ap.add_argument("--face-model", default="scrfd_2.5g")
    ap.add_argument("--arcface-model", default="auto",
                    help="w600k_r50 | glintr100 | arcface_synth | auto "
                         "(bundled trained embedder when present)")
    ap.add_argument("--reid-weights", default="auto",
                    help="ReID tower checkpoint: .npz | open_clip .pt | "
                         "auto (bundled trained clip_reid_s) | random")
    ap.add_argument("--mesh", default="",
                    help="device mesh spec, e.g. 'data:4,model:2'; ''=1 chip")
    # multi-host: run the same command on every host. On TPU pods the
    # coordinator/topology auto-discover (pass --multihost alone); manual
    # clusters pass all three (parallel/multihost.py)
    ap.add_argument("--multihost", action="store_true", default=False,
                    help="join the jax.distributed runtime (TPU pod "
                         "auto-discovery when the address flags are unset)")
    ap.add_argument("--coordinator", default="",
                    help="coordinator address host:port (multi-host)")
    ap.add_argument("--num-processes", type=int, default=0,
                    help="total process count (multi-host)")
    ap.add_argument("--process-id", type=int, default=-1,
                    help="this process's index (multi-host)")
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--preset", default="",
                    help="SessionConfig JSON preset (reference preset files "
                         "load unchanged); explicit flags override it")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="override any SessionConfig field by name "
                         "(repeatable; applied last)")
    return ap


def build_config(args, ap):
    """CLI args (+ optional --preset JSON, + --set overrides) → SessionConfig.
    Precedence: preset < explicitly-passed flags < --set."""
    from .config import SessionConfig

    if args.preset:
        with open(args.preset) as fh:
            cfg = SessionConfig.from_json(fh.read())
    else:
        cfg = SessionConfig()

    def flag(dest: str, field: str) -> None:
        """Apply a CLI flag onto cfg; with a preset loaded, only flags the
        user actually passed (value != parser default) override it."""
        v = getattr(args, dest)
        if not args.preset or v != ap.get_default(dest):
            setattr(cfg, field, v)

    cfg.video = args.video
    cfg.ref = ";".join(args.ref) if isinstance(args.ref, list) else args.ref
    cfg.out_dir = args.out
    flag("ratio", "ratio")
    flag("frame_stride", "frame_stride")
    flag("min_det_conf", "min_det_conf")
    flag("face_thresh", "face_thresh")
    flag("reid_thresh", "reid_thresh")
    flag("combine", "combine")
    flag("match_mode", "match_mode")
    flag("device", "device")
    # the prescan cache keys on cfg.face_model (the bank's embedding space
    # follows the detector/embedder family) — without this, runs with
    # different --face-model values collided on the same cache entry
    flag("face_model", "face_model")
    flag("save_annot", "save_annot")
    flag("yolo", "yolo_model")
    flag("min_sharpness", "min_sharpness")
    flag("min_gap_sec", "min_gap_sec")
    flag("face_det_conf", "face_det_conf")
    flag("prescan", "prescan_enable")
    flag("batch", "tpu_batch_frames")
    flag("mesh", "tpu_mesh")
    flag("compute_dtype", "tpu_compute_dtype")

    # --set KEY=VALUE: typed override of any SessionConfig field (applied
    # last; replaces the reference's env-var side channel for one-offs)
    import json as _json

    for ov in args.overrides:
        k, sep, v = ov.partition("=")
        if not sep or not hasattr(cfg, k):
            ap.error(f"--set {ov!r}: unknown config field {k!r}")
        cur = getattr(cfg, k)
        try:
            if isinstance(cur, bool):
                val = v.strip().lower() in ("1", "true", "yes", "on")
            elif isinstance(cur, int):
                val = int(v)
            elif isinstance(cur, float):
                val = float(v)
            elif isinstance(cur, (tuple, list)):
                val = type(cur)(_json.loads(v))
            else:
                val = v
        except (ValueError, _json.JSONDecodeError) as e:
            ap.error(f"--set {ov!r}: {e}")
        setattr(cfg, k, val)
    return cfg


def resolve_yolo(yolo_model: str, dtype=None):
    """Resolve the person-detector spec to (yolo_cfg, weights).

    Bundled synthetic-trained weights for known names; a user-supplied
    checkpoint path loads for real (ultralytics .pt via
    models/loaders.load_yolov8_torch, flax .npz via the zoo). A spec that
    resolves to nothing raises — never a silent random-init run."""
    from .models import yolov8 as YV
    from .models.zoo import BUNDLED, resolve_weights

    yolo_spec = str(yolo_model or "yolov8n.pt")
    yolo_name = (os.path.splitext(os.path.basename(yolo_spec))[0]
                 .replace("-", "_")) or "yolov8n"
    yolo_cfg = YV.CONFIGS.get(yolo_name, YV.YOLOV8N)
    if os.path.isfile(yolo_spec):
        if yolo_spec.lower().endswith((".pt", ".pth")):
            import jax as _jax

            from .models.loaders import load_yolov8_torch
            from .tools.convert_weights import torch_param_dict

            _m, _v = YV.init_yolo(_jax.random.PRNGKey(0), yolo_cfg,
                                  size=640, dtype=dtype)
            return yolo_cfg, load_yolov8_torch(
                _v, yolo_cfg, torch_param_dict(yolo_spec), strict=True)
        return yolo_cfg, resolve_weights(yolo_spec, yolo_name)
    if yolo_name not in BUNDLED:
        raise FileNotFoundError(
            f"--yolo {yolo_spec!r}: not a file and no bundled weights "
            f"for {yolo_name!r}")
    return yolo_cfg, resolve_weights("auto", yolo_name)


def resolve_reid(backbone: str, weights_spec: str = "auto"):
    """Resolve the ReID tower to ``(clip_cfg, variables|None)``.

    "auto" prefers the bundled synthetic-trained compact tower (swapping
    the arch to ``clip_reid_s`` exactly like arcface "auto" swaps to the
    bundled embedder — no egress exists here for open_clip checkpoints,
    reference reid_embedder.py:10-57 downloads ViT-L-14/laion2b at first
    use). An explicit checkpoint loads the REQUESTED backbone: open_clip
    torch state dicts via models/loaders.load_clip_torch, flax .npz via
    the zoo. "random" keeps the requested arch at random init."""
    from .models import clip_vit as CV
    from .models.zoo import resolve_weights

    spec = (weights_spec or "auto").strip()
    cfg = CV.CONFIGS.get(backbone, CV.VIT_L_14)
    if spec.lower() in ("random", "none"):
        return cfg, None
    if os.path.isfile(spec):
        if spec.lower().endswith((".pt", ".pth", ".bin")):
            import jax as _jax

            from .models.loaders import load_clip_torch
            from .tools.convert_weights import torch_param_dict

            _m, _v = CV.init_clip(_jax.random.PRNGKey(0), cfg)
            return cfg, load_clip_torch(_v, cfg, torch_param_dict(spec))
        return cfg, resolve_weights(spec, cfg.name)
    if spec.lower() not in ("auto", ""):
        raise FileNotFoundError(
            f"--reid-weights {spec!r}: not a file and not auto/random")
    w = resolve_weights("auto", "clip_reid_s")
    if w is not None:
        return CV.REID_S, w
    return cfg, None


def maybe_pin_platform(cfg) -> None:
    """Pin jax to CPU when ``cfg.device == "cpu"``. Must run BEFORE any
    backend is touched: env vars are not enough when a PJRT plugin (axon)
    forces the default platform from sitecustomize. "tpu" keeps the
    environment default; "cuda" is accepted for reference-preset
    compatibility (no CUDA exists on TPU hosts)."""
    if str(getattr(cfg, "device", "tpu")).lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def resolve_compile_cache_dir(cfg) -> str:
    """Resolve ``cfg.tpu_compile_cache_dir`` to a directory or ''.

    "auto" (the default) -> $XDG_CACHE_HOME/person_capture_tpu/xla (or
    ~/.cache/...); ""/"off"/"none"/"0" -> disabled; anything else is an
    explicit directory."""
    d = str(getattr(cfg, "tpu_compile_cache_dir", "") or "").strip()
    if d.lower() in ("", "off", "none", "0", "false"):
        return ""
    if d.lower() == "auto":
        root = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"),
                                           ".cache"))
        return os.path.join(root, "person_capture_tpu", "xla")
    return d


def maybe_enable_compile_cache(cfg) -> None:
    """Point JAX's persistent compilation cache at
    ``resolve_compile_cache_dir(cfg)`` (no-op when disabled).

    Must run BEFORE the first compile: a restarted process (sweep-daemon
    restart, repeated CLI invocations on the same host) then loads its
    executables from disk instead of paying the first-video compile cost
    again. The reference caches compiled inference engines the same way
    (ORT/TRT engine + session reuse, person_capture/face_embedder.py);
    here the whole multi-model pipeline is a handful of jitted programs,
    so one cache directory covers every backend. Default-ON ("auto"):
    tools_compile_cache_probe measured the axon PJRT plugin serving the
    second process's compile from disk (0.64 s -> 0.07 s), so repeated
    runs skip the first-video compile cost. Failure to create the
    directory (read-only $HOME) degrades to no-cache with a warning
    rather than failing the run."""
    d = resolve_compile_cache_dir(cfg)
    if not d:
        return
    import jax

    try:
        os.makedirs(d, exist_ok=True)
    except OSError as e:  # read-only home: degrade, don't die
        print(f"[pc] compile cache disabled ({e})", file=sys.stderr)
        return
    jax.config.update("jax_compilation_cache_dir", d)


def maybe_init_multihost(args, out_dir: str) -> str:
    """Join the global distributed runtime when requested; returns the
    output root this process should write under.

    Must run BEFORE the first backend touch (the device list must already
    span all processes when the mesh builds). SPMD: every process runs the
    identical pipeline; only the primary writes user-visible outputs —
    secondary hosts keep their (deterministic, identical) artifacts in a
    scratch subdir so shared filesystems never see write races."""
    if not (args.multihost or args.coordinator):
        return out_dir
    from .parallel import multihost as MH

    MH.initialize(
        coordinator=args.coordinator or None,
        num_processes=args.num_processes if args.num_processes > 0
        else None,
        process_id=args.process_id if args.process_id >= 0 else None)
    if not MH.is_primary():
        out_dir = os.path.join(out_dir, f".proc{MH.process_index()}")
    return out_dir


def build_runtime(cfg, args, ap) -> dict:
    """Resolve weights and build every model backend the run needs, ONCE.

    The returned runtime is reusable across videos (sweep.py): weights are
    device-resident and jit programs shape-keyed inside the backends, so a
    second video pays no model build or compile. Per-run adaptive state
    (the recovery ladder's rotation streaks) lives in the wrapper that
    :func:`make_engine` creates fresh per video."""
    from .pipeline.backends import ScrfdArcFaceBackend

    from .models import arcface as AF
    from .models import scrfd as SD

    import jax.numpy as jnp

    # mesh/dtype flags flow through build_config like every other flag, so
    # the documented precedence (preset < explicit flags < --set) holds for
    # them too; read the post-override values back from cfg
    mesh_spec = cfg.tpu_mesh
    dtype = (jnp.bfloat16 if cfg.tpu_compute_dtype == "bfloat16"
             else jnp.float32)
    from .models.zoo import resolve_weights

    # face detector config: SCRFD names resolve from models/scrfd.py;
    # "yolov8n-face"-style names select the alternate YOLOv8-face backend
    # (reference face_embedder.py:36-51). Reference names like
    # "scrfd_10g_bnkps" map onto the matching arch config.
    from .models import yolov8 as YV

    fm = os.path.basename(args.face_model)
    for ext in (".pt", ".pth", ".onnx", ".npz"):
        if fm.lower().endswith(ext):       # NOT splitext: "scrfd_2.5g"
            fm = fm[:-len(ext)]            # has a dot inside the name
            break
    fm = fm.replace("-", "_").replace("_bnkps", "")
    if fm in YV.CONFIGS and YV.CONFIGS[fm].kpt_shape[0]:
        face_cfg = YV.CONFIGS[fm]
    else:
        face_cfg = SD.CONFIGS.get(fm, SD.SCRFD_2_5G)

    scrfd_w = resolve_weights(args.scrfd_weights, face_cfg.name)
    # arcface: "auto" prefers the bundled synthetic-identity embedder;
    # explicit model names + user checkpoints (torch layouts) still load
    # via models/loaders.py
    arc_model_name = args.arcface_model
    if arc_model_name == "auto":
        from .models.zoo import bundled_weights_path

        arc_model_name = ("arcface_synth"
                          if bundled_weights_path("arcface_synth")
                          else "w600k_r50")
    arc_cfg = AF.CONFIGS.get(arc_model_name, AF.W600K_R50)
    arc_w = None
    if args.arcface_weights.lower() in ("auto", ""):
        arc_w = resolve_weights("auto", arc_model_name)
    elif args.arcface_weights.lower().endswith(".onnx"):
        # checkpoint-exact ONNX execution (models/onnx_zoo) — the
        # reference's own w600k_r50.onnx format, face_embedder.py:68-83
        arc_w = resolve_weights(args.arcface_weights, arc_model_name)
    elif args.arcface_weights.lower() not in ("random", "none"):
        from .models.loaders import load_checkpoint

        import jax as _jax
        _m, _v = AF.init_arcface(_jax.random.PRNGKey(0), arc_cfg, dtype=dtype)
        arc_w = load_checkpoint(args.arcface_weights, "arcface", _v, arc_cfg)
    clip_face_cfg = None
    if not cfg.use_arcface:
        from .models import clip_vit as CV

        clip_face_cfg = CV.CONFIGS.get(cfg.clip_face_backbone)
    if mesh_spec:
        from .pipeline.backends import ShardedScrfdArcFaceBackend

        backend = ShardedScrfdArcFaceBackend(
            mesh_spec=mesh_spec,
            scrfd_cfg=face_cfg,
            arcface_cfg=arc_cfg,
            det_size=args.det_size, score_thresh=cfg.face_det_conf,
            max_faces=cfg.tpu_max_faces,
            dtype=dtype, scrfd_weights=scrfd_w, arcface_weights=arc_w)
    else:
        backend = ScrfdArcFaceBackend(
            scrfd_cfg=face_cfg,
            arcface_cfg=arc_cfg,
            det_size=args.det_size, score_thresh=cfg.face_det_conf,
            max_faces=cfg.tpu_max_faces,
            use_arcface=cfg.use_arcface,
            clip_face_cfg=clip_face_cfg,
            embed_slots=int(getattr(cfg, "tpu_embed_slots", 0) or 0),
            dtype=dtype, scrfd_weights=scrfd_w, arcface_weights=arc_w)

    # high-imgsz full-frame re-probe backend (reference full-frame face
    # short-circuit, gui_app.py:6030-6219; imgsz 1408): compiled lazily on
    # first rescue batch, shares the arcface weights family. Mesh runs get
    # the same rescue with the rescue batch data-parallel over the mesh
    # (the heavy canvas is also spatially shardable —
    # parallel/mesh.build_sharded_fullframe_detect — for latency-bound
    # single-frame probes).
    fullframe_backend = None
    if (cfg.face_fullframe_when_missed
            and int(cfg.face_fullframe_imgsz) > int(args.det_size)):
        from .pipeline.backends import LazyBackend

        if mesh_spec:
            from .pipeline.backends import ShardedScrfdArcFaceBackend

            fullframe_backend = LazyBackend(
                lambda: ShardedScrfdArcFaceBackend(
                    mesh_spec=mesh_spec,
                    scrfd_cfg=face_cfg,
                    arcface_cfg=arc_cfg,
                    det_size=int(cfg.face_fullframe_imgsz),
                    score_thresh=cfg.face_det_conf,
                    max_faces=cfg.tpu_max_faces,
                    dtype=dtype, scrfd_weights=scrfd_w,
                    arcface_weights=arc_w))
        else:
            # mirror the primary backend's embedding configuration — a
            # CLIP-face primary with an ArcFace rescue would score the
            # same RefBank in two incompatible embedding spaces
            fullframe_backend = LazyBackend(lambda: ScrfdArcFaceBackend(
                scrfd_cfg=face_cfg,
                arcface_cfg=arc_cfg,
                det_size=int(cfg.face_fullframe_imgsz),
                score_thresh=cfg.face_det_conf,
                max_faces=cfg.tpu_max_faces,
                use_arcface=cfg.use_arcface,
                clip_face_cfg=clip_face_cfg,
                dtype=dtype, scrfd_weights=scrfd_w, arcface_weights=arc_w))

    # person/ReID backends only when the requested mode needs them. The
    # person detector ALSO builds for body-aware compose association
    # (compose_detect_person_for_face, default on — the reference always
    # constructs its PersonDetector and binds matched faces to owning
    # person boxes, gui_app.py:4490 + 5920-5938); the person program rides
    # the depth-2 pipeline, so its device time hides behind the host
    # decode/replay on measured runs
    person_backend = None
    reid_backend = None
    if (cfg.match_mode != "face_only" or not cfg.skip_yolo_when_faceonly
            or cfg.compose_detect_person_for_face):
        from .pipeline.backends import YoloPersonBackend

        try:
            yolo_cfg, yolo_w = resolve_yolo(cfg.yolo_model, dtype=dtype)
        except FileNotFoundError as e:
            ap.error(str(e))
        person_backend = YoloPersonBackend(
            cfg=yolo_cfg, conf=cfg.min_det_conf, weights=yolo_w)
    if cfg.match_mode in ("either", "both", "reid_only"):
        from .pipeline.backends import ClipReidBackend

        cfg.disable_reid = False
        # reid_backbone selects the OpenCLIP tower (reference
        # reid_embedder.py:10-57 default ViT-L-14/laion2b);
        # --reid-weights resolves bundled/user checkpoints (resolve_reid)
        try:
            reid_cfg, reid_w = resolve_reid(cfg.reid_backbone,
                                            args.reid_weights)
        except FileNotFoundError as e:
            ap.error(str(e))
        reid_backend = ClipReidBackend(cfg=reid_cfg, weights=reid_w)

    return {"inner_face": backend, "face_cfg": face_cfg,
            "person": person_backend, "reid": reid_backend,
            "fullframe": fullframe_backend}


def make_engine(cfg, runtime: dict, status=None, progress=None):
    """Engine over a shared :func:`build_runtime` — the per-video pieces
    (recovery ladder state, engine callbacks) are fresh; the heavy model
    backends are shared."""
    from .pipeline.engine import Engine
    from .pipeline.recovery import RecoveringFaceBackend, RecoveryPolicy

    # batched recovery ladder (rotations / scale-TTA / edge-pad) around the
    # face backend — reference face_embedder.py:2251-2443 semantics
    policy = RecoveryPolicy.from_config(cfg)
    # ±45/±135° probes only with the YOLO-face backend (reference
    # face_embedder.py:1935-2036 scopes them to the YOLO path)
    policy.affine_probes = bool(
        getattr(runtime["face_cfg"], "kpt_shape", (0, 0))[0])
    face = RecoveringFaceBackend(runtime["inner_face"], policy)
    return Engine(cfg, face, person_backend=runtime["person"],
                  reid_backend=runtime["reid"],
                  fullframe_backend=runtime["fullframe"],
                  status=status or (lambda m: print(f"[pc] {m}")),
                  progress=progress or (lambda p: None))


def main(argv=None) -> int:
    ap = build_parser()
    args = ap.parse_args(argv)

    # build the config BEFORE the platform pin so device=cpu from a preset
    # or --set (not just the CLI flag) takes effect; build_config touches
    # no jax backend
    cfg = build_config(args, ap)
    maybe_pin_platform(cfg)
    maybe_enable_compile_cache(cfg)
    cfg.out_dir = maybe_init_multihost(args, cfg.out_dir)

    runtime = build_runtime(cfg, args, ap)
    eng = make_engine(cfg, runtime)
    result = eng.run()
    if not result.ok:
        print(f"FAILED: {result.error}", file=sys.stderr)
        return 1
    mp = result.mainpass
    print(f"Done. Hits: {len(mp.hits) if mp else 0}. "
          f"Index: {cfg.out_dir}/index.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
