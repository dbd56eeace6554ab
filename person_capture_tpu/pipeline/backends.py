"""Inference backends for the pipelines.

A backend turns a batch of decoded frames into fixed-shape face detections +
identity embeddings. Two implementations:

* :class:`ScrfdArcFaceBackend` — the real fused XLA program (letterbox →
  SCRFD → 5-pt align → ArcFace → quality) replacing the reference's
  per-frame ``FaceEmbedder.extract`` ladder (face_embedder.py:1663-2502).
* :class:`OracleBackend` — ground-truth-driven backend for tests and
  pipeline benchmarks: identical interface, detections read from a
  :class:`~person_capture_tpu.video.synthetic.SyntheticVideo` table.

Outputs (host numpy, fixed shapes):
  boxes ``[B, F, 4]`` xyxy in *reader frame coords*, kps ``[B, F, 5, 2]``,
  scores ``[B, F]``, mask ``[B, F]`` bool, feats ``[B, F, D]`` L2-normalized,
  quality ``[B, F]`` (Laplacian variance of the aligned chip).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Protocol

import numpy as np


def pad_batch(frames, batch: int, idxs=None):
    """Stack a partial batch and pad it to the fixed program shape by
    repeating the last frame (and index) with a valid=False tail — the one
    padding contract every pipeline call site shares.

    Returns ``(arr [batch, ...], idxs [batch] | None, valid [batch], n)``.
    """
    n = len(frames)
    arr = np.stack(frames)
    if n < batch:
        arr = np.concatenate([arr, np.repeat(arr[-1:], batch - n, axis=0)],
                             axis=0)
    valid = np.zeros((batch,), bool)
    valid[:n] = True
    out_idxs = None
    if idxs is not None:
        idxs = list(idxs)
        out_idxs = np.asarray(idxs + [idxs[-1]] * (batch - n))
    return arr, out_idxs, valid, n


def extract_single_image(backend, img: np.ndarray, canvas: int = 0):
    """Run a face backend on ONE arbitrary-size image using a fixed
    [1, canvas, canvas, 3] device shape (avoids a recompile per image
    size), returning detections in original-image coordinates. Default
    canvas = the backend's det_size (keeps the extra compiled shape small)."""
    import cv2

    canvas = int(canvas or getattr(backend, "det_size", 0) or 640)
    s = min(1.0, canvas / max(img.shape[0], img.shape[1]))
    if s < 1.0:
        img = cv2.resize(img, (int(round(img.shape[1] * s)),
                               int(round(img.shape[0] * s))),
                         interpolation=cv2.INTER_AREA)
    arr = np.zeros((1, canvas, canvas, 3), np.uint8)
    arr[0, :img.shape[0], :img.shape[1]] = img
    out = backend.extract_batch(arr, np.ones(1, bool))
    inv = 1.0 / max(s, 1e-6)
    out["boxes"] = out["boxes"] * inv
    out["kps"] = out["kps"] * inv
    return out


class LazyBackend:
    """Defer backend construction to first use. Rescue backends (e.g. the
    face_fullframe_imgsz high-res re-probe) often never trigger; building
    their params eagerly costs ~20 s on tunneled TPU links."""

    def __init__(self, factory):
        object.__setattr__(self, "_factory", factory)
        object.__setattr__(self, "_b", None)
        object.__setattr__(self, "_pending", {})

    def _get(self):
        if self._b is None:
            object.__setattr__(self, "_b", self._factory())
            for k, v in self._pending.items():
                setattr(self._b, k, v)
            self._pending.clear()
        return self._b

    def extract_batch(self, *a, **k):
        return self._get().extract_batch(*a, **k)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if self._b is None and name in self._pending:
            return self._pending[name]
        return getattr(self._get(), name)

    def __setattr__(self, name, value):
        # attribute WRITES forward to the real backend too (e.g. the
        # prescan driver sets score_thresh on its backend); stashing them
        # on the wrapper would silently shadow the built backend's value
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        elif self._b is not None:
            setattr(self._b, name, value)
        else:
            self._pending[name] = value


class FaceBatchBackend(Protocol):
    embed_dim: int
    max_faces: int

    def extract_batch(self, frames: np.ndarray, valid: np.ndarray,
                      frame_idxs: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        ...


class ScrfdArcFaceBackend:
    """SCRFD + ArcFace face pipeline: two device programs with host
    alignment between them.

    Default (fused, host_align=False): ONE device program per batch —
    letterbox → SCRFD → matmul-based 5-pt warp (ops/align.
    align_chips_matmul_jnp; TPU gathers would serialize at ~350 ms/batch,
    the hat-weight matmul warp runs in single-digit ms) → ArcFace →
    quality. host_align=True splits into detect / cv2-align-on-host /
    embed — exact cv2 warp parity at the cost of an extra host↔device
    round trip per batch (expensive over tunneled TPU links).

    The reference's per-frame rotation/TTA escalation ladder is replaced by
    batching (SURVEY.md §7 "dynamic control flow under XLA").
    """

    def __init__(self, scrfd_cfg=None, arcface_cfg=None, det_size: int = 640,
                 score_thresh: float = 0.5, max_faces: int = 8,
                 flip_tta: bool = False, dtype=None, seed: int = 0,
                 scrfd_weights=None, arcface_weights=None,
                 host_align: bool = False, transfer_format: str = "i420",
                 use_arcface: bool = True, clip_face_cfg=None,
                 clip_face_weights=None, embed_slots: int = 0):
        import jax
        import jax.numpy as jnp

        from ..models import arcface as AF
        from ..models import scrfd as SD
        from ..ops import align as AL
        from ..ops import quality as Q
        from ..ops.preprocess import letterbox_topleft

        scrfd_cfg = scrfd_cfg or SD.SCRFD_2_5G
        arcface_cfg = arcface_cfg or AF.W600K_R50
        dtype = dtype or jnp.bfloat16
        self.use_arcface = bool(use_arcface)
        # Embed only the K highest-score face slots (NMS packs by score).
        # The embedder dominates step FLOPs (~6 GFLOP/slot for r50) and most
        # slots are empty in real footage; 0 = embed every slot.
        self.embed_slots = int(embed_slots) if embed_slots else 0
        self.det_size = int(det_size)
        self.score_thresh = float(score_thresh)
        self.max_faces = int(max_faces)
        self.embed_dim = arcface_cfg.embed_dim
        self.flip_tta = bool(flip_tta)
        self.host_align = bool(host_align)
        # "i420": halve host→device bytes by shipping 4:2:0 YUV (the video
        # was 4:2:0 to begin with) and converting to BGR on device — the
        # host link is the throughput ceiling on tunneled TPU setups.
        # "bgr": ship frames as-is.
        try:
            import cv2 as _cv2  # noqa: F401
            self.transfer_format = transfer_format
        except ImportError:
            self.transfer_format = "bgr"

        from ..models.onnx_zoo import (OnnxArcFaceEncoder, OnnxScrfdDetector,
                                       is_onnx_path)

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.scrfd_model = self.scrfd_vars = None
        self.arcface_model = self.arcface_vars = None
        from ..models.yolov8 import YoloConfig

        if is_onnx_path(scrfd_weights):
            # checkpoint-exact path: execute the insightface graph itself
            # (reference loads these same files, face_embedder.py:55-65)
            detect = OnnxScrfdDetector(scrfd_weights, det_size=det_size,
                                       max_faces=self.max_faces)
        elif isinstance(scrfd_cfg, YoloConfig):
            # YOLOv8-face alternate detector (reference
            # face_embedder.py:36-51): same output contract as SCRFD, the
            # rest of the fused pipeline is backend-agnostic
            from ..models import yolov8 as YV

            self.scrfd_model, self.scrfd_vars = YV.init_yolo(
                k1, scrfd_cfg, size=det_size, dtype=dtype)
            if scrfd_weights is not None:
                self.scrfd_vars = scrfd_weights
            detect = partial(YV.detect_faces_yolo, self.scrfd_model,
                             self.scrfd_vars, max_faces=self.max_faces)
        else:
            self.scrfd_model, self.scrfd_vars = SD.init_scrfd(
                k1, scrfd_cfg, size=det_size, dtype=dtype)
            if scrfd_weights is not None:
                self.scrfd_vars = scrfd_weights
            detect = partial(SD.detect_faces, self.scrfd_model,
                             self.scrfd_vars, max_faces=self.max_faces)
        if self.use_arcface and is_onnx_path(arcface_weights):
            encode = OnnxArcFaceEncoder(arcface_weights,
                                        flip_tta=self.flip_tta)
            self.embed_dim = encode.embed_dim
        elif self.use_arcface:
            self.arcface_model, self.arcface_vars = AF.init_arcface(
                k2, arcface_cfg, dtype=dtype)
            if arcface_weights is not None:
                self.arcface_vars = arcface_weights
            encode = partial(AF.encode_chips, self.arcface_model,
                             self.arcface_vars, flip_tta=self.flip_tta)
        else:
            # reference fallback: identity embedding via an OpenCLIP image
            # tower when ArcFace is unavailable (face_embedder.py:958-965)
            from ..models import clip_vit as CV

            clip_cfg = clip_face_cfg or CV.VIT_L_14
            self.clip_model, self.clip_vars = CV.init_clip(
                jax.random.PRNGKey(seed + 1), clip_cfg, dtype=dtype)
            if clip_face_weights is not None:
                self.clip_vars = clip_face_weights
            self.embed_dim = clip_cfg.embed_dim
            encode = partial(CV.encode_images, self.clip_model,
                             self.clip_vars)

        @jax.jit
        def detect_fn(frames_u8, score_thresh):
            frames = frames_u8.astype(jnp.float32)
            padded, scales = jax.vmap(
                lambda f: letterbox_topleft(f, self.det_size))(frames)
            return detect(padded, scales, score_thresh)

        @jax.jit
        def embed_fn(chips, mask):
            feats = encode(chips)
            quality = Q.chip_quality(chips)
            feats = jnp.where(mask[:, None], feats, 0.0)
            quality = jnp.where(mask, quality, 0.0)
            return feats, quality

        def _i420_to_bgr(planes_u8):
            """[B, H*3/2, W] uint8 I420 → [B, H, W, 3] float32 BGR
            (full-range BT.601, matching cv2.COLOR_BGR2YUV_I420)."""
            b, h15, w = planes_u8.shape
            h = (h15 * 2) // 3
            y = planes_u8[:, :h, :].astype(jnp.float32)
            u = planes_u8[:, h:h + h // 4, :].reshape(b, h // 2, w // 2)
            v = planes_u8[:, h + h // 4:, :].reshape(b, h // 2, w // 2)
            u = jax.image.resize(u.astype(jnp.float32), (b, h, w),
                                 "linear") - 128.0
            v = jax.image.resize(v.astype(jnp.float32), (b, h, w),
                                 "linear") - 128.0
            r = y + 1.402 * v
            g = y - 0.344136 * u - 0.714136 * v
            bl = y + 1.772 * u
            return jnp.clip(jnp.stack([bl, g, r], axis=-1), 0.0, 255.0)

        @jax.jit
        def convert_fn(frames_u8):
            """Wire format → device-resident float32 BGR (shared-upload
            path: one host→device transfer feeds BOTH the face and the
            person programs instead of two independent uploads)."""
            if self.transfer_format == "i420":
                return _i420_to_bgr(frames_u8)
            return frames_u8.astype(jnp.float32)

        @jax.jit
        def fused_from_bgr(frames, score_thresh):
            padded, scales = jax.vmap(
                lambda f: letterbox_topleft(f, self.det_size))(frames)
            det = detect(padded, scales, score_thresh)
            kps = det["kps"]
            dmask = det["mask"]
            k = self.embed_slots or self.max_faces
            k = min(k, self.max_faces)
            chips = jax.vmap(
                lambda fr, kp, m: AL.align_chips_matmul_jnp(fr, kp, m))(
                frames, kps[:, :k], dmask[:, :k])
            b, f = chips.shape[0], chips.shape[1]
            flat = chips.reshape(b * f, *chips.shape[2:])
            feats_k = encode(flat).reshape(b, f, -1)
            quality_k = Q.chip_quality(flat).reshape(b, f)
            if k < self.max_faces:
                pad = self.max_faces - k
                feats = jnp.pad(feats_k, ((0, 0), (0, pad), (0, 0)))
                quality = jnp.pad(quality_k, ((0, 0), (0, pad)))
                # non-embedded slots must not claim detections: a
                # mask=True slot with zeroed feats reads as fd=1.0
                # downstream, which would CLOSE active prescan spans on
                # frames where the target was actually detected. NMS packs
                # by score, so the dropped slots are the k+1-th..Nth
                # lowest-score faces.
                det = dict(det)
                det["mask"] = det["mask"] & (
                    jnp.arange(self.max_faces) < k)[None, :]
            else:
                feats = feats_k
                quality = quality_k
            feats = jnp.where(det["mask"][..., None], feats, 0.0)
            quality = jnp.where(det["mask"], quality, 0.0)
            # pack every output into ONE array: a single device→host
            # transfer per batch (round trips cost ~30 ms each on tunneled
            # TPU links; 6 separate downloads would dominate the step)
            packed = jnp.concatenate([
                det["boxes"],                            # 4
                det["kps"].reshape(b, self.max_faces, 10),  # 10
                det["scores"][..., None],                # 1
                det["mask"].astype(jnp.float32)[..., None],  # 1
                quality[..., None],                      # 1
                feats,                                   # D
            ], axis=-1)
            return packed

        @jax.jit
        def fused_fn(frames_u8, score_thresh):
            # ONE program from the wire format: an unjitted composition
            # here costs a second device dispatch per batch (~100+ ms RPC
            # over tunneled links — the same gap the main pass closed with
            # its combined wire program in r4, CLAUDE.md)
            return fused_from_bgr(convert_fn(frames_u8), score_thresh)

        self._detect = detect_fn
        self._embed = embed_fn
        self._fused = fused_fn
        self._convert = convert_fn
        self._fused_bgr = fused_from_bgr
        self._jnp = jnp

    # ---- shared-upload path (one transfer feeds face + person programs) --
    def upload_shared(self, frames: np.ndarray):
        """Host frames → device-resident float32 BGR via the wire format
        (i420 halves the bytes); the returned array feeds both
        :meth:`submit_device` and YoloPersonBackend.submit_device."""
        wire = self._prepare_transfer(np.asarray(frames))
        return self._convert(self._jnp.asarray(wire))

    def submit_device(self, bgr_dev, valid, frame_idxs=None):
        packed_dev = self._fused_bgr(bgr_dev,
                                     self._jnp.float32(self.score_thresh))
        # same async device→host copy as submit_batch: the shared-upload
        # main-pass path otherwise serializes the multi-MB download behind
        # the host's previous-batch work (~30-300 ms RPC each)
        try:
            packed_dev.copy_to_host_async()
        except AttributeError:
            pass
        valid = np.asarray(valid).copy()
        return lambda: self._unpack(np.asarray(packed_dev), valid)

    # ---- combined face+person step: ONE dispatch, ONE download ----------
    def _combined_with(self, person):
        """jit a single program running the face chain AND the person
        detector on the shared device-resident BGR, packing EVERYTHING
        into one flat array. Separate programs cost 1 extra dispatch + 3
        extra downloads per batch (~4 RPC round trips at 30-300 ms each
        over tunneled links — measured 32.5→23 src f/s on the main
        pass). Cached per person-backend instance."""
        cached = getattr(self, "_combo_cache", None)
        if cached is not None and cached[0] is person:
            return cached[1]
        import jax

        jnp = self._jnp
        face_bgr = self._fused_bgr
        person_fused = person._fused

        @jax.jit
        def combo(bgr, face_thresh, person_conf):
            f = face_bgr(bgr, face_thresh)           # [B, F, 17+D]
            p = person_fused(bgr, person_conf)       # dict of [B, P, ...]
            b = f.shape[0]
            pp = jnp.concatenate(
                [p["boxes"], p["scores"][..., None],
                 p["mask"].astype(jnp.float32)[..., None]],
                axis=-1)                             # [B, P, 6]
            return jnp.concatenate([f.reshape(b, -1), pp.reshape(b, -1)],
                                   axis=1)

        self._combo_cache = (person, combo)
        return combo

    def submit_device_with_person(self, person, bgr_dev, valid,
                                  frame_idxs=None):
        """Shared-upload + combined program: returns ONE fetch producing
        ``(face_out, person_out)`` from a single packed download."""
        combo = self._combined_with(person)
        packed_dev = combo(bgr_dev, self._jnp.float32(self.score_thresh),
                           self._jnp.float32(person.conf))
        return self._combo_fetch(packed_dev, valid, person)

    def _combined_wire_with(self, person):
        """jit ONE program from the WIRE format (uint8 i420/bgr) through
        convert → face chain → person detector → packed output. The
        shared-upload design (`upload_shared` + `submit_device_with_person`)
        predates the combined program and costs an EXTRA device dispatch
        for the convert — ~100+ ms of RPC per batch over tunneled links,
        measured as the whole gap between the face-only and combined main
        pass (BASELINE.md r4). Cached per person-backend instance."""
        cached = getattr(self, "_combo_wire_cache", None)
        if cached is not None and cached[0] is person:
            return cached[1]
        import jax

        combo = self._combined_with(person)
        convert = self._convert

        @jax.jit
        def combo_wire(wire_u8, face_thresh, person_conf):
            return combo(convert(wire_u8), face_thresh, person_conf)

        self._combo_wire_cache = (person, combo_wire)
        return combo_wire

    def submit_wire_with_person(self, person, frames, valid,
                                frame_idxs=None):
        """Host frames → wire format → ONE upload + ONE dispatch running
        convert + face + person; returns one fetch producing
        ``(face_out, person_out)`` from a single packed download."""
        combo_wire = self._combined_wire_with(person)
        wire = self._prepare_transfer(np.asarray(frames))
        packed_dev = combo_wire(self._jnp.asarray(wire),
                                self._jnp.float32(self.score_thresh),
                                self._jnp.float32(person.conf))
        return self._combo_fetch(packed_dev, valid, person)

    def _combo_fetch(self, packed_dev, valid, person):
        try:
            packed_dev.copy_to_host_async()
        except AttributeError:
            pass
        valid = np.asarray(valid).copy()
        face_cols = 17 + self.embed_dim
        face_w = self.max_faces * face_cols
        p_det = int(person.max_det)

        def fetch():
            host = np.asarray(packed_dev)
            b = host.shape[0]
            face = host[:, :face_w].reshape(b, self.max_faces, face_cols)
            out = self._unpack(face, valid)
            pp = host[:, face_w:].reshape(b, p_det, 6)
            person_out = {
                "boxes": pp[..., :4],
                "scores": pp[..., 4],
                "mask": (pp[..., 5] > 0.5) & valid[:, None],
            }
            return out, person_out

        return fetch

    def _align_host(self, frames, kps, mask):
        """cv2 similarity warp of every valid face (reference:
        face_embedder.py:1465-1473 semantics: umeyama ≙ LMEDS on clean
        points, INTER_LINEAR, reflect border)."""
        import cv2

        from ..ops.align import ARC_DST, umeyama_similarity

        b, f = mask.shape
        chips = np.zeros((b * f, 112, 112, 3), np.float32)
        for i in range(b):
            frame = frames[i].astype(np.float32)
            for j in np.flatnonzero(mask[i]):
                m = umeyama_similarity(kps[i, j], ARC_DST)
                chips[i * f + j] = cv2.warpAffine(
                    frame, m, (112, 112), flags=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT)
        return chips

    def _unpack(self, packed: np.ndarray, valid) -> Dict[str, np.ndarray]:
        b, f = packed.shape[0], packed.shape[1]
        host = {
            "boxes": packed[..., 0:4],
            "kps": packed[..., 4:14].reshape(b, f, 5, 2),
            "scores": packed[..., 14],
            "mask": packed[..., 15] > 0.5,
            "quality": packed[..., 16],
            "feats": packed[..., 17:],
        }
        host["mask"] = host["mask"] & np.asarray(valid)[:, None]
        return host

    def _prepare_transfer(self, frames: np.ndarray) -> np.ndarray:
        """BGR frames → the configured host→device wire format."""
        if self.transfer_format != "i420":
            return frames
        import cv2

        b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        if h % 2 or w % 2:  # I420 needs even dims
            frames = frames[:, : h - (h % 2), : w - (w % 2)]
            h, w = frames.shape[1], frames.shape[2]
        out = np.empty((b, h * 3 // 2, w), np.uint8)
        for i in range(b):
            out[i] = cv2.cvtColor(frames[i], cv2.COLOR_BGR2YUV_I420)
        return out

    def submit_batch(self, frames, valid, frame_idxs=None):
        """Asynchronous path: enqueue the device program and return a
        zero-arg callable producing the host dict. Device dispatch is async
        in JAX, so submitting batch i+1 before fetching batch i overlaps
        compute with the device→host round trip — essential on tunneled
        links where a synchronous step pays ~300 ms of RPC latency."""
        jnp = self._jnp
        if self.host_align:
            out = self.extract_batch(frames, valid, frame_idxs)
            return lambda: out
        wire = self._prepare_transfer(np.asarray(frames))
        packed_dev = self._fused(jnp.asarray(wire),
                                 jnp.float32(self.score_thresh))
        # start the device→host copy as soon as the program finishes rather
        # than when the fetch closure runs (the depth-1 pipeline fetches
        # only after host work on the previous batch; see hdr/stills.py)
        try:
            packed_dev.copy_to_host_async()
        except AttributeError:
            pass
        valid = np.asarray(valid).copy()
        return lambda: self._unpack(np.asarray(packed_dev), valid)

    def extract_batch(self, frames, valid, frame_idxs=None):
        jnp = self._jnp
        frames = np.asarray(frames)
        if not self.host_align:
            wire = self._prepare_transfer(frames)
            packed = np.asarray(self._fused(jnp.asarray(wire),
                                            jnp.float32(self.score_thresh)))
            return self._unpack(packed, valid)
        det = self._detect(jnp.asarray(frames),
                           jnp.float32(self.score_thresh))
        host = {k: np.asarray(v) for k, v in det.items()}
        host["mask"] = host["mask"] & np.asarray(valid)[:, None]
        b, f = host["mask"].shape
        chips = self._align_host(frames, host["kps"], host["mask"])
        feats, quality = self._embed(jnp.asarray(chips),
                                     jnp.asarray(host["mask"].reshape(-1)))
        host["feats"] = np.asarray(feats).reshape(b, f, -1)
        host["quality"] = np.asarray(quality).reshape(b, f)
        return host


class ShardedScrfdArcFaceBackend:
    """Multi-chip variant of :class:`ScrfdArcFaceBackend`.

    The frame batch shards over the mesh's ``data`` axis and wide model
    kernels over the optional ``model`` axis (parallel/mesh.py). Batch size
    must divide by the data-axis size; the pipeline drivers' fixed-size
    padded batches guarantee that when ``tpu_batch_frames`` is chosen
    accordingly. Exposes the same extract_batch/submit_batch protocol.
    """

    def __init__(self, mesh=None, mesh_spec: str = "", scrfd_cfg=None,
                 arcface_cfg=None, det_size: int = 640,
                 score_thresh: float = 0.5, max_faces: int = 8,
                 dtype=None, seed: int = 0,
                 scrfd_weights=None, arcface_weights=None):
        import jax.numpy as jnp

        from ..models import arcface as AF
        from ..models import scrfd as SD
        from ..parallel.mesh import build_sharded_prescan_step, make_mesh

        self.mesh = mesh if mesh is not None else make_mesh(mesh_spec)
        scrfd_cfg = scrfd_cfg or SD.SCRFD_2_5G
        arcface_cfg = arcface_cfg or AF.W600K_R50
        self.det_size = int(det_size)
        self.score_thresh = float(score_thresh)
        self.max_faces = int(max_faces)
        self._run = build_sharded_prescan_step(
            self.mesh, scrfd_cfg=scrfd_cfg, arcface_cfg=arcface_cfg,
            det_size=det_size, max_faces=max_faces,
            dtype=dtype or jnp.bfloat16, seed=seed,
            scrfd_vars=scrfd_weights, arcface_vars=arcface_weights)
        # embed dim comes from the step (differs from arcface_cfg when an
        # .onnx checkpoint supplies the encoder)
        self.embed_dim = self._run.embed_dim
        # bank placeholder: distances recomputed on host against the live
        # bank, the device result is a cheap byproduct
        self._bank = np.zeros((1, self.embed_dim), np.float32)
        self._bank_mask = np.zeros((1,), bool)

    def _to_host(self, out, valid):
        host = {k: np.asarray(v) for k, v in out.items()
                if k in ("boxes", "kps", "scores", "mask", "feats",
                         "quality")}
        host["mask"] = host["mask"] & np.asarray(valid)[:, None]
        return host

    def _pad_to_mesh(self, frames, valid):
        """The batch dim shards over ``data``: pad to a multiple of the
        data-axis size (repeat last frame, valid=False) so odd batches —
        e.g. a single reference photo through seed_bank — still shard."""
        dp = int(self.mesh.shape.get("data", 1))
        frames = np.asarray(frames)
        valid = np.asarray(valid)
        n = frames.shape[0]
        rem = (-n) % dp
        if rem:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], rem, axis=0)], 0)
            valid = np.concatenate([valid, np.zeros(rem, bool)])
        return frames, valid, n

    def extract_batch(self, frames, valid, frame_idxs=None):
        frames, valid, n = self._pad_to_mesh(frames, valid)
        out = self._run(frames, self._bank, self._bank_mask,
                        score_thresh=self.score_thresh)
        host = self._to_host(out, valid)
        return {k: v[:n] for k, v in host.items()}

    def submit_batch(self, frames, valid, frame_idxs=None):
        frames, valid, n = self._pad_to_mesh(frames, valid)
        out = self._run(frames, self._bank, self._bank_mask,
                        score_thresh=self.score_thresh)
        for v in out.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        valid = valid.copy()
        return lambda: {k: v[:n]
                        for k, v in self._to_host(out, valid).items()}


class YoloPersonBackend:
    """Fused YOLOv8 person detection device program.

    One jitted call: ``[B, H, W, 3] uint8`` → person boxes/scores/mask in
    reader frame coords (reference: detectors.py:271-296 semantics).
    """

    def __init__(self, cfg=None, det_size: int = 640, conf: float = 0.35,
                 max_det: int = 16, dtype=None, seed: int = 0, weights=None):
        import jax
        import jax.numpy as jnp

        from ..models import yolov8 as Y
        from ..ops.preprocess import letterbox_topleft

        cfg = cfg or Y.YOLOV8N
        dtype = dtype or jnp.bfloat16
        self.det_size = int(det_size)
        self.conf = float(conf)
        self.max_det = int(max_det)
        self.model, self.variables = Y.init_yolo(
            jax.random.PRNGKey(seed), cfg, size=det_size, dtype=dtype)
        if weights is not None:
            self.variables = weights

        @jax.jit
        def fused(frames_u8, conf):
            frames = frames_u8.astype(jnp.float32)
            padded, scales = jax.vmap(
                lambda f: letterbox_topleft(f, self.det_size))(frames)
            return Y.detect_persons(self.model, self.variables, padded,
                                    scales, conf, self.max_det,
                                    clip_hw=frames.shape[1:3])

        self._fused = fused
        self._jnp = jnp

    def detect_batch(self, frames, valid, frame_idxs=None):
        return self.submit_batch(frames, valid, frame_idxs)()

    def submit_batch(self, frames, valid, frame_idxs=None):
        """Async dispatch: enqueue the YOLO program and return a fetcher.
        Submitting it back-to-back with the face program lets both run on
        device before either download — the person stage stops serializing
        the main-pass step (VERDICT weak #6)."""
        return self._submit(self._jnp.asarray(frames), valid)

    def submit_device(self, bgr_dev, valid, frame_idxs=None):
        """Shared-upload variant: consume the device-resident float32 BGR
        produced by ScrfdArcFaceBackend.upload_shared — no second
        host→device transfer of the same frames."""
        return self._submit(bgr_dev, valid)

    def _submit(self, frames_dev, valid):
        out_dev = self._fused(frames_dev, self._jnp.float32(self.conf))
        # start every device→host copy immediately (the fetch closure runs
        # only after the host processed the previous batch; without the
        # async copy each array download pays its RPC latency serially on
        # the critical path)
        for v in out_dev.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        valid = np.asarray(valid).copy()

        def fetch():
            host = {k: np.asarray(v) for k, v in out_dev.items()}
            host["mask"] = host["mask"] & valid[:, None]
            return host

        return fetch


class ClipReidBackend:
    """CLIP ViT ReID embedding device program (reference:
    reid_embedder.py:10-57). ``extract(crops)`` pads the crop list to a
    fixed batch so recompiles don't happen per call."""

    def __init__(self, cfg=None, batch: int = 16, dtype=None, seed: int = 0,
                 weights=None):
        import jax
        import jax.numpy as jnp

        from ..models import clip_vit as CV

        cfg = cfg or CV.VIT_L_14
        dtype = dtype or jnp.bfloat16
        self.batch = int(batch)
        self.embed_dim = cfg.embed_dim
        self.model, self.variables = CV.init_clip(
            jax.random.PRNGKey(seed), cfg, dtype=dtype)
        if weights is not None:
            self.variables = weights
        size = cfg.image_size

        @jax.jit
        def fused(crops):
            return CV.encode_images(self.model, self.variables, crops)

        self._fused = fused
        self._jnp = jnp
        self._size = size

    def extract(self, crops) -> np.ndarray:
        """crops: list of HxWx3 BGR arrays → [N, D] float32 normalized.

        Preprocess matches the reference's open_clip transform
        (reid_embedder.py:34,47: ``Resize(shortest side → 224, bicubic)``
        then ``CenterCrop(224)``) — a squash resize would aspect-distort
        the typical tall person crop and systematically shift embeddings
        vs thresholds tuned on reference behavior.
        """
        import cv2

        if not crops:
            return np.zeros((0, self.embed_dim), np.float32)
        s = self._size

        def preprocess(c):
            h, w = c.shape[:2]
            if (h, w) == (s, s):
                return c
            scale = s / min(h, w)
            nw, nh = max(s, int(w * scale)), max(s, int(h * scale))
            r = cv2.resize(c, (nw, nh), interpolation=cv2.INTER_CUBIC)
            y0 = int(round((nh - s) / 2.0))
            x0 = int(round((nw - s) / 2.0))
            return r[y0:y0 + s, x0:x0 + s]

        resized = [preprocess(c) for c in crops]
        out = []
        for i in range(0, len(resized), self.batch):
            chunk = resized[i:i + self.batch]
            n = len(chunk)
            while len(chunk) < self.batch:
                chunk.append(chunk[-1])
            emb = np.asarray(self._fused(
                self._jnp.asarray(np.stack(chunk).astype(np.float32))))
            out.append(emb[:n])
        return np.concatenate(out, 0)


class OraclePersonBackend:
    """Ground-truth person boxes for tests: each synthetic face's box
    inflated to a plausible body box."""

    def __init__(self, sv, max_det: int = 4, scale: float = 1.0):
        self.sv = sv
        self.max_det = int(max_det)
        self.scale = float(scale)

    def detect_batch(self, frames, valid, frame_idxs=None):
        b = frames.shape[0]
        h, w = frames.shape[1], frames.shape[2]
        boxes = np.zeros((b, self.max_det, 4), np.float32)
        scores = np.zeros((b, self.max_det), np.float32)
        mask = np.zeros((b, self.max_det), bool)
        if frame_idxs is None:
            frame_idxs = np.arange(b)
        for i in range(b):
            if not valid[i]:
                continue
            pls = self.sv.truth.get(int(frame_idxs[i]), [])
            for j, pl in enumerate(pls[: self.max_det]):
                x1, y1, x2, y2 = (v * self.scale for v in pl.box)
                fw, fh = x2 - x1, y2 - y1
                boxes[i, j] = [max(0, x1 - fw), max(0, y1 - 0.5 * fh),
                               min(w, x2 + fw), min(h, y2 + 4 * fh)]
                scores[i, j] = 0.9
                mask[i, j] = True
        return {"boxes": boxes, "scores": scores, "mask": mask}


class OracleBackend:
    """Ground-truth backend over a synthetic video.

    Embeddings are deterministic unit vectors per identity (plus tiny
    box-position-seeded jitter), so bank/threshold logic behaves like real
    embeddings with ~0 intra-identity distance and ~1.0 cross-identity.
    """

    def __init__(self, sv, embed_dim: int = 64, max_faces: int = 4,
                 scale: float = 1.0, noise: float = 0.0):
        self.sv = sv
        self.embed_dim = int(embed_dim)
        self.max_faces = int(max_faces)
        self.scale = float(scale)  # reader downscale vs truth coords
        self.noise = float(noise)

    def identity_feat(self, identity: int) -> np.ndarray:
        v = np.zeros(self.embed_dim, np.float32)
        v[identity % self.embed_dim] = 1.0
        return v

    def extract_batch(self, frames, valid, frame_idxs=None):
        b = frames.shape[0]
        f = self.max_faces
        boxes = np.zeros((b, f, 4), np.float32)
        kps = np.zeros((b, f, 5, 2), np.float32)
        scores = np.zeros((b, f), np.float32)
        mask = np.zeros((b, f), bool)
        feats = np.zeros((b, f, self.embed_dim), np.float32)
        quality = np.zeros((b, f), np.float32)
        if frame_idxs is None:
            frame_idxs = np.arange(b)
        for i in range(b):
            if not valid[i]:
                continue
            pls = self.sv.truth.get(int(frame_idxs[i]), [])
            for j, pl in enumerate(pls[:f]):
                boxes[i, j] = np.asarray(pl.box, np.float32) * self.scale
                kps[i, j] = pl.kps * self.scale
                scores[i, j] = 0.99
                mask[i, j] = True
                v = self.identity_feat(pl.identity)
                if self.noise:
                    rng = np.random.default_rng(
                        int(frame_idxs[i]) * 131 + j)
                    v = v + rng.normal(0, self.noise, v.shape).astype(np.float32)
                feats[i, j] = v / np.linalg.norm(v)
                quality[i, j] = 500.0
        return {"boxes": boxes, "kps": kps, "scores": scores,
                "mask": mask, "feats": feats, "quality": quality}
