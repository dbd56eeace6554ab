"""Reference-compatible ``FaceEmbedder`` facade.

API parity with person_capture/face_embedder.py — ``extract(bgr)`` returns
faces sorted by (quality, area) desc as dicts with keys ``bbox`` (int32
xyxy), ``feat`` (L2-normalized), ``quality``; ``best_face(faces)`` picks by
(quality, area). Implemented over the fused SCRFD+ArcFace TPU backend; the
reference's rotation/TTA escalation ladder is replaced by the batched
fixed-shape design (see SURVEY.md §7), with ``set_prescan_fast`` retained as
a no-op-compatible hint.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class FaceEmbedder:
    def __init__(self, ctx: str = "tpu", det_size: str | int = 640,
                 providers=None, backend=None, scrfd_weights=None,
                 arcface_weights=None, face_model: str = "scrfd_2.5g",
                 arcface_model: str = "w600k_r50"):
        self.ctx = ctx
        if backend is not None:
            self._backend = backend
        else:
            from .models import arcface as AF
            from .models import scrfd as SD
            from .pipeline.backends import ScrfdArcFaceBackend

            self._backend = ScrfdArcFaceBackend(
                scrfd_cfg=SD.CONFIGS.get(face_model, SD.SCRFD_2_5G),
                arcface_cfg=AF.CONFIGS.get(arcface_model, AF.W600K_R50),
                det_size=int(det_size),
                scrfd_weights=scrfd_weights,
                arcface_weights=arcface_weights)
        self._prescan_fast = False

    # ---- reference runtime hints (tuning surface parity) -----------------
    def set_prescan_fast(self, enabled: bool, rr_mode: str = "rr") -> None:
        """Pre-scan fast mode: in the TPU design batching replaces the
        per-frame escalation this flag used to gate; kept for API parity."""
        self._prescan_fast = bool(enabled)

    def set_prescan_hint(self, **kw) -> None:
        pass

    def configure_rotation_strategy(self, **kw) -> None:
        pass

    # ---- main API --------------------------------------------------------
    def extract(self, bgr: np.ndarray) -> List[dict]:
        if bgr is None or bgr.size == 0:
            return []
        out = self._backend.extract_batch(bgr[None], np.ones(1, bool))
        faces = []
        for j in np.flatnonzero(out["mask"][0]):
            faces.append({
                "bbox": np.asarray(out["boxes"][0][j], np.int32),
                "kps": np.asarray(out["kps"][0][j], np.float32),
                "feat": np.asarray(out["feats"][0][j], np.float32),
                "quality": float(out["quality"][0][j]),
            })
        faces.sort(key=lambda f: (
            f["quality"],
            (f["bbox"][2] - f["bbox"][0]) * (f["bbox"][3] - f["bbox"][1])),
            reverse=True)
        return faces

    @staticmethod
    def best_face(faces) -> Optional[dict]:
        if not faces:
            return None
        return max(faces, key=lambda f: (
            f["quality"],
            (f["bbox"][2] - f["bbox"][0]) * (f["bbox"][3] - f["bbox"][1])))
