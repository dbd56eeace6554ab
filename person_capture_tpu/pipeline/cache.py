"""Persistent pre-scan cache.

Content-addressed ``.npz`` storing keep-spans + the grown reference bank,
keyed by SHA-256 of {video identity (path, mtime, size), reference
identities, fps, total frames, every prescan-affecting setting} — same
resume semantics as the reference (person_capture/gui_app.py:787-920),
modes auto | refresh | off.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import SessionConfig
from ..core.bank import RefBank

# Settings that change pre-scan outcomes (HDR/export-only changes must NOT
# invalidate the cache).
_PRESCAN_KEYS = (
    "prescan_enable", "prescan_stride", "prescan_max_width",
    "prescan_decode_max_w", "prescan_face_conf", "prescan_fd_enter",
    "prescan_fd_add", "prescan_fd_exit", "prescan_add_cooldown_samples",
    "prescan_rot_probe_period", "prescan_probe_imgsz",
    "prescan_no_upscale_det", "prescan_probe_conf", "prescan_heavy_90",
    "prescan_heavy_180", "prescan_min_segment_sec", "prescan_pad_sec",
    "prescan_bridge_gap_sec", "prescan_exit_cooldown_sec",
    "prescan_boundary_refine_sec", "prescan_refine_stride_min",
    "prescan_trim_pad", "prescan_skip_trailing_refine",
    "prescan_refine_budget_sec", "prescan_bank_max",
    "prescan_diversity_dedup_cos", "prescan_replace_margin",
    "prescan_fd9_skip", "prescan_fd9_grace", "prescan_fd9_probe_period",
    "prescan_weights", "face_quality_min", "face_model",
    # the embedding family defines the bank's vector space: a cached CLIP
    # bank replayed into an ArcFace run is dimension/semantics-poison
    # (reference keys these too, gui_app.py:820-824)
    "use_arcface", "clip_face_backbone", "clip_face_pretrained",
)


def _file_identity(path: str) -> Tuple[str, float, int]:
    try:
        st = os.stat(path)
        return (os.path.abspath(path), st.st_mtime, st.st_size)
    except OSError:
        return (os.path.abspath(path), 0.0, 0)


def cache_key(cfg: SessionConfig, video_path: str, ref_paths: List[str],
              fps: float, total_frames: int, extra: str = "") -> str:
    payload = {
        "video": _file_identity(video_path),
        "refs": sorted(_file_identity(p) for p in ref_paths),
        "fps": round(float(fps), 4),
        "total": int(total_frames),
        "settings": {k: getattr(cfg, k) for k in _PRESCAN_KEYS
                     if hasattr(cfg, k)},
        # backend identity (class/det size/embed dim) — catches model
        # swaps the config fields alone can't see (e.g. different
        # --arcface-weights checkpoints changing the embedding space)
        "extra": str(extra or ""),
    }
    blob = json.dumps(payload, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()


def cache_path(cfg: SessionConfig, key: str) -> str:
    d = cfg.prescan_cache_dir or "prescan_cache"
    if not os.path.isabs(d):
        d = os.path.join(cfg.out_dir or ".", d)
    return os.path.join(d, f"prescan_{key[:32]}.npz")


def save_cache(path: str, spans: List[Tuple[int, int]], bank: RefBank,
               key: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mat = bank.matrix()
    np.savez_compressed(
        path,
        key=np.frombuffer(key.encode(), np.uint8),
        spans=np.asarray(spans, np.int64).reshape(-1, 2),
        bank=mat if mat is not None else np.zeros((0, 512), np.float32),
        bank_cap=np.int64(bank.cap),
    )


def load_cache(path: str, key: str,
               cfg: Optional[SessionConfig] = None
               ) -> Optional[Tuple[List[Tuple[int, int]], RefBank]]:
    if not os.path.isfile(path):
        return None
    try:
        # context manager: NpzFile holds the zip handle open otherwise
        # (leaks per cache hit; an open handle also blocks overwriting the
        # file on Windows)
        with np.load(path) as data:
            stored_key = bytes(data["key"]).decode()
            if stored_key != key:
                return None
            spans = [tuple(int(v) for v in row) for row in data["spans"]]
            bank = RefBank(cap=int(data["bank_cap"]))
            if cfg is not None:
                bank.dedup_cos = cfg.prescan_diversity_dedup_cos
                bank.replace_margin = cfg.prescan_replace_margin
                bank.weights = tuple(cfg.prescan_weights)
            mat = data["bank"]
            if mat.size:
                bank.vectors = [row.astype(np.float32) for row in mat]
            return spans, bank
    except Exception:
        return None


def get_or_run(cfg: SessionConfig, video_path: str, ref_paths: List[str],
               fps: float, total_frames: int, run_fn, skip_save=None,
               extra: str = ""):
    """Cache wrapper: ``run_fn()`` must return (spans, bank).

    ``skip_save``: optional zero-arg callable checked after the run; True
    suppresses caching (interactively perturbed scans must not be cached —
    reference gui_app.py:5047-5058).
    """
    mode = (cfg.prescan_cache_mode or "auto").lower()
    if mode == "off":
        return run_fn(), False
    key = cache_key(cfg, video_path, ref_paths, fps, total_frames,
                    extra=extra)
    path = cache_path(cfg, key)
    if mode in ("auto", "reuse"):
        # the reference accepts "reuse" as a load-enabled mode
        # (gui_app.py:853-854); only "refresh" skips the load
        hit = load_cache(path, key, cfg)
        if hit is not None:
            return hit, True
    spans, bank = run_fn()
    if skip_save is not None and skip_save():
        return (spans, bank), False
    try:
        save_cache(path, spans, bank, key)
    except OSError:
        pass
    return (spans, bank), False
