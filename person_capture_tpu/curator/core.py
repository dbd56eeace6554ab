"""Curator: pick a diverse, high-quality subset of the produced crops.

Behavior-compatible rebuild of the reference's Curator
(person_capture/dataset_curator.py): per-image ``describe`` features
(identity distance vs reference, sharpness, exposure, face fraction,
yaw/roll, pHash, CLIP embedding, watermark + black-border penalties),
scene clustering (CLIP-sim + pHash + time gap within an NN window),
category buckets (closeup/portrait/cowboy/full/wide/profile), and
quota-constrained greedy MMR with pHash dedup and scene spreading.

TPU-first: the heavy describe features (face detect+embed, CLIP, pHash DCT)
batch through the device backends; clustering and MMR run on host over the
small [N, D] matrices (one N×N matmul each — fine on device too via the
jnp helpers, used when pools are large).
"""

from __future__ import annotations

import csv
import json
import os
import re
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..core.scoring import calc_sharpness


# --------------------------------------------------------------------------
# per-image features
# --------------------------------------------------------------------------

def phash64(bgr: np.ndarray) -> int:
    """64-bit DCT pHash with the DC coefficient zeroed (exposure-robust) —
    reference: dataset_curator.py:55-73."""
    if bgr is None or bgr.size == 0 or cv2 is None:
        return 0
    g = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    g = cv2.resize(g, (32, 32), interpolation=cv2.INTER_AREA)
    d = cv2.dct(np.float32(g))
    block = d[:8, :8].copy()
    block[0, 0] = 0.0
    med = np.median(block)
    bits = (block > med).astype(np.uint8).flatten()
    out = 0
    for i, b in enumerate(bits):
        out |= int(b) << i
    return out


def hamming64(a: int, b: int) -> int:
    return ((a ^ b) & ((1 << 64) - 1)).bit_count()


def sharpness_norm(bgr: np.ndarray) -> float:
    """tanh(log1p(normalized Laplacian variance)) in ~0..1."""
    v = calc_sharpness(bgr)
    return float(np.tanh(np.log1p(v)))


def exposure_score(bgr: np.ndarray) -> float:
    """1.0 well-exposed; penalize crushed/blown histograms."""
    if bgr is None or bgr.size == 0 or cv2 is None:
        return 0.0
    g = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    hist = cv2.calcHist([g], [0], None, [256], [0, 256]).flatten()
    hist = hist / max(1.0, hist.sum())
    low = hist[:8].sum()
    high = hist[-8:].sum()
    mid = hist[16:240].sum()
    return float(max(0.0, min(1.0, mid - 0.5 * (low + high))))


def yaw_roll_from_5pts(pts5: Optional[np.ndarray]) -> Tuple[float, float]:
    """Approximate yaw/roll in degrees from [le,re,nose,lm,rm]."""
    if pts5 is None or getattr(pts5, "shape", None) != (5, 2):
        return 0.0, 0.0
    le, re_, nose, _, _ = pts5
    roll = float(np.degrees(np.arctan2(re_[1] - le[1], re_[0] - le[0])))
    eye_mid = (le + re_) * 0.5
    iod = float(np.linalg.norm(re_ - le)) + 1e-6
    yaw = float(np.degrees(np.arctan2(nose[0] - eye_mid[0], iod)))
    return yaw, roll


def textlike_corners_score(bgr: np.ndarray) -> float:
    """Watermark heuristic: MSER text-like regions near the corners."""
    if bgr is None or bgr.size == 0 or cv2 is None:
        return 0.0
    H, W = bgr.shape[:2]
    region = max(1, int(0.22 * min(H, W)))
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    try:
        mser = cv2.MSER_create(delta=5, min_area=60, max_area=5000)
    except TypeError:  # older signatures
        mser = cv2.MSER_create()
    try:
        regions, _ = mser.detectRegions(gray)
    except cv2.error:
        return 0.0
    cnt = 0
    for rr in regions:
        x, y, w, h = cv2.boundingRect(rr)
        in_corner = ((x < region or x + w > W - region)
                     and (y < region or y + h > H - region))
        if in_corner:
            ar = w / float(h + 1e-6)
            if 1.5 <= ar <= 12.0 and w * h >= 80:
                cnt += 1
    return float(min(1.0, cnt / 25.0))


_RE_FRAME = re.compile(r"\b(?:frame|f|img|i)[_\-]?\s*(\d{3,})(?!\d)", re.I)
_RE_TIME = re.compile(r"(?:t|time)[_\-:]?(\d+(?:\.\d+)?)\s*s", re.I)
_RE_NUM = re.compile(r"(\d{3,})")


def timestamp_from_name(path: str, fps_hint: float = 30.0) -> float:
    """Recover an ordering timestamp from crop filenames (f%08d.jpg…)."""
    name = os.path.basename(path)
    m = _RE_TIME.search(name)
    if m:
        return float(m.group(1))
    m = _RE_FRAME.search(name) or _RE_NUM.search(name)
    if m:
        return float(int(m.group(1))) / max(1.0, fps_hint)
    return 0.0


@dataclass
class Item:
    path: str
    ts: float = 0.0
    ratio: str = ""
    face_fd: float = 9.0
    face_feat: Optional[np.ndarray] = None
    face_quality: float = 0.0
    face_box: Optional[Tuple[float, float, float, float]] = None
    face_frac: float = 0.0
    yaw: float = 0.0
    roll: float = 0.0
    sharpness: float = 0.0
    exposure: float = 0.0
    wmark: float = 0.0
    phash: int = 0
    bg_clip: Optional[np.ndarray] = None
    scene: int = -1
    meta: Dict = field(default_factory=dict)
    # (identity, sharpness, exposure) weights — cfg.curate_weights; set by
    # Curator.describe so downstream scoring honors the session's tuning
    qweights: Optional[Tuple[float, float, float]] = None

    def quality_score(self) -> float:
        """Weighted quality (reference: dataset_curator.py:266-284); the
        weight triple is cfg-driven (curate_weights)."""
        fd = max(0.0, float(self.face_fd))
        idq = float(np.clip(1.0 - fd / 0.5, 0.0, 1.0))
        w = self.qweights or (0.45, 0.30, 0.20)
        total = max(1e-6, sum(w))
        scale = 0.95 / total  # keep 0.05 for the chip-quality term
        q = (scale * (w[0] * idq + w[1] * self.sharpness
                      + w[2] * self.exposure)
             + 0.05 * min(1.0, self.face_quality / 1200.0))
        q *= max(0.0, 1.0 - 0.6 * self.wmark)
        bb = float(min(max(self.meta.get("black_border_frac", 0.0), 0.0), 0.4))
        q *= max(0.0, 1.0 - 0.6 * bb)
        return float(max(0.0, min(1.0, q)))


def ratio_label(w: int, h: int) -> str:
    """Normalized aspect bucket, reference-exact (``norm_ratio``,
    dataset_curator.py:730-744): categorize() consumes these labels, so an
    extra label like "16:9" would fall through to the portrait bucket
    where the reference buckets >1.70 aspects as "wide"."""
    if h <= 0 or w <= 0:
        return ""
    a = w / float(h)
    if 0.60 <= a <= 0.70:
        return "2:3"
    if 0.70 < a <= 0.82:
        return "3:4"
    if 0.95 <= a <= 1.05:
        return "1:1"
    if 1.40 <= a <= 1.70:
        return "3:2"
    if a < 0.60:
        return "narrow"
    if a > 1.70:
        return "wide"
    return "other"


def categorize(it: Item) -> str:
    """Bucket assignment (reference: dataset_curator.py:587-607)."""
    f = it.face_frac
    ratio = it.ratio
    if ratio in ("2:3", "3:4"):
        if f >= 0.33:
            return "closeup"
        if 0.22 <= f < 0.33:
            return "portrait"
        if 0.12 <= f < 0.22:
            return "cowboy"
        return "full"
    if ratio in ("3:2", "wide"):
        return "closeup" if f >= 0.30 else "wide"
    if ratio == "1:1":
        return "closeup" if f >= 0.30 else "portrait"
    return "portrait"


# --------------------------------------------------------------------------
# scene clustering
# --------------------------------------------------------------------------

def cluster_scenes(items: List[Item], sim_thresh: float = 0.92,
                   hamm_thresh: int = 7, time_gap: float = 4.0,
                   nn_window: int = 64) -> List[int]:
    """Assign scene ids: same scene when pHash close OR background-CLIP
    similar, searched over a sliding window of recent clusters."""
    if not items:
        return []

    def cos(a, b):
        return float(np.dot(a, b))

    order = sorted(range(len(items)), key=lambda i: (items[i].ts, items[i].path))
    clusters: List[List[int]] = []
    medoids: List[int] = []

    def same_scene(idx: int, med: int) -> bool:
        a, b = items[idx], items[med]
        if hamming64(a.phash, b.phash) <= hamm_thresh:
            return True
        if a.bg_clip is None or b.bg_clip is None:
            return False
        return cos(a.bg_clip, b.bg_clip) >= sim_thresh

    for idx in order:
        it = items[idx]
        assigned = False
        start = max(0, len(clusters) - max(1, nn_window))
        for cidx in range(len(clusters) - 1, start - 1, -1):
            # assignment is similarity-only: the reference computes a
            # dt>time_gap guard here too, but it is a provable no-op (the
            # same same_scene test decides either way,
            # dataset_curator.py:543-547) — time_gap only gates the
            # stitch pass below
            if same_scene(idx, medoids[cidx]):
                clusters[cidx].append(idx)
                if items[idx].quality_score() > items[medoids[cidx]].quality_score():
                    medoids[cidx] = idx
                assigned = True
                break
        if not assigned:
            clusters.append([idx])
            medoids.append(idx)

    # stitch adjacent clusters whose boundary items are within time_gap and
    # pHash/CLIP-similar (reference dataset_curator.py:555-577) — without
    # this the time_gap knob has no effect and a continuous shot whose
    # medoid drifts over-fragments, defeating mmr_select's scene soft-cap
    if nn_window > 0 and len(clusters) > 1:
        merged: List[List[int]] = []
        for group in clusters:
            if not merged:
                merged.append(group)
                continue
            prev = merged[-1]
            ia, ib = items[prev[-1]], items[group[0]]
            if abs(ib.ts - ia.ts) <= time_gap and (
                    hamming64(ia.phash, ib.phash) <= hamm_thresh
                    or (ia.bg_clip is not None and ib.bg_clip is not None
                        # stitch keys off the BACKGROUND clip embedding so
                        # face-driven diversity does not split identical
                        # locations (reference comment)
                        and cos(ia.bg_clip, ib.bg_clip) >= sim_thresh)):
                prev.extend(group)
            else:
                merged.append(group)
        clusters = merged

    scene_ids = [-1] * len(items)
    for sid, group in enumerate(clusters):
        for i in group:
            scene_ids[i] = sid
    return scene_ids


# --------------------------------------------------------------------------
# MMR selection
# --------------------------------------------------------------------------

DEFAULT_QUOTAS = {
    # category: (min, max_frac of max_images)
    "closeup": (4, 0.45),
    "portrait": (4, 0.45),
    "cowboy": (2, 0.30),
    "full": (2, 0.30),
    "wide": (0, 0.20),
    "profile": (0, 0.25),   # cap, not target
}


def quotas_from_bucket_fracs(bucket_quota, use_yaw_quota: bool = True,
                             profile_cap_frac: float = 0.25) -> Dict:
    """Map cfg.curate_bucket_quota = (closeup, portrait, body) fractions to
    the per-category (min, max_frac) table; cfg.curate_use_yaw_quota=False
    lifts the profile cap."""
    c, p, b = (float(v) for v in bucket_quota)
    return {
        "closeup": (2, max(0.05, c)),
        "portrait": (2, max(0.05, p)),
        "cowboy": (1, max(0.05, b)),
        "full": (1, max(0.05, b)),
        "wide": (0, max(0.05, b * 0.8)),
        "profile": (0, profile_cap_frac if use_yaw_quota else 1.0),
    }


def phash_sim_to_hamm(sim: float) -> int:
    """cfg.curate_phash_dedup is a 0..1 similarity; the dedup gate works in
    Hamming distance over 64 bits."""
    return max(0, int(round((1.0 - float(sim)) * 64.0)))


def closeup_boosted_quality(q: float, face_frac: float, boost: float,
                            thr: float) -> float:
    """MMR quality with the close-up ramp, reference-exact (the nested
    ``q_for_mmr``, dataset_curator.py:920-927): linear ramp from ``thr``
    to face-fraction 1.0, boosted score capped at 1.5."""
    q = float(max(0.0, min(1.0, q)))
    if boost <= 1e-6:
        return q
    extra = max(0.0, float(face_frac) - float(thr))
    denom = max(1e-6, 1.0 - float(thr))
    ramp = min(1.0, extra / denom)
    return float(min(1.5, max(0.0, q * (1.0 + float(boost) * ramp))))


def scene_phash_dedup(items: List[Item], hamm: int) -> List[int]:
    """In-scene pHash dedup BEFORE selection (reference
    dataset_curator.py:828-849): within each scene, rank by
    (quality desc, fd, ts, path) and drop items within ``hamm`` of an
    already-kept item of the same scene. Returns kept indices in
    original order."""
    if hamm <= 0:
        return list(range(len(items)))
    by_scene: Dict[int, List[int]] = {}
    for i, it in enumerate(items):
        by_scene.setdefault(int(it.scene), []).append(i)
    kept: List[int] = []
    for sid in sorted(by_scene):
        idxs = sorted(by_scene[sid],
                      key=lambda k: (-items[k].quality_score(),
                                     items[k].face_fd, items[k].ts,
                                     items[k].path))
        seen_ph: List[int] = []
        for k in idxs:
            ph = items[k].phash
            if any(hamming64(ph, sph) <= hamm for sph in seen_ph):
                continue
            seen_ph.append(ph)
            kept.append(k)
    kept.sort()
    return kept


def mmr_select(items: List[Item], max_images: int = 200,
               fd_gate: float = 0.45, lam: float = 0.70,
               dedup_hamm: int = 5, cos_face_dedup: float = 0.985,
               scene_softcap: int = 6, scene_penalty: float = 0.08,
               profile_yaw_thresh: float = 20.0,
               quotas: Optional[Dict] = None,
               sharp_min: float = 0.0,
               closeup_boost: float = 0.0, closeup_thr: float = 0.33,
               div_bg: float = 0.6, div_face: float = 0.4
               ) -> Tuple[List[int], List[Dict]]:
    """Greedy quota-constrained MMR. Returns (selected indices, debug rows).

    score = λ·quality − (1−λ)·max-sim-to-selected − scene-overuse penalty;
    hard gates: identity fd, sharpness floor, pHash dedup, face-embedding
    dedup, per-category and profile caps. ``closeup_boost`` ramps quality
    up for face fractions past ``closeup_thr`` and ``div_bg``/``div_face``
    weight the diversity vector mix (reference dataset_curator.py:918-927
    q_for_mmr and :935-946 _mix_vec; exposed by the reference CLI as
    --closeup-boost/--closeup-thr/--div-bg/--div-face/--sharp-min).
    """
    quotas = quotas or DEFAULT_QUOTAS
    pool = [i for i, it in enumerate(items)
            if it.face_fd <= fd_gate and it.sharpness >= sharp_min]
    cats = {i: categorize(items[i]) for i in pool}
    q = {i: closeup_boosted_quality(items[i].quality_score(),
                                    items[i].face_frac,
                                    closeup_boost, closeup_thr)
         for i in pool}

    caps = {c: (mn, max(1, int(round(mx * max_images))))
            for c, (mn, mx) in quotas.items()}
    counts: Dict[str, int] = {c: 0 for c in caps}
    scene_counts: Dict[int, int] = {}
    chosen: List[int] = []
    chosen_ph: List[int] = []
    chosen_faces: List[np.ndarray] = []
    debug: List[Dict] = []
    remaining = set(pool)

    def vec(i):
        it = items[i]
        bg = it.bg_clip if div_bg > 0 else None
        ff = it.face_feat if div_face > 0 else None
        if bg is not None and ff is not None:
            v = np.concatenate([div_bg * bg, div_face * ff])
        elif bg is not None:
            v = bg
        elif ff is not None:
            v = ff
        else:
            return None
        n = np.linalg.norm(v)
        return v / n if n > 0 else None

    vecs = {i: vec(i) for i in pool}
    # incremental max-similarity-to-selected: ONE [N,D]@[D] matvec per pick
    # updates a running max, instead of re-dotting every candidate against
    # every chosen vector from scratch (O(picks·pool·picks) python-loop
    # np.dot calls — tens of minutes on a 10k pool with a 1-core host).
    # Vectors of different dims (bg+face / bg-only / face-only items) never
    # compare, so candidates group by dim.
    by_dim: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for d in {v.size for v in vecs.values() if v is not None}:
        idxs = np.asarray([i for i in pool
                           if vecs[i] is not None and vecs[i].size == d])
        by_dim[d] = (idxs, np.stack([vecs[i] for i in idxs]))
    maxsim = np.zeros(len(items), np.float32)

    def redundancy(i) -> float:
        return float(maxsim[i]) if vecs.get(i) is not None else 0.0

    def is_blocked(i) -> bool:
        it = items[i]
        cat = cats[i]
        mn, mx = caps.get(cat, (0, max_images))
        if counts.get(cat, 0) >= mx:
            return True
        if abs(it.yaw) >= profile_yaw_thresh:
            _, pmax = caps.get("profile", (0, 0))
            if counts.get("profile", 0) >= pmax:
                return True
        if any(hamming64(it.phash, p) <= dedup_hamm for p in chosen_ph):
            return True
        if it.face_feat is not None:
            for fv in chosen_faces:
                if fv.shape == it.face_feat.shape \
                        and float(np.dot(fv, it.face_feat)) >= cos_face_dedup:
                    return True
        return False

    def pick(i, score, red):
        it = items[i]
        chosen.append(i)
        remaining.discard(i)
        chosen_ph.append(it.phash)
        if it.face_feat is not None:
            chosen_faces.append(it.face_feat)
        v = vecs[i]
        if v is not None:
            idxs, mat = by_dim[v.size]
            maxsim[idxs] = np.maximum(maxsim[idxs], mat @ v)
        counts[cats[i]] = counts.get(cats[i], 0) + 1
        if abs(it.yaw) >= profile_yaw_thresh:
            counts["profile"] = counts.get("profile", 0) + 1
        scene_counts[it.scene] = scene_counts.get(it.scene, 0) + 1
        debug.append({"rank": len(chosen), "file": it.path,
                      "scene": it.scene, "category": cats[i],
                      "quality": q[i], "redundancy": red,
                      "mmr_score": score,
                      "is_profile": int(abs(it.yaw) >= profile_yaw_thresh)})

    # pass 1: satisfy category minimums (spread over scenes by greedy score)
    for cat, (cmin, _) in caps.items():
        if cat == "profile" or cmin <= 0:
            continue
        need = cmin
        while need > 0 and len(chosen) < max_images:
            best_i, best_s, best_r = None, -1e9, 0.0
            for i in remaining:
                if cats[i] != cat or is_blocked(i):
                    continue
                red = redundancy(i)
                over = max(0, scene_counts.get(items[i].scene, 0)
                           - scene_softcap)
                s = lam * q[i] - (1 - lam) * red - scene_penalty * over
                if s > best_s:
                    best_i, best_s, best_r = i, s, red
            if best_i is None:
                break
            pick(best_i, best_s, best_r)
            need -= 1

    # pass 2: fill to max_images by global MMR
    while len(chosen) < max_images:
        best_i, best_s, best_r = None, -1e9, 0.0
        for i in remaining:
            if is_blocked(i):
                continue
            red = redundancy(i)
            over = max(0, scene_counts.get(items[i].scene, 0) - scene_softcap)
            s = lam * q[i] - (1 - lam) * red - scene_penalty * over
            if s > best_s:
                best_i, best_s, best_r = i, s, red
        if best_i is None:
            break
        pick(best_i, best_s, best_r)

    return chosen, debug


# --------------------------------------------------------------------------
# Curator driver
# --------------------------------------------------------------------------

class Curator:
    """Describe a pool of crops, select a subset, copy to out_dir.

    ``face_backend`` / ``clip_backend`` follow the pipeline backend
    protocols; ``ref_bank`` provides identity distance.
    """

    def __init__(self, face_backend, ref_bank, clip_backend=None,
                 progress: Optional[Callable[[str, int, int], None]] = None,
                 batch: int = 16, canvas: int = 640):
        self.face = face_backend
        self.bank = ref_bank
        self.clip = clip_backend
        self.progress = progress or (lambda *a: None)
        self.batch = int(batch)
        # fixed device canvas: every describe chunk ships the same
        # [batch, canvas, canvas, 3] shape so the device program compiles
        # once (variable shapes would recompile per chunk — minutes each on
        # tunneled TPUs)
        self.canvas = int(canvas)

    def describe(self, paths: Sequence[str],
                 fps_hint: float = 30.0) -> List[Item]:
        """Streamed describe: images decode PER CHUNK (host metrics +
        pHash + the fixed-canvas device batch), with depth-1 pipelining —
        peak memory is O(batch), not O(pool) (10k decoded 1080p crops
        would hold ~60 GB; 4K pools exceeded this host's RAM)."""
        from .. import native as hostops
        from ..core.geometry import detect_black_borders

        metas: List[Item] = []
        use_native_phash = hostops.available() and cv2 is not None

        # batched device features on a fixed canvas (single compilation),
        # depth-1 pipelined: chunk i+1's program is submitted before chunk
        # i's results download, like the pre-scan/main-pass drivers
        cvs = self.canvas
        submit = getattr(self.face, "submit_batch", None)

        def _consume(entry):
            fetch, chunk, mchunk, scales = entry
            out = fetch()
            for i, it in enumerate(mchunk):
                mask = out["mask"][i]
                if mask.any():
                    fds = [self.bank.fd(out["feats"][i][j]) if mask[j] else 9.0
                           for j in range(len(mask))]
                    j = int(np.argmin(fds))
                    it.face_fd = float(fds[j])
                    feat = out["feats"][i][j]
                    nn = np.linalg.norm(feat)
                    it.face_feat = feat / nn if nn > 0 else None
                    it.face_quality = float(out["quality"][i][j])
                    inv = 1.0 / max(scales[i], 1e-6)
                    it.face_box = tuple(float(v) * inv
                                        for v in out["boxes"][i][j])
                    h = chunk[i].shape[0]
                    it.face_frac = (it.face_box[3] - it.face_box[1]) / max(1, h)
                    it.yaw, it.roll = yaw_roll_from_5pts(
                        np.asarray(out["kps"][i][j]) * inv)
            if self.clip is not None:
                feats = self.clip.extract(chunk)
                for i, it in enumerate(mchunk):
                    it.bg_clip = feats[i]

        pending = None
        done = 0
        chunk: List[np.ndarray] = []
        mchunk: List[Item] = []

        def _flush_chunk():
            nonlocal pending, done, chunk, mchunk
            if not chunk:
                return
            # pHash per chunk: native batched DCT when hostops built
            if use_native_phash:
                gray32 = np.stack([
                    cv2.resize(cv2.cvtColor(im, cv2.COLOR_BGR2GRAY),
                               (32, 32), interpolation=cv2.INTER_AREA)
                    .astype(np.float32) for im in chunk])
                for it, hsh in zip(mchunk, hostops.phash64_batch(gray32)):
                    it.phash = int(hsh)
            else:
                for it, im in zip(mchunk, chunk):
                    it.phash = phash64(im)
            n = len(chunk)
            batch_arr = np.zeros((self.batch, cvs, cvs, 3), np.uint8)
            scales = np.ones(n, np.float32)
            for i, im in enumerate(chunk):
                s = min(1.0, cvs / max(im.shape[0], im.shape[1]))
                if s < 1.0 and cv2 is not None:
                    im = cv2.resize(im, (int(round(im.shape[1] * s)),
                                         int(round(im.shape[0] * s))),
                                    interpolation=cv2.INTER_AREA)
                scales[i] = s
                batch_arr[i, :im.shape[0], :im.shape[1]] = im
            valid = np.zeros(self.batch, bool)
            valid[:n] = True
            if submit is not None:
                fetch = submit(batch_arr, valid)
            else:
                out_now = self.face.extract_batch(batch_arr, valid)
                fetch = lambda out_now=out_now: out_now
            if pending is not None:
                _consume(pending)
                done += len(pending[1])
                self.progress("describe", done, len(paths))
            pending = (fetch, chunk, mchunk, scales)
            chunk, mchunk = [], []

        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_COLOR) if cv2 else None
            if img is None:
                continue
            it = Item(path=p, ts=timestamp_from_name(p, fps_hint),
                      ratio=ratio_label(img.shape[1], img.shape[0]))
            it.sharpness = sharpness_norm(img)
            it.exposure = exposure_score(img)
            it.wmark = textlike_corners_score(img)
            x1, y1, x2, y2 = detect_black_borders(img)
            h, w = img.shape[:2]
            bb_frac = 1.0 - ((x2 - x1) * (y2 - y1)) / max(1, w * h)
            it.meta["black_border_frac"] = float(max(0.0, bb_frac))
            metas.append(it)
            chunk.append(img)
            mchunk.append(it)
            if len(chunk) == self.batch:
                _flush_chunk()
        _flush_chunk()
        if pending is not None:
            _consume(pending)
        # final tick pins done == total even when some paths failed to
        # decode (consumers treating done==total as completion would
        # otherwise hang at 9x%)
        self.progress("describe", len(paths), len(paths))
        return metas

    def run(self, pool_dir: str, out_dir: str, max_images: int = 200,
            fd_gate: float = 0.45, lam: float = 0.70,
            dedup_hamm: int = 5, cos_face_dedup: float = 0.985,
            copy: bool = True, weights=None, bucket_quota=None,
            use_yaw_quota: bool = True, scene_softcap: int = 6,
            scene_penalty: float = 0.08,
            profile_yaw_thresh: float = 20.0,
            sharp_min: float = 0.0, assume_identity: bool = False,
            scene_aware: bool = True, scene_sim: float = 0.92,
            scene_time_gap: float = 4.0, scene_nn_window: int = 64,
            scene_dedup: int = 0,
            closeup_boost: float = 0.0, closeup_thr: float = 0.33,
            div_bg: float = 0.6, div_face: float = 0.4,
            quotas: Optional[Dict] = None) -> Dict:
        exts = (".jpg", ".jpeg", ".png", ".webp")
        paths = sorted(
            os.path.join(pool_dir, f) for f in os.listdir(pool_dir)
            if f.lower().endswith(exts))
        t0 = time.perf_counter()
        items = self.describe(paths)
        n_pool_raw = len(items)
        if assume_identity:
            # pool already identity-filtered: skip the gate by zeroing fd
            # (reference --assume-identity, dataset_curator.py:303-309)
            for it in items:
                it.face_fd = 0.0
        if weights is not None:
            for it in items:
                it.qweights = tuple(float(v) for v in weights)
        if scene_aware:
            # the global dedup hamming doubles as the clustering pHash
            # threshold, exactly like the reference (dataset_curator.py:820)
            scene_ids = cluster_scenes(items, sim_thresh=scene_sim,
                                       hamm_thresh=dedup_hamm,
                                       time_gap=scene_time_gap,
                                       nn_window=scene_nn_window)
            for it, sid in zip(items, scene_ids):
                it.scene = sid
            if scene_dedup > 0:
                items = [items[i]
                         for i in scene_phash_dedup(items, scene_dedup)]
        else:
            scene_ids = [-1] * len(items)
            for it in items:
                it.scene = -1
        if quotas is None:
            # direct quotas (reference --quotas JSON) win over the
            # bucket-fraction mapping when supplied
            quotas = (quotas_from_bucket_fracs(bucket_quota, use_yaw_quota)
                      if bucket_quota is not None else
                      (None if use_yaw_quota else
                       {**DEFAULT_QUOTAS, "profile": (0, 1.0)}))
        chosen, debug = mmr_select(items, max_images=max_images,
                                   fd_gate=fd_gate, lam=lam,
                                   dedup_hamm=dedup_hamm,
                                   cos_face_dedup=cos_face_dedup,
                                   scene_softcap=scene_softcap,
                                   scene_penalty=scene_penalty,
                                   profile_yaw_thresh=profile_yaw_thresh,
                                   quotas=quotas, sharp_min=sharp_min,
                                   closeup_boost=closeup_boost,
                                   closeup_thr=closeup_thr,
                                   div_bg=div_bg, div_face=div_face)
        os.makedirs(out_dir, exist_ok=True)
        selected_paths = []
        for i in chosen:
            src = items[i].path
            dst = os.path.join(out_dir, os.path.basename(src))
            if copy:
                shutil.copy2(src, dst)
            selected_paths.append(dst)

        with open(os.path.join(out_dir, "selection_debug.csv"), "w",
                  newline="") as fh:
            cols = ["rank", "file", "scene", "category", "quality",
                    "redundancy", "mmr_score", "is_profile"]
            writer = csv.DictWriter(fh, fieldnames=cols)
            writer.writeheader()
            for row in debug:
                writer.writerow(row)

        metrics = {
            "pool": n_pool_raw,
            "selected": len(chosen),
            "scenes": len(set(scene_ids)) if scene_ids else 0,
            "scene_dedup_kept": len(items),
            "categories": {},
            "mean_quality": float(np.mean([items[i].quality_score()
                                           for i in chosen])) if chosen else 0.0,
            "wall_s": time.perf_counter() - t0,
        }
        for row in debug:
            metrics["categories"][row["category"]] = \
                metrics["categories"].get(row["category"], 0) + 1
        with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
            json.dump(metrics, fh, indent=2)
        # richer v2 metrics (reference writes metrics_v2.json alongside)
        sel_items = [items[i] for i in chosen]
        metrics_v2 = {
            **metrics,
            "quality": {
                "mean_sharpness": float(np.mean([it.sharpness
                                                 for it in sel_items]))
                if sel_items else 0.0,
                "mean_exposure": float(np.mean([it.exposure
                                                for it in sel_items]))
                if sel_items else 0.0,
                "mean_face_fd": float(np.mean([it.face_fd
                                               for it in sel_items]))
                if sel_items else 0.0,
            },
            "yaw_histogram": {
                "frontal": sum(1 for it in sel_items if abs(it.yaw) < 10),
                "quarter": sum(1 for it in sel_items
                               if 10 <= abs(it.yaw) < 20),
                "profile": sum(1 for it in sel_items if abs(it.yaw) >= 20),
            },
            "scene_spread": {
                str(s): sum(1 for it in sel_items if it.scene == s)
                for s in sorted({it.scene for it in sel_items})
            },
            # knob echo (reference metrics_v2, dataset_curator.py:1685-1706)
            "knobs": {
                "scene_aware": bool(scene_aware),
                "scene_sim": float(scene_sim),
                "scene_time_gap": float(scene_time_gap),
                "scene_nn_window": int(scene_nn_window),
                "scene_dedup": int(scene_dedup),
                "dedup_hamm": int(dedup_hamm),
                "scene_soft_cap": int(scene_softcap),
                "scene_soft_penalty": float(scene_penalty),
                "alpha": float(lam),
                "profile_yaw": float(profile_yaw_thresh),
                "div_bg": float(div_bg),
                "div_face": float(div_face),
                "closeup_boost": float(closeup_boost),
                "closeup_thr": float(closeup_thr),
                "fd_max": float(fd_gate),
                "sharp_min": float(sharp_min),
                "assume_identity": bool(assume_identity),
            },
        }
        with open(os.path.join(out_dir, "metrics_v2.json"), "w") as fh:
            json.dump(metrics_v2, fh, indent=2)
        return {"selected": selected_paths, "metrics": metrics,
                "metrics_v2": metrics_v2, "debug": debug, "items": items}
