"""Full-resolution HDR→SDR still export.

TPU replacement for the reference's per-export ffmpeg/WIC subprocess zoo
(person_capture/gui_app.py:12867 `_save_hdr_sdr_screencap`, 11563 archive
path): the crop is legalized for 4:2:0 (`even_hdr_crop_xyxy` semantics,
gui_app.py:8676-8703), tone-mapped by the fused device kernel
(kernels/hdr.py), optionally color-matched to the WIC-look response
(kernels/colormatch.py) and despeckled (kernels/cleanup.py), then written
atomically as PNG/JPG. Validation oracles re-implement the reference's
decode-and-inspect checks (gui_app.py:12485-12597).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def scale_crop_xyxy_to_source(crop_xyxy, frame_size, source_size):
    """Map processed-frame crop coords to source pixels (round + clamp)."""
    fw, fh = max(1, int(frame_size[0])), max(1, int(frame_size[1]))
    sw, sh = max(1, int(source_size[0])), max(1, int(source_size[1]))
    sx, sy = sw / fw, sh / fh
    x1, y1, x2, y2 = crop_xyxy
    ox1 = max(0, min(sw - 1, int(round(x1 * sx))))
    oy1 = max(0, min(sh - 1, int(round(y1 * sy))))
    ox2 = max(ox1 + 1, min(sw, int(round(x2 * sx))))
    oy2 = max(oy1 + 1, min(sh, int(round(y2 * sy))))
    return ox1, oy1, ox2, oy2


def even_hdr_crop_xyxy(crop_xyxy, source_size):
    """Legalize a crop for 4:2:0: even origin, even extent, in bounds,
    ≥2px each axis, staying as close as possible to the chosen box."""
    def legalize(a1: int, a2: int, limit: int) -> Tuple[int, int]:
        a1 = max(0, min(limit - 2, a1 & ~1))
        a2 = max(a1 + 2, min(limit, a2))
        if (a2 - a1) & 1:
            if a2 < limit:
                a2 += 1
            elif a2 > a1 + 2:
                a2 -= 1
            elif a1 >= 2:
                a1 -= 2
            else:
                a2 = min(limit, a1 + 2)
        if a1 & 1:
            if a1 + 1 <= limit - 2:
                a1 += 1
                a2 = max(a1 + 2, min(limit, a2 + 1))
            else:
                a1 -= 1
        a1 = max(0, min(limit - 2, a1 & ~1))
        a2 = max(a1 + 2, min(limit, a2))
        if (a2 - a1) & 1:
            a2 = max(a1 + 2, min(limit, a2 - 1))
        return a1, a2

    sw, sh = max(2, int(source_size[0])), max(2, int(source_size[1]))
    x1, y1, x2, y2 = (int(v) for v in crop_xyxy)
    x1, x2 = legalize(x1, x2, sw)
    y1, y2 = legalize(y1, y2, sh)
    return x1, y1, x2, y2


@dataclass
class HdrExportParams:
    transfer: str = "pq"            # pq | hlg
    full_range: bool = False
    src_peak_nits: float = 1000.0
    sdr_nits: float = 100.0
    tonemap: str = "bt.2390"        # auto|bt.2390|spline|st2094-40|mobius|hable
    desat: float = 0.25
    tm_param: Optional[float] = None
    dither: bool = True
    peak_detect: bool = True
    color_match: bool = True
    color_match_strength: float = 1.0
    color_match_luma: float = 0.45
    color_match_chroma: float = 0.85
    shadow_luma_protect: float = 0.85
    shadow_chroma_protect: float = 0.80
    speckle_cleanup: bool = True
    # WIC-look reference chain controls (reference gui_app.py:10188-10379):
    # the statistics reference renders through a genuinely different decode
    # chain — full-range expansion, nearest (420-style) chroma, pure-2.2
    # gamma — vs the clean chain's limited/linear/sRGB.
    # render-shape bucketing (TPU-native): pad crops to multiples of this
    # before the kernel and trim after, so varying crop sizes reuse ONE
    # compiled program instead of recompiling per shape (compiles cost
    # seconds on tunneled links). Edge-replicated padding only duplicates
    # existing pixel values, so quantile-based stats (peak detect, LUT fit)
    # barely move. 0 disables.
    shape_bucket: int = 64
    clean_range: str = "limited"    # hdr_wic_yuv444_color_match_clean_range
    ref_max_side: int = 960         # reduced-res statistics reference
    lowfreq: float = 0.0            # coarse chroma-field residual transfer
    shadow_deblob: float = 0.0      # wic_shadow_deblob_strength
    contrast_recovery: float = 0.0  # hdr_sdr_contrast_recovery
    gamut: str = "clip"             # hdr_sdr_gamut_mapping
    guide_cleanup: bool = False     # hdr_wic_yuv444_guide_cleanup

    @staticmethod
    def from_cfg(cfg, transfer: str = "",
                 full_range: Optional[bool] = None) -> "HdrExportParams":
        """``transfer``/``full_range`` come from the SOURCE probe (engine:
        detect_hdr().transfer, color_range_full) — an HLG video tone-mapped
        through the PQ EOTF renders with grossly wrong luminance, so the
        probed transfer must override the 'pq' default."""
        p = HdrExportParams(
            sdr_nits=cfg.sdr_nits,
            tonemap=cfg.hdr_sdr_tonemap,
            desat=cfg.tm_desat,
            tm_param=cfg.tm_param,
            peak_detect=cfg.hdr_sdr_peak_detect,
            color_match=cfg.hdr_wic_yuv444_color_match,
            color_match_strength=cfg.hdr_wic_yuv444_color_match_strength,
            color_match_luma=cfg.hdr_wic_yuv444_color_match_luma_strength,
            color_match_chroma=cfg.hdr_wic_yuv444_color_match_chroma_strength,
            shadow_luma_protect=cfg.hdr_wic_yuv444_color_match_shadow_luma_protect,
            shadow_chroma_protect=cfg.hdr_wic_yuv444_color_match_shadow_chroma_protect,
            speckle_cleanup=cfg.hdr_wic_speckle_cleanup,
            clean_range=cfg.hdr_wic_yuv444_color_match_clean_range,
            ref_max_side=cfg.hdr_wic_yuv444_color_match_ref_max_side,
            lowfreq=cfg.hdr_wic_yuv444_color_match_lowfreq,
            shadow_deblob=cfg.wic_shadow_deblob_strength,
            contrast_recovery=cfg.hdr_sdr_contrast_recovery,
            gamut=cfg.hdr_sdr_gamut_mapping,
            guide_cleanup=cfg.hdr_wic_yuv444_guide_cleanup,
        )
        tr = (transfer or "").lower()
        if tr in ("hlg", "arib-std-b67"):
            p.transfer = "hlg"
        elif tr in ("pq", "smpte2084", "smpte st 2084"):
            p.transfer = "pq"
        if full_range is not None:
            p.full_range = bool(full_range)
        # conversion backend selection (reference: windows_wic = WIC-look
        # with color-match repair; ffmpeg = plain libplacebo/zscale render)
        if (cfg.hdr_sdr_conversion or "").lower() == "ffmpeg":
            p.color_match = False
        # quality preset ladder. DIVERGENCE from the reference (documented):
        # the reference maps these names to libplacebo parameter sets
        # (peak-detect/contrast-recovery/LUT/dither, gui_app.py:12598+);
        # this chain has no libplacebo, so the presets instead scale the
        # device chain's expensive stages — "balanced" keeps the WIC-look
        # color match but fits it against a half-resolution statistics
        # reference (quality barely differs, render cost drops), "fast"
        # drops the repair/dither stages entirely.
        quality = (cfg.hdr_sdr_quality or "madvr_like").lower()
        if quality == "fast":
            p.color_match = False
            p.speckle_cleanup = False
            p.peak_detect = False
            p.dither = False
        elif quality == "balanced":
            p.ref_max_side = max(256, int(p.ref_max_side) // 2 or 480)
        # madvr_like / resolve_like keep the full chain
        return p


_RENDER_CACHE: dict = {}


def _params_key(params: HdrExportParams) -> tuple:
    return (params.transfer, params.full_range, params.src_peak_nits,
            params.sdr_nits, params.tonemap, params.desat, params.tm_param,
            params.dither, params.peak_detect,
            params.color_match, params.color_match_strength,
            params.color_match_luma, params.color_match_chroma,
            params.shadow_luma_protect, params.shadow_chroma_protect,
            params.speckle_cleanup, params.clean_range, params.ref_max_side,
            params.lowfreq, params.shadow_deblob, params.contrast_recovery,
            params.gamut, params.guide_cleanup)


def _ref_subsample_step(shape_hw, ref_max_side: int) -> int:
    """Even stride k so the statistics reference renders at ≤ ref_max_side
    (the reference's reduced-reference fast path, gui_app.py:10380)."""
    if ref_max_side <= 0:
        return 1
    side = max(shape_hw[0], shape_hw[1])
    k = -(-side // int(ref_max_side))
    return max(1, int(k))


def _get_render_fn(params: HdrExportParams):
    """One jitted program for the whole export: clean tone-map + the
    WIC-look statistics-reference render (a genuinely different decode
    chain: full-range expansion, nearest 420-style chroma, pure-2.2 gamma —
    reference gui_app.py:10188-10379 renders yuv420/full vs yuv444/limited
    pairs for the same purpose) + LUT/gain/lowfreq match + shadow deblob +
    despeckle → uint8 BGR. Eager per-op execution pays a host round trip
    per op on tunneled TPU links; fused it is one dispatch + one download."""
    key = _params_key(params)
    fn = _RENDER_CACHE.get(key)
    if fn is not None:
        return fn

    import jax

    from ..kernels.cleanup import despeckle_bgr, shadow_deblob_bgr
    from ..kernels.colormatch import color_match_bgr
    from ..kernels.hdr import hdr_to_sdr_bgr, p010_to_sdr_bgr_jnp

    def render(y_crop, uv_crop):
        clean_full = params.full_range or params.clean_range == "full"
        # plain PQ tone-map (no peak-detect/contrast-recovery/gamut-map —
        # e.g. the "fast" quality preset) dispatches the Pallas-fused
        # per-pixel kernel on TPU; richer configurations use the jnp chain
        plain = (params.transfer == "pq" and not params.peak_detect
                 and params.gamut == "clip"
                 and float(params.contrast_recovery) == 0.0)
        if plain:
            bgr = hdr_to_sdr_bgr(
                y_crop, uv_crop, full_range=clean_full,
                transfer=params.transfer,
                src_peak_nits=params.src_peak_nits,
                sdr_nits=params.sdr_nits, algo=params.tonemap,
                desat=params.desat, param=params.tm_param,
                dither=params.dither)
        else:
            bgr = p010_to_sdr_bgr_jnp(
                y_crop, uv_crop, full_range=clean_full,
                transfer=params.transfer, src_peak_nits=params.src_peak_nits,
                sdr_nits=params.sdr_nits, algo=params.tonemap,
                desat=params.desat, param=params.tm_param,
                dither=params.dither, peak_detect=params.peak_detect,
                contrast_recovery=params.contrast_recovery,
                gamut=params.gamut)
        if params.color_match:
            # WIC-look reference: full-range expansion + nearest chroma +
            # gamma-2.2, rendered at reduced resolution (stats only)
            k = _ref_subsample_step(y_crop.shape, params.ref_max_side)
            y_ref = y_crop[::k, ::k]
            uv_ref = uv_crop[::k, ::k]
            ref = p010_to_sdr_bgr_jnp(
                y_ref, uv_ref, full_range=True,
                transfer=params.transfer,
                src_peak_nits=params.src_peak_nits,
                sdr_nits=params.sdr_nits, algo=params.tonemap,
                desat=params.desat, param=params.tm_param, dither=False,
                peak_detect=params.peak_detect,
                chroma_upsample="nearest", oetf="gamma22",
                contrast_recovery=params.contrast_recovery,
                gamut=params.gamut)
            bgr = color_match_bgr(
                bgr, ref, strength=params.color_match_strength,
                luma_strength=params.color_match_luma,
                chroma_strength=params.color_match_chroma,
                shadow_luma_protect=params.shadow_luma_protect,
                shadow_chroma_protect=params.shadow_chroma_protect,
                lowfreq=params.lowfreq)
            if params.guide_cleanup:
                from ..kernels.cleanup import guide_cleanup_bgr

                bgr = guide_cleanup_bgr(bgr, ref)
        if params.shadow_deblob > 0.0:
            bgr = shadow_deblob_bgr(bgr, strength=params.shadow_deblob)
        if params.speckle_cleanup:
            bgr, _ = despeckle_bgr(bgr)
        return bgr

    fn = jax.jit(render)
    _RENDER_CACHE[key] = fn
    return fn


def _get_ext_match_fn(params: HdrExportParams):
    """One jitted program for the EXTERNAL-reference post-stages, mirroring
    the internal chain's order exactly: color match → guide cleanup →
    shadow deblob → despeckle."""
    key = _params_key(params) + ("ext_match",)
    fn = _RENDER_CACHE.get(key)
    if fn is not None:
        return fn

    import jax

    from ..kernels.cleanup import (despeckle_bgr, guide_cleanup_bgr,
                                   shadow_deblob_bgr)
    from ..kernels.colormatch import color_match_bgr

    def run(bgr, ref):
        out = color_match_bgr(
            bgr, ref, strength=params.color_match_strength,
            luma_strength=params.color_match_luma,
            chroma_strength=params.color_match_chroma,
            shadow_luma_protect=params.shadow_luma_protect,
            shadow_chroma_protect=params.shadow_chroma_protect,
            lowfreq=params.lowfreq)
        if params.guide_cleanup:
            out = guide_cleanup_bgr(out, ref)
        if params.shadow_deblob > 0.0:
            out = shadow_deblob_bgr(out, strength=params.shadow_deblob)
        if params.speckle_cleanup:
            out, _ = despeckle_bgr(out)
        return out

    fn = jax.jit(run)
    _RENDER_CACHE[key] = fn
    return fn


def bucketed_crop_arrays(y_plane: np.ndarray, uv_plane: np.ndarray,
                         crop_xyxy, params: HdrExportParams):
    """Legalized (4:2:0-even) + shape-bucketed crop planes, exactly as
    the export dispatch prepares them: ``(y_crop, uv_crop, trim)`` where
    ``trim`` is the pre-pad (h, w) to slice the render back to, or None.
    Shared by :func:`submit_sdr_crop_render` and bench's MFU report so
    the measured program is the one the pipeline compiles."""
    h, w = y_plane.shape[:2]
    x1, y1, x2, y2 = even_hdr_crop_xyxy(crop_xyxy, (w, h))
    y_crop = np.ascontiguousarray(np.asarray(y_plane)[y1:y2, x1:x2])
    uv_crop = np.ascontiguousarray(
        np.asarray(uv_plane)[y1 // 2:y2 // 2, x1 // 2:x2 // 2])

    ch, cw = y_crop.shape
    bucket = int(getattr(params, "shape_bucket", 0) or 0)
    trim = None
    if bucket > 1 and (ch % bucket or cw % bucket):
        ph = (-ch) % bucket
        pw = (-cw) % bucket
        pad_frac = ((ch + ph) * (cw + pw) - ch * cw) / float(ch * cw)
        # replicated pixels enter the quantile statistics (peak detect,
        # LUT fit); keep their share small — tiny crops render exact
        if pad_frac <= 0.25:
            y_crop = np.pad(y_crop, ((0, ph), (0, pw)), mode="edge")
            uv_crop = np.pad(uv_crop, ((0, ph // 2), (0, pw // 2), (0, 0)),
                             mode="edge")
            trim = (ch, cw)
    return y_crop, uv_crop, trim


def submit_sdr_crop_render(y_plane: np.ndarray, uv_plane: np.ndarray,
                           crop_xyxy, params: HdrExportParams,
                           reference_bgr: Optional[np.ndarray] = None):
    """Dispatch the device render for a P010 crop; return a zero-arg
    ``fetch() -> np.ndarray`` that blocks on the result.

    jax dispatch is asynchronous: the device computes between ``submit``
    and ``fetch``, so a caller can overlap the previous still's host-side
    PNG encode with this render (depth-1 export pipelining — the saver
    thread and bench.py both do; round trips cost ~30-300 ms on tunneled
    links and the encode is host-CPU-bound).

    The crop is legalized for 4:2:0 first; cropping happens *before* the
    kernel (as the reference's PNG path crops in HDR space) so tone-map
    statistics see only the exported region. The full render chain is one
    jitted device program (see :func:`_get_render_fn`).

    ``reference_bgr``: optional externally-rendered statistics reference for
    the color match (e.g. a reduced-resolution render); when None and
    color_match is on, the program renders its own reference internally.
    """
    y_crop, uv_crop, trim = bucketed_crop_arrays(y_plane, uv_plane,
                                                 crop_xyxy, params)

    if reference_bgr is not None and params.color_match:
        # external reference: render the clean tone-map now (all the
        # post-stages move to the jitted ext program so their ORDER matches
        # the internal chain — match → guide cleanup → shadow deblob →
        # despeckle — and nothing runs eagerly op-by-op, which pays a host
        # round trip per op on tunneled links)
        base = HdrExportParams(**{**params.__dict__, "color_match": False,
                                  "speckle_cleanup": False,
                                  "shadow_deblob": 0.0,
                                  "guide_cleanup": False})
        pending = _get_render_fn(base)(y_crop, uv_crop)
        ext_fn = _get_ext_match_fn(params)
        ref = np.asarray(reference_bgr)
        if trim is not None:
            # the render was edge-padded to the shape bucket; pad the
            # reference by the same FRACTION of its own size so the spatial
            # post-stages (lowfreq residual pooling, guide-cleanup resize)
            # keep both inputs on the same normalized grid — an unpadded
            # reference would be stretched over the pad band, shifting every
            # interior comparison
            rh, rw = ref.shape[:2]
            rph = int(round(rh * (y_crop.shape[0] - ch) / float(ch)))
            rpw = int(round(rw * (y_crop.shape[1] - cw) / float(cw)))
            if rph or rpw:
                ref = np.pad(ref, ((0, rph), (0, rpw), (0, 0)), mode="edge")
        out_dev = ext_fn(pending, ref)
        try:
            out_dev.copy_to_host_async()
        except AttributeError:
            pass

        def fetch_ext() -> np.ndarray:
            bgr = np.asarray(out_dev)
            return bgr[: trim[0], : trim[1]] if trim is not None else bgr

        return fetch_ext

    pending = _get_render_fn(params)(y_crop, uv_crop)
    # start the device→host copy the moment the render completes instead of
    # when fetch() is called: on tunneled links the ~8 MB download otherwise
    # sits serialized on the critical path between renders (the saver's
    # depth-1 pipeline calls fetch() only after encoding the previous still)
    try:
        pending.copy_to_host_async()
    except AttributeError:
        pass

    def fetch() -> np.ndarray:
        out = np.asarray(pending)
        return out[: trim[0], : trim[1]] if trim is not None else out

    return fetch


def render_sdr_crop_from_p010(y_plane: np.ndarray, uv_plane: np.ndarray,
                              crop_xyxy, params: HdrExportParams,
                              reference_bgr: Optional[np.ndarray] = None
                              ) -> np.ndarray:
    """Blocking crop-render (see :func:`submit_sdr_crop_render`)."""
    return submit_sdr_crop_render(y_plane, uv_plane, crop_xyxy, params,
                                  reference_bgr)()


def save_sdr_still(bgr: np.ndarray, out_path: str) -> Tuple[bool, str]:
    """Atomic PNG/JPG write + validation. The format follows the
    ``out_path`` extension (HdrStillExporter.out_path_for sets it)."""
    from ..pipeline.saver import atomic_image_write

    ok, err = atomic_image_write(bgr, out_path)
    if not ok:
        return False, err
    return validate_sdr_export(out_path,
                               expected_size=(bgr.shape[1], bgr.shape[0]))


def validate_sdr_export(path: str,
                        expected_size: Optional[Tuple[int, int]] = None
                        ) -> Tuple[bool, str]:
    """Decode-and-inspect validation (no byte-size heuristics): missing/
    empty/undecodable/wrong-size/near-black ⇒ reject."""
    if cv2 is None:
        return os.path.exists(path), "cv2_unavailable"
    try:
        if not path or not os.path.exists(path):
            return False, "missing_output"
        if os.path.getsize(path) <= 16:
            return False, "empty_output"
        data = np.fromfile(path, dtype=np.uint8)
        img = cv2.imdecode(data, cv2.IMREAD_COLOR)
        if img is None or img.ndim != 3 or img.size == 0:
            return False, "decode_failed"
        ih, iw = img.shape[:2]
        if expected_size is not None:
            ew, eh = int(expected_size[0]), int(expected_size[1])
            if ew > 0 and eh > 0 and (abs(iw - ew) > 2 or abs(ih - eh) > 2):
                return False, f"wrong_size got={iw}x{ih} expected={ew}x{eh}"
        y = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        mean = float(np.mean(y))
        p95 = float(np.percentile(y, 95.0))
        p99 = float(np.percentile(y, 99.0))
        if mean < 1.0 and p95 < 3.0 and p99 < 8.0:
            return False, (f"near_black_output mean={mean:.3f} "
                           f"p95={p95:.3f} p99={p99:.3f}")
        return True, ""
    except Exception as exc:  # noqa: BLE001 — oracle must not raise
        return False, f"validate_failed:{exc}"


def detect_block_corruption_bgr(bgr: np.ndarray) -> Tuple[bool, str]:
    """Detect block-dropout corruption: many small hard-edged regions much
    darker than their local dark neighborhood (reference oracle:
    gui_app.py:12525-12597)."""
    if cv2 is None or bgr is None or bgr.ndim != 3 or bgr.shape[2] < 3:
        return False, ""
    bgr = bgr[:, :, :3]
    h, w = bgr.shape[:2]
    if h < 64 or w < 64:
        return False, ""
    ycc = cv2.cvtColor(bgr, cv2.COLOR_BGR2YCrCb)
    y = ycc[:, :, 0].astype(np.int16, copy=False)
    y_med = cv2.medianBlur(ycc[:, :, 0], 17).astype(np.int16, copy=False)
    drop = (y <= 52) & (y_med >= 12) & ((y_med - y) >= 12)
    drop_count = int(np.count_nonzero(drop))
    if drop_count < 2500:
        return False, ""
    n, _labels, stats, _cent = cv2.connectedComponentsWithStats(
        drop.astype(np.uint8), 8)
    rect_count = 0
    rect_area = 0
    for i in range(1, n):
        cw = int(stats[i, cv2.CC_STAT_WIDTH])
        ch = int(stats[i, cv2.CC_STAT_HEIGHT])
        area = int(stats[i, cv2.CC_STAT_AREA])
        if area < 12 or cw < 3 or ch < 3 or cw > 80 or ch > 80:
            continue
        if area / max(1, cw * ch) < 0.15:
            continue
        rect_count += 1
        rect_area += area
    bad = ((rect_count >= 80 and rect_area >= 5000)
           or (rect_count >= 50 and drop_count >= 12000))
    if not bad:
        return False, ""
    return True, (f"dark_block_dropouts pixels={drop_count} "
                  f"components={rect_count} area={rect_area}")
