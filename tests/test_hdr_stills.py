import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from person_capture_tpu.hdr import stills as S  # noqa: E402
from person_capture_tpu.kernels import cleanup as CL  # noqa: E402
from person_capture_tpu.kernels import colormatch as CM  # noqa: E402


def test_scale_crop_to_source():
    out = S.scale_crop_xyxy_to_source((10, 10, 110, 110), (200, 100), (400, 200))
    assert out == (20, 20, 220, 200)


def test_even_crop_legalization():
    # odd coords get evened, bounds respected
    for crop in [(3, 5, 101, 77), (0, 0, 3, 3), (1, 1, 2, 2), (95, 95, 100, 100)]:
        x1, y1, x2, y2 = S.even_hdr_crop_xyxy(crop, (100, 100))
        assert x1 % 2 == 0 and y1 % 2 == 0
        assert (x2 - x1) % 2 == 0 and (y2 - y1) % 2 == 0
        assert 0 <= x1 < x2 <= 100 and 0 <= y1 < y2 <= 100
        assert x2 - x1 >= 2 and y2 - y1 >= 2


def _p010_scene(h=64, w=96):
    rng = np.random.default_rng(0)
    codes = rng.integers(200, 700, (h, w)).astype(np.uint16)
    y = (codes << 6).astype(np.uint16)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    uv[..., 0] += (rng.integers(-40, 40, uv.shape[:2]) << 6).astype(np.uint16)
    return y, uv


def test_render_sdr_crop_from_p010():
    y, uv = _p010_scene()
    params = S.HdrExportParams(dither=False, color_match=False,
                               speckle_cleanup=False)
    bgr = S.render_sdr_crop_from_p010(y, uv, (9, 9, 65, 49), params)
    # crop was legalized to even bounds → even dims near requested
    assert bgr.shape[0] in (40, 42) and bgr.shape[1] in (56, 58)
    assert bgr.dtype == np.uint8
    assert bgr.std() > 1.0  # has content


def test_save_and_validate_roundtrip(tmp_path):
    y, uv = _p010_scene()
    params = S.HdrExportParams(dither=True, color_match=False)
    bgr = S.render_sdr_crop_from_p010(y, uv, (0, 0, 96, 64), params)
    out = str(tmp_path / "crop.png")
    ok, err = S.save_sdr_still(bgr, out)
    assert ok, err


def test_validate_rejects_missing_and_black(tmp_path):
    ok, err = S.validate_sdr_export(str(tmp_path / "nope.png"))
    assert not ok and err == "missing_output"
    import cv2
    black = np.zeros((64, 64, 3), np.uint8)
    p = str(tmp_path / "black.png")
    cv2.imwrite(p, black)
    ok, err = S.validate_sdr_export(p)
    assert not ok and err.startswith("near_black")
    # wrong size
    gray = np.full((64, 64, 3), 90, np.uint8)
    p2 = str(tmp_path / "gray.png")
    cv2.imwrite(p2, gray)
    ok, err = S.validate_sdr_export(p2, expected_size=(128, 128))
    assert not ok and err.startswith("wrong_size")
    ok, _ = S.validate_sdr_export(p2, expected_size=(64, 64))
    assert ok


def test_block_corruption_detector():
    rng = np.random.default_rng(1)
    clean = rng.integers(60, 120, (256, 256, 3)).astype(np.uint8)
    bad, _ = S.detect_block_corruption_bgr(clean)
    assert not bad
    # inject many small dark blocks
    corrupted = clean.copy()
    for by in range(0, 256, 16):
        for bx in range(0, 256, 16):
            corrupted[by:by + 6, bx:bx + 6] = 2
    bad, reason = S.detect_block_corruption_bgr(corrupted)
    assert bad and "dark_block_dropouts" in reason


# --------------------------- color match ------------------------------------

def test_color_match_luma_moves_toward_reference():
    rng = np.random.default_rng(2)
    base = rng.integers(40, 200, (64, 64, 3)).astype(np.uint8)
    darker = np.clip(base.astype(np.int16) - 40, 0, 255).astype(np.uint8)
    out = np.asarray(CM.color_match_bgr(darker, base, strength=1.0,
                                        luma_strength=1.0,
                                        shadow_luma_protect=0.0))
    # matched output mean should approach the reference mean
    assert abs(out.mean() - base.mean()) < abs(darker.mean() - base.mean())


def test_color_match_identity_when_same():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = np.asarray(CM.color_match_bgr(img, img))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_color_match_shadow_protection():
    rng = np.random.default_rng(4)
    dark = rng.integers(0, 30, (64, 64, 3)).astype(np.uint8)
    bright_ref = np.clip(dark.astype(np.int16) + 120, 0, 255).astype(np.uint8)
    protected = np.asarray(CM.color_match_bgr(
        dark, bright_ref, luma_strength=1.0, shadow_luma_protect=1.0))
    unprotected = np.asarray(CM.color_match_bgr(
        dark, bright_ref, luma_strength=1.0, shadow_luma_protect=0.0))
    # protection keeps dark pixels closer to the clean input
    assert protected.mean() < unprotected.mean()


def test_quantile_lut_monotone():
    rng = np.random.default_rng(5)
    clean = jnp.asarray(rng.uniform(0, 1, 1000).astype(np.float32))
    ref = jnp.asarray((rng.uniform(0, 1, 1000) ** 2).astype(np.float32))
    xs, ys = CM.fit_quantile_lut(clean, ref)
    assert np.all(np.diff(np.asarray(xs)) >= 0)
    assert np.all(np.diff(np.asarray(ys)) >= 0)


# ----------------------------- cleanup --------------------------------------

def test_despeckle_removes_isolated_saturated_pixels():
    img = np.full((64, 64, 3), 25, np.uint8)  # dark gray scene
    img[10, 10] = (255, 0, 255)   # magenta speckle
    img[40, 20] = (255, 0, 0)     # blue speckle (BGR)
    out, mask = (np.asarray(v) for v in CL.despeckle_bgr(img))
    assert mask[10, 10] and mask[40, 20]
    assert np.abs(out[10, 10].astype(int) - 25).max() <= 10
    # untouched elsewhere
    assert np.array_equal(out[0, 0], img[0, 0])


def test_despeckle_keeps_coherent_color_regions():
    img = np.full((64, 64, 3), 25, np.uint8)
    img[20:30, 20:30] = (200, 30, 180)  # a real colored object (coherent)
    out, mask = (np.asarray(v) for v in CL.despeckle_bgr(img))
    assert mask[22:28, 22:28].sum() == 0
    assert np.array_equal(out[25, 25], img[25, 25])


def test_external_reference_render_is_fused_and_ordered(tmp_path):
    """External-reference exports run the post-stages in ONE jitted program
    with the same stage order as the internal chain (match → guide →
    deblob → despeckle); the old path ran them eagerly op-by-op and
    silently dropped guide_cleanup."""
    import numpy as np

    from person_capture_tpu.hdr.stills import (HdrExportParams,
                                               render_sdr_crop_from_p010)

    rng = np.random.default_rng(4)
    h, w = 64, 96
    y = (rng.integers(200, 800, (h, w)).astype(np.uint16) << 6)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    ref = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    crop = (0, 0, w, h)

    base = render_sdr_crop_from_p010(
        y, uv, crop, HdrExportParams(color_match=False,
                                     speckle_cleanup=False))
    p = HdrExportParams(color_match=True, speckle_cleanup=True,
                        shadow_deblob=0.4)
    ext = render_sdr_crop_from_p010(y, uv, crop, p, reference_bgr=ref)
    assert ext.shape == base.shape and ext.dtype == np.uint8
    assert not np.array_equal(ext, base)       # the match actually applied
    # guide_cleanup toggles the output (it was silently ignored before)
    p2 = HdrExportParams(color_match=True, speckle_cleanup=True,
                         shadow_deblob=0.4, guide_cleanup=True)
    ext2 = render_sdr_crop_from_p010(y, uv, crop, p2, reference_bgr=ref)
    assert not np.array_equal(ext2, ext)
