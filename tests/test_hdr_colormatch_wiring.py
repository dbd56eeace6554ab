"""The WIC-look color match has a REAL statistics reference now: toggling
`hdr_wic_yuv444_color_match` visibly changes output, the reduced-reference
path matches the full-res reference, and the lowfreq/deblob/contrast/gamut
keys each change the render. Reference chains: gui_app.py:9487-9878,
10188-10379 (color match), 9344-9467 (deblob), libplacebo contrast
recovery / gamut modes (hdr_sdr_* keys)."""

import numpy as np
import pytest

from person_capture_tpu.hdr.stills import (HdrExportParams,
                                           render_sdr_crop_from_p010)


def _synth_planes(h=96, w=128, seed=0):
    """PQ/BT.2020 P010 planes with gradients + colored regions + shadows."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    y_norm = 0.08 + 0.55 * xx + 0.2 * yy ** 2  # dark→bright ramp
    y_norm[h // 3:h // 2, w // 4:w // 2] = 0.75  # bright patch
    y_norm[2 * h // 3:, : w // 4] = 0.03         # deep shadow
    y_code = np.clip(64 + y_norm * (940 - 64)
                     + rng.normal(0, 2, (h, w)), 0, 1023)
    y_u16 = (y_code.astype(np.uint16) << 6)
    cb = np.full((h // 2, w // 2), 512.0)
    cr = np.full((h // 2, w // 2), 512.0)
    cb[: h // 4] += 120  # blue cast region
    cr[:, : w // 4] += 90  # red cast region
    cr[h // 3:, w // 3:] -= 60
    uv = np.stack([cb, cr], -1) + rng.normal(0, 2, (h // 2, w // 2, 2))
    uv_u16 = (np.clip(uv, 0, 1023).astype(np.uint16) << 6)
    return y_u16, uv_u16


BASE = dict(peak_detect=False, dither=False, speckle_cleanup=False)


def _render(**kw):
    y, uv = _synth_planes()
    p = HdrExportParams(**{**BASE, **kw})
    return render_sdr_crop_from_p010(y, uv, (0, 0, 128, 96), p)


def test_color_match_toggle_changes_output():
    off = _render(color_match=False)
    on = _render(color_match=True)
    diff = np.abs(on.astype(np.int16) - off.astype(np.int16)).mean()
    assert diff > 1.0, f"color match is a no-op (mean |diff|={diff:.3f})"


def test_color_match_response_regression_lock():
    """Lock the direction/magnitude band of the response so future wiring
    changes that silently neuter the match fail here."""
    off = _render(color_match=False).astype(np.float64)
    on = _render(color_match=True).astype(np.float64)
    diff = np.abs(on - off).mean()
    # gamma2.2-vs-sRGB + full-range expansion reference: shadow-heavy shift
    assert 1.0 < diff < 40.0, diff
    # shadow protection: the deep-shadow region moves LESS than midtones
    shadow = np.abs(on[64:, :32] - off[64:, :32]).mean()
    mid = np.abs(on[:48, 32:96] - off[:48, 32:96]).mean()
    assert shadow < mid * 1.5, (shadow, mid)


def test_ref_max_side_reduced_reference_close_to_full():
    full = _render(color_match=True, ref_max_side=0).astype(np.float64)
    fast = _render(color_match=True, ref_max_side=48).astype(np.float64)
    assert np.abs(full - fast).mean() < 3.0


def test_lowfreq_residual_changes_output():
    a = _render(color_match=True, lowfreq=0.0).astype(np.int16)
    b = _render(color_match=True, lowfreq=0.8).astype(np.int16)
    assert np.abs(a - b).mean() > 0.05


def test_shadow_deblob_changes_only_dark_regions():
    a = _render(color_match=False, shadow_deblob=0.0).astype(np.int16)
    b = _render(color_match=False, shadow_deblob=0.9).astype(np.int16)
    dark = np.abs(a[64:, :32] - b[64:, :32]).mean()   # deep shadow corner
    bright = np.abs(a[32:48, 32:64] - b[32:48, 32:64]).mean()  # bright patch
    assert dark >= bright


def test_contrast_recovery_changes_output():
    a = _render(color_match=False, contrast_recovery=0.0)
    b = _render(color_match=False, contrast_recovery=0.8)
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).mean() > 0.05


@pytest.mark.parametrize("mode", ["relative", "perceptual", "saturation"])
def test_gamut_modes_differ_from_clip(mode):
    a = _render(color_match=False, gamut="clip")
    b = _render(color_match=False, gamut=mode)
    assert a.shape == b.shape
    # saturated casts exist in the synth planes; modes must diverge
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() > 0


def test_clean_range_full_changes_interpretation():
    a = _render(color_match=False, clean_range="limited")
    b = _render(color_match=False, clean_range="full")
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).mean() > 1.0


def test_from_cfg_wires_the_keys():
    from person_capture_tpu.config import SessionConfig

    cfg = SessionConfig()
    cfg.hdr_wic_yuv444_color_match_lowfreq = 0.4
    cfg.hdr_wic_yuv444_color_match_ref_max_side = 512
    cfg.wic_shadow_deblob_strength = 0.3
    cfg.hdr_sdr_contrast_recovery = 0.25
    cfg.hdr_sdr_gamut_mapping = "perceptual"
    cfg.hdr_wic_yuv444_color_match_clean_range = "full"
    p = HdrExportParams.from_cfg(cfg)
    assert p.lowfreq == 0.4 and p.ref_max_side == 512
    assert p.shadow_deblob == 0.3 and p.contrast_recovery == 0.25
    assert p.gamut == "perceptual" and p.clean_range == "full"


def test_shape_bucketing_matches_exact_render():
    """Bucketed (pad-to-multiple + trim) renders must match the exact-shape
    render closely — the bucket exists so varying crop sizes reuse one
    compiled program instead of recompiling per shape."""
    y, uv = _synth_planes()
    crop = (2, 2, 2 + 124, 2 + 60)  # 124x60: pads ~10% to 128x64
    exact = render_sdr_crop_from_p010(
        y, uv, crop, HdrExportParams(**{**BASE, "shape_bucket": 0}))
    bucketed = render_sdr_crop_from_p010(
        y, uv, crop, HdrExportParams(**{**BASE, "shape_bucket": 64}))
    assert bucketed.shape == exact.shape
    diff = np.abs(bucketed.astype(np.int16) - exact.astype(np.int16))
    assert diff.mean() < 1.5, diff.mean()


def test_shape_bucketing_single_compilation():
    """Different sub-bucket crop sizes hit the same compiled program."""
    import jax

    y, uv = _synth_planes()
    p = HdrExportParams(**{**BASE, "shape_bucket": 64})
    from person_capture_tpu.hdr.stills import _get_render_fn

    fn = _get_render_fn(p)
    sizes_before = fn._cache_size() if hasattr(fn, "_cache_size") else None
    for crop in ((0, 0, 124, 60), (2, 2, 122, 62), (0, 0, 126, 64)):
        out = render_sdr_crop_from_p010(y, uv, crop, p)
        x1, y1, x2, y2 = crop
        # even-legalized sizes
        assert abs(out.shape[1] - (x2 - x1)) <= 2
    if sizes_before is not None:
        assert fn._cache_size() - sizes_before <= 1
