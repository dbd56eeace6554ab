"""Regression tests for the round-3 kernels/hdr review findings:

- sparse-side chroma gain falls back to neutral instead of the clip floor;
- BT.2390 honors the pipeline's sdr_nits anchor;
- shape-bucket padding keeps the external statistics reference aligned;
- exporter cancellation is observed BEFORE the blocking fetch;
- the plain-PQ stills config routes through hdr_to_sdr_bgr (Pallas on TPU).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from person_capture_tpu.kernels import colormatch as CM  # noqa: E402
from person_capture_tpu.kernels import tonemap as T  # noqa: E402


def test_chroma_side_gain_sparse_side_neutral():
    # identical clean/ref with only ~5% positive-chroma pixels: the old
    # full-array quantile collapsed the positive gain to the 0.4 clip
    # floor; reference semantics give ~1.0 (identical inputs)
    rng = np.random.default_rng(0)
    c = rng.normal(-0.08, 0.02, (200, 200)).astype(np.float32)
    c[:10, :] = 0.1  # sparse positive side (5% of rows)
    pos, neg = CM.fit_chroma_side_gains(jnp.asarray(c), jnp.asarray(c))
    assert float(pos) == pytest.approx(1.0, abs=0.05)
    assert float(neg) == pytest.approx(1.0, abs=0.05)


def test_chroma_side_gain_scales_real_cast():
    # ref = clean with doubled positive chroma -> positive gain ~2, the
    # (dense) negative side stays ~1
    rng = np.random.default_rng(1)
    c = rng.normal(0.0, 0.06, (200, 200)).astype(np.float32)
    r = np.where(c > 0, c * 2.0, c).astype(np.float32)
    pos, neg = CM.fit_chroma_side_gains(jnp.asarray(c), jnp.asarray(r))
    assert float(pos) == pytest.approx(2.0, abs=0.15)
    assert float(neg) == pytest.approx(1.0, abs=0.1)


def test_chroma_side_gain_tiny_input_neutral():
    c = jnp.zeros((8, 8), jnp.float32)
    pos, neg = CM.fit_chroma_side_gains(c, c)
    assert float(pos) == 1.0 and float(neg) == 1.0


def test_color_match_accepts_reduced_reference():
    rng = np.random.default_rng(2)
    clean = rng.integers(0, 255, (128, 160, 3), np.uint8)
    ref = np.asarray(clean[::2, ::2])  # half-res statistics reference
    out = np.asarray(CM.color_match_bgr(jnp.asarray(clean),
                                        jnp.asarray(ref)))
    assert out.shape == clean.shape
    # matching an image against its own (subsampled) statistics must be
    # close to identity
    assert float(np.abs(out.astype(np.int16)
                        - clean.astype(np.int16)).mean()) < 4.0


def test_bt2390_honors_sdr_nits():
    rgb = jnp.linspace(0.05, 8.0, 300).reshape(100, 1, 3)
    out100 = np.asarray(T.apply_tonemap(rgb, peak=10.0, algo="bt.2390",
                                        desat=0.0, sdr_nits=100.0))
    out203 = np.asarray(T.apply_tonemap(rgb, peak=10.0, algo="bt.2390",
                                        desat=0.0, sdr_nits=203.0))
    # the knee anchor moves with sdr_nits — outputs must differ measurably
    assert float(np.abs(out100 - out203).max()) > 1e-3
    # and each matches the curve called directly with the same anchor
    lum = np.maximum(np.asarray(rgb).max(-1, keepdims=True), 1e-6)
    direct = np.asarray(T.tm_bt2390(jnp.asarray(lum), 10.0, sdr_nits=203.0))
    scaled = np.clip(np.asarray(rgb) * (direct / lum), 0.0, 1.0)
    np.testing.assert_allclose(out203, scaled, atol=1e-5)


def _mk_p010(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(150, 900, (h // 8, w // 8)).astype(np.float32)
    import cv2

    luma = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    y = (np.clip(luma, 64, 940).astype(np.uint16) << 6)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    uv[: h // 4] = 560 << 6  # a real chroma cast in the top half
    return y, uv


def test_ext_reference_padding_alignment():
    # a crop NOT a multiple of the shape bucket, matched against an
    # external reduced reference with the spatial lowfreq stage on: the
    # padded render must produce (nearly) the same still as the exact
    # (bucket-disabled) render — a misaligned reference would shift the
    # coarse chroma field across the whole interior
    from person_capture_tpu.hdr.stills import (HdrExportParams,
                                               render_sdr_crop_from_p010)

    y, uv = _mk_p010(256, 320)
    crop = (2, 2, 222, 170)  # 220x168 -> pads to 256x192 at bucket 64
    base = dict(color_match=True, speckle_cleanup=False, dither=False,
                peak_detect=False, lowfreq=0.6, ref_max_side=128)
    # external reference = the plain render of the exact crop, reduced
    ref_params = HdrExportParams(**{**base, "color_match": False},
                                 shape_bucket=0)
    ref_full = render_sdr_crop_from_p010(y, uv, crop, ref_params)
    ref = ref_full[::2, ::2]

    exact = render_sdr_crop_from_p010(
        y, uv, crop, HdrExportParams(**base, shape_bucket=0),
        reference_bgr=ref)
    padded = render_sdr_crop_from_p010(
        y, uv, crop, HdrExportParams(**base, shape_bucket=64),
        reference_bgr=ref)
    assert exact.shape == padded.shape
    diff = np.abs(exact.astype(np.int16) - padded.astype(np.int16))
    assert float(diff.mean()) < 1.5


def test_exporter_cancel_before_fetch():
    from person_capture_tpu.hdr.exporter import HdrStillExporter
    from person_capture_tpu.hdr.stills import HdrExportParams
    import threading

    exp = HdrStillExporter(source=None, params=HdrExportParams())
    ev = threading.Event()
    ev.set()

    def fetch_must_not_run():
        raise AssertionError("fetch() ran despite pre-set cancel")

    pending = ("ok", (None, None, (0, 0, 2, 2), fetch_must_not_run))
    ok, err = exp.finish(pending, "/tmp/nonexistent.png", cancel=ev)
    assert not ok and err == "cancelled"


def test_plain_config_uses_pallas_entry(monkeypatch):
    # the "fast"-style config must route through hdr_to_sdr_bgr (the
    # Pallas production entry); richer configs through the jnp chain
    import person_capture_tpu.hdr.stills as S
    from person_capture_tpu.kernels import hdr as H

    calls = []
    real = H.hdr_to_sdr_bgr

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(H, "hdr_to_sdr_bgr", spy)
    S._RENDER_CACHE.clear()
    try:
        y, uv = _mk_p010(128, 128, seed=3)
        plain = S.HdrExportParams(color_match=False, speckle_cleanup=False,
                                  peak_detect=False, dither=False)
        S.render_sdr_crop_from_p010(y, uv, (0, 0, 128, 128), plain)
        assert calls, "plain config did not dispatch hdr_to_sdr_bgr"
        n = len(calls)
        rich = S.HdrExportParams(color_match=False, speckle_cleanup=False,
                                 peak_detect=True, dither=False)
        S.render_sdr_crop_from_p010(y, uv, (0, 0, 128, 128), rich)
        assert len(calls) == n  # peak-detect config stays on the jnp chain
    finally:
        S._RENDER_CACHE.clear()
