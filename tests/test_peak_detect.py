import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from person_capture_tpu.kernels.hdr import (detect_peak_nits,
                                            p010_to_sdr_bgr_jnp)
from person_capture_tpu.kernels.color import pq_inv_eotf


def _p010_at_nits(nits, h=32, w=64):
    code = float(np.asarray(pq_inv_eotf(jnp.float32(nits / 10000.0))))
    level = int(round(16 * 4 + code * (940 - 64)))  # limited-range 10-bit
    y = np.full((h, w), level << 6, np.uint16)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    return y, uv


def test_detect_peak_nits_floor():
    # dim scene: measured peak floors at reference white
    y, uv = _p010_at_nits(50.0)
    from person_capture_tpu.kernels.hdr import p010_unpack
    from person_capture_tpu.kernels.color import YCBCR_BT2020, ycbcr_to_rgb

    yy, cb, cr = p010_unpack(jnp.asarray(y), jnp.asarray(uv))
    rgbp = jnp.clip(ycbcr_to_rgb(yy, cb, cr, YCBCR_BT2020), 0, 1)
    nits = float(detect_peak_nits(rgbp))
    assert nits == pytest.approx(203.0, rel=0.05)

    yb, uvb = _p010_at_nits(1500.0)
    yy, cb, cr = p010_unpack(jnp.asarray(yb), jnp.asarray(uvb))
    rgbp = jnp.clip(ycbcr_to_rgb(yy, cb, cr, YCBCR_BT2020), 0, 1)
    assert float(detect_peak_nits(rgbp)) == pytest.approx(1500.0, rel=0.1)


def test_peak_detect_brightens_dim_scenes():
    # a 90-nit field: with a fixed 1000-nit peak the bt.2390 knee squeezes
    # it; with measured peak (~reference white) it renders brighter
    y, uv = _p010_at_nits(90.0)
    fixed = np.asarray(p010_to_sdr_bgr_jnp(
        jnp.asarray(y), jnp.asarray(uv), dither=False, peak_detect=False,
        src_peak_nits=4000.0))
    dyn = np.asarray(p010_to_sdr_bgr_jnp(
        jnp.asarray(y), jnp.asarray(uv), dither=False, peak_detect=True))
    assert dyn.mean() > fixed.mean() + 2
    # bright scenes: dynamic peak still compresses into range
    yb, uvb = _p010_at_nits(2000.0)
    bright = np.asarray(p010_to_sdr_bgr_jnp(
        jnp.asarray(yb), jnp.asarray(uvb), dither=False, peak_detect=True))
    assert bright.max() <= 255