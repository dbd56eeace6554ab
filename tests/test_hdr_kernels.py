import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.kernels import color as C  # noqa: E402
from person_capture_tpu.kernels import hdr as H  # noqa: E402
from person_capture_tpu.kernels import tonemap as T  # noqa: E402


# ------------------------------ transfer functions --------------------------

def test_pq_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    rt = np.asarray(C.pq_inv_eotf(C.pq_eotf(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=2e-3)


def test_pq_known_values():
    # PQ(1.0) = 10000 nits; PQ code for 100 nits ≈ 0.508
    assert float(C.pq_eotf(jnp.float32(1.0))) == pytest.approx(1.0, abs=1e-5)
    code_100 = float(C.pq_inv_eotf(jnp.float32(100.0 / 10000.0)))
    assert code_100 == pytest.approx(0.5081, abs=2e-3)
    assert float(C.pq_eotf(jnp.float32(0.0))) == pytest.approx(0.0, abs=1e-6)


def test_hlg_inverse_oetf():
    # HLG OETF⁻¹(0.5) = 1/12 by construction
    assert float(C.hlg_oetf_inv(jnp.float32(0.5))) == pytest.approx(1 / 12, abs=1e-4)
    assert float(C.hlg_oetf_inv(jnp.float32(1.0))) == pytest.approx(1.0, abs=1e-3)


def test_srgb_roundtrip():
    x = jnp.linspace(0, 1, 32)
    rt = np.asarray(C.srgb_eotf(C.srgb_oetf(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=1e-5)


def test_gamut_matrices_inverse():
    m = C.BT2020_TO_BT709 @ C.BT709_TO_BT2020
    np.testing.assert_allclose(m, np.eye(3), atol=1e-5)
    # white stays white
    white = np.asarray(C.apply_matrix(jnp.ones((1, 3)), C.BT2020_TO_BT709))
    np.testing.assert_allclose(white, 1.0, atol=1e-4)


def test_ycbcr_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (16, 3)).astype(np.float32))
    ycc = C.rgb_to_ycbcr(rgb, C.YCBCR_BT2020)
    back = np.asarray(C.ycbcr_to_rgb(ycc[..., 0], ycc[..., 1], ycc[..., 2],
                                     C.YCBCR_BT2020))
    np.testing.assert_allclose(back, np.asarray(rgb), atol=1e-5)


def test_limited_range_normalization():
    # code 64 (10-bit) -> 0.0; 940 -> 1.0
    assert float(C.normalize_limited(jnp.float32(64.0))) == pytest.approx(0.0)
    assert float(C.normalize_limited(jnp.float32(940.0))) == pytest.approx(1.0)
    # chroma: 512 -> 0.0
    assert float(C.normalize_limited(jnp.float32(512.0), chroma=True)) == \
        pytest.approx(0.0, abs=1e-3)


# ------------------------------ tone mapping --------------------------------

@pytest.mark.parametrize("name", ["clip", "reinhard", "mobius", "hable",
                                  "bt.2390"])
def test_tonemap_properties(name):
    fn = T.TONEMAPPERS[name]
    x = jnp.linspace(0.0, 10.0, 256)
    y = np.asarray(fn(x, 10.0))
    assert y.min() >= -1e-6 and y.max() <= 1.0 + 1e-6
    assert np.all(np.diff(y) >= -1e-4)          # monotone
    assert y[-1] >= 0.95                        # peak maps near 1
    # dark region ~identity (reinhard compresses everywhere; hable's filmic
    # toe darkens shadows by design)
    lo = np.asarray(fn(jnp.float32(0.05), 10.0))
    if name not in ("reinhard", "hable"):
        assert lo == pytest.approx(0.05, abs=0.02)


def test_apply_tonemap_preserves_sdr_colors():
    rgb = jnp.asarray([[0.2, 0.1, 0.05]])
    out = np.asarray(T.apply_tonemap(rgb, peak=10.0, algo="bt.2390",
                                     desat=0.25))
    np.testing.assert_allclose(out, np.asarray(rgb), atol=0.03)


def test_apply_tonemap_compresses_highlights():
    rgb = jnp.asarray([[8.0, 6.0, 4.0]])
    out = np.asarray(T.apply_tonemap(rgb, peak=10.0, algo="bt.2390"))
    assert out.max() <= 1.0
    assert out[0, 0] > out[0, 1] > out[0, 2]    # order kept


# ------------------------------ P010 pipeline -------------------------------

def _synthetic_p010(h=32, w=64, seed=0, level=400):
    """P010 planes encoding a mid-gray HDR field with a bright patch."""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), level << 6, np.uint16)
    y[: h // 2, : w // 2] = 900 << 6  # bright patch
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)  # neutral chroma
    return jnp.asarray(y), jnp.asarray(uv)


def test_p010_unpack_neutral_chroma():
    y_u16, uv_u16 = _synthetic_p010()
    y, cb, cr = H.p010_unpack(y_u16, uv_u16)
    assert np.asarray(cb).max() < 1e-2 and np.asarray(cr).max() < 1e-2
    assert y.shape == (32, 64)


def test_p010_to_sdr_produces_gray():
    y_u16, uv_u16 = _synthetic_p010()
    bgr = np.asarray(H.p010_to_sdr_bgr_jnp(y_u16, uv_u16, dither=False))
    assert bgr.shape == (32, 64, 3) and bgr.dtype == np.uint8
    # neutral chroma → R≈G≈B
    spread = bgr.astype(int).max(axis=-1) - bgr.astype(int).min(axis=-1)
    assert spread.max() <= 3
    # bright patch brighter than the rest
    assert bgr[:16, :32].mean() > bgr[16:, 32:].mean() + 20


def test_pallas_kernel_matches_jnp():
    rng = np.random.default_rng(1)
    rgb_prime = rng.uniform(0, 1, (3, 24, 100)).astype(np.float32)
    got = np.asarray(H.tonemap_planes_pallas(jnp.asarray(rgb_prime),
                                             interpret=True))
    # jnp reference of the same chain
    rgbp = jnp.moveaxis(jnp.asarray(rgb_prime), 0, -1)
    lin = H.hdr_rgb_prime_to_linear(rgbp, "pq", 100.0, 1000.0)
    core = H.hdr_to_sdr_core_jnp(lin, 1000.0, 100.0)
    want = np.moveaxis(np.asarray(C.srgb_oetf(core)), -1, 0)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_hdr_to_sdr_bgr_pallas_path_matches_reference():
    y_u16, uv_u16 = _synthetic_p010(seed=2)
    ref = np.asarray(H.p010_to_sdr_bgr_jnp(y_u16, uv_u16, dither=False))
    fused = np.asarray(H.hdr_to_sdr_bgr(y_u16, uv_u16, dither=False,
                                        use_pallas=True))
    diff = np.abs(ref.astype(int) - fused.astype(int))
    assert diff.max() <= 1


def test_dither_changes_lsb_only():
    y_u16, uv_u16 = _synthetic_p010(seed=3)
    a = np.asarray(H.p010_to_sdr_bgr_jnp(y_u16, uv_u16, dither=False)).astype(int)
    b = np.asarray(H.p010_to_sdr_bgr_jnp(y_u16, uv_u16, dither=True)).astype(int)
    assert np.abs(a - b).max() <= 1
