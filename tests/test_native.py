import numpy as np
import pytest

from person_capture_tpu import native as N
from person_capture_tpu.curator.core import hamming64, phash64


def test_native_builds():
    # g++ is baked into the image; the extension must build
    assert N.available(), "native hostops failed to build"
    assert N.lib().pc_hostops_version() == 1


def test_p010_repack():
    rng = np.random.default_rng(0)
    h, w = 32, 48
    codes_y = rng.integers(0, 1024, (h, w)).astype(np.uint16)
    codes_uv = rng.integers(0, 1024, (h // 2, w // 2, 2)).astype(np.uint16)
    y_hi = (codes_y << 6).astype(np.uint16)
    uv_hi = (codes_uv << 6).astype(np.uint16)
    y, uv = N.p010_repack(y_hi, uv_hi)
    np.testing.assert_array_equal(y, codes_y)
    np.testing.assert_array_equal(uv, codes_uv)


def test_hamming_matrix_matches_python():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2 ** 63, 16, dtype=np.uint64)
    b = rng.integers(0, 2 ** 63, 9, dtype=np.uint64)
    m = N.hamming_matrix(a, b)
    assert m.shape == (16, 9)
    for i in range(16):
        for j in range(9):
            assert m[i, j] == hamming64(int(a[i]), int(b[j]))


def test_phash64_batch_matches_curator():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (4, 64, 80, 3), dtype=np.uint8)
    gray32 = np.stack([
        cv2.resize(cv2.cvtColor(im, cv2.COLOR_BGR2GRAY), (32, 32),
                   interpolation=cv2.INTER_AREA).astype(np.float32)
        for im in imgs])
    hashes = N.phash64_batch(gray32, zero_dc=True)
    for i, im in enumerate(imgs):
        ref = phash64(im)
        # identical DCT math; tolerate ≤2 bit diffs from float ordering
        assert hamming64(int(hashes[i]), ref) <= 2
