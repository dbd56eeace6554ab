import numpy as np
import pytest

from person_capture_tpu.core import hashing as H


def test_dct_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 32)).astype(np.float32)
    ours = H.dct2(x)
    ref = cv2.dct(x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_phash_self_similarity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    h1 = H.phash_bits(img)
    assert H.phash_similarity(h1, h1) == 1.0
    # small noise keeps hash close
    noisy = np.clip(img.astype(int) + rng.integers(-5, 5, img.shape), 0, 255).astype(np.uint8)
    assert H.phash_similarity(h1, H.phash_bits(noisy)) > 0.8


def test_phash_differs_for_different_images():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    sim = H.phash_similarity(H.phash_bits(a), H.phash_bits(b))
    assert sim < 0.9


def test_phash_empty():
    assert H.phash_bits(np.zeros((0, 0, 3), np.uint8)) == 0
    assert H.phash_bits(None) == 0


def test_phash_batch_jnp_matches_host():
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (4, 48, 56, 3), dtype=np.uint8)
    gray32 = np.stack([
        cv2.resize(cv2.cvtColor(im, cv2.COLOR_BGR2GRAY), (32, 32),
                   interpolation=cv2.INTER_AREA).astype(np.float32)
        for im in imgs
    ])
    bits = np.asarray(H.phash_bits_batch_jnp(jnp.asarray(gray32)))
    for i, im in enumerate(imgs):
        host = H.phash_bits(im)
        dev = H.pack_bits(bits[i])
        # median ties can flip a bit or two between float paths
        assert H.phash_similarity(host, dev) >= 60 / 64


def test_hamming_matrix():
    import jax.numpy as jnp

    a = np.array([[1, 0, 1, 0] + [0] * 60, [1, 1, 1, 1] + [0] * 60], np.uint8)
    d = np.asarray(H.phash_hamming_matrix_jnp(jnp.asarray(a), jnp.asarray(a)))
    assert d[0, 0] == 0 and d[1, 1] == 0
    assert d[0, 1] == 2 and d[1, 0] == 2
