import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.models import arcface as AF  # noqa: E402
from person_capture_tpu.models import scrfd as SD  # noqa: E402
from person_capture_tpu.models.layers import (distance2bbox, distance2kps,  # noqa: E402
                                              make_anchor_centers)


@pytest.fixture(scope="module")
def scrfd_tiny():
    model, variables = SD.init_scrfd(jax.random.PRNGKey(0), SD.TINY, size=64)
    return model, variables, SD.make_detect_fn(model, variables)


@pytest.fixture(scope="module")
def arcface_tiny():
    model, variables = AF.init_arcface(jax.random.PRNGKey(1), AF.TINY)
    return model, variables


def test_anchor_centers():
    c = np.asarray(make_anchor_centers(2, 3, 8, 2))
    assert c.shape == (12, 2)
    np.testing.assert_array_equal(c[0], [0, 0])
    np.testing.assert_array_equal(c[1], [0, 0])   # second anchor, same center
    np.testing.assert_array_equal(c[2], [8, 0])
    np.testing.assert_array_equal(c[6], [0, 8])


def test_distance2bbox_kps():
    centers = jnp.asarray([[16.0, 16.0]])
    d = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    box = np.asarray(distance2bbox(centers, d, 8.0))
    np.testing.assert_allclose(box[0], [16 - 8, 16 - 16, 16 + 24, 16 + 32])
    offs = jnp.asarray([[1.0, 0.0] * 5])
    kp = np.asarray(distance2kps(centers, offs, 8.0))
    assert kp.shape == (1, 5, 2)
    np.testing.assert_allclose(kp[0, 0], [24, 16])


def test_scrfd_tiny_detection(scrfd_tiny):
    _, _, detect = scrfd_tiny
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)

    # high threshold + random init (cls bias -4.6): nothing detected
    out = detect(frames, jnp.ones((2,)), jnp.float32(0.5))
    assert out["boxes"].shape == (2, 8, 4)
    assert out["kps"].shape == (2, 8, 5, 2)
    assert out["scores"].shape == (2, 8)
    assert not np.asarray(out["mask"]).any()

    # threshold 0: slots fill, scores sorted descending
    out0 = detect(frames, jnp.ones((2,)), jnp.float32(0.0))
    m = np.asarray(out0["mask"])
    assert m.any()
    s = np.asarray(out0["scores"])[0][m[0]]
    assert np.all(np.diff(s) <= 1e-6)

    # det_scale mapping: halving the scale doubles output coords
    outh = detect(frames, jnp.full((2,), 0.5), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(outh["boxes"]),
                               np.asarray(out0["boxes"]) * 2.0, rtol=1e-5)


def test_arcface_tiny_embedding(arcface_tiny):
    model, variables = arcface_tiny
    chips = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (3, 112, 112, 3)),
                        jnp.float32)
    encode = jax.jit(lambda c: AF.encode_chips(model, variables, c, flip_tta=False))
    emb = np.asarray(encode(chips))
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(emb, np.asarray(encode(chips)), atol=1e-6)


def test_arcface_flip_tta_mirror_invariance(arcface_tiny):
    model, variables = arcface_tiny
    rng = np.random.default_rng(2)
    chip = rng.uniform(0, 255, (1, 112, 112, 3)).astype(np.float32)
    mirrored = chip[:, :, ::-1, :].copy()
    encode = jax.jit(lambda c: AF.encode_chips(model, variables, c, flip_tta=True))
    e1 = np.asarray(encode(jnp.asarray(chip)))
    e2 = np.asarray(encode(jnp.asarray(mirrored)))
    np.testing.assert_allclose(e1, e2, atol=1e-4)
