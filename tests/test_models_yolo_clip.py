import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.models import clip_vit as CV  # noqa: E402
from person_capture_tpu.models import yolov8 as Y  # noqa: E402


@pytest.fixture(scope="module")
def yolo_tiny():
    model, variables = Y.init_yolo(jax.random.PRNGKey(0), Y.TINY, size=64)
    detect = jax.jit(lambda f, s, c: Y.detect_persons(model, variables, f, s, c))
    return model, variables, detect


def test_yolo_shapes_and_threshold(yolo_tiny):
    _, _, detect = yolo_tiny
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    out = detect(frames, jnp.ones((2,)), jnp.float32(0.5))
    assert out["boxes"].shape == (2, 8, 4)
    assert out["scores"].shape == (2, 8)
    # random init with -4.6 bias: no detections above 0.5
    assert not np.asarray(out["mask"]).any()
    out0 = detect(frames, jnp.ones((2,)), jnp.float32(0.0))
    assert np.asarray(out0["mask"]).any()
    s = np.asarray(out0["scores"])[0][np.asarray(out0["mask"])[0]]
    assert np.all(np.diff(s) <= 1e-6)


def test_yolo_dfl_decode():
    # uniform logits -> expected distance = (reg_max-1)/2 bins
    b, h, w, reg_max = 1, 2, 2, 16
    box_map = jnp.zeros((b, h, w, 4 * reg_max))
    cls_map = jnp.zeros((b, h, w, 80))
    boxes, scores = Y.decode_level(box_map, cls_map, stride=8, reg_max=reg_max)
    assert boxes.shape == (1, 4, 4)
    d = (reg_max - 1) / 2 * 8  # 60px
    # first cell center (4, 4)
    np.testing.assert_allclose(np.asarray(boxes)[0, 0],
                               [4 - d, 4 - d, 4 + d, 4 + d], atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), 0.5, atol=1e-6)


def test_clip_tiny_embedding():
    model, variables = CV.init_clip(jax.random.PRNGKey(1), CV.TINY)
    rng = np.random.default_rng(2)
    crops = jnp.asarray(rng.integers(0, 255, (3, 48, 40, 3)), jnp.float32)
    encode = jax.jit(lambda c: CV.encode_images(model, variables, c))
    emb = np.asarray(encode(crops))
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # deterministic + input-sensitive
    emb2 = np.asarray(encode(crops))
    np.testing.assert_allclose(emb, emb2, atol=1e-6)
    other = np.asarray(encode(crops + 50.0))
    assert np.abs(emb - other).max() > 1e-4


@pytest.mark.slow
def test_yolo_boxes_clipped_to_frame(yolo_tiny):
    """detect_persons(clip_hw=...) clamps edge regressions to frame bounds
    like the reference's ultralytics scale_boxes path (detectors.py:271)."""
    model, variables, _ = yolo_tiny
    rng = np.random.default_rng(3)
    # square letterboxed canvas (production always letterboxes to det_size);
    # clip_hw carries the pre-letterbox source bounds
    frames = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    out = Y.detect_persons(model, variables, frames, jnp.ones((2,)),
                           conf=0.0, clip_hw=(48, 64))
    b = np.asarray(out["boxes"])[np.asarray(out["mask"])]
    assert b.size  # conf=0 guarantees detections even at random init
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 2] <= 64).all() and (b[:, 3] <= 48).all()
    # without clip_hw at least one random-init box regresses out of frame
    raw = Y.detect_persons(model, variables, frames, jnp.ones((2,)),
                           conf=0.0)
    rb = np.asarray(raw["boxes"])[np.asarray(raw["mask"])]
    assert ((rb[:, 0] < 0) | (rb[:, 1] < 0) |
            (rb[:, 2] > 64) | (rb[:, 3] > 48)).any()


def test_clip_ingress_center_crops_not_squash():
    """Non-square inputs take the open_clip Resize+CenterCrop path
    (reid_embedder.py:34): a tall crop's output must equal encoding the
    center square, not the squashed full extent."""
    model, variables = CV.init_clip(jax.random.PRNGKey(1), CV.TINY)
    s = model.cfg.image_size
    rng = np.random.default_rng(4)
    tall = rng.integers(0, 255, (1, 3 * s, s, 3)).astype(np.float32)
    emb_tall = np.asarray(CV.encode_images(model, variables,
                                           jnp.asarray(tall)))
    center = tall[:, s:2 * s]
    emb_center = np.asarray(CV.encode_images(model, variables,
                                             jnp.asarray(center)))
    np.testing.assert_allclose(emb_tall, emb_center, atol=1e-5)
