import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.models import arcface as AF  # noqa: E402
from person_capture_tpu.models import scrfd as SD  # noqa: E402
from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend  # noqa: E402


@pytest.fixture(scope="module")
def tiny_backend_pair():
    common = dict(scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=64,
                  score_thresh=0.0, max_faces=4, dtype=jnp.float32)
    b_bgr = ScrfdArcFaceBackend(transfer_format="bgr", **common)
    b_i420 = ScrfdArcFaceBackend(transfer_format="i420", **common)
    return b_bgr, b_i420


def test_i420_roundtrip_color():
    """Device-side I420→BGR matches cv2's inverse conversion."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    # smooth image: chroma subsampling differences stay small (noise images
    # have full-bandwidth chroma that 4:2:0 cannot represent in any codec)
    bgr = cv2.GaussianBlur(
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8), (7, 7), 2.0)
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    back_cv = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420).astype(np.float32)

    backend = ScrfdArcFaceBackend(scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY,
                                  det_size=64, dtype=jnp.float32,
                                  transfer_format="i420")
    # reach into the fused program's converter via a tiny jit wrapper
    from person_capture_tpu.pipeline import backends as B

    # reconstruct the same math here
    b = 1
    planes = jnp.asarray(i420[None])
    h = 48
    y = planes[:, :h, :].astype(jnp.float32)
    u = planes[:, h:h + h // 4, :].reshape(b, h // 2, 32)
    v = planes[:, h + h // 4:, :].reshape(b, h // 2, 32)
    u = jax.image.resize(u.astype(jnp.float32), (b, h, 64), "linear") - 128.0
    v = jax.image.resize(v.astype(jnp.float32), (b, h, 64), "linear") - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    bl = y + 1.772 * u
    ours = np.asarray(jnp.clip(jnp.stack([bl, g, r], -1), 0, 255))[0]
    # chroma upsampling differs (bilinear vs cv2 nearest-ish): compare means
    # and overall closeness
    assert abs(ours.mean() - back_cv.mean()) < 2.0
    assert np.abs(ours - back_cv).mean() < 6.0


def test_backend_formats_agree(tiny_backend_pair):
    b_bgr, b_i420 = tiny_backend_pair
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    valid = np.ones(2, bool)
    out_a = b_bgr.extract_batch(frames, valid)
    out_b = b_i420.extract_batch(frames, valid)
    assert out_a["boxes"].shape == out_b["boxes"].shape
    assert out_a["mask"].shape == out_b["mask"].shape
    # with threshold 0 the top-k fills; box geometry should be close between
    # formats (4:2:0 chroma loss only)
    if out_a["mask"].any() and out_b["mask"].any():
        assert np.abs(out_a["boxes"] - out_b["boxes"]).mean() < 20.0


def test_submit_batch_matches_extract(tiny_backend_pair):
    _, backend = tiny_backend_pair
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    valid = np.asarray([True, False])
    sync = backend.extract_batch(frames, valid)
    fetch = backend.submit_batch(frames, valid)
    async_out = fetch()
    for k in sync:
        np.testing.assert_allclose(np.asarray(sync[k], np.float32),
                                   np.asarray(async_out[k], np.float32),
                                   atol=1e-5)
    assert not async_out["mask"][1].any()  # valid mask applied


def test_pipelined_submits_in_order(tiny_backend_pair):
    _, backend = tiny_backend_pair
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8)
    f2 = rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8)
    h1 = backend.submit_batch(f1, np.ones(1, bool))
    h2 = backend.submit_batch(f2, np.ones(1, bool))
    o1, o2 = h1(), h2()
    direct1 = backend.extract_batch(f1, np.ones(1, bool))
    np.testing.assert_allclose(o1["scores"], direct1["scores"], atol=1e-5)


def test_clip_face_fallback_backend():
    """use_arcface=False embeds chips with the CLIP tower (reference:
    face_embedder.py:958-965 fallback)."""
    from person_capture_tpu.models import clip_vit as CV

    backend = ScrfdArcFaceBackend(
        scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, clip_face_cfg=CV.TINY,
        det_size=64, score_thresh=0.0, max_faces=4, dtype=jnp.float32,
        use_arcface=False)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(2, bool))
    assert backend.embed_dim == CV.TINY.embed_dim
    assert out["feats"].shape == (2, 4, CV.TINY.embed_dim)
    # embeddings normalized where masked
    m = out["mask"]
    if m.any():
        norms = np.linalg.norm(out["feats"][m], axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_embed_slots_limits_embedding_work():
    backend = ScrfdArcFaceBackend(
        scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=64,
        score_thresh=0.0, max_faces=4, dtype=jnp.float32, embed_slots=2)
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(2, bool))
    assert out["feats"].shape == (2, 4, AF.TINY.embed_dim)
    # trailing (un-embedded) slots carry zero feats/quality
    assert np.all(out["feats"][:, 2:] == 0)
    assert np.all(out["quality"][:, 2:] == 0)
    # boxes/mask still report all 4 slots
    assert out["boxes"].shape == (2, 4, 4)

    # default (0) embeds every slot — identical to an explicit max setting
    b_all = ScrfdArcFaceBackend(
        scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=64,
        score_thresh=0.0, max_faces=4, dtype=jnp.float32)
    out_all = b_all.extract_batch(frames, np.ones(2, bool))
    if out_all["mask"].any():
        m = out_all["mask"]
        assert np.linalg.norm(out_all["feats"][m], axis=-1).min() > 0.9


@pytest.mark.slow
def test_combined_face_person_matches_separate(tiny_backend_pair):
    """submit_device_with_person (ONE dispatch + ONE packed download) must
    produce exactly the outputs the two separate shared-upload programs
    produce — and the recovery facade must pass the person half through."""
    from person_capture_tpu.models import yolov8 as YV
    from person_capture_tpu.pipeline.backends import YoloPersonBackend
    from person_capture_tpu.pipeline.recovery import (RecoveringFaceBackend,
                                                      RecoveryPolicy)

    backend, _ = tiny_backend_pair
    person = YoloPersonBackend(cfg=YV.TINY, det_size=64, conf=0.0,
                               max_det=4, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (4, 48, 64, 3), dtype=np.uint8)
    valid = np.array([True, True, True, False])

    dev = backend.upload_shared(frames)
    face_a = backend.submit_device(dev, valid)()
    person_a = person.submit_device(dev, valid)()

    dev = backend.upload_shared(frames)
    face_b, person_b = backend.submit_device_with_person(person, dev,
                                                         valid)()
    for k in face_a:
        np.testing.assert_allclose(face_a[k], face_b[k], atol=1e-5,
                                   err_msg=k)
    for k in ("boxes", "scores"):
        np.testing.assert_allclose(person_a[k], person_b[k], atol=1e-5,
                                   err_msg=k)
    np.testing.assert_array_equal(person_a["mask"], person_b["mask"])

    # recovery facade: combined capability mirrored, person passthrough
    rec = RecoveringFaceBackend(backend,
                                RecoveryPolicy(rot_adaptive=False))
    assert hasattr(rec, "submit_device_with_person")
    dev = rec.upload_shared(frames)
    face_c, person_c = rec.submit_device_with_person(person, dev, valid)()
    np.testing.assert_array_equal(person_c["mask"], person_b["mask"])
    assert set(face_c) >= {"boxes", "mask", "feats", "quality"}


def test_combined_wire_program_matches_separate(tiny_backend_pair):
    """submit_wire_with_person (ONE upload + ONE dispatch running
    convert+face+person + ONE packed download — the main-pass default
    since the separate convert dispatch measured ~40% of the step over
    the tunnel) must equal the two separate programs, and the recovery
    facade must mirror it with person passthrough."""
    from person_capture_tpu.models import yolov8 as YV
    from person_capture_tpu.pipeline.backends import YoloPersonBackend
    from person_capture_tpu.pipeline.recovery import (RecoveringFaceBackend,
                                                      RecoveryPolicy)

    backend, _ = tiny_backend_pair
    person = YoloPersonBackend(cfg=YV.TINY, det_size=64, conf=0.0,
                               max_det=4, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (4, 48, 64, 3), dtype=np.uint8)
    valid = np.array([True, True, True, False])

    dev = backend.upload_shared(frames)
    face_a = backend.submit_device(dev, valid)()
    person_a = person.submit_device(dev, valid)()

    face_b, person_b = backend.submit_wire_with_person(person, frames,
                                                       valid)()
    for k in face_a:
        np.testing.assert_allclose(face_a[k], face_b[k], atol=1e-5,
                                   err_msg=k)
    for k in ("boxes", "scores"):
        np.testing.assert_allclose(person_a[k], person_b[k], atol=1e-5,
                                   err_msg=k)
    np.testing.assert_array_equal(person_a["mask"], person_b["mask"])

    rec = RecoveringFaceBackend(backend,
                                RecoveryPolicy(rot_adaptive=False))
    assert hasattr(rec, "submit_wire_with_person")
    face_c, person_c = rec.submit_wire_with_person(person, frames, valid)()
    np.testing.assert_array_equal(person_c["mask"], person_b["mask"])
    assert set(face_c) >= {"boxes", "mask", "feats", "quality"}
