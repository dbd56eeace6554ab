import numpy as np
import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from person_capture_tpu.models import arcface as AF  # noqa: E402
from person_capture_tpu.models import scrfd as SD  # noqa: E402
from person_capture_tpu.parallel.mesh import (make_mesh, parse_mesh_spec,  # noqa: E402
                                              shard_params_for_tp)
from person_capture_tpu.pipeline.backends import ShardedScrfdArcFaceBackend  # noqa: E402


def test_parse_mesh_spec():
    assert parse_mesh_spec("data:4,model:2") == (("data", "model"), (4, 2))
    assert parse_mesh_spec("") == ((), ())
    with pytest.raises(ValueError):
        parse_mesh_spec("bogus")


def test_make_mesh_default():
    mesh = make_mesh("")
    assert mesh.axis_names == ("data",)
    assert mesh.size == len(jax.devices())


def test_sharded_backend_runs_on_cpu_mesh():
    backend = ShardedScrfdArcFaceBackend(
        mesh_spec="data:4,model:2", scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY,
        det_size=64, score_thresh=0.0, max_faces=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    valid = np.ones(8, bool)
    out = backend.extract_batch(frames, valid)
    assert out["boxes"].shape == (8, 4, 4)
    assert out["feats"].shape == (8, 4, AF.TINY.embed_dim)
    assert out["mask"].any()  # threshold 0 fills slots
    # submit/fetch path agrees
    fetch = backend.submit_batch(frames, valid)
    out2 = fetch()
    np.testing.assert_allclose(out["scores"], out2["scores"], atol=1e-5)


def test_sharded_prescan_pipeline_on_cpu_mesh(tmp_path):
    """Full pre-scan driver over the sharded backend on the 8-device mesh.
    With random weights nothing matches — the point is that the sharded
    program executes inside the real driver loop."""
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.prescan import run_prescan
    from person_capture_tpu.video.reader import Cv2Reader
    from person_capture_tpu.video.synthetic import generate_video

    sv = generate_video(str(tmp_path / "v.mp4"), width=64, height=48,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    backend = ShardedScrfdArcFaceBackend(
        mesh_spec="data:8", scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY,
        det_size=64, score_thresh=0.9, max_faces=4, dtype=jnp.float32)
    cfg = SessionConfig()
    cfg.prescan_stride = 6
    cfg.tpu_batch_frames = 8
    cfg.prescan_fd9_skip = False
    bank = RefBank(cap=4)
    bank.seed([np.eye(AF.TINY.embed_dim, dtype=np.float32)[0]])
    reader = Cv2Reader(sv.path)
    res = run_prescan(reader, backend, cfg, bank)
    reader.release()
    assert res.samples == 10
    assert res.spans == []  # random weights, threshold 0.9: no detections

def test_sharded_step_matches_unsharded():
    """dp×tp sharding must be numerically transparent: the mesh program and
    a single-device run of the same math with the same weights agree."""
    import jax.numpy as jnp

    from person_capture_tpu.core.bank import fd_min_batch_jnp
    from person_capture_tpu.ops import align as AL
    from person_capture_tpu.ops import quality as Q
    from person_capture_tpu.ops.preprocess import letterbox_topleft
    from person_capture_tpu.parallel.mesh import build_sharded_prescan_step

    mesh = make_mesh("data:4,model:2")
    run = build_sharded_prescan_step(mesh, scrfd_cfg=SD.TINY,
                                     arcface_cfg=AF.TINY, det_size=64,
                                     max_faces=4, dtype=jnp.float32, seed=3)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    bank = rng.normal(size=(4, AF.TINY.embed_dim)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    bank_mask = np.ones(4, bool)
    sharded = run(frames, bank, bank_mask, score_thresh=0.0)

    # single-device recompute with the SAME (gathered) weights
    sv = jax.device_get(run.scrfd_vars)
    av = jax.device_get(run.arcface_vars)
    from person_capture_tpu.models.arcface import IResNet, encode_chips
    from person_capture_tpu.models.scrfd import SCRFD, detect_faces

    scrfd_model = SCRFD(SD.TINY, jnp.float32)
    arc_model = IResNet(AF.TINY, jnp.float32)
    fr = jnp.asarray(frames).astype(jnp.float32)
    padded, scales = jax.vmap(lambda f: letterbox_topleft(f, 64))(fr)
    det = detect_faces(scrfd_model, sv, padded, scales, 0.0, 4)
    chips = jax.vmap(lambda f, kp, m: AL.align_chips_matmul_jnp(f, kp, m))(
        fr, det["kps"], det["mask"])
    feats = encode_chips(arc_model, av, chips.reshape(32, 112, 112, 3),
                         flip_tta=False).reshape(8, 4, -1)
    _, best = fd_min_batch_jnp(feats, det["mask"], jnp.asarray(bank),
                               jnp.asarray(bank_mask))

    np.testing.assert_allclose(np.asarray(sharded["boxes"]),
                               np.asarray(det["boxes"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sharded["best_fd"]),
                               np.asarray(best), atol=1e-3)


def test_sharded_train_step_matches_single_device():
    """The dp×tp-sharded training step is numerically transparent: same
    init/data → same loss as the unsharded trainer step, and loss drops
    over a few steps."""
    import jax
    import numpy as np
    import optax

    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.parallel.mesh import (build_sharded_train_step,
                                                  make_mesh)
    from person_capture_tpu.train.scenes import sample_batch
    from person_capture_tpu.train.scrfd_synth import (build_targets,
                                                      make_loss_fn)

    size, batch, seed = 64, 4, 0
    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    step, state, model = build_sharded_train_step(mesh, scrfd_cfg=SD.TINY,
                                                  size=size, seed=seed)

    # single-device oracle: same params, same loss fn
    model1, variables1 = SD.init_scrfd(jax.random.PRNGKey(seed), SD.TINY,
                                       size=size)
    loss_fn = make_loss_fn(model1)

    # one fixed batch: steps on it must match the single-device loss at
    # step 0 and strictly improve (memorization)
    rng = np.random.default_rng(3)
    data = sample_batch(rng, batch, size)
    targets = build_targets(data["boxes"], data["kps"],
                            data["gt_mask"], size, SD.TINY.strides,
                            SD.TINY.num_anchors)
    ref_loss, _ = loss_fn(variables1["params"], variables1["batch_stats"],
                          data["images"], targets)
    losses = []
    for _ in range(4):
        state, metrics = step(state, data["images"], targets)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], float(ref_loss), rtol=2e-3)
    assert losses[-1] < losses[0]


def test_sharded_backend_yolo_face_on_cpu_mesh():
    """The alternate YOLOv8-face detector runs inside the sharded step
    (same output contract as SCRFD — reference face_embedder.py:36-51)."""
    from person_capture_tpu.models import yolov8 as Y

    backend = ShardedScrfdArcFaceBackend(
        mesh_spec="data:4,model:2", scrfd_cfg=Y.TINY_FACE,
        arcface_cfg=AF.TINY, det_size=64, score_thresh=0.0, max_faces=4,
        dtype=jnp.float32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(8, bool))
    assert out["boxes"].shape == (8, 4, 4)
    assert out["kps"].shape == (8, 4, 5, 2)
    assert out["feats"].shape == (8, 4, AF.TINY.embed_dim)
    assert out["mask"].any()  # threshold 0 fills slots


def test_spatial_sharded_fullframe_detect_matches_single_device():
    """Heavy-canvas detection with the H dimension sharded over the model
    axis (XLA-SPMD halo exchange for convs) must match the single-device
    program numerically — the TPU scaling path for the reference's
    imgsz-1408/2048 heavy passes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.parallel.mesh import (
        build_sharded_fullframe_detect, make_mesh)
    from person_capture_tpu.video.synthetic import FacePlacement, draw_face

    sw = resolve_weights("auto", "scrfd_tiny")
    devices = jax.devices("cpu")
    mesh = make_mesh("data:2,model:4", devices=devices[:8])
    size = 128
    run_sp = build_sharded_fullframe_detect(mesh, scrfd_cfg=SD.TINY,
                                            det_size=size, max_faces=4,
                                            seed=0, dtype=jnp.float32,
                                            scrfd_vars=sw)
    assert run_sp.spatial
    mesh1 = make_mesh("data:1", devices=devices[:1])
    run_1 = build_sharded_fullframe_detect(mesh1, scrfd_cfg=SD.TINY,
                                           det_size=size, max_faces=4,
                                           seed=0, dtype=jnp.float32,
                                           scrfd_vars=sw)
    assert not run_1.spatial

    rng = np.random.default_rng(3)
    frames = np.full((4, size, size, 3), 70, np.uint8)
    for i in range(4):
        s = float(rng.uniform(36, 48))
        x = float(rng.uniform(4, size - s - 4))
        y = float(rng.uniform(4, size - s - 4))
        draw_face(frames[i], FacePlacement(0, 0, (x, y, x + s, y + s)))
    padded = frames.astype(np.float32)
    scales = np.ones((4,), np.float32)

    a = run_sp(padded, scales, score_thresh=0.45)
    b = run_1(padded, scales, score_thresh=0.45)
    mask = np.asarray(a["mask"])
    assert mask.any(), "trained tiny detector must find the drawn faces"
    np.testing.assert_array_equal(mask, np.asarray(b["mask"]))
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["boxes"])[mask],
                               np.asarray(b["boxes"])[mask], atol=1e-2)
