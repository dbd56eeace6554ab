"""Checkpoint-exact ONNX adapters (models/onnx_zoo) end-to-end.

Authors insightface-layout SCRFD/ArcFace ONNX fixtures with
tools/onnx_lite.write_onnx, verifies OnnxScrfdDetector's decode plumbing
(output regroup, flat reshape, anchor inference, NCHW/normalization)
against an independent torch + shared-selection composition, and drives
the full ScrfdArcFaceBackend fused program from `.onnx` weight specs
(the reference's own checkpoint format, face_embedder.py:55-83).
"""

import numpy as np
import pytest

from person_capture_tpu.tools.onnx_lite import OnnxNode, write_onnx

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

DET = 32
STRIDES = (8, 16, 32)
A = 2
C = 6


def _scrfd_weights(rng):
    w = {}
    for s in STRIDES:
        w[f"w_patch_{s}"] = rng.normal(
            size=(C, 3, s, s)).astype(np.float32) * 0.1
        w[f"w_cls_{s}"] = rng.normal(size=(A, C, 1, 1)).astype(np.float32)
        w[f"b_cls_{s}"] = rng.normal(size=(A,)).astype(np.float32)
        w[f"w_box_{s}"] = rng.normal(size=(4 * A, C, 1, 1)).astype(np.float32)
        w[f"w_kps_{s}"] = rng.normal(
            size=(10 * A, C, 1, 1)).astype(np.float32)
    return w


def _write_scrfd_onnx(path, w):
    """Patchify conv per stride → 1x1 heads; outputs grouped by kind
    (score*3, bbox*3, kps*3) flattened [N, HWA, k] like the bnkps files."""
    nodes = []
    inits = dict(w)
    inits["shape1"] = np.asarray([1, -1, 1], np.int64)
    inits["shape4"] = np.asarray([1, -1, 4], np.int64)
    inits["shape10"] = np.asarray([1, -1, 10], np.int64)
    for s in STRIDES:
        nodes += [
            OnnxNode("Conv", ["x", f"w_patch_{s}"], [f"f{s}"], attrs={
                "strides": [s, s], "kernel_shape": [s, s]}),
            OnnxNode("Relu", [f"f{s}"], [f"fr{s}"]),
            OnnxNode("Conv", [f"fr{s}", f"w_cls_{s}", f"b_cls_{s}"],
                     [f"cls{s}"], attrs={"kernel_shape": [1, 1]}),
            OnnxNode("Sigmoid", [f"cls{s}"], [f"clss{s}"]),
            OnnxNode("Transpose", [f"clss{s}"], [f"clst{s}"],
                     attrs={"perm": [0, 2, 3, 1]}),
            OnnxNode("Reshape", [f"clst{s}", "shape1"], [f"score_{s}"]),
            OnnxNode("Conv", [f"fr{s}", f"w_box_{s}"], [f"box{s}"],
                     attrs={"kernel_shape": [1, 1]}),
            OnnxNode("Transpose", [f"box{s}"], [f"boxt{s}"],
                     attrs={"perm": [0, 2, 3, 1]}),
            OnnxNode("Reshape", [f"boxt{s}", "shape4"], [f"bbox_{s}"]),
            OnnxNode("Conv", [f"fr{s}", f"w_kps_{s}"], [f"kp{s}"],
                     attrs={"kernel_shape": [1, 1]}),
            OnnxNode("Transpose", [f"kp{s}"], [f"kpt{s}"],
                     attrs={"perm": [0, 2, 3, 1]}),
            OnnxNode("Reshape", [f"kpt{s}", "shape10"], [f"kps_{s}"]),
        ]
    outputs = [f"score_{s}" for s in STRIDES] + \
              [f"bbox_{s}" for s in STRIDES] + \
              [f"kps_{s}" for s in STRIDES]
    write_onnx(path, nodes=nodes, initializers=inits,
               inputs={"x": (1, 3, DET, DET)}, outputs=outputs, opset=11)


def _torch_raw_levels(frames_bgr_f32, w):
    """Independent torch forward producing per-level flat raws with the
    exact SCRFD input normalization (RGB, (x-127.5)/128, NCHW)."""
    x = frames_bgr_f32[..., ::-1].copy()
    x = (x - 127.5) / 128.0
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    outs = []
    for s in STRIDES:
        f = F.relu(F.conv2d(t, torch.from_numpy(w[f"w_patch_{s}"]),
                            stride=s))
        cls = torch.sigmoid(F.conv2d(f, torch.from_numpy(w[f"w_cls_{s}"]),
                                     torch.from_numpy(w[f"b_cls_{s}"])))
        box = F.conv2d(f, torch.from_numpy(w[f"w_box_{s}"]))
        kps = F.conv2d(f, torch.from_numpy(w[f"w_kps_{s}"]))
        b = t.shape[0]
        outs.append((
            cls.permute(0, 2, 3, 1).reshape(b, -1).numpy(),
            box.permute(0, 2, 3, 1).reshape(b, -1, 4).numpy(),
            kps.permute(0, 2, 3, 1).reshape(b, -1, 10).numpy()))
    return outs


def test_onnx_scrfd_detector_decode_parity(tmp_path):
    from person_capture_tpu.models.layers import (distance2bbox,
                                                  distance2kps,
                                                  make_anchor_centers)
    from person_capture_tpu.models.onnx_zoo import OnnxScrfdDetector
    from person_capture_tpu.models.scrfd import select_detections

    rng = np.random.default_rng(0)
    w = _scrfd_weights(rng)
    path = str(tmp_path / "scrfd_mini.onnx")
    _write_scrfd_onnx(path, w)

    det = OnnxScrfdDetector(path, det_size=DET, max_faces=4)
    frames = rng.uniform(0, 255, (2, DET, DET, 3)).astype(np.float32)
    scales = np.asarray([1.0, 0.5], np.float32)
    got = det(frames, scales, np.float32(0.5))

    # independent expectation: torch raws → shared selection tail
    level_scores, level_boxes, level_kps = [], [], []
    for (s, d, o), stride in zip(_torch_raw_levels(frames, w), STRIDES):
        side = DET // stride
        centers = np.asarray(make_anchor_centers(side, side, stride, A))
        level_scores.append(s)
        level_boxes.append(np.asarray(
            distance2bbox(centers[None], d, float(stride))))
        level_kps.append(np.asarray(
            distance2kps(centers[None], o, float(stride))))
    want = select_detections(level_scores, level_boxes, level_kps, scales,
                             np.float32(0.5), 4, 0.4, 256)
    np.testing.assert_array_equal(np.asarray(got["mask"]),
                                  np.asarray(want["mask"]))
    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(want["scores"]),
                               rtol=1e-4, atol=1e-5)
    m = np.asarray(want["mask"])
    np.testing.assert_allclose(np.asarray(got["boxes"])[m],
                               np.asarray(want["boxes"])[m],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["kps"])[m],
                               np.asarray(want["kps"])[m],
                               rtol=1e-3, atol=1e-3)


def _write_arcface_onnx(path, rng, embed_dim=16):
    w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32) * 0.2
    wfc = rng.normal(size=(embed_dim, 8)).astype(np.float32) * 0.3
    bfc = rng.normal(size=(embed_dim,)).astype(np.float32)
    fs = rng.uniform(0.5, 2, embed_dim).astype(np.float32)
    fb = rng.normal(size=embed_dim).astype(np.float32)
    fm = rng.normal(size=embed_dim).astype(np.float32)
    fv = rng.uniform(0.5, 2, embed_dim).astype(np.float32)
    nodes = [
        OnnxNode("Conv", ["x", "w1"], ["c1"], attrs={
            "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Relu", ["c1"], ["r1"]),
        OnnxNode("GlobalAveragePool", ["r1"], ["gap"]),
        OnnxNode("Flatten", ["gap"], ["flat"], attrs={"axis": 1}),
        OnnxNode("Gemm", ["flat", "wfc", "bfc"], ["fc"],
                 attrs={"transB": 1}),
        OnnxNode("BatchNormalization", ["fc", "fs", "fb", "fm", "fv"],
                 ["emb"]),
    ]
    inits = dict(w1=w1, wfc=wfc, bfc=bfc, fs=fs, fb=fb, fm=fm, fv=fv)
    write_onnx(path, nodes=nodes, initializers=inits,
               inputs={"x": (1, 3, 112, 112)}, outputs=["emb"], opset=11)
    return inits


def test_onnx_arcface_encoder_parity(tmp_path):
    from person_capture_tpu.models.onnx_zoo import OnnxArcFaceEncoder

    rng = np.random.default_rng(1)
    path = str(tmp_path / "arc_mini.onnx")
    w = _write_arcface_onnx(path, rng)
    enc = OnnxArcFaceEncoder(path, flip_tta=True)
    assert enc.embed_dim == 16   # inferred from the output BN scale

    chips = rng.uniform(0, 255, (3, 112, 112, 3)).astype(np.float32)
    got = np.asarray(enc(chips))
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)

    x = chips[..., ::-1] / 127.5 - 1.0
    xt = torch.from_numpy(
        np.concatenate([x, x[:, :, ::-1]], 0).transpose(0, 3, 1, 2).copy())
    f = F.relu(F.conv2d(xt, torch.from_numpy(w["w1"]), padding=1))
    flat = f.mean(dim=(2, 3))
    fc = flat @ torch.from_numpy(w["wfc"]).T + torch.from_numpy(w["bfc"])
    emb = F.batch_norm(fc, torch.from_numpy(w["fm"]),
                       torch.from_numpy(w["fv"]), torch.from_numpy(w["fs"]),
                       torch.from_numpy(w["fb"]), training=False).numpy()
    want = emb[:3] + emb[3:]
    want /= np.linalg.norm(want, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_backend_accepts_onnx_weight_specs(tmp_path):
    """Full fused backend program (letterbox → ONNX SCRFD → warp → ONNX
    ArcFace → pack) compiles and runs from .onnx weight specs."""
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    rng = np.random.default_rng(2)
    spath = str(tmp_path / "scrfd_mini.onnx")
    _write_scrfd_onnx(spath, _scrfd_weights(rng))
    apath = str(tmp_path / "arc_mini.onnx")
    _write_arcface_onnx(apath, rng)

    assert resolve_weights(spath, "scrfd_2.5g") == spath
    backend = ScrfdArcFaceBackend(
        det_size=DET, score_thresh=0.5, max_faces=4,
        scrfd_weights=resolve_weights(spath, "scrfd_2.5g"),
        arcface_weights=resolve_weights(apath, "w600k_r50"),
        transfer_format="bgr")
    assert backend.embed_dim == 16
    frames = rng.integers(0, 255, (2, 24, DET, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(2, bool))
    assert out["boxes"].shape == (2, 4, 4)
    assert out["kps"].shape == (2, 4, 5, 2)
    assert out["feats"].shape == (2, 4, 16)
    assert np.isfinite(out["feats"]).all()


def test_sharded_backend_runs_onnx_checkpoints(tmp_path):
    """The checkpoint-exact ONNX path also runs inside the dp×tp-sharded
    step: the reference's own graphs execute unchanged over the mesh with
    replicated params, frames sharded on the data axis."""
    from person_capture_tpu.pipeline.backends import ShardedScrfdArcFaceBackend

    rng = np.random.default_rng(5)
    spath = str(tmp_path / "scrfd_mini.onnx")
    _write_scrfd_onnx(spath, _scrfd_weights(rng))
    apath = str(tmp_path / "arc_mini.onnx")
    _write_arcface_onnx(apath, rng)

    backend = ShardedScrfdArcFaceBackend(
        mesh_spec="data:4,model:2", det_size=DET, score_thresh=0.5,
        max_faces=4, scrfd_weights=spath, arcface_weights=apath)
    assert backend.embed_dim == 16
    frames = rng.integers(0, 255, (8, 24, DET, 3), dtype=np.uint8)
    out = backend.extract_batch(frames, np.ones(8, bool))
    assert out["boxes"].shape == (8, 4, 4)
    assert out["feats"].shape == (8, 4, 16)
    assert np.isfinite(out["feats"]).all()

    # parity vs the single-device ONNX backend on the same inputs
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    single = ScrfdArcFaceBackend(
        det_size=DET, score_thresh=0.5, max_faces=4, scrfd_weights=spath,
        arcface_weights=apath, transfer_format="bgr")
    ref = single.extract_batch(frames, np.ones(8, bool))
    np.testing.assert_allclose(out["boxes"], ref["boxes"], atol=2e-2)
    np.testing.assert_array_equal(out["mask"], ref["mask"])
