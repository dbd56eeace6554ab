"""flax→ONNX export (tools/onnx_export) + the in-repo checkpoint E2E.

VERDICT r4 #7: the reference-checkpoint E2E is env-gated on files this
image can never download, so the OnnxModule→zoo→engine path had no
non-skipped E2E. These tests export the repo's OWN flax weights into
insightface-layout ONNX files (same graph contract the reference's
scrfd_*_bnkps.onnx / w600k_r50.onnx follow — face_embedder.py:55-83),
prove numerical parity against the native flax path, and drive the full
CLI through ``--scrfd-weights/--arcface-weights *.onnx``.
"""

import csv
import os

import jax
import numpy as np
import pytest

from person_capture_tpu.models import arcface as AF
from person_capture_tpu.models import scrfd as SD
from person_capture_tpu.models.zoo import bundled_weights_path, resolve_weights
from person_capture_tpu.tools.onnx_export import export_arcface, export_scrfd
from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                generate_video)


@pytest.mark.slow
def test_arcface_export_matches_flax(tmp_path):
    """Random-init tiny iresnet: the exported graph must reproduce the
    flax embeddings (same weights, two executors)."""
    from person_capture_tpu.models.onnx_zoo import OnnxArcFaceEncoder

    cfg = AF.TINY
    model, variables = AF.init_arcface(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "arc_tiny.onnx")
    export_arcface(path, cfg, variables)

    enc = OnnxArcFaceEncoder(path, flip_tta=False)
    assert enc.embed_dim == cfg.embed_dim      # read from the graph

    rng = np.random.default_rng(0)
    chips = rng.integers(0, 255, (3, 112, 112, 3), np.uint8)
    ours = np.asarray(AF.encode_chips(model, variables, chips,
                                      flip_tta=False))
    theirs = np.asarray(enc(chips))
    cos = (ours * theirs).sum(-1)
    assert cos.min() > 0.9999, cos
    np.testing.assert_allclose(theirs, ours, atol=2e-3)


@pytest.mark.slow
def test_scrfd_export_matches_flax(tmp_path):
    """Bundled TRAINED tiny SCRFD on a synthetic face: same detections
    through the exported graph as through the native flax model."""
    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")
    from person_capture_tpu.models.onnx_zoo import OnnxScrfdDetector

    cfg = SD.TINY
    variables = resolve_weights("auto", "scrfd_tiny")
    det_size = 128
    path = str(tmp_path / "scrfd_tiny.onnx")
    export_scrfd(path, cfg, variables, det_size)

    frame = np.full((det_size, det_size, 3), 60, np.uint8)
    draw_face(frame, FacePlacement(0, 0, (30, 26, 98, 94)))
    frames = frame[None].astype(np.float32)
    scales = np.ones((1,), np.float32)

    model, _ = SD.init_scrfd(jax.random.PRNGKey(0), cfg, size=det_size)
    native = SD.detect_faces(model, variables, frames, scales, 0.3,
                             max_faces=4)
    onnx_det = OnnxScrfdDetector(path, det_size=det_size, max_faces=4)
    ours = onnx_det(frames, scales, 0.3)

    nm = np.asarray(native["mask"])
    om = np.asarray(ours["mask"])
    assert nm.sum() >= 1                       # trained weights detect it
    np.testing.assert_array_equal(om, nm)
    np.testing.assert_allclose(np.asarray(ours["scores"])[om],
                               np.asarray(native["scores"])[nm], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["boxes"])[om],
                               np.asarray(native["boxes"])[nm], atol=0.2)
    np.testing.assert_allclose(np.asarray(ours["kps"])[om],
                               np.asarray(native["kps"])[nm], atol=0.2)


@pytest.mark.slow
def test_cli_end_to_end_with_exported_onnx_checkpoints(tmp_path):
    """The full CLI through the checkpoint-exact ONNX path, no env gate:
    exported SCRFD + ArcFace .onnx files drive --scrfd-weights /
    --arcface-weights and hits land on the truth spans (the sweep tiny-E2E
    recipe, swapped onto the OnnxModule executors)."""
    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")
    import cv2

    from person_capture_tpu.main import main as cli_main

    scrfd_onnx = str(tmp_path / "scrfd_tiny.onnx")
    export_scrfd(scrfd_onnx, SD.TINY, resolve_weights("auto", "scrfd_tiny"),
                 det_size=128)
    arc_onnx = str(tmp_path / "arc_tiny.onnx")
    _, arc_vars = AF.init_arcface(jax.random.PRNGKey(0), AF.TINY)
    export_arcface(arc_onnx, AF.TINY, arc_vars)

    video = str(tmp_path / "vid.mp4")
    lo, hi = 6, 22
    generate_video(video, width=128, height=128, fps=30.0, total_frames=32,
                   segments=[(lo, hi, 0)], moving=False)
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)
    out_dir = str(tmp_path / "out")

    rc = cli_main([
        "--video", video, "--ref", ref_path, "--out", out_dir,
        "--face-model", "scrfd_tiny", "--arcface-model", "arcface_tiny",
        "--scrfd-weights", scrfd_onnx, "--arcface-weights", arc_onnx,
        "--det-size", "128", "--batch", "8", "--compute-dtype", "float32",
        # random-init tiny ArcFace: loose gates (sweep tiny-E2E rationale)
        "--face-thresh", "0.9", "--face-det-conf", "0.45",
        "--set", "prescan_enable=false",
        "--set", "min_gap_sec=0.0",
        "--set", "min_box_pixels=400",
        "--set", "face_quality_min=0.0",
        "--set", "min_sharpness=0.0",
        "--set", "curate_enable=false",
        "--set", "prescan_cache_mode=off",
        "--set", "compose_crop_enable=false",
        "--set", "compose_detect_person_for_face=false",
        "--set", "smart_crop_enable=false",
    ])
    assert rc == 0
    with open(os.path.join(out_dir, "index.csv")) as fh:
        frames = sorted(int(r["frame"]) for r in csv.DictReader(fh))
    assert frames, "no hits through the ONNX path"
    in_span = [f for f in frames if lo <= f <= hi]
    assert len(in_span) >= max(2, len(frames) // 2)
