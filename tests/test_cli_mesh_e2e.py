"""CLI --mesh end-to-end on the virtual CPU mesh: the sharded backend
family (dp×tp prescan/mainpass step + the mesh-parallel full-frame rescue
backend now wired in main.py) drives the whole pipeline through the real
CLI entry and produces hits on the truth span."""

import csv
import os

import numpy as np
import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow

from person_capture_tpu.models.zoo import bundled_weights_path
from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                generate_video)


def test_cli_mesh_end_to_end(tmp_path):
    import cv2

    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")

    from person_capture_tpu.main import main

    vid = str(tmp_path / "m.mp4")
    sv = generate_video(vid, width=128, height=128, fps=30.0,
                        total_frames=40, segments=[(8, 28, 0)],
                        moving=False)
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)

    out_dir = str(tmp_path / "out")
    rc = main([
        "--video", vid, "--ref", ref_path, "--out", out_dir,
        "--mesh", "data:2,model:2",
        "--face-model", "scrfd_tiny", "--arcface-model", "arcface_tiny",
        "--det-size", "128", "--batch", "8", "--compute-dtype", "float32",
        # random-init tiny ArcFace (no bundled arcface_tiny): loose gates,
        # same rationale as tests/test_e2e_real_models.py
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

    index = os.path.join(out_dir, "index.csv")
    assert os.path.isfile(index)
    with open(index) as fh:
        rows = list(csv.DictReader(fh))
    hit_frames = sorted(int(r["frame"]) for r in rows)
    assert hit_frames, "mesh CLI produced no hits"
    in_span = [f for f in hit_frames if 8 <= f <= 28]
    assert len(in_span) >= max(2, len(hit_frames) // 2)


def test_cli_mesh_with_person_path(tmp_path):
    """Mesh run with the person path ACTIVE: the sharded face backend has
    no shared-upload capability, so the mainpass must take the plain
    dispatch path (a facade exposing upload_shared over the sharded
    backend crashed exactly here — pipeline/recovery.py capability
    mirror)."""
    import cv2

    if (bundled_weights_path("scrfd_tiny") is None
            or bundled_weights_path("yolo_tiny") is None):
        pytest.skip("bundled tiny weights not present")

    from person_capture_tpu.main import main

    vid = str(tmp_path / "mp.mp4")
    sv = generate_video(vid, width=128, height=128, fps=30.0,
                        total_frames=32, segments=[(4, 28, 0)],
                        moving=False, draw_body=True)
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)

    out_dir = str(tmp_path / "out")
    rc = main([
        "--video", vid, "--ref", ref_path, "--out", out_dir,
        "--mesh", "data:2,model:2",
        "--face-model", "scrfd_tiny", "--arcface-model", "arcface_tiny",
        "--yolo", "yolo_tiny",
        "--det-size", "128", "--batch", "8", "--compute-dtype", "float32",
        "--face-thresh", "0.9", "--face-det-conf", "0.45",
        "--set", "skip_yolo_when_faceonly=false",  # person path ON
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
    index = os.path.join(out_dir, "index.csv")
    assert os.path.isfile(index)
    with open(index) as fh:
        rows = list(csv.DictReader(fh))
    assert rows, "mesh+person CLI produced no hits"
