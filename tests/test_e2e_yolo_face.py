"""E2E with the trained YOLOv8-face backend (no oracle): the alternate
face detector (reference face_embedder.py:36-51) drives the same engine
path as SCRFD — synthetic video → prescan → main pass → crops."""

import os

import numpy as np
import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.pipeline.engine import Engine
from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                generate_video)


def test_engine_e2e_yolo_face_backend(tmp_path):
    import cv2
    import jax.numpy as jnp

    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import yolov8 as Y
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend
    from person_capture_tpu.pipeline.recovery import (RecoveringFaceBackend,
                                                      RecoveryPolicy)

    w = resolve_weights("auto", "yolo_face_tiny")
    if w is None:
        pytest.skip("bundled yolo_face_tiny weights not present")

    face = ScrfdArcFaceBackend(scrfd_cfg=Y.TINY_FACE, arcface_cfg=AF.TINY,
                               det_size=128, max_faces=4, score_thresh=0.4,
                               dtype=jnp.float32, scrfd_weights=w,
                               transfer_format="bgr")
    policy = RecoveryPolicy(use_scale_tta=False, use_edge_pad=False,
                            affine_probes=True)
    face = RecoveringFaceBackend(face, policy)

    vid = str(tmp_path / "v.mp4")
    generate_video(vid, width=128, height=128, fps=30.0,
                   total_frames=40, segments=[(8, 28, 0)], moving=False)
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)

    cfg = SessionConfig()
    cfg.video = vid
    cfg.ref = ref_path
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = True
    cfg.prescan_stride = 6
    cfg.prescan_max_width = 128
    cfg.prescan_decode_max_w = 128
    cfg.tpu_batch_frames = 8
    cfg.frame_stride = 2
    cfg.min_gap_sec = 0.0
    cfg.face_thresh = 0.9            # random-init tiny ArcFace: loose gate
    cfg.face_det_conf = 0.4
    cfg.prescan_face_conf = 0.4
    cfg.prescan_fd_enter = 0.9
    cfg.prescan_fd_exit = 0.95
    cfg.match_mode = "face_only"
    cfg.min_box_pixels = 400         # 128px frames: default 8000 rejects all
    cfg.curate_enable = False
    cfg.prescan_cache_mode = "off"
    cfg.compose_crop_enable = False
    cfg.smart_crop_enable = False
    cfg.face_fullframe_when_missed = False

    eng = Engine(cfg, face)
    res = eng.run()
    assert res.ok, res.error
    hit_frames = sorted({h.frame for h in res.mainpass.hits})
    assert hit_frames, "yolo-face pipeline produced no hits"
    in_span = [f for f in hit_frames if 8 <= f <= 28]
    assert len(in_span) >= max(2, int(0.5 * len(hit_frames)))
    assert os.listdir(os.path.join(cfg.out_dir, "crops"))
