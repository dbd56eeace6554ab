import os

import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


def test_hdr_preview_shim():
    from person_capture_tpu.hdr_preview import (hdr_passthrough_available,
                                                tonemap_preview_frame)

    assert hdr_passthrough_available() is False
    rng = np.random.default_rng(0)
    y = (rng.integers(100, 900, (64, 96)).astype(np.uint16) << 6)
    uv = np.full((32, 48, 2), 512 << 6, np.uint16)
    bgr = tonemap_preview_frame(y, uv, max_dim=48)
    assert bgr.dtype == np.uint8
    assert max(bgr.shape[:2]) <= 48


def test_tpu_preset_loads():
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "presets" / \
        "solidpreset_tpu.json"
    cfg = SessionConfig.from_json(p.read_text())
    assert cfg.tpu_batch_frames == 128
    assert cfg.prescan_stride == 24


def test_save_annot_writes_frames(tmp_path):
    sv = generate_video(str(tmp_path / "v.mp4"), width=320, height=240,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 5
    cfg.min_gap_sec = 0.5
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 100
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    cfg.save_annot = True
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(5, 55)], saver,
                            batch_size=8)
    reader.release()
    assert res.hits
    annots = os.listdir(tmp_path / "out" / "annot")
    assert len(annots) == len(res.hits)
