import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


def test_preview_emission(tmp_path):
    sv = generate_video(str(tmp_path / "v.mp4"), width=320, height=240,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 2
    cfg.tpu_batch_frames = 8
    cfg.min_gap_sec = 10.0      # previews don't depend on saves
    cfg.face_quality_min = 0.0
    cfg.preview_every = 3
    cfg.preview_fps_cap = 0     # no wall-clock throttle in tests
    cfg.preview_max_dim = 100

    frames = []
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(5, 55)], saver,
                            batch_size=8,
                            on_preview=lambda img, idx: frames.append((idx, img)))
    reader.release()
    assert res.frames_processed > 0
    # every 3rd processed frame previews
    assert len(frames) == res.frames_processed // 3
    # downscaled to max_dim
    for _, img in frames:
        assert max(img.shape[:2]) <= 100
