import threading
import time

import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.engine import Engine
from person_capture_tpu.video.synthetic import generate_video


def _setup(tmp_path, total=300):
    sv = generate_video(str(tmp_path / "v.mp4"), width=160, height=120,
                        fps=30.0, total_frames=total,
                        segments=[(5, total - 5, 0)])
    backend = OracleBackend(sv)
    cfg = SessionConfig()
    cfg.video = sv.path
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = False
    cfg.curate_enable = False
    cfg.frame_stride = 2
    cfg.min_gap_sec = 0.2
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 50
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    return sv, backend, cfg, bank


class SlowOracle(OracleBackend):
    def extract_batch(self, frames, valid, frame_idxs=None):
        time.sleep(0.05)
        return super().extract_batch(frames, valid, frame_idxs)


def test_engine_stop_interrupts_run(tmp_path):
    sv, _, cfg, bank = _setup(tmp_path, total=2000)
    backend = SlowOracle(sv)
    eng = Engine(cfg, backend)
    result = {}

    def run():
        result["r"] = eng.run(bank=bank)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.4)
    eng.stop()
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["r"].ok
    # stopped early: processed far fewer than all frames
    assert result["r"].mainpass.frames_decoded < 900


def test_engine_pause_resume(tmp_path):
    sv, _, cfg, bank = _setup(tmp_path, total=400)
    backend = SlowOracle(sv)
    eng = Engine(cfg, backend)
    result = {}

    def run():
        result["r"] = eng.run(bank=bank)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.2)
    eng.pause(True)
    time.sleep(0.3)   # paused: little progress should happen
    eng.pause(False)
    t.join(timeout=60)
    assert not t.is_alive()
    assert result["r"].ok
    assert len(result["r"].mainpass.hits) > 0


def test_engine_live_cfg_update(tmp_path):
    sv, backend, cfg, bank = _setup(tmp_path)
    eng = Engine(cfg, backend)
    eng.update_cfg(face_thresh=0.123, bogus="x")
    eng._drain_cmds()
    assert cfg.face_thresh == 0.123
    assert not hasattr(cfg, "bogus")