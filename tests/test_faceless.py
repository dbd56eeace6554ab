import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import (OracleBackend,
                                                  OraclePersonBackend)
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


class FaceUntil:
    """Face oracle that stops seeing faces after a cutoff frame (occlusion)."""

    def __init__(self, inner, cutoff):
        self.inner = inner
        self.cutoff = cutoff
        self.embed_dim = inner.embed_dim
        self.max_faces = inner.max_faces

    def identity_feat(self, i):
        return self.inner.identity_feat(i)

    def extract_batch(self, frames, valid, frame_idxs=None):
        out = self.inner.extract_batch(frames, valid, frame_idxs)
        if frame_idxs is not None:
            for i, f in enumerate(np.asarray(frame_idxs)):
                if f > self.cutoff:
                    out["mask"][i] = False
        return out


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "fl.mp4")
    return generate_video(path, width=320, height=240, fps=30.0,
                          total_frames=120, segments=[(20, 100, 0)],
                          moving=False)


def _cfg(out_dir, **kw):
    cfg = SessionConfig()
    cfg.out_dir = out_dir
    cfg.frame_stride = 3
    cfg.min_gap_sec = 0.3
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 100
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    cfg.skip_yolo_when_faceonly = False
    cfg.faceless_min_motion_frac = 0.0   # static synthetic scene
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _run(synth, cfg, face_backend):
    bank = RefBank(cap=8)
    bank.seed([face_backend.identity_feat(0)])
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, face_backend, cfg, bank, [(20, 100)],
                            saver, batch_size=8,
                            person_backend=OraclePersonBackend(synth))
    reader.release()
    return res


def test_faceless_iou_continuation(tmp_path, synth):
    face = FaceUntil(OracleBackend(synth), cutoff=60)
    cfg = _cfg(str(tmp_path), allow_faceless_when_locked=True)
    res = _run(synth, cfg, face)
    frames = [h.frame for h in res.hits]
    assert any(f <= 60 for f in frames)      # locked via face
    assert any(f > 63 for f in frames)       # continued facelessly


def test_faceless_disabled(tmp_path, synth):
    face = FaceUntil(OracleBackend(synth), cutoff=60)
    cfg = _cfg(str(tmp_path), allow_faceless_when_locked=False)
    res = _run(synth, cfg, face)
    frames = [h.frame for h in res.hits]
    assert all(f <= 63 for f in frames)


def test_faceless_area_gate(tmp_path, synth):
    face = FaceUntil(OracleBackend(synth), cutoff=60)
    cfg = _cfg(str(tmp_path), allow_faceless_when_locked=True,
               faceless_min_area_frac=0.9)  # impossible area requirement
    res = _run(synth, cfg, face)
    frames = [h.frame for h in res.hits]
    assert all(f <= 63 for f in frames)
