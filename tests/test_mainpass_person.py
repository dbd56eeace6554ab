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


class ColorReidBackend:
    """Deterministic ReID oracle: embedding = normalized mean BGR color."""

    embed_dim = 3

    def extract(self, crops):
        out = []
        for c in crops:
            v = np.asarray(c, np.float32).reshape(-1, 3).mean(0) + 1e-3
            out.append(v / np.linalg.norm(v))
        return np.stack(out) if out else np.zeros((0, 3), np.float32)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "p.mp4")
    sv = generate_video(path, width=320, height=240, fps=30.0,
                        total_frames=120, segments=[(20, 100, 0)])
    return sv


def _cfg(out_dir, **kw):
    cfg = SessionConfig()
    cfg.out_dir = out_dir
    cfg.frame_stride = 3
    cfg.min_gap_sec = 0.4
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 100
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _run(synth, cfg, bank, person=None, reid=None, ref_reid=None):
    face = OracleBackend(synth)
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, face, cfg, bank, [(20, 100)], saver,
                            batch_size=8, person_backend=person,
                            reid_backend=reid, ref_reid_feat=ref_reid)
    reader.release()
    return res


def _bank(identity=0):
    b = RefBank(cap=8)
    face = OracleBackend.__new__(OracleBackend)
    v = np.zeros(64, np.float32)
    v[identity] = 1.0
    b.seed([v])
    return b


def test_person_path_face_only_with_yolo(tmp_path, synth):
    cfg = _cfg(str(tmp_path), match_mode="face_only",
               skip_yolo_when_faceonly=False)
    res = _run(synth, cfg, _bank(0), person=OraclePersonBackend(synth))
    assert len(res.hits) >= 4
    # person-box-derived crops should be taller than wide face crops
    for h in res.hits:
        assert h.face_dist is not None and h.face_dist < 0.1


def test_reid_only_mode(tmp_path, synth):
    # ref reid feature = mean color of a crop containing the identity
    reid = ColorReidBackend()
    frame_idx = 60
    reader = Cv2Reader(synth.path)
    reader.seek(58)
    for _ in range(3):
        f = reader.read()
    reader.release()
    # ref feature from the same kind of crop the candidates use: person box
    pb = OraclePersonBackend(synth).detect_batch(
        f[None], np.ones(1, bool), np.asarray([60]))
    x1, y1, x2, y2 = (int(v) for v in pb["boxes"][0][0])
    ref_feat = reid.extract([f[y1:y2, x1:x2]])[0]

    cfg = _cfg(str(tmp_path), match_mode="reid_only", disable_reid=False,
               reid_thresh=0.05, require_face_if_visible=False)
    res = _run(synth, cfg, _bank(0), person=OraclePersonBackend(synth),
               reid=reid, ref_reid=ref_feat)
    assert len(res.hits) >= 3
    assert all(h.reid_dist is not None and h.reid_dist <= 0.05 for h in res.hits)


def test_require_face_gate_exempts_either_mode(tmp_path, synth):
    # bank holds identity 2 (absent); reid matches via color while the
    # visible face does not. The reference's revised face-first policy
    # scopes the require_face_if_visible hard gate to both/face_only
    # (gui_app.py:6415-6422) — in 'either' mode a solid ReID match is NOT
    # overruled by a non-matching face.
    reid = ColorReidBackend()
    reader = Cv2Reader(synth.path)
    reader.seek(60)
    f = reader.read()
    reader.release()
    pb = OraclePersonBackend(synth).detect_batch(
        f[None], np.ones(1, bool), np.asarray([60]))
    x1, y1, x2, y2 = (int(v) for v in pb["boxes"][0][0])
    ref_feat = reid.extract([f[y1:y2, x1:x2]])[0]

    cfg = _cfg(str(tmp_path), match_mode="either", disable_reid=False,
               reid_thresh=0.05, require_face_if_visible=True,
               drop_reid_if_any_face_match=False)
    res = _run(synth, cfg, _bank(2), person=OraclePersonBackend(synth),
               reid=reid, ref_reid=ref_feat)
    assert len(res.hits) >= 1
    assert all(h.reid_dist is not None and h.reid_dist <= 0.05
               for h in res.hits)

    # 'both' mode with the same signals rejects: face present but failing
    cfg2 = _cfg(str(tmp_path), match_mode="both", disable_reid=False,
                reid_thresh=0.05, require_face_if_visible=True)
    res2 = _run(synth, cfg2, _bank(2), person=OraclePersonBackend(synth),
                reid=reid, ref_reid=ref_feat)
    assert res2.hits == []


def test_both_mode_requires_both(tmp_path, synth):
    reid = ColorReidBackend()
    reader = Cv2Reader(synth.path)
    reader.seek(60)
    f = reader.read()
    reader.release()
    pb = OraclePersonBackend(synth).detect_batch(
        f[None], np.ones(1, bool), np.asarray([60]))
    x1, y1, x2, y2 = (int(v) for v in pb["boxes"][0][0])
    ref_feat = reid.extract([f[y1:y2, x1:x2]])[0]

    # matching face + matching reid -> hits
    cfg = _cfg(str(tmp_path), match_mode="both", disable_reid=False,
               reid_thresh=0.05)
    res = _run(synth, cfg, _bank(0), person=OraclePersonBackend(synth),
               reid=reid, ref_reid=ref_feat)
    assert len(res.hits) >= 3
    # matching face + non-matching reid reference -> nothing in strict both
    wrong_ref = np.asarray([1.0, 0.0, 0.0], np.float32)
    cfg2 = _cfg(str(tmp_path), match_mode="both", disable_reid=False,
                reid_thresh=0.05)
    res2 = _run(synth, cfg2, _bank(0), person=OraclePersonBackend(synth),
                reid=reid, ref_reid=wrong_ref)
    assert res2.hits == []
