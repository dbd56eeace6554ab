"""Match-mode degradation semantics (reference gui_app.py:6381-6402).

Three behaviors the decision block must honor:
- a run without a usable ReID signal degrades both/reid_only to face_only
  (and a bankless run degrades both/face_only to reid_only);
- in 'both' mode a candidate missing ONE signal is judged on the other;
- drop_reid_if_any_face_match never vetoes 'either'/'reid_only' accepts.
"""

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


def _bank(identity=0):
    b = RefBank(cap=8)
    v = np.zeros(64, np.float32)
    v[identity] = 1.0
    b.seed([v])
    return b


def _run(sv, cfg, bank, face=None, person=None, reid=None, ref_reid=None):
    face = face or OracleBackend(sv)
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, face, cfg, bank,
                            [(0, sv.total_frames - 1)], saver,
                            batch_size=8, person_backend=person,
                            reid_backend=reid, ref_reid_feat=ref_reid)
    reader.release()
    return res


def _ref_reid_from(sv, reid, frame_idx, truth_slot):
    reader = Cv2Reader(sv.path)
    reader.seek(frame_idx)
    f = reader.read()
    reader.release()
    pb = OraclePersonBackend(sv).detect_batch(
        f[None], np.ones(1, bool), np.asarray([frame_idx]))
    x1, y1, x2, y2 = (int(v) for v in pb["boxes"][0][truth_slot])
    return reid.extract([f[y1:y2, x1:x2]])[0]


@pytest.fixture(scope="module")
def single(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid1") / "s.mp4")
    return generate_video(path, total_frames=120, segments=[(10, 110, 0)])


@pytest.fixture(scope="module")
def duo(tmp_path_factory):
    # identity 0: face-only, left; identity 1: with body, right (truth
    # order A then B — OracleBackend(max_faces=1) then sees only A's face)
    path = str(tmp_path_factory.mktemp("vid2") / "d.mp4")
    return generate_video(path, total_frames=120,
                          segments=[(0, 119, 0, 0.22, False),
                                    (0, 119, 1, 0.75, True)])


@pytest.fixture(scope="module")
def duo_rev(tmp_path_factory):
    # truth order B then A — OraclePersonBackend(max_det=1) then emits
    # only B's body box while BOTH faces stay detectable
    # B sits at 0.58 so the composed crop keeps side margins (the save-path
    # side guard rejects crops whose face hugs the crop edge)
    path = str(tmp_path_factory.mktemp("vid3") / "r.mp4")
    return generate_video(path, total_frames=120,
                          segments=[(0, 119, 1, 0.58, True),
                                    (0, 119, 0, 0.15, False)])


def test_reid_only_without_reid_degrades_to_face_only(tmp_path, single):
    # no ReID backend at all: reference degrades reid_only to face matching
    # instead of rejecting every frame (gui_app.py:6381-6385)
    cfg = _cfg(str(tmp_path), match_mode="reid_only")
    res = _run(single, cfg, _bank(0))
    assert len(res.hits) >= 3
    assert all(h.face_dist is not None and h.face_dist < 0.1
               for h in res.hits)


def test_both_mode_judges_candidate_on_available_signal(tmp_path, duo):
    # B's face is never detected (max_faces=1 sees only A's); B's ReID
    # matches the reference crop -> 'both' must judge B on ReID alone
    # (gui_app.py:6388-6393), not reject for the missing face signal.
    # The bank holds an ABSENT identity so drop_reid_if_any_face_match
    # (which the reference honors in 'both' mode) stays out of the way.
    reid = ColorReidBackend()
    ref_feat = _ref_reid_from(duo, reid, 60, truth_slot=1)
    face = OracleBackend(duo, max_faces=1)
    cfg = _cfg(str(tmp_path), match_mode="both", disable_reid=False,
               reid_thresh=0.05, require_face_if_visible=False,
               skip_yolo_when_faceonly=False)
    res = _run(duo, cfg, _bank(2), face=face,
               person=OraclePersonBackend(duo), reid=reid, ref_reid=ref_feat)
    assert len(res.hits) >= 3
    for h in res.hits:
        assert h.reid_dist is not None and h.reid_dist <= 0.05
        assert h.face_dist is None  # accepted via ReID, no face signal


def test_either_mode_reid_accept_despite_face_match_elsewhere(tmp_path,
                                                              duo_rev):
    # A's face matches the bank elsewhere in the frame; the candidate (B)
    # matches only by ReID. drop_reid_if_any_face_match must NOT veto the
    # accept in 'either' mode (gui_app.py:6402)
    reid = ColorReidBackend()
    ref_feat = _ref_reid_from(duo_rev, reid, 60, truth_slot=0)
    # side guard off: this test exercises the accept decision — the guard
    # otherwise drops the crop after smart-crop shifts it off the face
    cfg = _cfg(str(tmp_path), match_mode="either", disable_reid=False,
               reid_thresh=0.05, require_face_if_visible=False,
               drop_reid_if_any_face_match=True,
               side_guard_drop_enable=False)
    res = _run(duo_rev, cfg, _bank(0),
               person=OraclePersonBackend(duo_rev, max_det=1),
               reid=reid, ref_reid=ref_feat)
    assert len(res.hits) >= 3
    for h in res.hits:
        assert h.reid_dist is not None and h.reid_dist <= 0.05
        # the accepted subject is B: its face (identity 1) does not match
        assert h.face_dist is None or h.face_dist > 0.5


def test_require_face_gate_drops_faceless_candidate_in_both(tmp_path, duo):
    # same staging as test_both_mode_judges_candidate_on_available_signal,
    # but with require_face_if_visible ON: another face is visible in the
    # frame, so the candidate without a detectable face hard-drops
    # (reference qfail 'bf is None', gui_app.py:6426-6436)
    reid = ColorReidBackend()
    ref_feat = _ref_reid_from(duo, reid, 60, truth_slot=1)
    face = OracleBackend(duo, max_faces=1)
    cfg = _cfg(str(tmp_path), match_mode="both", disable_reid=False,
               reid_thresh=0.05, require_face_if_visible=True,
               skip_yolo_when_faceonly=False)
    res = _run(duo, cfg, _bank(2), face=face,
               person=OraclePersonBackend(duo), reid=reid, ref_reid=ref_feat)
    assert res.hits == []
