"""Wired main-pass config keys: lock carry (faceless_persist_frames), lock
ReID EMA (lock_momentum), runtime bank learning (learn_bank_runtime), face
ambiguity margin (face_margin_min), full-frame high-res rescue
(face_fullframe_*), and saver timeout/archive semantics.

Reference sites: gui_app.py:7719-7730 (carry), 7495-7512 (EMA),
7460 (bank), 7797 (margin), 6030-6219 (full-frame), 7284-7344 + 5209-5372
(saver ack/archive)."""

import os
import threading
import time

import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import LockState, run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver, SaveItem
from person_capture_tpu.video.reader import open_reader
from person_capture_tpu.video.synthetic import generate_video


def _cfg(tmp_path, **kw) -> SessionConfig:
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = False
    cfg.frame_stride = 1
    cfg.tpu_batch_frames = 8
    cfg.min_gap_sec = 0.0
    cfg.face_thresh = 0.3
    cfg.compose_crop_enable = False
    cfg.smart_crop_enable = False
    cfg.auto_crop_borders = False
    # ROI rescue feeds CROPS to the backend; OracleBackend would fabricate
    # detections for them from arange frame indices — keep it out of these
    # focused wiring tests (it has its own: test_roi_rescue.py)
    cfg.lock_face_roi_enable = False
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _bank(backend, ident=0) -> RefBank:
    bank = RefBank(cap=8)
    bank.update(backend.identity_feat(ident), 100.0)
    return bank


def test_lockstate_reid_ema_and_clear():
    ls = LockState()
    a = np.zeros(4, np.float32)
    a[0] = 1.0
    b = np.zeros(4, np.float32)
    b[1] = 1.0
    ls.update_reid(a, 0.7)
    np.testing.assert_allclose(ls.reid_feat, a)
    ls.update_reid(b, 0.7)
    assert ls.reid_feat[0] > ls.reid_feat[1] > 0  # EMA favors history
    np.testing.assert_allclose(np.linalg.norm(ls.reid_feat), 1.0, atol=1e-6)
    ls.clear()
    assert ls.reid_feat is None and not ls.locked


def test_lock_carry_persist_frames(tmp_path):
    """With faceless_persist_frames > 0 and match_mode != face_only, frames
    just after the face disappears still produce crops from the carried
    lock box; with 0 they do not."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=40, segments=[(0, 19, 0)],
                        moving=False)

    def run(persist):
        cfg = _cfg(tmp_path, match_mode="either",
                   faceless_persist_frames=persist,
                   allow_faceless_when_locked=False,
                   out_dir=str(tmp_path / f"out{persist}"))
        backend = OracleBackend(sv)
        reader = open_reader(vid)
        with AsyncSaver(cfg.out_dir, async_save=False) as saver:
            mp = run_main_pass(reader, backend, cfg, _bank(backend),
                               [(0, 39)], saver, batch_size=8)
        reader.release()
        return [h.frame for h in mp.hits]

    frames_with = run(6)
    frames_without = run(0)
    carried = [f for f in frames_with if f > 19]
    assert carried and max(carried) <= 19 + 6 + 1
    assert not [f for f in frames_without if f > 19]


def test_learn_bank_runtime_grows_bank(tmp_path):
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=30, segments=[(0, 29, 0)],
                        moving=True)
    backend = OracleBackend(sv, noise=0.05)
    cfg = _cfg(tmp_path, learn_bank_runtime=True, prescan_fd_add=0.5,
               face_quality_min=0.0)
    bank = _bank(backend)
    size0 = bank.size
    reader = open_reader(vid)
    with AsyncSaver(cfg.out_dir, async_save=False) as saver:
        run_main_pass(reader, backend, cfg, bank, [(0, 29)], saver,
                      batch_size=8)
    reader.release()
    assert bank.size > size0


def test_face_margin_min_rejects_ambiguous(tmp_path):
    """Two distinct faces of the SAME identity-distance within the margin →
    frame rejected as ambiguous."""
    vid = str(tmp_path / "v.mp4")
    # two identities at the same time; make both match the bank
    sv = generate_video(vid, total_frames=12,
                        segments=[(0, 11, 0), (0, 11, 1)], moving=False)
    # place the second face elsewhere so boxes don't overlap
    for f, pls in sv.truth.items():
        if len(pls) > 1:
            x1, y1, x2, y2 = pls[1].box
            w = x2 - x1
            pls[1].box = (2, 2, 2 + w, 2 + w)

    class TwoMatchBackend(OracleBackend):
        def identity_feat(self, identity):
            return super().identity_feat(0)  # both faces match the bank

    backend = TwoMatchBackend(sv)
    bank = _bank(backend)

    def run(margin):
        cfg = _cfg(tmp_path, face_margin_min=margin,
                   out_dir=str(tmp_path / f"out_m{margin}"))
        reader = open_reader(vid)
        with AsyncSaver(cfg.out_dir, async_save=False) as saver:
            mp = run_main_pass(reader, backend, cfg, bank, [(0, 11)], saver,
                               batch_size=8)
        reader.release()
        return len(mp.hits)

    assert run(0.0) > 0
    assert run(0.2) == 0


def test_fullframe_rescue_recovers_missed_faces(tmp_path):
    """Frames where the primary backend sees nothing get re-probed through
    the full-frame backend at cadence and produce hits."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=24, segments=[(0, 23, 0)],
                        moving=False)

    class BlindBackend(OracleBackend):
        def extract_batch(self, frames, valid, frame_idxs=None):
            out = super().extract_batch(frames, valid, frame_idxs)
            for k in ("mask",):
                out[k][:] = False
            return out

    class SeeingBackend(OracleBackend):
        calls = 0

        def extract_batch(self, frames, valid, frame_idxs=None):
            SeeingBackend.calls += 1
            return super().extract_batch(frames, valid, frame_idxs)

    cfg = _cfg(tmp_path, face_fullframe_when_missed=True,
               face_fullframe_cadence=1)
    blind = BlindBackend(sv)
    seeing = SeeingBackend(sv)
    bank = _bank(blind)
    reader = open_reader(vid)
    with AsyncSaver(cfg.out_dir, async_save=False) as saver:
        mp = run_main_pass(reader, blind, cfg, bank, [(0, 23)], saver,
                           batch_size=8, fullframe_backend=seeing)
    reader.release()
    assert SeeingBackend.calls > 0
    assert len(mp.hits) > 0


def test_saver_render_timeout_sets_cancel(tmp_path):
    ev = threading.Event()

    def hung_render(path):
        time.sleep(5.0)
        return True, path

    with AsyncSaver(str(tmp_path), async_save=True,
                    render_timeout_sec=0.3) as saver:
        saver.submit(SaveItem(img=None, path=str(tmp_path / "a.png"),
                              render=hung_render, cancel_event=ev))
        # a fast crop save behind the hung render must still complete
        img = np.zeros((8, 8, 3), np.uint8)
        saver.submit(SaveItem(img=img, path=str(tmp_path / "b.jpg")))
        saver.wait_empty()
        assert ev.is_set()
        assert any(p.endswith("b.jpg") for p in saver.saved)
        assert any("render_timeout" in e for _, e in saver.errors)


def test_saver_archive_queue(tmp_path):
    done = []
    with AsyncSaver(str(tmp_path), async_save=True) as saver:
        for i in range(4):
            saver.submit_archive(
                lambda i=i: (done.append(i) or (True, f"a{i}")), label=f"a{i}")
    assert sorted(done) == [0, 1, 2, 3]
    assert len(saver.archived) == 4


def test_async_save_wait_blocks_until_written(tmp_path):
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=10, segments=[(0, 9, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    cfg = _cfg(tmp_path, async_save_wait=True)
    reader = open_reader(vid)
    with AsyncSaver(cfg.out_dir, async_save=True) as saver:
        mp = run_main_pass(reader, backend, cfg, _bank(backend), [(0, 9)],
                           saver, batch_size=8)
        # with the wait flag every submitted crop is already on disk here
        for h in mp.hits:
            assert os.path.isfile(h.path)
    reader.release()


def test_live_min_gap_takes_effect_mid_run(tmp_path):
    """LIVE keys must be re-read per use: with min_gap_sec huge a run
    yields one hit; dropping it to 0 mid-run (as Engine.update_cfg does)
    must let later frames save too. The old entry-time snapshot kept the
    initial value for the whole run."""
    import numpy as np

    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.mainpass import run_main_pass
    from person_capture_tpu.pipeline.saver import AsyncSaver
    from person_capture_tpu.video.reader import Cv2Reader
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "lg.mp4")
    sv = generate_video(vid, total_frames=120, segments=[(0, 119, 0)],
                        moving=False)
    cfg = _cfg(tmp_path)
    cfg.min_gap_sec = 1e9
    bank = RefBank(cap=8)
    v = np.zeros(64, np.float32)
    v[0] = 1.0
    bank.seed([v])
    calls = [0]

    def should_stop():
        calls[0] += 1
        if calls[0] == 3:
            cfg.min_gap_sec = 0.0   # what Engine.update_cfg does
        return False

    reader = Cv2Reader(vid)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, OracleBackend(sv), cfg, bank,
                            [(0, 119)], saver, batch_size=8,
                            should_stop=should_stop)
    reader.release()
    assert len(res.hits) > 1, "mid-run min_gap change was ignored"


def test_person_assoc_gate_reference_semantics(tmp_path, monkeypatch):
    """Body-aware compose association (reference gui_app.py:5920-5938):
    faces at/below compose_person_assoc_max_face_frac associate on EVERY
    matched frame (OR-gate, not AND), cadence frames associate regardless,
    compose_detect_person_for_face=False disables it entirely, and the
    owning box comes from the scored find_person_box_for_face."""
    from person_capture_tpu.core import geometry as G
    from person_capture_tpu.pipeline.backends import OraclePersonBackend

    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, width=320, height=240, total_frames=24,
                        segments=[(0, 23, 0)], moving=False)
    face_h = sv.truth[0][0].box[3] - sv.truth[0][0].box[1]
    face_frac = face_h / 240.0          # 0.25 with this generator

    calls = []
    real = G.find_person_box_for_face

    def recorder(face, persons, w, h):
        calls.append(len(calls))
        return real(face, persons, w, h)

    monkeypatch.setattr(G, "find_person_box_for_face", recorder)

    def run(tag, **kw):
        calls.clear()
        cfg = _cfg(tmp_path, match_mode="face_only",
                   out_dir=str(tmp_path / tag), **kw)
        backend = OracleBackend(sv)
        reader = open_reader(vid)
        with AsyncSaver(cfg.out_dir, async_save=False) as saver:
            mp = run_main_pass(reader, backend, cfg, _bank(backend),
                               [(0, 23)], saver, batch_size=8,
                               person_backend=OraclePersonBackend(sv))
        reader.release()
        return len(mp.hits), len(calls)

    # cap below the face size: only cadence frames (idx % 6 == 0) associate
    hits, n_calls = run("cadence",
                        compose_person_assoc_max_face_frac=face_frac - 0.05)
    assert hits == 24 and n_calls == 4          # frames 0, 6, 12, 18

    # cap above the face size: EVERY matched frame associates
    hits, n_calls = run("always",
                        compose_person_assoc_max_face_frac=face_frac + 0.05)
    assert hits == 24 and n_calls == 24

    # master switch off: never
    hits, n_calls = run("off", compose_detect_person_for_face=False)
    assert hits == 24 and n_calls == 0
