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

def test_engine_step_while_paused(tmp_path):
    """'step' advances exactly one frame per call while paused (reference
    Processor step command, gui_app.py:3543-3593)."""
    sv, backend, cfg, bank = _setup(tmp_path, total=600)
    eng = Engine(cfg, backend)
    eng.pause(True)
    result = {}

    def run():
        result["r"] = eng.run(bank=bank)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.6)          # reaches the pause wait before any frame
    for _ in range(6):
        eng.step()
        time.sleep(0.05)
    time.sleep(0.5)
    eng.stop()
    t.join(timeout=30)
    assert not t.is_alive()
    decoded = result["r"].mainpass.frames_decoded
    # paused the whole run: only the stepped frames were processed
    assert 1 <= decoded <= 8, decoded


def test_engine_set_speed_throttles(tmp_path):
    """set_speed caps processing at speed × video fps (reference
    'set_speed' command)."""
    sv, backend, cfg, bank = _setup(tmp_path, total=120)
    eng = Engine(cfg, backend)
    eng.set_speed(1.0)       # 30 fps video → ≤30 frames/s processed
    t0 = time.perf_counter()
    res = eng.run(bank=bank)
    dt = time.perf_counter() - t0
    assert res.ok
    # 120 frames at stride 2 = 60 processed at ≤30 f/s ⇒ ≥2 s
    # (unthrottled the oracle finishes in well under a second)
    assert dt >= 1.8, dt


def test_engine_releases_resources_on_failure(tmp_path):
    """A main-pass exception must still release the reader stack (decoder
    processes / prefetch threads) — review finding: they leaked on every
    failed run, accumulating per run in a GUI session."""
    import threading

    import numpy as np

    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.engine import Engine
    from person_capture_tpu.video.synthetic import generate_video

    sv = generate_video(str(tmp_path / "f.mp4"), width=160, height=120,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])

    class ExplodingBackend(OracleBackend):
        def extract_batch(self, frames, valid, frame_idxs=None):
            raise RuntimeError("device exploded mid-pass")

        submit_batch = None  # force the extract_batch path

    backend = ExplodingBackend(sv)
    cfg = SessionConfig()
    cfg.video = sv.path
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = False
    cfg.curate_enable = False
    cfg.tpu_batch_frames = 8
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])

    before = {t.name for t in threading.enumerate()}
    eng = Engine(cfg, backend)
    res = eng.run(bank=bank)
    assert not res.ok and "device exploded" in res.error
    assert eng._run_resources == []          # cleanup ran
    # the prefetch worker thread must be gone
    leaked = {t.name for t in threading.enumerate()} - before
    assert not any("pc.prefetch" in n for n in leaked), leaked


def test_engine_repairs_zeroed_stream_metadata(tmp_path, monkeypatch):
    """cv2 reports fps=0/total=0 on some MKV/stream files; the engine must
    run the probe recovery chain instead of collapsing to a 1-frame run."""
    import numpy as np

    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.engine import Engine
    from person_capture_tpu.video import reader as R
    from person_capture_tpu.video.synthetic import generate_video

    sv_vid = generate_video(str(tmp_path / "z.mp4"), width=160, height=120,
                            fps=30.0, total_frames=60, segments=[(5, 55, 0)])

    real_meta = R.Cv2Reader.meta

    def broken_meta(self):
        m = real_meta(self)
        m.fps = 0.0
        m.total_frames = 0
        return m

    monkeypatch.setattr(R.Cv2Reader, "meta", broken_meta)
    backend = OracleBackend(sv_vid)
    cfg = SessionConfig()
    cfg.video = sv_vid.path
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = False
    cfg.curate_enable = False
    cfg.frame_stride = 3
    cfg.min_gap_sec = 0.3
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 50
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    msgs = []
    eng = Engine(cfg, backend, status=msgs.append)
    res = eng.run(bank=bank)
    assert res.ok, res.error
    assert any("repaired stream metadata" in m for m in msgs)
    # the whole span was processed, not a single frame
    assert res.mainpass.frames_decoded > 10
    assert len(res.mainpass.hits) > 0


def test_engine_reusable_after_stop(tmp_path):
    """An Engine reused after a stopped run must do a real second run, not
    return an instant empty success: per-run command state (stop/step/seek)
    clears when run() exits (round-3 review finding)."""
    sv, _, cfg, bank = _setup(tmp_path, total=400)
    backend = SlowOracle(sv)
    eng = Engine(cfg, backend)
    result = {}

    def run1():
        result["r1"] = eng.run(bank=bank)

    t = threading.Thread(target=run1)
    t.start()
    time.sleep(0.3)
    eng.step()
    eng.seek(350)
    eng.stop()
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["r1"].ok
    assert result["r1"].mainpass.frames_decoded < 190   # really stopped

    # second run on the SAME engine processes the whole video
    res2 = eng.run(bank=bank)
    assert res2.ok, res2.error
    assert res2.mainpass.frames_decoded >= 190
    assert len(res2.mainpass.hits) > 0


def test_engine_profile_reports_stage_timings(tmp_path):
    sv, backend, cfg, bank = _setup(tmp_path, total=120)
    cfg.tpu_profile = True
    cfg.prescan_enable = True
    cfg.prescan_cache_mode = "off"
    cfg.prescan_boundary_refine_sec = 0.0
    msgs = []
    eng = Engine(cfg, backend, status=msgs.append)
    res = eng.run(bank=bank)
    assert res.ok, res.error
    prof = [m for m in msgs if m.startswith("profile:")]
    assert prof, msgs
    for stage in ("main.decode", "main.device_fetch", "main.host_replay",
                  "prescan.device_fetch"):
        assert stage in prof[0], prof[0]


def test_engine_jax_profile_dir_writes_trace(tmp_path):
    """tpu_jax_profile_dir wraps the run in a jax.profiler trace (device
    timelines for TensorBoard/XProf — SURVEY §5 tracing). The run must
    succeed AND leave trace artifacts under the directory."""
    import os

    sv, backend, cfg, bank = _setup(tmp_path, total=60)
    trace_dir = str(tmp_path / "jaxtrace")
    cfg.tpu_jax_profile_dir = trace_dir
    eng = Engine(cfg, backend, status=lambda m: None)
    res = eng.run(bank=bank)
    assert res.ok, res.error
    found = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir)
             for f in fs]
    assert found, "no jax profiler trace artifacts written"
