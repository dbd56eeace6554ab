"""Execute the Qt GUI shell headlessly under the fake-Qt double.

PySide6 is absent in this image; these tests run the REAL gui_app code —
window construction, the auto-generated settings tab, config collection,
an actual Engine run driven from the window's Start path, LIVE-key push,
preset save/load and QSettings persistence — against tests/fake_qt.py.
This upgrades the GUI from "compile-checked only" to "logic fully
executed"; only rendering/event-loop behavior remains desktop-only.
"""

from __future__ import annotations

import os
import sys
from dataclasses import fields

import numpy as np
import pytest

import fake_qt
from person_capture_tpu.config import LIVE_KEYS, SessionConfig
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                generate_video)


@pytest.fixture()
def gui(monkeypatch):
    fake_qt.install(monkeypatch)
    monkeypatch.delitem(sys.modules, "person_capture_tpu.gui_app",
                        raising=False)
    import person_capture_tpu.gui_app as gui_app

    yield gui_app
    sys.modules.pop("person_capture_tpu.gui_app", None)


@pytest.fixture()
def synth(tmp_path):
    import cv2

    vid = str(tmp_path / "g.mp4")
    sv = generate_video(vid, width=160, height=120, fps=30.0,
                        total_frames=90, segments=[(0, 80, 0)])
    ref = np.full((120, 120, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (20, 20, 100, 100)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)
    return sv, ref_path


def test_window_constructs_and_binds_every_config_field(gui):
    win = gui.MainWindow(backend_factory=lambda: None)
    names = {f.name for f in fields(SessionConfig)}
    bound = set(win._field_widgets)
    assert bound <= names
    assert len(bound) >= 0.8 * len(names), \
        f"settings tab binds only {len(bound)}/{len(names)} fields"
    # collect round-trips widget values onto the config
    win.video_edit.setText("v.mp4")
    win.ref_list.addItem("r.png")
    win.out_edit.setText("outdir")
    win.face_thresh.setValue(0.37)
    win.frame_stride.setValue(4)
    cfg = win._collect_cfg()
    assert cfg.video == "v.mp4" and cfg.ref == "r.png"
    assert cfg.out_dir == "outdir"
    assert abs(cfg.face_thresh - 0.37) < 1e-9
    assert cfg.frame_stride == 4


def test_engine_run_through_window_start(gui, synth, tmp_path):
    sv, ref_path = synth
    win = gui.MainWindow(backend_factory=lambda: OracleBackend(sv))
    win.video_edit.setText(sv.path)
    win.ref_list.addItem(ref_path)
    win.out_edit.setText(str(tmp_path / "out"))
    win.min_gap.setValue(0.3)
    win.frame_stride.setValue(3)
    win.prescan_enable.setChecked(False)
    win.curate_enable.setChecked(False)
    for name, value in (("tpu_batch_frames", 8), ("min_box_pixels", 50),
                        ("face_quality_min", 0), ("min_sharpness", 0)):
        win._field_widgets[name][0].setValue(value)

    win.start_btn.click()                       # the real Start path
    assert win.bridge is not None
    win.bridge._thread.join(timeout=180)
    assert not win.bridge._thread.is_alive()
    log = "\n".join(win.log_pane.lines)
    assert "done" in log, log
    assert "hit f" in log, log
    assert win.progress_bar.value() > 0
    assert win.preview_label._pixmap is not None     # previews rendered
    assert os.path.isfile(os.path.join(str(tmp_path / "out"), "index.csv"))


def test_live_key_push_reaches_engine(gui):
    win = gui.MainWindow(backend_factory=lambda: None)
    pushed = {}

    class FakeBridge:
        def update_cfg(self, **kv):
            pushed.update(kv)

    win.bridge = FakeBridge()
    assert "face_thresh" in LIVE_KEYS
    w, _default, _kind = win._field_widgets["face_thresh"]
    w.setValue(0.21)                            # valueChanged → _push_live
    assert pushed == {"face_thresh": 0.21}
    assert win.cfg.face_thresh == 0.21


def test_preset_save_load_roundtrip(gui, tmp_path, monkeypatch):
    win = gui.MainWindow(backend_factory=lambda: None)
    win.face_thresh.setValue(0.33)
    win.frame_stride.setValue(7)
    preset = str(tmp_path / "p.json")
    monkeypatch.setattr(fake_qt.QFileDialog, "getSaveFileName",
                        staticmethod(lambda *a, **k: (preset, "")))
    win._save_preset()
    assert os.path.isfile(preset)

    win2 = gui.MainWindow(backend_factory=lambda: None)
    monkeypatch.setattr(fake_qt.QFileDialog, "getOpenFileName",
                        staticmethod(lambda *a, **k: (preset, "")))
    win2._load_preset()
    assert abs(win2.face_thresh.value() - 0.33) < 1e-9
    assert win2.frame_stride.value() == 7


def test_qsettings_persist_and_restore(gui):
    win = gui.MainWindow(backend_factory=lambda: None)
    win.video_edit.setText("persisted.mp4")
    win.out_edit.setText("persist_out")
    win.ref_list.addItem("a.png")
    win.ref_list.addItem("b.png")
    win.close()                                  # closeEvent persists

    win2 = gui.MainWindow(backend_factory=lambda: None)
    assert win2.video_edit.text() == "persisted.mp4"
    assert win2.out_edit.text() == "persist_out"
    assert [win2.ref_list.item(i).text()
            for i in range(win2.ref_list.count())] == ["a.png", "b.png"]


def test_preset_load_refreshes_generated_widgets(gui, tmp_path, monkeypatch):
    """Loading a preset refreshes the auto-generated settings tab; without
    that, _collect_cfg at Start silently overwrites the loaded values with
    stale widget state (round-3 GUI review finding)."""
    import json

    preset = str(tmp_path / "p.json")
    with open(preset, "w") as fh:
        json.dump({"prescan_stride": 48, "min_det_conf": 0.77,
                   "save_annot": True, "face_thresh": 0.19}, fh)
    win = gui.MainWindow(backend_factory=lambda: None)
    monkeypatch.setattr(fake_qt.QFileDialog, "getOpenFileName",
                        staticmethod(lambda *a, **k: (preset, "")))
    win._load_preset()
    # generated widgets now carry the preset values...
    w, _d, _k = win._field_widgets["prescan_stride"]
    assert w.value() == 48
    # ...and therefore survive config collection at Start
    cfg = win._collect_cfg()
    assert cfg.prescan_stride == 48
    assert abs(cfg.min_det_conf - 0.77) < 1e-9
    assert cfg.save_annot is True
    assert abs(cfg.face_thresh - 0.19) < 1e-9


def test_bridge_commands_before_engine_ready(gui):
    """pause/stop/seek clicked while the backend is still compiling reach
    the Engine: the bridge constructs it eagerly (LazyBackend defers only
    the heavy build to the worker thread)."""
    cfg = SessionConfig()
    cfg.video = "nonexistent.mp4"   # run() will fail fast in the worker
    cfg.ref = "nonexistent.png"
    built = {"n": 0}

    def slow_factory():
        built["n"] += 1
        return None

    bridge = gui.EngineBridge(cfg, slow_factory)
    done = []
    bridge.finished.connect(lambda ok, err: done.append((ok, err)))
    bridge.start()
    # engine exists immediately — commands are not dropped
    assert bridge._engine is not None
    bridge.stop()
    bridge.seek(10)
    bridge._thread.join(timeout=30)
    assert done and done[0][0] is False


def test_aux_factories_follow_config(gui):
    """The Start path builds person/ReID/full-frame factories exactly when
    the run's config needs them (mirrors main.py's conditional
    construction; reference gui_app.py:4490-4515 always loads all)."""
    win = gui.MainWindow(backend_factory=lambda: None)

    # face_only still builds the person factory by default: body-aware
    # compose association (compose_detect_person_for_face, reference
    # gui_app.py:4490 + 5920-5938)
    cfg = SessionConfig(match_mode="face_only", skip_yolo_when_faceonly=True,
                        face_fullframe_when_missed=False)
    assert set(win._aux_factories(cfg)) == {"person"}
    cfg.compose_detect_person_for_face = False
    assert win._aux_factories(cfg) == {}

    cfg = SessionConfig(match_mode="either",
                        face_fullframe_when_missed=False)
    aux = win._aux_factories(cfg)
    assert set(aux) == {"person", "reid"}
    assert cfg.disable_reid is False        # main.py:409 parity

    cfg = SessionConfig(match_mode="face_only", skip_yolo_when_faceonly=True,
                        compose_detect_person_for_face=False,
                        face_fullframe_when_missed=True,
                        face_fullframe_imgsz=1408)
    assert set(win._aux_factories(cfg)) == {"fullframe"}
    cfg.face_fullframe_imgsz = 640          # no upscale ⇒ no rescue tower
    assert win._aux_factories(cfg) == {}


def test_bridge_wires_aux_backends_lazily(gui):
    """Aux factories reach the Engine as LazyBackends without being built
    at Start — a face_only run must never pay a YOLO/CLIP compile."""
    from person_capture_tpu.pipeline.backends import LazyBackend

    cfg = SessionConfig(video="nonexistent.mp4", ref="nonexistent.png")
    built = []
    bridge = gui.EngineBridge(
        cfg, lambda: None,
        aux_factories={"person": lambda: built.append("person"),
                       "reid": lambda: built.append("reid")})
    done = []
    bridge.finished.connect(lambda ok, err: done.append(ok))
    bridge.start()
    eng = bridge._engine
    assert isinstance(eng.person_backend, LazyBackend)
    assert isinstance(eng.reid_backend, LazyBackend)
    assert eng.fullframe_backend is None
    bridge._thread.join(timeout=30)
    assert built == []                      # run failed before first touch
    assert done == [False]


def test_generated_tab_edit_survives_collect(gui):
    # editing a field in the generated All-settings tab must not be
    # clobbered by the untouched Capture-tab twin at Start
    win = gui.MainWindow(backend_factory=lambda: None)
    w, default, kind = win._field_widgets["face_thresh"]
    w.setValue(0.123)
    cfg = win._collect_cfg()
    assert cfg.face_thresh == pytest.approx(0.123)
    # and an edited quick control wins over a stale generated widget
    win.face_thresh.setValue(0.321)
    cfg = win._collect_cfg()
    assert cfg.face_thresh == pytest.approx(0.321)


def test_curate_tab_full_reference_knob_argv(gui, monkeypatch, tmp_path):
    """The curate tab exposes the reference CurateTab's tunable set and
    forwards every knob to the curator CLI with the reference arg names
    (reference gui_curate_tab.py:26-711)."""
    import threading

    win = gui.MainWindow(backend_factory=lambda: None)
    # every reference CLI knob has a widget
    expected = {"sharp-min", "scene-sim", "scene-time-gap",
                "scene-nn-window", "dedup-hamm", "scene-dedup",
                "scene-soft-cap", "scene-soft-penalty", "profile-yaw",
                "div-bg", "div-face", "closeup-boost", "closeup-thr"}
    assert set(win.cur_knobs) == expected

    captured = {}
    done = threading.Event()

    def fake_main(argv):
        captured["argv"] = list(argv)
        done.set()
        return 0

    import person_capture_tpu.curator.__main__ as cm

    monkeypatch.setattr(cm, "main", fake_main)
    win.cur_pool.setText(str(tmp_path))
    win.cur_out.setText(str(tmp_path / "o"))
    win.cur_knobs["sharp-min"].setValue(0.2)
    win.cur_knobs["scene-dedup"].setValue(3)
    win.cur_scene_aware.setChecked(False)
    win.cur_assume_id.setChecked(True)
    win.cur_quotas.setText('{"closeup": [1, 5]}')
    win.on_curate()
    assert done.wait(timeout=30)
    argv = captured["argv"]
    # the CLI parser accepts the exact argv the tab built
    args = cm.build_parser().parse_args(argv)
    assert args.sharp_min == pytest.approx(0.2)
    assert args.scene_dedup == 3 and args.scene_aware == 0
    assert args.assume_identity is True
    assert args.quotas == '{"closeup": [1, 5]}'
    assert args.ref == ""              # no ref set -> omit, assume identity
    # untouched knobs carry the reference defaults
    assert args.div_bg == 1.0 and args.closeup_boost == 0.25
