"""CLI config surface: --preset JSON loading and typed --set overrides
(person_capture_tpu.main.build_config). The reference loads preset JSON in
the GUI (gui_app.py:15881-15943); the rebuild's CLI accepts the same files
plus a typed --set side door replacing the reference's env-var channel."""

import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.main import build_config, build_parser

BASE = ["--video", "v.mp4", "--ref", "r.png", "--out", "o"]


def _cfg(extra):
    ap = build_parser()
    args = ap.parse_args(BASE + extra)
    return build_config(args, ap)


def test_set_overrides_typed():
    cfg = _cfg(["--set", "tpu_mainpass_analysis_max_w=832",
                "--set", "min_gap_sec=1.5",
                "--set", "prescan_fd9_skip=false",
                "--set", "curate_weights=[0.5, 0.4, 0.1]"])
    assert cfg.tpu_mainpass_analysis_max_w == 832
    assert cfg.min_gap_sec == 1.5
    assert cfg.prescan_fd9_skip is False
    assert cfg.curate_weights == (0.5, 0.4, 0.1)


def test_set_unknown_key_errors():
    with pytest.raises(SystemExit):
        _cfg(["--set", "not_a_field=1"])


def test_set_bad_value_errors():
    with pytest.raises(SystemExit):
        _cfg(["--set", "min_gap_sec=abc"])


def test_preset_loads_and_flags_override(tmp_path):
    src = SessionConfig()
    src.face_thresh = 0.123
    src.prescan_stride = 99
    p = tmp_path / "preset.json"
    p.write_text(src.to_json())

    # no explicit flag: preset value wins over the CLI default
    cfg = _cfg(["--preset", str(p)])
    assert cfg.face_thresh == 0.123
    assert cfg.prescan_stride == 99

    # explicitly-passed flag beats the preset
    cfg = _cfg(["--preset", str(p), "--face-thresh", "0.5"])
    assert cfg.face_thresh == 0.5
    assert cfg.prescan_stride == 99

    # --set beats everything
    cfg = _cfg(["--preset", str(p), "--face-thresh", "0.5",
                "--set", "face_thresh=0.7"])
    assert cfg.face_thresh == 0.7


def test_ref_repeatable_joins():
    ap = build_parser()
    args = ap.parse_args(["--video", "v.mp4", "--ref", "a.png",
                          "--ref", "b.png", "--out", "o"])
    cfg = build_config(args, ap)
    assert cfg.ref == "a.png;b.png"
