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


def test_mesh_dtype_precedence(tmp_path):
    """tpu_mesh / tpu_compute_dtype follow the documented precedence
    (preset < explicit flags < --set) instead of being clobbered from
    argparse defaults after build_config (round-3 review finding)."""
    import json

    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.main import build_config, build_parser

    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({"tpu_mesh": "data:4",
                                  "tpu_compute_dtype": "float32"}))
    ap = build_parser()
    base = ["--video", "v", "--ref", "r", "--out", "o"]
    # preset values survive when the flags are not passed
    cfg = build_config(ap.parse_args(base + ["--preset", str(preset)]), ap)
    assert cfg.tpu_mesh == "data:4"
    assert cfg.tpu_compute_dtype == "float32"
    # explicit flag overrides the preset
    cfg = build_config(ap.parse_args(
        base + ["--preset", str(preset), "--mesh", "data:2"]), ap)
    assert cfg.tpu_mesh == "data:2"
    # --set wins over everything
    cfg = build_config(ap.parse_args(
        base + ["--mesh", "data:2", "--set", "tpu_mesh=data:8",
                "--set", "tpu_compute_dtype=float32"]), ap)
    assert cfg.tpu_mesh == "data:8"
    assert cfg.tpu_compute_dtype == "float32"
    # without preset, flag defaults still land in cfg
    cfg = build_config(ap.parse_args(base), ap)
    assert cfg.tpu_mesh == SessionConfig().tpu_mesh
    assert cfg.tpu_compute_dtype == "bfloat16"


def test_resolve_yolo_rejects_unresolvable_spec(tmp_path):
    """A user-supplied --yolo checkpoint that resolves to nothing raises —
    it must never fall back to a silent random-init person detector."""
    import numpy as np
    import pytest

    from person_capture_tpu.main import resolve_yolo

    with pytest.raises(FileNotFoundError, match="yolov8s"):
        resolve_yolo("/nonexistent/yolov8s.pt")
    # bundled name (with or without the .pt suffix) resolves to real weights
    cfg, w = resolve_yolo("yolov8n.pt")
    assert cfg.name == "yolov8n"
    assert w is not None
    # an existing flax .npz path loads for real
    from person_capture_tpu.models.zoo import bundled_weights_path

    src = bundled_weights_path("yolov8n")
    cfg2, w2 = resolve_yolo(src)
    assert w2 is not None
    flat_keys = lambda t, p="": [  # noqa: E731
        k for kk, vv in t.items()
        for k in (flat_keys(vv, p + kk + "/") if isinstance(vv, dict)
                  else [p + kk])]
    assert flat_keys(w) == flat_keys(w2)
