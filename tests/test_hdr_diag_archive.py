import json
import os

import numpy as np
import pytest

pytest.importorskip("jax.numpy")

from person_capture_tpu.hdr.diagnostics import run_speckle_diagnostics
from person_capture_tpu.hdr.exporter import archive_hdr_crop


def _p010(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.integers(200, 800, (h, w)).astype(np.uint16) << 6)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    uv[..., 1] += (rng.integers(-60, 60, uv.shape[:2]) << 6).astype(np.uint16)
    return y, uv


def test_speckle_diagnostics_report(tmp_path):
    y, uv = _p010()
    report = run_speckle_diagnostics(y, uv, (8, 8, 72, 72), str(tmp_path))
    assert os.path.exists(tmp_path / "speckle_diag.json")
    assert set(report["variants"]) >= {"bt2390_limited", "mobius_limited",
                                       "hable_limited", "clip_limited"}
    for name, v in report["variants"].items():
        assert "stats" in v and "speckle_pixels" in v
        assert 0 <= v["stats"]["g"]["mean"] <= 255
    diffs = report["diffs_vs_bt2390_limited"]
    assert "clip_limited" in diffs
    # intermediates written
    assert os.path.exists(tmp_path / "diag_bt2390_limited.png")
    # json round-trips
    with open(tmp_path / "speckle_diag.json") as fh:
        loaded = json.load(fh)
    assert loaded["crop"] == [8, 8, 72, 72]


def test_archive_npz_fallback(tmp_path, monkeypatch):
    # force the no-ffmpeg path
    import person_capture_tpu.video.reader as R

    monkeypatch.setattr(R, "find_ffmpeg", lambda: None)
    y, uv = _p010()
    ok, path = archive_hdr_crop(y, uv, (9, 9, 73, 73),
                                str(tmp_path / "crop.avif"))
    assert ok and path.endswith(".npz")
    data = np.load(path)
    assert bytes(data["pix_fmt"]).decode() == "p010le"
    x1, y1, x2, y2 = data["crop"]
    assert (x2 - x1) % 2 == 0 and (y2 - y1) % 2 == 0
    assert data["y"].shape == (y2 - y1, x2 - x1)
    assert data["uv"].shape == ((y2 - y1) // 2, (x2 - x1) // 2, 2)
    # lossless: matches the source crop exactly
    np.testing.assert_array_equal(data["y"], y[y1:y2, x1:x2])
