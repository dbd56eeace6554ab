import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.hdr.exporter import ArrayP010Source, HdrStillExporter
from person_capture_tpu.hdr.stills import HdrExportParams
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


def _p010_frame(h, w, seed):
    rng = np.random.default_rng(seed)
    y = (rng.integers(300, 700, (h, w)).astype(np.uint16) << 6)
    uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
    return y, uv


def test_exporter_renders_and_validates(tmp_path):
    h, w = 128, 192
    src = ArrayP010Source({10: _p010_frame(h, w, 0)}, w, h)
    params = HdrExportParams(color_match=True, speckle_cleanup=True)
    exp = HdrStillExporter(src, params, out_format="png")
    out = str(tmp_path / "f00000010.png")
    ok, err = exp.export(10, (20, 20, 84, 108), (w, h), out)
    assert ok, err
    assert os.path.exists(out)
    import cv2
    img = cv2.imread(out)
    # crop is ~64x88 after 4:2:0 legalization
    assert abs(img.shape[1] - 64) <= 2 and abs(img.shape[0] - 88) <= 2


def test_exporter_missing_frame(tmp_path):
    src = ArrayP010Source({}, 64, 64)
    exp = HdrStillExporter(src, HdrExportParams())
    ok, err = exp.export(5, (0, 0, 32, 32), (64, 64), str(tmp_path / "x.png"))
    assert not ok and err == "hdr_decode_failed"


def test_out_path_format():
    exp = HdrStillExporter(ArrayP010Source({}, 4, 4),
                           HdrExportParams(), out_format="png")
    assert exp.out_path_for("/a/b/f00000001.jpg") == "/a/b/f00000001.png"


def test_mainpass_hdr_export_path(tmp_path):
    """Accepted crops export as full-res HDR→SDR PNGs via the saver thread."""
    sv = generate_video(str(tmp_path / "v.mp4"), width=160, height=120,
                        fps=30.0, total_frames=90, segments=[(10, 80, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    # HDR "source" at 2x the reader resolution
    frames = {i: _p010_frame(240, 320, i) for i in range(0, 90)}
    exporter = HdrStillExporter(ArrayP010Source(frames, 320, 240),
                                HdrExportParams(color_match=False,
                                                speckle_cleanup=False),
                                out_format="png")
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 5
    cfg.min_gap_sec = 0.5
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 50
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(10, 80)], saver,
                            batch_size=8, hdr_exporter=exporter)
    reader.release()
    assert len(res.hits) >= 2
    assert not saver.errors, saver.errors
    for h in res.hits:
        assert h.path.endswith(".png")
        assert os.path.exists(h.path)
