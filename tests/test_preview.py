import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


def test_preview_emission(tmp_path):
    sv = generate_video(str(tmp_path / "v.mp4"), width=320, height=240,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 2
    cfg.tpu_batch_frames = 8
    cfg.min_gap_sec = 10.0      # previews don't depend on saves
    cfg.face_quality_min = 0.0
    cfg.preview_every = 3
    cfg.preview_fps_cap = 0     # no wall-clock throttle in tests
    cfg.preview_max_dim = 100

    frames = []
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(5, 55)], saver,
                            batch_size=8,
                            on_preview=lambda img, idx: frames.append((idx, img)))
    reader.release()
    assert res.frames_processed > 0
    # every 3rd processed frame previews
    assert len(frames) == res.frames_processed // 3
    # downscaled to max_dim
    for _, img in frames:
        assert max(img.shape[:2]) <= 100


def test_engine_hdr_preview_pump(tmp_path, monkeypatch):
    """HDR run: previews must come from the P010 stream through the device
    tone-map kernel (reference P010 preview pump, gui_app.py:13290-13481),
    via a DEDICATED source instance — not the exporter's, and not the
    washed analysis frames. Verified pixel-exact against
    tonemap_preview_frame on the same planes."""
    from person_capture_tpu.hdr.exporter import ArrayP010Source
    from person_capture_tpu.hdr_preview import tonemap_preview_frame
    from person_capture_tpu.pipeline.engine import Engine

    sv = generate_video(str(tmp_path / "v.mp4"), width=160, height=120,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    monkeypatch.setenv("PERSON_CAPTURE_FORCE_HDR", "1")

    h, w = 120, 160
    planes = {}
    for i in range(60):
        y = np.full((h, w), (300 + 5 * i) << 6, np.uint16)
        uv = np.full((h // 2, w // 2, 2), 512 << 6, np.uint16)
        planes[i] = (y, uv)

    made = []

    def factory(video, width, height, fps):
        src = ArrayP010Source(planes, width, height)
        made.append(src)
        return src

    backend = OracleBackend(sv)
    cfg = SessionConfig()
    cfg.video = sv.path
    cfg.out_dir = str(tmp_path / "out")
    cfg.prescan_enable = False
    cfg.curate_enable = False
    cfg.frame_stride = 2
    cfg.tpu_batch_frames = 8
    cfg.min_gap_sec = 0.3
    cfg.min_box_pixels = 50
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    cfg.preview_every = 5
    cfg.preview_fps_cap = 0
    cfg.preview_max_dim = 100

    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    previews = []
    eng = Engine(cfg, backend, on_preview=lambda img, i: previews.append((i, img)),
                 hdr_source_factory=factory)
    res = eng.run(bank=bank)
    assert res.ok, res.error
    assert previews, "HDR run emitted no previews"
    # one source for the exporter, one for the preview pump
    assert len(made) == 2
    idx, img = previews[0]
    assert max(img.shape[:2]) <= 100
    expect = tonemap_preview_frame(planes[idx][0], planes[idx][1],
                                   max_dim=100)
    np.testing.assert_array_equal(img, expect)
