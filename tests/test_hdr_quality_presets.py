import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.hdr.stills import HdrExportParams


def test_quality_preset_ladder():
    cfg = SessionConfig()
    cfg.hdr_sdr_quality = "madvr_like"
    p = HdrExportParams.from_cfg(cfg)
    assert p.color_match and p.speckle_cleanup and p.peak_detect

    cfg.hdr_sdr_quality = "balanced"
    p = HdrExportParams.from_cfg(cfg)
    # balanced keeps the color match but fits it at a half-res statistics
    # reference (narrowed divergence from the reference's libplacebo
    # presets — see hdr/stills.py)
    assert p.color_match and p.speckle_cleanup
    assert p.ref_max_side == 480
    assert p.ref_max_side < HdrExportParams.from_cfg(
        SessionConfig()).ref_max_side

    cfg.hdr_sdr_quality = "fast"
    p = HdrExportParams.from_cfg(cfg)
    assert not p.color_match and not p.speckle_cleanup
    assert not p.peak_detect and not p.dither


def test_engine_degrades_without_ffmpeg(tmp_path, monkeypatch):
    """Forced-HDR source without ffmpeg: engine reports the HDR stills are
    unavailable but the run still completes (SDR decode path)."""
    import numpy as np

    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.engine import Engine
    from person_capture_tpu.video.synthetic import generate_video

    sv = generate_video(str(tmp_path / "v.mp4"), width=160, height=120,
                        fps=30.0, total_frames=60, segments=[(5, 55, 0)])
    monkeypatch.setenv("PERSON_CAPTURE_FORCE_HDR", "1")
    backend = OracleBackend(sv)
    cfg = SessionConfig()
    cfg.video = sv.path
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
    assert any("HDR stills unavailable" in m for m in msgs)
    assert len(res.mainpass.hits) > 0
    # crops are plain JPEGs (no HDR re-render available)
    assert all(h.path.endswith(".jpg") for h in res.mainpass.hits)

def test_from_cfg_plumbs_probed_transfer_and_range():
    """HLG sources must not be tone-mapped through the PQ EOTF: the engine
    passes the probe's transfer/color-range into from_cfg."""
    cfg = SessionConfig()
    p = HdrExportParams.from_cfg(cfg)
    assert p.transfer == "pq" and p.full_range is False   # defaults
    p = HdrExportParams.from_cfg(cfg, transfer="arib-std-b67")
    assert p.transfer == "hlg"
    p = HdrExportParams.from_cfg(cfg, transfer="smpte2084", full_range=True)
    assert p.transfer == "pq" and p.full_range is True
