import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.prescan import refine_span_edges, run_prescan
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "r.mp4")
    sv = generate_video(path, width=160, height=120, fps=30.0,
                        total_frames=240, segments=[(60, 150, 0)])
    return sv


def _cfg(**kw):
    cfg = SessionConfig()
    cfg.prescan_stride = 24          # coarse: edges land ±24 frames off
    cfg.prescan_pad_sec = 0.5        # 15 frames pad
    cfg.prescan_min_segment_sec = 0.5
    cfg.prescan_bridge_gap_sec = 0.2
    cfg.prescan_exit_cooldown_sec = 0.2
    cfg.prescan_boundary_refine_sec = 1.0
    cfg.prescan_refine_stride_min = 3
    cfg.prescan_refine_budget_sec = 10.0
    cfg.tpu_batch_frames = 8
    cfg.face_quality_min = 0.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_refine_tightens_edges(synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg()
    reader = Cv2Reader(synth.path)
    res = run_prescan(reader, backend, cfg, bank,
                      reopen_reader=lambda: Cv2Reader(synth.path))
    reader.release()
    assert len(res.spans) == 1
    s, e = res.spans[0]
    # refined with stride 3: edges within ~6 frames of ground truth 60..150
    assert abs(s - 60) <= 8
    assert abs(e - 150) <= 8


def test_refine_respects_budget(synth):
    import time

    class SlowBackend(OracleBackend):
        def extract_batch(self, frames, valid, frame_idxs=None):
            time.sleep(0.02)
            return super().extract_batch(frames, valid, frame_idxs)

    backend = SlowBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    # budget covers (part of) the first span only; the second is left as-is
    cfg = _cfg(prescan_refine_budget_sec=0.005)
    spans = [(36, 100), (120, 165)]
    out = refine_span_edges(spans, lambda: Cv2Reader(synth.path), backend,
                            cfg, bank, 30.0, 240)
    assert out[-1][1] == 165  # untouched second span end

    # budget <= 1e-3 means unlimited (reference semantics)
    cfg2 = _cfg(prescan_refine_budget_sec=0.0)
    out2 = refine_span_edges([(36, 183)], lambda: Cv2Reader(synth.path),
                             OracleBackend(synth), cfg2, bank, 30.0, 240)
    assert abs(out2[0][1] - 150) <= 8


def test_refine_disabled(synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg(prescan_boundary_refine_sec=0.0)
    reader = Cv2Reader(synth.path)
    res = run_prescan(reader, backend, cfg, bank,
                      reopen_reader=lambda: Cv2Reader(synth.path))
    reader.release()
    # coarse edges only (padded), same spans as without refinement
    assert len(res.spans) == 1


def test_refine_uses_fixed_production_batch_shape(synth):
    """Boundary refinement must submit batches padded to tpu_batch_frames:
    every distinct edge-window size would otherwise be a fresh XLA compile
    (minutes each over tunneled links)."""

    class ShapeRecordingBackend(OracleBackend):
        def __init__(self, sv):
            super().__init__(sv)
            self.batch_sizes = []

        def extract_batch(self, frames, valid, frame_idxs=None):
            self.batch_sizes.append(int(len(frames)))
            return super().extract_batch(frames, valid, frame_idxs)

    backend = ShapeRecordingBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg()
    out = refine_span_edges([(36, 183)], lambda: Cv2Reader(synth.path),
                            backend, cfg, bank, 30.0, 240)
    assert backend.batch_sizes, "refinement must have run"
    assert set(backend.batch_sizes) == {cfg.tpu_batch_frames}
    assert abs(out[0][0] - 60) <= 8 and abs(out[0][1] - 150) <= 8


def test_refine_drops_spans_trimmed_below_min_length(tmp_path):
    """Reference parity (gui_app.py:1819): a span trimmed below
    prescan_min_segment_sec does not survive refinement."""
    path = str(tmp_path / "short.mp4")
    sv = generate_video(path, width=160, height=120, fps=30.0,
                        total_frames=240, segments=[(100, 104, 0)])
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg(prescan_min_segment_sec=1.0,   # 30 frames at 30 fps
               prescan_trim_pad=True)
    out = refine_span_edges([(80, 124)], lambda: Cv2Reader(path), backend,
                            cfg, bank, 30.0, 240)
    assert out == [], f"micro-span survived refinement: {out}"
