import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


class FullFrameBlindBackend(OracleBackend):
    """Misses faces on full frames after a cutoff, but still sees them on
    upscaled ROI crops (models the small-face recall the reference's
    lock-ROI probe recovers). ROI crops are recognized because the
    pipeline resizes them back to frame shape — the face appears larger
    than `min_px`."""

    def __init__(self, sv, cutoff, min_px=90, **kw):
        super().__init__(sv, **kw)
        self.cutoff = cutoff
        self.min_px = min_px
        self._truth_box = None

    def extract_batch(self, frames, valid, frame_idxs=None):
        # full-frame path: truth boxes at native size
        out = super().extract_batch(frames, valid, frame_idxs)
        if frame_idxs is not None:
            for i, fi in enumerate(np.asarray(frame_idxs)):
                if fi > self.cutoff:
                    # simulate full-frame miss for small faces
                    for j in range(out["mask"].shape[1]):
                        if out["mask"][i, j]:
                            b = out["boxes"][i, j]
                            if (b[2] - b[0]) < self.min_px:
                                out["mask"][i, j] = False
        else:
            # ROI rescue path (no frame idxs): find the face by color blob
            h, w = frames.shape[1], frames.shape[2]
            from person_capture_tpu.video.synthetic import _ID_COLORS
            color = _ID_COLORS[0]
            for i in range(frames.shape[0]):
                if not valid[i]:
                    continue
                mask = np.all(np.abs(frames[i].astype(int) - color) < 40, -1)
                if mask.sum() < 100:
                    continue
                ys, xs = np.nonzero(mask)
                box = [xs.min(), ys.min(), xs.max(), ys.max()]
                if box[2] - box[0] < self.min_px:
                    continue
                out["boxes"][i, 0] = box
                out["scores"][i, 0] = 0.9
                out["mask"][i, 0] = True
                out["feats"][i, 0] = self.identity_feat(0)
                out["quality"][i, 0] = 500.0
        return out


def test_roi_rescue_recovers_locked_faces(tmp_path):
    sv = generate_video(str(tmp_path / "v.mp4"), width=320, height=240,
                        fps=30.0, total_frames=120,
                        segments=[(10, 110, 0)], moving=False)
    backend = FullFrameBlindBackend(sv, cutoff=50)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 4
    cfg.min_gap_sec = 0.3
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 100
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    cfg.lock_face_roi_enable = True
    cfg.lock_face_roi_pad = 1.25
    cfg.allow_faceless_when_locked = False
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(10, 110)], saver,
                            batch_size=8)
    reader.release()
    frames = [h.frame for h in res.hits]
    assert any(f <= 50 for f in frames)
    # rescue recovered hits past the full-frame cutoff
    assert any(f > 54 for f in frames), frames

    # with the ROI probe disabled, nothing past the cutoff
    cfg.lock_face_roi_enable = False
    cfg.out_dir = str(tmp_path / "out2")
    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res2 = run_main_pass(reader, backend, cfg, bank, [(10, 110)], saver,
                             batch_size=8)
    reader.release()
    assert all(h.frame <= 54 for h in res2.hits)
