import csv
import os

import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import (CSV_COLUMNS, AsyncSaver,
                                               SaveItem, atomic_image_write)
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "m.mp4")
    sv = generate_video(path, width=320, height=240, fps=30.0,
                        total_frames=150, segments=[(30, 120, 0)])
    return sv


def _cfg(out_dir, **kw):
    cfg = SessionConfig()
    cfg.out_dir = out_dir
    cfg.frame_stride = 3
    cfg.min_gap_sec = 0.5
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 100
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_saver_atomic_write(tmp_path):
    img = np.full((20, 20, 3), 128, np.uint8)
    out = str(tmp_path / "x.jpg")
    ok, err = atomic_image_write(img, out)
    assert ok, err
    assert os.path.exists(out)
    assert not os.path.exists(out + ".tmp")


def test_saver_async_and_csv(tmp_path):
    with AsyncSaver(str(tmp_path), async_save=True) as sv:
        for i in range(5):
            img = np.full((10, 10, 3), i * 40, np.uint8)
            sv.submit(SaveItem(img, str(tmp_path / f"f{i}.jpg"),
                               csv_row=[i, "0.0", "", "", "", 0, 0, 1, 1,
                                        f"f{i}.jpg", "", "1:1"]))
    assert len(sv.saved) == 5 and not sv.errors
    with open(tmp_path / "index.csv") as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == CSV_COLUMNS
    assert len(rows) == 6


def test_main_pass_produces_hits(tmp_path, synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg(str(tmp_path))
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(30, 120)], saver,
                            batch_size=8)
    reader.release()
    assert res.frames_decoded > 0
    assert len(res.hits) >= 5           # ~3s of face at min_gap 0.5s
    # crops written + csv rows match
    for h in res.hits:
        assert os.path.exists(h.path)
    with open(os.path.join(cfg.out_dir, "index.csv")) as fh:
        rows = list(csv.reader(fh))
    assert len(rows) == len(res.hits) + 1
    # min gap respected
    times = [h.time_secs for h in res.hits]
    assert all(b - a >= 0.5 - 1e-6 for a, b in zip(times, times[1:]))
    # all hits inside the span
    assert all(30 <= h.frame <= 120 for h in res.hits)
    # crop geometry sane and face contained horizontally
    for h in res.hits:
        x1, y1, x2, y2 = h.crop
        assert 0 <= x1 < x2 <= 320 and 0 <= y1 < y2 <= 240
        truth = synth.truth[h.frame][0].box
        assert x1 <= truth[0] + 2 and x2 >= truth[2] - 2


def test_main_pass_no_hits_for_wrong_identity(tmp_path, synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(2)])
    cfg = _cfg(str(tmp_path))
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(30, 120)], saver,
                            batch_size=8)
    reader.release()
    assert res.hits == []


def test_main_pass_empty_spans(tmp_path, synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg(str(tmp_path))
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [], saver)
    reader.release()
    assert res.hits == [] and res.frames_decoded == 0


def test_engine_end_to_end(tmp_path, synth):
    """Full Engine.run with oracle backend, prescan + main pass + cache."""
    from person_capture_tpu.pipeline.engine import Engine

    backend = OracleBackend(synth)
    cfg = _cfg(str(tmp_path), prescan_enable=True)
    cfg.video = synth.path
    cfg.prescan_stride = 6
    cfg.prescan_pad_sec = 0.2
    cfg.prescan_min_segment_sec = 0.5
    cfg.prescan_exit_cooldown_sec = 0.2

    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    msgs = []
    eng = Engine(cfg, backend, status=msgs.append)
    res = eng.run(bank=bank)
    assert res.ok, res.error
    assert len(res.spans) == 1
    s, e = res.spans[0]
    assert abs(s - 24) <= 6 and abs(e - 126) <= 12
    assert res.mainpass is not None and len(res.mainpass.hits) >= 5
    # second run hits the prescan cache
    bank2 = RefBank(cap=8)
    bank2.seed([backend.identity_feat(0)])
    eng2 = Engine(cfg, backend, status=msgs.append)
    res2 = eng2.run(bank=bank2)
    assert res2.ok and res2.prescan is None  # cached
    assert res2.spans == res.spans


def test_main_pass_analysis_downscale_matches_fullres(tmp_path, synth):
    """tpu_mainpass_analysis_max_w: the batch uploads host-downscaled, the
    detector works in downscaled coords, and the driver maps boxes back to
    full reader resolution — hit frames and crop boxes must match the
    full-res run (oracle emits coords in the submitted frame's space via
    its `scale`)."""
    # baseline: full-res analysis
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = _cfg(str(tmp_path / "a"))
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg.out_dir) as saver:
        base = run_main_pass(reader, backend, cfg, bank, [(30, 120)], saver,
                             batch_size=8)
    reader.release()

    # downscaled analysis: 320 → 160 wide (a_scale = 2); the oracle sees
    # 160-wide frames, so its coords halve — exactly a real detector's view
    backend2 = OracleBackend(synth, scale=0.5)
    bank2 = RefBank(cap=8)
    bank2.seed([backend2.identity_feat(0)])
    cfg2 = _cfg(str(tmp_path / "b"), tpu_mainpass_analysis_max_w=160)
    reader = Cv2Reader(synth.path)
    with AsyncSaver(cfg2.out_dir) as saver:
        down = run_main_pass(reader, backend2, cfg2, bank2, [(30, 120)],
                             saver, batch_size=8)
    reader.release()

    assert [h.frame for h in down.hits] == [h.frame for h in base.hits]
    assert down.hits, "downscaled analysis produced no hits"
    for hb, hd in zip(base.hits, down.hits):
        assert np.allclose(hb.crop, hd.crop, atol=2.0), (hb.crop, hd.crop)


def test_main_pass_resize_pool_worker_count_independent(tmp_path, synth):
    """tpu_resize_workers: frames pre-resized on a thread pool as they
    arrive must produce hits + crops identical to the inline downscale
    (per-frame cv2.resize is deterministic; only scheduling changes)."""
    results = []
    for sub, workers in (("w1", 1), ("w3", 3)):
        backend = OracleBackend(synth, scale=0.5)
        bank = RefBank(cap=8)
        bank.seed([backend.identity_feat(0)])
        cfg = _cfg(str(tmp_path / sub), tpu_mainpass_analysis_max_w=160,
                   tpu_resize_workers=workers)
        reader = Cv2Reader(synth.path)
        with AsyncSaver(cfg.out_dir) as saver:
            results.append(run_main_pass(reader, backend, cfg, bank,
                                         [(30, 120)], saver, batch_size=8))
        reader.release()
    inline, pooled = results
    assert pooled.hits and (
        [h.frame for h in pooled.hits] == [h.frame for h in inline.hits])
    for hi, hp in zip(inline.hits, pooled.hits):
        assert np.array_equal(hi.crop, hp.crop)
