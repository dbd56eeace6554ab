import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline import cache as C
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.prescan import run_prescan
from person_capture_tpu.video.reader import Cv2Reader, SampledBatchIterator
from person_capture_tpu.video.synthetic import generate_video


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "t.mp4")
    sv = generate_video(path, width=160, height=120, fps=30.0,
                        total_frames=240,
                        segments=[(30, 90, 0), (150, 200, 0)])
    return sv


def _cfg(**kw):
    cfg = SessionConfig()
    cfg.prescan_stride = 6
    cfg.prescan_pad_sec = 0.2        # 6 frames
    cfg.prescan_min_segment_sec = 0.5
    cfg.prescan_bridge_gap_sec = 0.2
    cfg.prescan_exit_cooldown_sec = 0.2
    cfg.tpu_batch_frames = 8
    cfg.face_quality_min = 0.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _bank(backend, cap=16):
    bank = RefBank(cap=cap)
    bank.seed([backend.identity_feat(0)])
    return bank


def test_reader_and_batch_iterator(synth):
    r = Cv2Reader(synth.path)
    meta = r.meta()
    assert meta.total_frames == 240
    assert meta.fps == pytest.approx(30.0, rel=0.01)
    batches = list(SampledBatchIterator(r, stride=24, batch=4))
    r.release()
    idxs = np.concatenate([b[0][b[2]] for b in batches])
    assert idxs[0] == 0 and np.all(np.diff(idxs) == 24)
    assert batches[0][1].shape == (4, 120, 160, 3)


def test_reader_downscale(synth):
    r = Cv2Reader(synth.path, max_w=80)
    f = r.read()
    r.release()
    assert f.shape[1] == 80 and f.shape[0] == 60


def test_prescan_finds_spans(synth):
    backend = OracleBackend(synth)
    cfg = _cfg()
    reader = Cv2Reader(synth.path)
    res = run_prescan(reader, backend, cfg, _bank(backend))
    reader.release()
    assert len(res.spans) == 2
    (s1, e1), (s2, e2) = res.spans
    # ground truth 30..90 and 150..200, pad 6 frames, sampling stride 6
    assert abs(s1 - 24) <= 6 and abs(e1 - 96) <= 12
    assert abs(s2 - 144) <= 6 and abs(e2 - 206) <= 12
    assert res.samples == 40
    assert res.extracted + res.skipped == res.samples


def test_prescan_fd9_gate_skips_idle(tmp_path_factory):
    # With depth-1 pipelining the gate reacts at batch granularity, so it
    # engages only on idle stretches longer than ~2 batches of samples —
    # use a video with a long empty tail.
    path = str(tmp_path_factory.mktemp("vid9") / "t9.mp4")
    sv = generate_video(path, width=160, height=120, fps=30.0,
                        total_frames=600, segments=[(30, 90, 0)])
    backend = OracleBackend(sv)
    cfg = _cfg(prescan_fd9_skip=True, prescan_fd9_grace=1,
               prescan_fd9_probe_period=2)
    reader = Cv2Reader(path)
    res = run_prescan(reader, backend, cfg, _bank(backend))
    reader.release()
    assert res.skipped > 0
    assert len(res.spans) == 1

    # gate off: everything extracted
    reader = Cv2Reader(path)
    res2 = run_prescan(reader, backend, _cfg(prescan_fd9_skip=False),
                       _bank(backend))
    reader.release()
    assert res2.skipped == 0
    assert len(res2.spans) == 1


def test_prescan_grows_bank(synth):
    backend = OracleBackend(synth, noise=0.15)
    cfg = _cfg(prescan_fd_add=0.30, prescan_add_cooldown_samples=1)
    bank = _bank(backend)
    reader = Cv2Reader(synth.path)
    run_prescan(reader, backend, cfg, bank)
    reader.release()
    assert bank.size > 1


def test_prescan_no_match_when_wrong_identity(synth):
    backend = OracleBackend(synth)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(3)])  # identity not in the video
    reader = Cv2Reader(synth.path)
    res = run_prescan(reader, backend, _cfg(), bank)
    reader.release()
    assert res.spans == []


# ------------------------------ cache ---------------------------------------

def test_cache_roundtrip(tmp_path, synth):
    cfg = _cfg()
    cfg.out_dir = str(tmp_path)
    key = C.cache_key(cfg, synth.path, [], 30.0, 240)
    path = C.cache_path(cfg, key)
    bank = RefBank(cap=8)
    bank.seed([np.eye(16, dtype=np.float32)[0]])
    C.save_cache(path, [(10, 50)], bank, key)
    hit = C.load_cache(path, key, cfg)
    assert hit is not None
    spans, bank2 = hit
    assert spans == [(10, 50)]
    assert bank2.size == 1
    np.testing.assert_allclose(bank2.vectors[0], bank.vectors[0])


def test_cache_key_sensitivity(tmp_path, synth):
    cfg = _cfg()
    cfg.out_dir = str(tmp_path)
    k1 = C.cache_key(cfg, synth.path, [], 30.0, 240)
    cfg.prescan_stride = 12
    k2 = C.cache_key(cfg, synth.path, [], 30.0, 240)
    assert k1 != k2
    # HDR/export-only settings do NOT invalidate
    cfg.prescan_stride = 6
    cfg.hdr_sdr_quality = "fast"
    cfg.jpg_quality = 10
    k3 = C.cache_key(cfg, synth.path, [], 30.0, 240)
    assert k3 == k1


def test_get_or_run_modes(tmp_path, synth):
    cfg = _cfg(prescan_cache_mode="auto")
    cfg.out_dir = str(tmp_path)
    calls = []

    def run_fn():
        calls.append(1)
        b = RefBank(cap=4)
        b.seed([np.eye(8, dtype=np.float32)[0]])
        return [(1, 2)], b

    (spans, bank), hit = C.get_or_run(cfg, synth.path, [], 30.0, 240, run_fn)
    assert not hit and spans == [(1, 2)] and len(calls) == 1
    (spans2, _), hit2 = C.get_or_run(cfg, synth.path, [], 30.0, 240, run_fn)
    assert hit2 and spans2 == [(1, 2)] and len(calls) == 1
    cfg.prescan_cache_mode = "refresh"
    _, hit3 = C.get_or_run(cfg, synth.path, [], 30.0, 240, run_fn)
    assert not hit3 and len(calls) == 2
    cfg.prescan_cache_mode = "off"
    _, hit4 = C.get_or_run(cfg, synth.path, [], 30.0, 240, run_fn)
    assert not hit4 and len(calls) == 3


def test_prescan_seek_command_and_cache_skip(tmp_path):
    """Interactive seek inside the pre-scan jumps the scan position and
    marks the result perturbed (so the cache wrapper skips saving) —
    reference gui_app.py:1230-1415 + 5047-5058."""
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.prescan import run_prescan
    from person_capture_tpu.video.reader import open_reader
    from person_capture_tpu.video.synthetic import generate_video

    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=200, segments=[(0, 199, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.update(backend.identity_feat(0), 100.0)
    cfg = SessionConfig()
    cfg.prescan_stride = 10
    cfg.tpu_batch_frames = 4
    cfg.prescan_fd9_skip = False
    cfg.prescan_boundary_refine_sec = 0.0

    seeks = [120]  # fire once, then no more seeks

    def seek_request():
        return seeks.pop() if seeks else None

    reader = open_reader(vid)
    try:
        res = run_prescan(reader, backend, cfg, bank, batch_size=4,
                          seek_request=seek_request)
    finally:
        reader.release()
    assert res.perturbed
    sampled = sorted(res.per_sample_fd)
    # the scan jumped to 120: no samples in (0, 120) beyond the very first
    assert not [i for i in sampled if 10 <= i < 120]
    assert [i for i in sampled if i >= 120]


def test_pipeline_depth_does_not_change_results(tmp_path):
    """tpu_pipeline_depth hides round trips; spans, bank and per-sample
    fds must be identical at any depth (submission-ordered replay)."""
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank
    from person_capture_tpu.pipeline.backends import OracleBackend
    from person_capture_tpu.pipeline.prescan import run_prescan
    from person_capture_tpu.video.reader import Cv2Reader
    from person_capture_tpu.video.synthetic import generate_video

    path = str(tmp_path / "pd.mp4")
    sv = generate_video(path, width=160, height=120, fps=30.0,
                        total_frames=240, segments=[(30, 90, 0),
                                                    (150, 210, 0)])

    def run(depth):
        cfg = SessionConfig()
        cfg.prescan_stride = 6
        cfg.prescan_pad_sec = 0.2
        cfg.prescan_min_segment_sec = 0.5
        cfg.prescan_exit_cooldown_sec = 0.2
        cfg.tpu_batch_frames = 8
        cfg.face_quality_min = 0.0
        cfg.tpu_pipeline_depth = depth
        backend = OracleBackend(sv)
        bank = RefBank(cap=8)
        bank.seed([backend.identity_feat(0)])
        reader = Cv2Reader(path)
        res = run_prescan(reader, backend, cfg, bank,
                          reopen_reader=lambda: Cv2Reader(path))
        reader.release()
        return res

    a, b = run(1), run(3)
    assert a.spans == b.spans
    assert a.per_sample_fd == b.per_sample_fd
    assert a.extracted == b.extracted


def test_prescan_seek_closes_active_span(tmp_path):
    """A forward seek must not extend the active span across unseen video
    (SpanBuilder.interrupt on the seek path)."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=400, segments=[(0, 399, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    cfg = _cfg(prescan_pad_sec=0.0, prescan_bridge_gap_sec=0.0,
               prescan_min_segment_sec=0.2, prescan_fd9_skip=False,
               prescan_boundary_refine_sec=0.0)
    calls = [0]

    def seek_request():
        calls[0] += 1
        return 300 if calls[0] == 20 else None

    reader = Cv2Reader(vid)
    res = run_prescan(reader, backend, cfg, _bank(backend),
                      seek_request=seek_request)
    reader.release()
    assert res.perturbed
    assert len(res.spans) == 2
    (s1, e1), (s2, e2) = res.spans
    assert e1 < 150 and s2 >= 294  # nothing claims the unseen 150..294 gap


def test_prescan_backward_seek_rescans_cleanly(tmp_path):
    """A backward seek re-feeds earlier samples; the final span list must
    come back sorted and merged, not duplicated."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=400, segments=[(0, 150, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    cfg = _cfg(prescan_pad_sec=0.0, prescan_bridge_gap_sec=0.0,
               prescan_min_segment_sec=0.2, prescan_fd9_skip=False,
               prescan_boundary_refine_sec=0.0)
    calls = [0]

    def seek_request():
        calls[0] += 1
        return 60 if calls[0] == 40 else None  # past the span -> back inside

    reader = Cv2Reader(vid)
    res = run_prescan(reader, backend, cfg, _bank(backend),
                      seek_request=seek_request)
    reader.release()
    assert res.perturbed
    assert res.spans == sorted(res.spans)
    for (a, b), (c, d) in zip(res.spans, res.spans[1:]):
        assert b < c  # non-overlapping
    assert len(res.spans) == 1
    s, e = res.spans[0]
    assert s <= 6 and abs(e - 150) <= 12


class _RecordingBackend:
    """Wraps a backend and records every extract_batch batch size."""

    def __init__(self, inner):
        self.inner = inner
        self.batch_sizes = []

    def identity_feat(self, i):
        return self.inner.identity_feat(i)

    def extract_batch(self, frames, valid, frame_idxs=None):
        self.batch_sizes.append(int(frames.shape[0]))
        return self.inner.extract_batch(frames, valid, frame_idxs)


def test_prescan_gate_probes_use_microbatch(tmp_path):
    """Inside a long no-face stretch, gate probes switch to a batch-1
    dispatch (full-batch padding would upload batch x the bytes per probe)."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=900, segments=[(0, 60, 0)],
                        moving=False)
    backend = _RecordingBackend(OracleBackend(sv))
    cfg = _cfg(prescan_fd9_skip=True, prescan_fd9_grace=1,
               prescan_fd9_probe_period=2, prescan_boundary_refine_sec=0.0)
    reader = Cv2Reader(vid)
    res = run_prescan(reader, backend, cfg, _bank(backend))
    reader.release()
    assert res.skipped > 0
    assert len(res.spans) == 1
    assert 1 in backend.batch_sizes  # probes dispatched alone
    # the first few probes still ride the already-compiled full batch
    assert backend.batch_sizes.count(1) >= 5


def test_prescan_abort_marks_perturbed(tmp_path):
    """A stop() mid-scan must flag the result so the cache wrapper never
    saves the truncated spans (reference refuses the save on abort)."""
    vid = str(tmp_path / "v.mp4")
    sv = generate_video(vid, total_frames=300, segments=[(0, 299, 0)],
                        moving=False)
    backend = OracleBackend(sv)
    calls = [0]

    def should_stop():
        calls[0] += 1
        return calls[0] > 10

    reader = Cv2Reader(vid)
    res = run_prescan(reader, backend, _cfg(prescan_fd9_skip=False),
                      _bank(backend), should_stop=should_stop)
    reader.release()
    assert res.perturbed  # truncated scan -> never cached


def test_cache_mode_reuse_loads(tmp_path):
    from person_capture_tpu.pipeline import cache as C

    cfg = _cfg(prescan_cache_mode="auto")
    cfg.out_dir = str(tmp_path)
    calls = []

    def run_fn():
        calls.append(1)
        b = RefBank(cap=4)
        b.seed([np.eye(8, dtype=np.float32)[0]])
        return [(3, 9)], b

    C.get_or_run(cfg, str(tmp_path / "x.mp4"), [], 30.0, 100, run_fn)
    cfg.prescan_cache_mode = "reuse"   # reference-accepted load mode
    (spans, _), hit = C.get_or_run(cfg, str(tmp_path / "x.mp4"), [], 30.0,
                                   100, run_fn)
    assert hit and spans == [(3, 9)] and len(calls) == 1


def test_cache_key_covers_embedding_family(tmp_path):
    from person_capture_tpu.pipeline import cache as C

    cfg = _cfg()
    cfg.out_dir = str(tmp_path)
    k1 = C.cache_key(cfg, "v.mp4", [], 30.0, 100)
    cfg.use_arcface = False
    k2 = C.cache_key(cfg, "v.mp4", [], 30.0, 100)
    assert k1 != k2  # a CLIP bank must never replay into an ArcFace run


def test_cache_extra_key_discriminates(tmp_path):
    from person_capture_tpu.pipeline import cache as C

    cfg = _cfg()
    cfg.out_dir = str(tmp_path)
    k1 = C.cache_key(cfg, "v.mp4", [], 30.0, 100, extra="Scrfd:640:512")
    k2 = C.cache_key(cfg, "v.mp4", [], 30.0, 100, extra="Scrfd:320:512")
    k3 = C.cache_key(cfg, "v.mp4", [], 30.0, 100, extra="Scrfd:640:256")
    assert len({k1, k2, k3}) == 3
