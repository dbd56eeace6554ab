import numpy as np
import pytest

from person_capture_tpu.core.bank import FD_NONE, RefBank, fd_min, fd_min_batch_jnp
from person_capture_tpu.core.spans import (Fd9SkipGate, SpanBuilder,
                                           SpanBuilderConfig, bridge_gaps,
                                           span_index_for)


def _cfg(**kw):
    base = dict(fps=30.0, stride=24, enter=0.45, exit=0.52,
                exit_cooldown_sec=0.5, pad_sec=0.0, min_segment_sec=0.0,
                bridge_gap_sec=0.0, total_frames=10_000)
    base.update(kw)
    return SpanBuilderConfig(**base)


def test_span_open_close_basic():
    sb = SpanBuilder(_cfg())
    # matching samples at stride 24
    for i in range(0, 240, 24):
        sb.update(i, 0.2)
    # one bad sample closes it (24 * 1 >= 15 frame cooldown)
    sb.update(240, 0.9)
    spans = sb.finish()
    assert spans == [(0, 240)]


def test_span_exit_requires_cooldown_or_exit_threshold():
    # cooldown of 2s = 60 frames; stride 24 -> needs 3 consecutive misses
    sb = SpanBuilder(_cfg(exit_cooldown_sec=2.0, exit=0.95))
    seq = [(0, 0.2), (24, 0.2), (48, 0.5), (72, 0.2), (96, 0.5), (120, 0.5), (144, 0.5)]
    for f, fd in seq:
        sb.update(f, fd)
    spans = sb.finish()
    # mid-span single misses (0.5 < exit 0.95) don't close; the final run of 3 does
    assert spans == [(0, 144)]


def test_span_immediate_exit_on_exit_threshold():
    sb = SpanBuilder(_cfg(exit_cooldown_sec=100.0))
    sb.update(0, 0.2)
    sb.update(24, 0.8)  # >= exit 0.52 closes immediately
    spans = sb.finish()
    assert spans == [(0, 24)]


def test_span_pad_and_min_len():
    sb = SpanBuilder(_cfg(pad_sec=1.0, min_segment_sec=3.0))  # pad 30, min 90
    sb.update(100, 0.2)
    sb.update(124, 0.9)  # span 100..124 -> padded 70..154 -> len 85 < 90: dropped
    assert sb.finish() == []

    sb = SpanBuilder(_cfg(pad_sec=1.0, min_segment_sec=2.0))  # min 60
    sb.update(100, 0.2)
    sb.update(124, 0.9)
    assert sb.finish() == [(70, 154)]


def test_span_open_at_eof():
    sb = SpanBuilder(_cfg(total_frames=200))
    sb.update(150, 0.2)
    assert sb.finish() == [(150, 199)]


def test_span_merge_adjacent_after_pad():
    sb = SpanBuilder(_cfg(pad_sec=1.0))  # pad 30
    sb.update(0, 0.2)
    sb.update(24, 0.9)     # span (0, 54)
    sb.update(72, 0.2)
    sb.update(96, 0.9)     # raw (72,96) padded (42,126) overlaps -> merged
    assert sb.finish() == [(0, 126)]


def test_bridge_gaps():
    spans = [(0, 100), (130, 200), (400, 500)]
    # gap 30 frames <= 1s * 30fps: first two merge
    assert bridge_gaps(spans, 1.0, 30.0) == [(0, 200), (400, 500)]
    assert bridge_gaps(spans, 0.0, 30.0) == spans


def test_span_index_for():
    spans = [(10, 20), (30, 40)]
    assert span_index_for(15, spans) == 0
    assert span_index_for(25, spans) == 1
    assert span_index_for(50, spans) is None


def test_fd9_gate():
    g = Fd9SkipGate(grace=1, probe_period=2)
    assert not g.should_skip(span_active=False)  # streak 0 < anything? grace=1, streak 0
    g.observe(9.0)  # streak 1
    assert g.should_skip(False)       # 1 % 2 != 0 -> skip
    g.observe(9.0)  # streak 2
    assert not g.should_skip(False)   # 2 % 2 == 0 -> probe
    g.observe(0.2)  # match resets
    assert g.streak == 0
    assert not g.should_skip(True)    # never skip while active


# --------------------------- bank ---------------------------------------

def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_fd_min():
    bank = np.stack([_unit([1, 0, 0]), _unit([0, 1, 0])])
    assert fd_min(_unit([1, 0, 0]), bank) == pytest.approx(0.0, abs=1e-6)
    assert fd_min(None, bank) == FD_NONE
    assert fd_min(_unit([1, 0, 0]), None) == FD_NONE


def test_bank_add_and_dedup():
    b = RefBank(cap=4)
    assert b.update(_unit([1, 0, 0, 0]))[0] == "added"
    assert b.update(_unit([1, 0.01, 0, 0]))[0] == "dup"      # cos ~1 >= 0.968
    assert b.update(_unit([0, 1, 0, 0]))[0] == "added"
    assert b.update(None)[0] == "skip"
    assert b.update(np.zeros(4))[0] == "skip"
    assert b.size == 2


def test_bank_replacement_when_full():
    b = RefBank(cap=2, dedup_cos=0.999, replace_margin=0.0,
                weights=(1.0, 0.0, 0.0))
    anchor = _unit([1, 0, 0, 0])
    b.seed([anchor])
    # far-from-anchor member
    far = _unit([0, 1, 0, 0])
    assert b.update(far)[0] == "added"
    assert b.size == 2
    # candidate closer to anchor than `far` should replace it
    close = _unit([1, 0.3, 0, 0])
    action, idx = b.update(close)
    assert action == "replaced" and idx == 1
    # a worse candidate is skipped
    worse = _unit([0, 0, 1, 0])
    assert b.update(worse)[0] == "skip"


def test_bank_padded_view():
    b = RefBank(cap=8)
    b.seed([_unit([1, 0, 0, 0]), _unit([0, 1, 0, 0])])
    mat, mask = b.padded()
    assert mat.shape == (8, 4) and mask.sum() == 2
    assert np.all(mat[2:] == 0)


def test_fd_min_batch_jnp_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b = RefBank(cap=8)
    for _ in range(3):
        b.update(rng.normal(size=512).astype(np.float32))
    bank, bank_mask = b.padded()

    feats = rng.normal(size=(4, 3, 512)).astype(np.float32)
    mask = np.ones((4, 3), bool)
    mask[2, 1:] = False  # frame 2 has 1 face
    mask[3, :] = False   # frame 3 empty

    per_face, best = fd_min_batch_jnp(
        jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(bank), jnp.asarray(bank_mask))
    per_face, best = np.asarray(per_face), np.asarray(best)

    host_mat = b.matrix()
    for i in range(4):
        fds = [fd_min(feats[i, j], host_mat) if mask[i, j] else FD_NONE
               for j in range(3)]
        np.testing.assert_allclose(per_face[i], fds, atol=5e-4)
        assert best[i] == pytest.approx(min(fds), abs=5e-4)
    assert best[3] == FD_NONE


def test_fd_min_batch_jnp_empty_bank():
    import jax.numpy as jnp

    bank = np.zeros((4, 16), np.float32)
    bank_mask = np.zeros(4, bool)
    feats = np.ones((2, 2, 16), np.float32)
    mask = np.ones((2, 2), bool)
    _, best = fd_min_batch_jnp(jnp.asarray(feats), jnp.asarray(mask),
                               jnp.asarray(bank), jnp.asarray(bank_mask))
    assert np.all(np.asarray(best) == FD_NONE)


def test_spanbuilder_interrupt_closes_active_span():
    sb = SpanBuilder(_cfg(stride=1, exit_cooldown_sec=0.1, total_frames=1000))
    for i in range(100, 110):
        sb.update(i, 0.2)
    assert sb.active
    sb.interrupt(109)
    assert not sb.active and sb.neg_run == 0
    assert sb.spans == [(100, 109)]
    # resuming far away opens a NEW span instead of extending the old one
    for i in range(500, 510):
        sb.update(i, 0.2)
    spans = sb.finish()
    assert spans[0] == (100, 109) and spans[1][0] == 500


def test_spanbuilder_interrupt_inactive_is_noop():
    sb = SpanBuilder(_cfg(stride=1))
    sb.update(5, 9.0)
    sb.interrupt(5)
    assert sb.finish() == []


def test_spanbuilder_finish_sorts_out_of_order_spans():
    # a backward seek feeds an earlier region after a later one
    sb = SpanBuilder(_cfg(stride=1, exit_cooldown_sec=0.05, total_frames=1000))
    for i in range(600, 650):
        sb.update(i, 0.2)
    sb.interrupt(649)
    for i in range(100, 150):
        sb.update(i, 0.2)
    sb.interrupt(149)
    spans = sb.finish()
    assert spans == [(100, 149), (600, 649)]
    # overlapping re-scan of the same region merges instead of duplicating
    sb2 = SpanBuilder(_cfg(stride=1, exit_cooldown_sec=0.05, total_frames=1000))
    for i in range(100, 160):
        sb2.update(i, 0.2)
    sb2.interrupt(159)
    for i in range(120, 180):
        sb2.update(i, 0.2)
    sb2.interrupt(179)
    assert sb2.finish() == [(100, 179)]


def test_bank_matrix_cache_invalidation():
    e = np.eye(8, dtype=np.float32)
    b = RefBank(cap=2)
    b.seed([e[0]])
    m1 = b.matrix()
    assert b.matrix() is m1  # cached between mutations
    b.update(e[1], 10.0)
    assert b.matrix().shape[0] == 2
    # in-place replacement at capacity must also refresh the cache
    v = e[0] * 0.9 + e[2] * np.sqrt(1.0 - 0.81)
    v = (v / np.linalg.norm(v)).astype(np.float32)
    action, idx = b.update(v, 10.0)
    assert action == "replaced"
    assert b.fd(v) == pytest.approx(0.0, abs=1e-6)
    assert b.fd(e[1]) > 0.5  # the replaced row is really gone from matrix()


def test_spans_unknown_stream_length():
    # total_frames <= 0 = unknown length (cv2 can't always count frames):
    # spans must still form — the old total-1 clamp dropped every span
    sb = SpanBuilder(_cfg(stride=1, exit_cooldown_sec=0.05, total_frames=0,
                          min_segment_sec=0.1))
    for i in range(100, 140):
        sb.update(i, 0.2)
    for i in range(140, 146):
        sb.update(i, 9.0)
    spans = sb.finish(last_idx=145)
    assert len(spans) == 1
    s, e = spans[0]
    assert s == 100 and 139 <= e <= 145
    # open span at EOF closes at the last scanned index
    sb2 = SpanBuilder(_cfg(stride=1, total_frames=0, min_segment_sec=0.1))
    for i in range(50, 90):
        sb2.update(i, 0.2)
    assert sb2.finish(last_idx=89) == [(50, 89)]


def test_span_close_reports_event():
    sb = SpanBuilder(_cfg(stride=24, exit_cooldown_sec=0.5))
    assert not sb.update(0, 0.2)      # open
    assert not sb.update(24, 0.2)
    assert sb.update(48, 9.0)         # one miss covers the cooldown: close
    assert not sb.update(72, 9.0)     # already closed
