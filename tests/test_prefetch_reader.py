import numpy as np
import pytest

from person_capture_tpu.video.reader import Cv2Reader, StridedPrefetchReader
from person_capture_tpu.video.synthetic import generate_video


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "pf.mp4")
    # frame index encoded in pixel brightness via segments? use noise seed
    return generate_video(path, width=64, height=48, fps=30.0,
                          total_frames=120, segments=[])


def _collect(reader, stride, n):
    out = []
    for _ in range(n):
        f = reader.read()
        if f is None:
            break
        out.append((reader.pos - 1, f.copy()))
        reader.skip(stride - 1)
    return out


def test_prefetch_matches_direct(synth):
    direct = Cv2Reader(synth.path)
    ref = _collect(direct, 6, 15)
    direct.release()

    pf = StridedPrefetchReader(Cv2Reader(synth.path), stride=6)
    got = _collect(pf, 6, 15)
    pf.release()

    assert len(got) == len(ref)
    for (ia, fa), (ib, fb) in zip(ref, got):
        assert ia == ib
        np.testing.assert_array_equal(fa, fb)


def test_prefetch_seek(synth):
    pf = StridedPrefetchReader(Cv2Reader(synth.path), stride=6)
    pf.read()
    pf.skip(5)
    pf.seek(60)
    f = pf.read()
    assert f is not None
    assert pf.pos == 61
    direct = Cv2Reader(synth.path)
    direct.seek(60)
    np.testing.assert_array_equal(f, direct.read())
    direct.release()
    pf.release()


def test_prefetch_non_stride_skip(synth):
    pf = StridedPrefetchReader(Cv2Reader(synth.path), stride=6)
    pf.read()           # frame 0
    pf.skip(11)         # non-stride skip (like the fd9 gate)
    f = pf.read()       # frame 12
    pf.release()
    direct = Cv2Reader(synth.path)
    direct.seek(12)
    np.testing.assert_array_equal(f, direct.read())
    direct.release()


def test_prefetch_eof(synth):
    pf = StridedPrefetchReader(Cv2Reader(synth.path), stride=30)
    frames = _collect(pf, 30, 20)
    pf.release()
    assert 3 <= len(frames) <= 5  # 120 frames / 30 stride
