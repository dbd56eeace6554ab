import numpy as np
import pytest

from person_capture_tpu.face_embedder import FaceEmbedder


class _StubBackend:
    embed_dim = 8
    max_faces = 2

    def extract_batch(self, frames, valid, frame_idxs=None):
        b = frames.shape[0]
        out = {
            "boxes": np.zeros((b, 2, 4), np.float32),
            "kps": np.zeros((b, 2, 5, 2), np.float32),
            "scores": np.zeros((b, 2), np.float32),
            "mask": np.zeros((b, 2), bool),
            "feats": np.zeros((b, 2, 8), np.float32),
            "quality": np.zeros((b, 2), np.float32),
        }
        # two faces, second higher quality
        out["boxes"][0, 0] = [10, 10, 50, 50]
        out["boxes"][0, 1] = [60, 10, 90, 40]
        out["mask"][0] = [True, True]
        out["quality"][0] = [100.0, 400.0]
        out["feats"][0, 0, 0] = 1.0
        out["feats"][0, 1, 1] = 1.0
        return out


def test_face_embedder_extract_sorted_by_quality():
    fe = FaceEmbedder(backend=_StubBackend())
    faces = fe.extract(np.zeros((100, 100, 3), np.uint8))
    assert len(faces) == 2
    assert faces[0]["quality"] == 400.0     # sorted desc
    assert faces[0]["bbox"].dtype == np.int32
    best = FaceEmbedder.best_face(faces)
    assert best["quality"] == 400.0
    assert FaceEmbedder.best_face([]) is None


def test_face_embedder_empty_frame():
    fe = FaceEmbedder(backend=_StubBackend())
    assert fe.extract(None) == []
    assert fe.extract(np.zeros((0, 0, 3), np.uint8)) == []
    fe.set_prescan_fast(True)  # API parity no-op


class _StubPersonBackend:
    conf = 0.35

    def detect_batch(self, frames, valid, frame_idxs=None):
        b = frames.shape[0]
        out = {"boxes": np.zeros((b, 2, 4), np.float32),
               "scores": np.zeros((b, 2), np.float32),
               "mask": np.zeros((b, 2), bool)}
        out["boxes"][0, 0] = [5, 5, 60, 95]
        out["scores"][0, 0] = 0.8
        out["mask"][0, 0] = True
        return out


def test_person_detector_facade():
    from person_capture_tpu.detectors import PersonDetector

    det = PersonDetector(backend=_StubPersonBackend())
    out = det.detect(np.zeros((100, 100, 3), np.uint8), conf=0.5)
    assert len(out) == 1
    assert out[0]["cls"] == 0
    assert out[0]["xyxy"] == [5.0, 5.0, 60.0, 95.0]
    assert det.detect(None) == []


class _StubReid:
    def extract(self, crops):
        return np.stack([np.full(4, 0.5, np.float32) for _ in crops])


def test_reid_embedder_facade():
    from person_capture_tpu.reid_embedder import ReIDEmbedder

    r = ReIDEmbedder(backend=_StubReid())
    feats = r.extract([np.zeros((10, 10, 3), np.uint8)] * 3)
    assert len(feats) == 3
    assert r.extract([]) == []
    assert r.extract([None]) == []


def test_lazy_backend_forwards_attribute_writes():
    from person_capture_tpu.pipeline.backends import LazyBackend

    class B:
        score_thresh = 0.5

        def extract_batch(self, *a, **k):
            return "out"

    built = {}

    def factory():
        built["b"] = B()
        return built["b"]

    lazy = LazyBackend(factory)
    lazy.score_thresh = 0.3            # write before build: stashed…
    assert "b" not in built            # …without triggering construction
    assert lazy.score_thresh == 0.3    # read of pending value, still lazy
    assert "b" not in built
    assert lazy.extract_batch() == "out"
    assert built["b"].score_thresh == 0.3   # applied at build
    lazy.score_thresh = 0.7            # write after build: forwarded
    assert built["b"].score_thresh == 0.7
