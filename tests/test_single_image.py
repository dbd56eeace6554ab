import numpy as np

from person_capture_tpu.pipeline.backends import extract_single_image


class _EchoBackend:
    """Reports one face at a fixed canvas position, so the coordinate
    back-mapping is directly checkable."""

    def extract_batch(self, frames, valid, frame_idxs=None):
        b = frames.shape[0]
        out = {"boxes": np.zeros((b, 1, 4), np.float32),
               "kps": np.zeros((b, 1, 5, 2), np.float32),
               "scores": np.full((b, 1), 0.9, np.float32),
               "mask": np.ones((b, 1), bool),
               "feats": np.zeros((b, 1, 4), np.float32),
               "quality": np.full((b, 1), 100.0, np.float32)}
        out["boxes"][:, 0] = [64, 64, 128, 128]
        out["kps"][:, 0] = 96.0
        return out


def test_extract_single_image_maps_coordinates_back():
    backend = _EchoBackend()
    # 1280-wide image downscales 2x onto the 640 canvas
    img = np.zeros((960, 1280, 3), np.uint8)
    out = extract_single_image(backend, img, canvas=640)
    np.testing.assert_allclose(out["boxes"][0, 0], [128, 128, 256, 256])
    np.testing.assert_allclose(out["kps"][0, 0], 192.0)

    # small image: no scaling, coordinates unchanged
    small = np.zeros((200, 300, 3), np.uint8)
    out2 = extract_single_image(backend, small, canvas=640)
    np.testing.assert_allclose(out2["boxes"][0, 0], [64, 64, 128, 128])