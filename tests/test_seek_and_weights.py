import numpy as np
import pytest

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.core.bank import RefBank
from person_capture_tpu.pipeline.backends import OracleBackend
from person_capture_tpu.pipeline.mainpass import run_main_pass
from person_capture_tpu.pipeline.saver import AsyncSaver
from person_capture_tpu.video.reader import Cv2Reader
from person_capture_tpu.video.synthetic import generate_video


def test_seek_request_jumps_forward(tmp_path):
    sv = generate_video(str(tmp_path / "v.mp4"), width=160, height=120,
                        fps=30.0, total_frames=200,
                        segments=[(10, 190, 0)])
    backend = OracleBackend(sv)
    bank = RefBank(cap=8)
    bank.seed([backend.identity_feat(0)])
    cfg = SessionConfig()
    cfg.out_dir = str(tmp_path / "out")
    cfg.frame_stride = 4
    cfg.min_gap_sec = 0.2
    cfg.tpu_batch_frames = 8
    cfg.min_box_pixels = 50
    cfg.face_quality_min = 0.0
    cfg.min_sharpness = 0.0

    polls = {"n": 0}

    def seek_request():
        # fire one forward seek on the 10th poll (~frame 46 at stride 4)
        polls["n"] += 1
        if polls["n"] == 10:
            return 120
        return None

    reader = Cv2Reader(sv.path)
    with AsyncSaver(cfg.out_dir) as saver:
        res = run_main_pass(reader, backend, cfg, bank, [(10, 190)], saver,
                            batch_size=8, seek_request=seek_request)
    reader.release()
    frames = [h.frame for h in res.hits]
    # frames processed skip the seeked-over region (decode gap)
    decoded_region = set()
    # the seek fired after the first batch; there must be hits before ~50
    # and after 120, with a gap in between (nothing in [64, 119])
    assert any(f < 60 for f in frames)
    assert any(f >= 120 for f in frames)


def test_weights_npz_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.tools.weights import (load_npz_variables,
                                                  save_npz_variables)

    model, variables = SD.init_scrfd(jax.random.PRNGKey(0), SD.TINY, size=32)
    p = str(tmp_path / "w.npz")
    save_npz_variables(p, variables)
    loaded = load_npz_variables(p)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out_a = model.apply(variables, x)
    out_b = model.apply(loaded, x)
    for (ca, ba, ka), (cb, bb, kb) in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb), atol=1e-6)

def test_resolve_weights_rejects_non_flax_npz(tmp_path):
    # a convert_weights-style dump (src/ keys) must fail loudly at load
    # time, not as an opaque missing-parameter error inside jit
    import numpy as np
    import pytest

    from person_capture_tpu.models.zoo import resolve_weights

    bad = str(tmp_path / "torchdump.npz")
    np.savez(bad, **{"src/backbone.conv.weight": np.zeros((3, 3))})
    with pytest.raises(ValueError, match="flax-variables"):
        resolve_weights(bad, "scrfd_2.5g")


def test_det_size_divisibility_validated():
    import jax
    import pytest

    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.models import yolov8 as YV

    with pytest.raises(ValueError, match="multiple of 32"):
        SD.init_scrfd(jax.random.PRNGKey(0), SD.TINY, size=100)
    with pytest.raises(ValueError, match="multiple of 32"):
        YV.init_yolo(jax.random.PRNGKey(0), YV.TINY, size=100)
