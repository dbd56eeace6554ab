import time, numpy as np
import jax
from person_capture_tpu.models.zoo import resolve_weights
from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend, YoloPersonBackend

b = ScrfdArcFaceBackend(det_size=640, score_thresh=0.3, max_faces=8,
                        scrfd_weights=resolve_weights("auto", "scrfd_2.5g"))
p = YoloPersonBackend(conf=0.35, weights=resolve_weights("auto", "yolov8n"))
rng = np.random.default_rng(0)
frames = rng.integers(0, 255, (16, 360, 640, 3), np.uint8)
dev = b.upload_shared(frames)
dev.block_until_ready()
jnp = b._jnp

def t(label, fn, n=10):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:24s} {(time.perf_counter()-t0)/n*1000:8.1f} ms/batch", flush=True)

t("face only (_fused_bgr)", lambda: b._fused_bgr(dev, jnp.float32(0.3)))
t("person only (_fused)", lambda: p._fused(dev, jnp.float32(0.35)))
combo = b._combined_with(p)
t("combined", lambda: combo(dev, jnp.float32(0.3), jnp.float32(0.35)))
