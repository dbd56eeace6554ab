"""Measure the decode pool's worker-scaling ceiling (VERDICT r4 #4).

The pool's job is to multiply IO/GIL-released decode across cores; the
question the auto-worker cap must answer is where the POOL's own
machinery (block claims, reorder buffer, per-block positioning) stops
scaling. Real cv2 decode releases the GIL and scales with cores — not
measurable on this 1-core image — so the rig uses sleep-based fake
readers (sleep = a GIL-released decode of fixed cost), which isolates
exactly the pool-overhead component the cap guards.

    python tools_bench_decodepool_workers.py [delay_ms]

Interpretation: near-linear sampled-f/s scaling at K workers means the
pool supports K cv2 decoders without self-limiting; the production cap
can then be cores-based, not pool-based.
"""

import sys
import time

from tests.test_decodepool import FakeReader, _walk_spans
from person_capture_tpu.video.decodepool import StripedDecodeReader


def measure(workers: int, delay: float, total: int = 600,
            stride: int = 1) -> float:
    spans = [(0, total - 1)]
    r = StripedDecodeReader(lambda: FakeReader(total, delay=delay),
                            spans, stride, workers=workers,
                            total_frames=total, block_samples=16)
    try:
        t0 = time.perf_counter()
        got = _walk_spans(r, spans, stride)
        dt = time.perf_counter() - t0
        expected = list(range(0, total, stride))
        assert got == expected, (
            f"pool dropped/duplicated samples: {len(got)} of "
            f"{len(expected)}")   # scaling numbers mean nothing otherwise
        return len(got) / dt
    finally:
        r.release()


def main():
    delay = (float(sys.argv[1]) if len(sys.argv) > 1 else 4.0) / 1e3
    base = None
    print(f"fake decode cost {delay * 1e3:.1f} ms/frame (GIL-released)")
    for w in (1, 2, 4, 6, 8, 12):
        rates = sorted(measure(w, delay) for _ in range(3))
        r = rates[1]
        if base is None:
            base = r
        print(f"workers={w:2d}  {r:8.1f} samples/s   "
              f"scaling x{r / base:5.2f}  (ideal x{w})")


if __name__ == "__main__":
    main()
