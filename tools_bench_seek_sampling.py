"""Measure prescan sampling decode rate: grab-drain vs keyframe-gated seek.

Generates a 1080p synthetic mp4 (cv2 writer => ~GOP-12 mp4v), then walks
the prescan sampling pattern (read 1, skip stride-1) both ways and
reports effective source-frames-covered/sec. The seek path should
approach drain_rate * stride/GOP-ish gains whenever GOP < stride.

    python tools_bench_seek_sampling.py [stride]
"""

import sys
import tempfile
import time

from person_capture_tpu.video.keyframes import read_keyframes
from person_capture_tpu.video.reader import Cv2Reader, KeyframeSkipReader
from person_capture_tpu.video.synthetic import generate_video


def walk(reader, stride, total):
    t0 = time.perf_counter()
    covered = 0
    while True:
        f = reader.read()
        if f is None:
            break
        got = reader.skip(stride - 1)
        covered += 1 + got
        if got < stride - 1:
            break
    return covered, time.perf_counter() - t0


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    codec = sys.argv[2] if len(sys.argv) > 2 else "mp4v"
    total = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    with tempfile.TemporaryDirectory() as td:
        ext = "webm" if codec == "vp90" else "mp4"
        path = f"{td}/bench1080.{ext}"
        print(f"encoding {total}f 1080p {codec}...", flush=True)
        generate_video(path, width=1920, height=1080, fps=24,
                       total_frames=total, segments=[(0, total - 1, 0)],
                       moving=True, seed=0, fourcc=codec)
        kfs = read_keyframes(path, 24.0, total)
        gops = [b - a for a, b in zip(kfs, kfs[1:])]
        med_gop = sorted(gops)[len(gops) // 2] if gops else 0
        print(f"keyframes={len(kfs)} median_gop={med_gop} stride={stride}")

        for label, mode in (("grab-drain", None), ("force-seek", "seek"),
                            ("auto-probe", "auto")):
            rates = []
            for _ in range(3):
                r = Cv2Reader(path, max_w=384)
                if mode is not None:
                    r = KeyframeSkipReader(r, kfs, total_frames=total,
                                           mode=mode)
                covered, dt = walk(r, stride, total)
                r.release()
                rates.append(covered / dt)
            rates.sort()
            extra = (f" seeks={r.seeks} locked={r.mode}"
                     if mode is not None else "")
            print(f"{label:12s} {rates[1]:8.1f} src f/s "
                  f"(runs {[round(x, 1) for x in rates]}){extra}")


if __name__ == "__main__":
    main()
