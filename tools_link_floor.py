"""Measure the tunneled link's raw floor: upload bandwidth, download
bandwidth, and dispatch RTT — then print the implied main-pass ceiling.

The main-pass batch uploads ``batch x analysis_w x analysis_h`` i420
(uint8, 1.5 B/px) and downloads a few-hundred-KB packed result. On
slow-relay days the upload alone can exceed the realtime budget
(batch 16 @ stride 2 covers 32 source frames = 1.33 s of 24 fps video),
so the achievable x-realtime is bounded by the LINK, not the device:

    ceiling_x = covered_video_seconds / max(upload_s, rtt_s, compute_s)

Run this next to a depressed bench capture to show whether the number
was the framework or the relay (CLAUDE.md: ~3x run-to-run variance).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _timed(fn, reps: int = 5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # one-time handshake off the books
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print(f"handshake+first download: {time.perf_counter() - t0:.1f}s",
          flush=True)

    # RTT: dispatch a trivial program and fetch its scalar result
    one = jax.device_put(np.ones((8, 8), np.float32))
    f = jax.jit(lambda x: (x @ x).sum())
    np.asarray(f(one))  # compile
    rtt, rtts = _timed(lambda: np.asarray(f(one)))
    print(f"dispatch+fetch RTT: median {rtt * 1e3:.0f} ms "
          f"(band {rtts[0]*1e3:.0f}-{rtts[-1]*1e3:.0f})", flush=True)

    # upload bandwidth at the main-pass batch size (16 x 640x360 i420)
    wire = np.random.default_rng(0).integers(
        0, 255, (16, 540, 640), np.uint8)  # 540 = 360*1.5 (i420 planes)
    up_mb = wire.nbytes / 1e6
    up, ups = _timed(
        lambda: jax.device_put(wire, dev).block_until_ready())
    print(f"upload {up_mb:.1f} MB: median {up:.2f}s "
          f"= {up_mb / up:.0f} MB/s "
          f"(band {up_mb/ups[-1]:.0f}-{up_mb/ups[0]:.0f})", flush=True)

    # download bandwidth at the HDR still size (8.3 MB bgr)
    g = jax.jit(lambda x: jnp.broadcast_to(
        x.astype(jnp.uint8), (1440, 1920, 3)))
    seed = jax.device_put(np.zeros((1, 1, 3), np.uint8))
    big = g(seed)
    big.block_until_ready()
    dn_mb = 1440 * 1920 * 3 / 1e6
    dn, dns = _timed(lambda: np.asarray(g(seed)))
    print(f"download {dn_mb:.1f} MB: median {dn:.2f}s "
          f"= {dn_mb / dn:.0f} MB/s "
          f"(band {dn_mb/dns[-1]:.0f}-{dn_mb/dns[0]:.0f})", flush=True)

    covered_s = 16 * 2 / 24.0          # batch 16, stride 2, 24 fps
    floor = max(up, rtt)
    print(f"implied mainpass ceiling at batch 16 @ w640: "
          f"{covered_s / floor:.2f}x-realtime "
          f"(covered {covered_s:.2f}s of video per batch; link floor "
          f"{floor:.2f}s/batch = max(upload, rtt); device compute and "
          f"host work pipeline behind it at depth>=2)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
