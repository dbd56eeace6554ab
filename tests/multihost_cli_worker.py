"""One process of the 2-process CLI cluster for tests/test_multihost.py.

Usage: python multihost_cli_worker.py <pid> <nprocs> <port> <video> <ref> <out>

Drives the REAL CLI entry (person_capture_tpu.main.main) with --multihost
over a global data:4 mesh (2 processes × 2 forced CPU devices). The
parent asserts the primary's index.csv has truth-span hits and that the
secondary's scratch replay produced the IDENTICAL hit list — the
determinism the multi-host design rests on (parallel/multihost.py).
"""

import os
import sys


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    video, ref, out = sys.argv[4], sys.argv[5], sys.argv[6]
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                               "--xla_backend_optimization_level=0")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from person_capture_tpu.main import main as cli_main

    rc = cli_main([
        "--video", video, "--ref", ref, "--out", out,
        "--device", "cpu",
        "--multihost", "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nprocs), "--process-id", str(pid),
        "--mesh", "data:4",
        "--face-model", "scrfd_tiny", "--arcface-model", "arcface_tiny",
        "--det-size", "128", "--batch", "8", "--compute-dtype", "float32",
        "--face-thresh", "0.9", "--face-det-conf", "0.45",
        "--set", "prescan_enable=false",
        "--set", "min_gap_sec=0.0",
        "--set", "min_box_pixels=400",
        "--set", "face_quality_min=0.0",
        "--set", "min_sharpness=0.0",
        "--set", "curate_enable=false",
        "--set", "prescan_cache_mode=off",
        "--set", "compose_crop_enable=false",
        "--set", "smart_crop_enable=false",
    ])
    print(f"CLIRC {rc}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
