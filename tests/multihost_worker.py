"""One process of the multi-process CPU cluster for tests/test_multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Forces a 2-device CPU platform, joins the jax.distributed runtime, runs
the sharded pre-scan step over the GLOBAL mesh (2 processes × 2 local
devices = data:4), and prints the replicated outputs as one JSON line for
the parent test to compare across processes and against a single-process
run. Deterministic: params init from PRNGKey(0) on CPU in every process.
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                               "--xla_backend_optimization_level=0")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from person_capture_tpu.parallel import multihost as MH

    MH.initialize(coordinator=f"127.0.0.1:{port}", num_processes=nprocs,
                  process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert MH.is_multiprocess()
    assert MH.is_primary() == (pid == 0)

    import jax.numpy as jnp
    import numpy as np

    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.parallel.mesh import (build_sharded_prescan_step,
                                                  make_mesh)

    mesh = make_mesh("data:4")
    run = build_sharded_prescan_step(
        mesh, scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY, det_size=64,
        max_faces=2, dtype=jnp.float32, seed=0)

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    bank = np.zeros((2, AF.TINY.embed_dim), np.float32)
    bank[0, 0] = 1.0
    bank_mask = np.array([True, False])

    out = run(frames, bank, bank_mask, score_thresh=0.5)
    res = {k: np.round(MH.to_host(out[k]).astype(np.float64), 5).tolist()
           for k in ("best_fd", "quality", "scores")}
    MH.barrier("done")
    print("MHRESULT " + json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
