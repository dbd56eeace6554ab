"""Multi-host (multi-process) execution tests.

The reference has no distributed runtime (SURVEY.md §2.3); the rebuild's
multi-host layer (parallel/multihost.py) is new architecture. These tests
run a REAL 2-process jax.distributed CPU cluster (Gloo collectives over
localhost) and assert the sharded pre-scan step produces identical,
fully-replicated results on every process, matching a single-process run.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same step on this process's CPU mesh (float32, same seed)."""
    import jax.numpy as jnp

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
    return {k: np.asarray(out[k], np.float64)
            for k in ("best_fd", "quality", "scores")}


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
        lines = [ln for ln in so.splitlines() if ln.startswith("MHRESULT ")]
        assert lines, f"no MHRESULT line:\n{so}\n{se}"
        outs.append(json.loads(lines[0][len("MHRESULT "):]))

    # every process sees the SAME fully-replicated result
    assert outs[0] == outs[1]

    ref = _single_process_reference()
    for k in ("best_fd", "quality", "scores"):
        got = np.asarray(outs[0][k], np.float64)
        assert got.shape == ref[k].shape
        np.testing.assert_allclose(got, ref[k], atol=2e-4, rtol=1e-3)


def test_helpers_single_process_passthrough():
    """Single-process: every multihost helper degrades to the local path."""
    import jax

    from person_capture_tpu.parallel import multihost as MH
    from person_capture_tpu.parallel.mesh import make_mesh

    assert MH.process_count() == 1
    assert MH.is_primary()
    assert not MH.is_multiprocess()
    mesh = make_mesh("data:4")
    arr = np.arange(8, dtype=np.float32)
    assert MH.make_global_batch(mesh, arr) is arr
    assert MH.make_replicated(mesh, arr) is arr
    MH.barrier("noop")

    dev = jax.device_put(arr)
    np.testing.assert_array_equal(MH.to_host(dev), arr)
    np.testing.assert_array_equal(MH.to_host(arr), arr)


def test_to_host_handles_sharded_local_arrays():
    """A data-sharded (but fully addressable) array downloads whole; the
    partitioned-multi-process rejection branch is covered in the worker
    (to_host on replicated outputs) — here we pin the local semantics."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from person_capture_tpu.parallel import multihost as MH
    from person_capture_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("data:4")
    x = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(MH.to_host(x), np.arange(8.0))
