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

import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow

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


def test_two_process_cli_end_to_end(tmp_path):
    """The REAL CLI entry under --multihost: a 2-process cluster runs the
    whole pipeline over a global data:4 mesh. The primary writes the real
    out dir; the secondary's scratch replay must produce the IDENTICAL
    hit list (deterministic host replay over replicated step outputs)."""
    import csv

    import cv2
    import pytest

    from person_capture_tpu.models.zoo import bundled_weights_path
    from person_capture_tpu.video.synthetic import (FacePlacement,
                                                    draw_face,
                                                    generate_video)

    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")

    vid = str(tmp_path / "m.mp4")
    generate_video(vid, width=128, height=128, fps=30.0, total_frames=40,
                   segments=[(8, 28, 0)], moving=False)
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)
    out_dir = str(tmp_path / "out")

    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_cli_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port),
                          vid, ref_path, out_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    for p in procs:
        try:
            so, se = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"CLI worker failed:\n{so[-4000:]}\n{se[-4000:]}"
        assert "CLIRC 0" in so

    def hit_frames(index_path):
        with open(index_path) as fh:
            return sorted(int(r["frame"]) for r in csv.DictReader(fh))

    primary = hit_frames(os.path.join(out_dir, "index.csv"))
    secondary = hit_frames(os.path.join(out_dir, ".proc1", "index.csv"))
    assert primary, "multihost CLI produced no hits"
    in_span = [f for f in primary if 8 <= f <= 28]
    assert len(in_span) >= max(2, len(primary) // 2)
    assert primary == secondary


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
