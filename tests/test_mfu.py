"""FLOP accounting / MFU reporting (utils/mfu.py) — VERDICT r4 #2.

On the CPU test mesh ``mfu`` is None (no TPU peak), but the cost model,
amortized timing, and report plumbing are fully exercised; bench.py uses
the same entry points on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from person_capture_tpu.utils import mfu as M


def test_program_cost_counts_matmul_flops():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64), jnp.float32)
    cost = M.program_cost(f, x)
    # 64^3 MACs = 2*64^3 flops = 524288; XLA's model counts exactly that
    assert cost["flops"] == 2 * 64 ** 3
    assert cost["bytes_accessed"] > 0


def test_chip_peak_lookup():
    class FakeDev:
        platform = "tpu"
        device_kind = "TPU v5 lite"

    assert M.chip_peak_tflops(FakeDev()) == 197.0
    FakeDev.device_kind = "TPU v4"
    assert M.chip_peak_tflops(FakeDev()) == 275.0
    FakeDev.platform = "cpu"
    assert M.chip_peak_tflops(FakeDev()) is None
    FakeDev.platform = "tpu"
    FakeDev.device_kind = "TPU v99 mystery"
    assert M.chip_peak_tflops(FakeDev()) is None


def test_mfu_report_end_to_end_cpu():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jax.device_put(np.ones((128, 128), np.float32))
    rep = M.mfu_report(f, (x,), n=4, reps=2)
    # matmul flops plus the trailing sum reduction
    assert 2 * 128 ** 3 <= rep["flops"] <= 2.1 * 128 ** 3
    assert rep["ms_per_step"] > 0
    assert rep["achieved_tflops"] > 0
    assert rep["mfu"] is None            # CPU mesh: no TPU peak
    assert rep["arith_intensity_flops_per_byte"] is not None


def test_backend_fused_program_is_single_dispatch_lowerable():
    """The prescan wire program must be ONE jitted program (two dispatches
    cost an extra ~100 ms RPC per batch over tunneled links) and must be
    lowerable for cost analysis."""
    from person_capture_tpu.models import arcface as AF
    from person_capture_tpu.models import scrfd as SD
    from person_capture_tpu.models.zoo import resolve_weights
    from person_capture_tpu.pipeline.backends import ScrfdArcFaceBackend

    b = ScrfdArcFaceBackend(scrfd_cfg=SD.TINY, arcface_cfg=AF.TINY,
                            det_size=128, score_thresh=0.5, max_faces=4,
                            host_align=False,
                            scrfd_weights=resolve_weights("auto",
                                                          "scrfd_tiny"))
    wire = np.zeros((4, 96 * 3 // 2, 128), np.uint8)   # i420 wire
    cost = M.program_cost(b._fused, jnp.asarray(wire), jnp.float32(0.5))
    assert cost["flops"] > 1e6           # conv towers are in the program
    # and the fused program still runs + matches extract_batch's contract
    out = b.extract_batch(np.zeros((4, 96, 128, 3), np.uint8),
                          np.ones(4, bool))
    assert out["feats"].shape[0] == 4
