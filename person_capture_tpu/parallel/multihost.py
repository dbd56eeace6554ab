"""Multi-host (multi-process) execution over ICI + DCN.

The reference is a single-process desktop app (SURVEY.md §2.3) — it has no
distributed runtime to port. The rebuild's multi-host story is therefore
new architecture, designed the JAX way:

- every host process runs the SAME program and owns the chips local to it
  (``jax.distributed.initialize`` wires the processes into one global
  runtime; on a TPU pod the coordinator/topology is discovered from the
  environment, elsewhere it is passed explicitly);
- one global ``jax.sharding.Mesh`` spans all processes' devices; the fused
  pipeline programs (parallel/mesh.py) run SPMD over it — XLA routes the
  collectives over ICI within a host's chips and DCN across hosts;
- the frame batch shards over the ``data`` axis. Each process decodes the
  video independently (decode at pre-scan widths is cheap and embarrassing
  to replicate; compute is what scales) and contributes ONLY the rows its
  local devices own via :func:`make_global_batch` — no host ships bytes it
  doesn't need to;
- per-batch outputs are replicated at the program edge (an XLA all-gather;
  they are small: boxes/feats per frame), so the host-side sequential
  replay — spans, locks, bank growth — runs identically and
  deterministically on every process. Only the primary process writes
  outputs (:func:`is_primary`).

Single-process behavior is unchanged: every helper degrades to the plain
local path, so the pipeline code calls these unconditionally.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

_INITIALIZED = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join the global distributed runtime (idempotent).

    On TPU pods all arguments may be ``None`` — jax discovers the
    coordinator and topology from the environment. For manual clusters
    (including the multi-process CPU harness used in tests) pass them
    explicitly. Must run before the first access to ``jax.devices()`` in
    the process, like ``jax.distributed.initialize`` itself.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    if local_device_ids is not None:
        kw["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kw)
    _INITIALIZED = True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns user-visible side effects (crop/CSV
    writes, archive encodes). The compute is SPMD; the host replay is
    deterministic on every process, so gating the writers is sufficient."""
    return process_index() == 0


def is_multiprocess() -> bool:
    return process_count() > 1


def make_global_batch(mesh, arr: np.ndarray, data_axis: str = "data"):
    """Host batch (full copy on every process) → global row-sharded array.

    Single-process: returns ``arr`` unchanged (jit's implicit transfer
    already places it). Multi-process: builds the global ``jax.Array``
    via per-shard callbacks, so each process uploads only the rows its
    local devices own — and no cross-process value-equality check (which
    ``device_put`` of an uncommitted array would pay per batch) runs.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not is_multiprocess():
        return arr
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def make_replicated(mesh, arr: np.ndarray):
    """Small host array (same value on every process) → mesh-replicated
    global array without the cross-process equality check."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not is_multiprocess():
        return arr
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def to_host(x) -> np.ndarray:
    """Global array → full host numpy on EVERY process.

    Requires the array to be fully replicated (the sharded pipeline steps
    emit replicated outputs in multi-process mode); raises otherwise
    rather than silently returning a partial shard.
    """
    import jax

    if isinstance(x, np.ndarray) or not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    if not x.is_fully_replicated:
        raise ValueError(
            "to_host() on a partitioned multi-process array; emit "
            "replicated outputs (replicate_outputs=True) instead")
    return np.asarray(x.addressable_shards[0].data)


def barrier(name: str = "pc_barrier") -> None:
    """Cross-process sync point (no-op single-process)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
