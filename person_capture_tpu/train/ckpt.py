"""Training checkpoint/resume for the in-repo trainers.

The reference has no training at all (SURVEY §2 — it consumes finished
ONNX checkpoints), so this is TPU-era infrastructure: long on-chip runs
(~25 min for the bundled SCRFD weights) must survive preemption. Orbax is
the idiomatic JAX checkpointer — full train state (params, batch_stats,
optimizer state) saves as a pytree and restores against a same-structure
template from a fresh init, so no structure is pickled.

Data-stream alignment on resume is the trainer's job: trainers seed a
PER-STEP rng (``step_rng``) so the sample stream is stateless and a
resumed run consumes exactly the batches the interrupted run would have.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np


def step_rng(seed: int, step: int) -> np.random.Generator:
    """Stateless per-step data rng: resume at step k sees the same batch
    the uninterrupted run saw at step k."""
    return np.random.default_rng((int(seed) + 1) * 1_000_003 + int(step))


_CKPTR = None


def _ckptr():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(ckpt_dir: str, step: int, state) -> str:
    """Write the full train state for ``step``; keeps the latest two."""
    import jax

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{int(step):08d}")
    host = jax.device_get(state)
    ck = _ckptr()
    ck.save(path, host, force=True)
    # orbax saves async: finalize before pruning so the newest checkpoint
    # is on disk (and so an interrupt right after this call loses nothing)
    ck.wait_until_finished()
    for old_step, old_path in list_checkpoints(ckpt_dir)[:-2]:
        import shutil

        shutil.rmtree(old_path, ignore_errors=True)
    return path


def list_checkpoints(ckpt_dir: str):
    """[(step, path)] ascending; only completed orbax dirs."""
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        p = os.path.join(ckpt_dir, name)
        if m and os.path.isdir(p):
            out.append((int(m.group(1)), p))
    out.sort()
    return out


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    cks = list_checkpoints(ckpt_dir)
    return cks[-1] if cks else None


def restore_checkpoint(path: str, template_state):
    """Restore against a fresh-init template (same pytree structure)."""
    import jax

    host = jax.device_get(template_state)
    return _ckptr().restore(os.path.abspath(path), host)
