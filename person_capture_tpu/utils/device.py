"""Accelerator health probing + backend-error classification.

The tunneled TPU enters transient bad states where even a trivial matmul
hangs or fails (CLAUDE.md: minutes-long relay hiccups up to 12h+ outages
where ``jax.devices()`` hangs uninterruptibly). Long-running drivers — the
bench harness, the sweep serving daemon — must distinguish "this video is
bad" from "the backend is down", probe OUTSIDE the process (a hung
in-process backend init cannot be interrupted), and back off instead of
consuming work items.

The reference has no analogue (one GUI run per video on local CUDA); this
is operational hardening for the fleet architecture (VERDICT r3 next #2).
"""

from __future__ import annotations

import re
import subprocess
import sys
import time
from typing import Callable, Optional

_PROBE_CODE = ("import jax, jax.numpy as jnp;"
               "print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))")

#: per-probe subprocess budget: the FIRST computed download in a process
#: pays a relay handshake that is ~2 min normally but was measured at
#: 317 s on a slow day — and a 420 s cap was later seen to time out while
#: a 480 s probe on the same chip succeeded, so healthy-but-slow relays
#: need the full 10 min. A fresh subprocess pays the handshake from zero
#: every attempt; a budget below the worst handshake fails FOREVER.
_PROBE_BUDGET_S = 600.0


def probe_device_once(timeout_s: float = _PROBE_BUDGET_S,
                      platform: str = "") -> bool:
    """One subprocess matmul probe; True iff the backend computed it.

    ``platform`` pins the child's JAX platform (jax.config, not env —
    the axon plugin's sitecustomize overrides env) so a cpu-pinned
    caller probes cpu, not the accelerator."""
    code = _PROBE_CODE
    if platform:
        code = ("import jax;"
                f"jax.config.update('jax_platforms', {platform!r});"
                + code.replace("import jax, ", "import "))
    try:
        cp = subprocess.run([sys.executable, "-c", code],
                            timeout=timeout_s, capture_output=True)
        return cp.returncode == 0
    except subprocess.SubprocessError:
        return False


def wait_for_device(deadline_s: Optional[float] = 600.0,
                    status: Optional[Callable[[str], None]] = None,
                    sleep_s: float = 20.0,
                    probe: Optional[Callable[[float], bool]] = None) -> bool:
    """Probe the accelerator in a subprocess until it answers.

    Returns True when a probe succeeded; False when ``deadline_s`` expired
    first (``deadline_s=None`` waits forever — the caller is a daemon that
    must stall through an outage rather than drain its queue). Backoff is
    bounded exponential starting at ``sleep_s`` (cap 5 min) with a status
    line per retry so operators can see the outage from the log stream.
    """
    status = status or (lambda m: None)
    probe = probe or probe_device_once
    t0 = time.time()
    delay = max(1.0, float(sleep_s))
    attempt = 0
    while True:
        remaining = (None if deadline_s is None
                     else deadline_s - (time.time() - t0))
        budget = _PROBE_BUDGET_S if remaining is None \
            else min(_PROBE_BUDGET_S, max(5.0, remaining))
        if probe(budget):
            if attempt:
                status(f"device probe ok after {attempt} retr"
                       f"{'y' if attempt == 1 else 'ies'} "
                       f"({time.time() - t0:.0f}s)")
            else:
                status("device probe ok")
            return True
        attempt += 1
        if deadline_s is not None and time.time() - t0 > deadline_s:
            status(f"device probe failed for {deadline_s:.0f}s — giving up")
            return False
        status(f"device probe failed (attempt {attempt}); "
               f"retrying in {delay:.0f}s")
        time.sleep(delay)
        delay = min(300.0, delay * 2)


# Error signatures that mean "the accelerator/runtime is unhealthy", not
# "this input is bad". Sourced from observed axon/PJRT failure modes
# (CLAUDE.md) plus the standard gRPC/XLA status vocabulary.
_BACKEND_PATTERNS = re.compile(
    "|".join([
        r"FAILED_PRECONDITION", r"UNAVAILABLE", r"DEADLINE_EXCEEDED",
        r"RESOURCE_EXHAUSTED", r"ABORTED", r"INTERNAL",
        r"XlaRuntimeError", r"PJRT", r"jaxlib",
        r"[Uu]nable to initialize backend",
        r"\bRPC\b", r"\bgrpc\b", r"\baxon\b",
        r"socket closed", r"[Cc]onnection (reset|refused|closed|aborted)",
        r"[Tt]ransfer.*(failed|timed out)",
        r"[Dd]evice.*(lost|unavailable|error)",
    ]))


def classify_error(err: Optional[str]) -> str:
    """``"backend"`` when the failure text matches an accelerator/runtime
    signature, else ``"video"`` (bad input, decode error, missing file —
    anything retrying on a healthy device would not fix)."""
    if not err:
        return "video"
    return "backend" if _BACKEND_PATTERNS.search(str(err)) else "video"
