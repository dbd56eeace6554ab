"""Probe: does the axon PJRT plugin support the JAX persistent
compilation cache?

Runs the same nontrivial jitted program twice in FRESH subprocesses with
``jax_compilation_cache_dir`` pointed at a temp dir. If the second
process's compile time collapses (and the cache dir gains entries), the
plugin serializes executables and the framework can skip its ~90 s
first-video compile cost on every rerun (sweep daemon restarts, bench,
CLI invocations).

Usage: python tools_compile_cache_probe.py
Prints one JSON line: {"supported": bool, "first_s": ..., "second_s": ...,
"entries": N}
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def f(x, w1, w2):
    y = jnp.tanh(x @ w1)
    z = jax.nn.relu(y @ w2)
    return (z * y[:, : z.shape[1]]).sum(axis=1)

x = jnp.ones((256, 512), jnp.bfloat16)
w1 = jnp.ones((512, 1024), jnp.bfloat16)
w2 = jnp.ones((1024, 384), jnp.bfloat16)
jf = jax.jit(f)
t0 = time.perf_counter()
jf.lower(x, w1, w2).compile()
print("COMPILE_S", time.perf_counter() - t0)
"""


def _run(cache_dir: str) -> float:
    out = subprocess.run([sys.executable, "-c", _CHILD, cache_dir],
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("COMPILE_S"):
            return float(line.split()[1])
    raise RuntimeError(f"probe child failed: {out.stderr[-2000:]}")


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        first = _run(d)
        entries = len([f for f in os.listdir(d) if not f.startswith(".")])
        second = _run(d)
    supported = entries > 0 and second < max(0.5 * first, first - 0.5)
    print(json.dumps({"supported": supported, "first_s": round(first, 3),
                      "second_s": round(second, 3), "entries": entries}))


if __name__ == "__main__":
    main()
