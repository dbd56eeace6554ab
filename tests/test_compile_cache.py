"""Persistent compilation cache wiring (``tpu_compile_cache_dir``).

When set, ``main.maybe_enable_compile_cache`` points JAX's persistent
compilation cache at the directory BEFORE the first compile, so a
restarted process (sweep-daemon restart, repeated CLI runs) loads its
executables from disk instead of recompiling. The reference's analogue
is ORT/TRT engine + session caching (person_capture/face_embedder.py);
here the whole pipeline is a handful of jitted programs behind one
jax.config switch.
"""

import os

import jax
import jax.numpy as jnp

from person_capture_tpu.config import SessionConfig
from person_capture_tpu.main import maybe_enable_compile_cache


def _cache_cfg_snapshot():
    return (jax.config.jax_compilation_cache_dir,
            jax.config.jax_persistent_cache_min_compile_time_secs,
            jax.config.jax_persistent_cache_min_entry_size_bytes)


def _cache_cfg_restore(snap):
    jax.config.update("jax_compilation_cache_dir", snap[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", snap[1])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", snap[2])


def test_unset_is_noop():
    snap = _cache_cfg_snapshot()
    cfg = SessionConfig(video="v", ref="r", out_dir="o")
    assert cfg.tpu_compile_cache_dir == ""
    maybe_enable_compile_cache(cfg)
    assert _cache_cfg_snapshot() == snap


def test_cache_dir_created_and_populated(tmp_path):
    snap = _cache_cfg_snapshot()
    d = str(tmp_path / "jaxcache")
    cfg = SessionConfig(video="v", ref="r", out_dir="o",
                        tpu_compile_cache_dir=d)
    try:
        maybe_enable_compile_cache(cfg)
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # production keeps jax's min-compile-time default (tiny programs
        # aren't worth a disk entry); force-cache a toy program only to
        # prove the wiring end-to-end
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

        def _probe(x):
            return (x @ x.T).sum() * 3.0 + 1.25

        jax.jit(_probe)(jnp.ones((32, 48), jnp.float32)).block_until_ready()
        assert os.listdir(d), "no persistent-cache entries written"
    finally:
        _cache_cfg_restore(snap)
