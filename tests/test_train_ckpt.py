"""Training checkpoint/resume: an interrupted run resumed from its latest
orbax checkpoint must land on EXACTLY the state of the uninterrupted run
(per-step data rng keeps the sample stream aligned across the restart)."""

import numpy as np

from person_capture_tpu.train.ckpt import (latest_checkpoint,
                                           list_checkpoints, step_rng)
from person_capture_tpu.train.scrfd_synth import train

import pytest

# full-gate tier: minutes-long on the CPU mesh (pytest.ini / CLAUDE.md)
pytestmark = pytest.mark.slow


def _final_params(variables):
    import jax

    leaves = jax.tree_util.tree_leaves(jax.device_get(variables["params"]))
    return [np.asarray(x) for x in leaves]


def test_resume_matches_uninterrupted_run(tmp_path):
    kw = dict(cfg_name="scrfd_tiny", size=64, batch=4, lr=1e-3, seed=7,
              log_every=1000, eval_every=0)

    straight, _ = train(steps=4, **kw)

    ck = str(tmp_path / "ck")
    train(steps=2, ckpt_dir=ck, ckpt_every=1, **kw)   # "interrupted" at 2
    assert latest_checkpoint(ck)[0] == 2
    resumed, _ = train(steps=4, ckpt_dir=ck, ckpt_every=1, **kw)

    for a, b in zip(_final_params(straight), _final_params(resumed)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_checkpoint_retention_keeps_latest_two(tmp_path):
    ck = str(tmp_path / "ck")
    train(cfg_name="scrfd_tiny", size=64, batch=4, steps=5, lr=1e-3,
          seed=1, log_every=1000, eval_every=0, ckpt_dir=ck, ckpt_every=1)
    steps = [s for s, _ in list_checkpoints(ck)]
    assert steps == [4, 5]


def test_step_rng_is_stateless():
    a = step_rng(3, 10).integers(0, 1 << 30, 8)
    b = step_rng(3, 10).integers(0, 1 << 30, 8)
    c = step_rng(3, 11).integers(0, 1 << 30, 8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
