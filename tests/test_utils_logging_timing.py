"""utils/logging.StatusLogger (reference `Processor._status` throttling
contract, gui_app.py:8490-8531) and utils/timing.StepTimer."""

import time

from person_capture_tpu.utils.logging import StatusLogger
from person_capture_tpu.utils.timing import StepTimer


def test_status_logger_throttles_per_key():
    out = []
    log = StatusLogger(out.append, default_interval=10.0)
    assert log("a1", key="a")
    assert not log("a2", key="a")        # same key within interval
    assert log("b1", key="b")            # different key passes
    assert out == ["a1", "b1"]


def test_status_logger_force_and_reset():
    out = []
    log = StatusLogger(out.append, default_interval=10.0)
    assert log("x", key="k")
    assert log("y", key="k", force=True)
    log.reset("k")
    assert log("z", key="k")
    assert out == ["x", "y", "z"]


def test_status_logger_interval_elapses():
    out = []
    log = StatusLogger(out.append, default_interval=0.05)
    assert log("m", key="k")
    assert not log("m", key="k")
    time.sleep(0.06)
    assert log("m", key="k")
    assert len(out) == 2


def test_status_logger_unkeyed_shares_global_channel():
    # reference maps key=None to ONE "_global" bucket (gui_app.py:8496):
    # unkeyed hot-loop messages with changing text still throttle
    out = []
    log = StatusLogger(out.append, default_interval=10.0)
    assert log("same")
    assert not log("same")
    assert not log("other")          # same channel, inside the interval
    assert log("milestone", key="phase")
    assert log("milestone 2", key="phase")   # phase: immediate on change
    assert not log("milestone 2", key="phase")  # unchanged text throttles


def test_step_timer_accumulates():
    t = StepTimer()
    with t("decode"):
        time.sleep(0.01)
    with t("decode"):
        time.sleep(0.01)
    t.add("embed", 0.5)
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert s["decode"]["total_s"] >= 0.02
    assert s["embed"] == {"total_s": 0.5, "count": 1, "mean_ms": 500.0}
    assert "decode" in t.report()


def test_step_timer_counts_on_exception():
    t = StepTimer()
    try:
        with t("stage"):
            raise ValueError("boom")
    except ValueError:
        pass
    assert t.summary()["stage"]["count"] == 1
