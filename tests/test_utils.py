import time

from person_capture_tpu.utils import StatusLogger, StepTimer


def test_status_logger_throttles_per_key():
    msgs = []
    log = StatusLogger(msgs.append, default_interval=10.0)
    assert log("a", key="k")
    assert not log("b", key="k")          # same key throttled
    assert log("c", key="other")
    assert log("d", key="k", force=True)  # force bypasses
    assert msgs == ["a", "c", "d"]


def test_status_logger_interval_expiry():
    msgs = []
    log = StatusLogger(msgs.append, default_interval=0.01)
    assert log("x", key="k")
    time.sleep(0.02)
    assert log("y", key="k")
    assert msgs == ["x", "y"]


def test_status_logger_reset():
    msgs = []
    log = StatusLogger(msgs.append, default_interval=100.0)
    log("a", key="k")
    log.reset("k")
    assert log("b", key="k")


def test_step_timer():
    t = StepTimer()
    with t("stage1"):
        time.sleep(0.01)
    with t("stage1"):
        pass
    t.add("stage2", 0.5)
    s = t.summary()
    assert s["stage1"]["count"] == 2
    assert s["stage1"]["total_s"] >= 0.01
    assert s["stage2"]["total_s"] == 0.5
    rep = t.report()
    assert "stage1" in rep and "stage2" in rep


def test_profile_trace_noop():
    from person_capture_tpu.utils import profile_trace

    with profile_trace(None):
        pass
    with profile_trace(""):
        pass
