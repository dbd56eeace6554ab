"""Batch-serving sweep CLI (person_capture_tpu/sweep.py): one runtime,
many videos. New architecture — the reference processes one video per GUI
run and rebuilds its sessions each time (gui_app.py:4490-4515)."""

import csv
import json
import os
import time

import numpy as np
import pytest

from person_capture_tpu import sweep as SW
from person_capture_tpu.models.zoo import bundled_weights_path
from person_capture_tpu.video.synthetic import (FacePlacement, draw_face,
                                                generate_video)


def test_expand_videos_dir_glob_file_dedupe(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    for name in ("b.mp4", "a.mkv", "notes.txt"):
        (d / name).write_bytes(b"x")
    single = tmp_path / "solo.webm"
    single.write_bytes(b"x")

    vids = SW.expand_videos([str(d)])
    assert [os.path.basename(v) for v in vids] == ["a.mkv", "b.mp4"]

    vids = SW.expand_videos([str(d / "*.mp4"), str(single), str(single)])
    assert [os.path.basename(v) for v in vids] == ["b.mp4", "solo.webm"]

    # ';'-separated spec, like --ref
    vids = SW.expand_videos([f"{d / 'b.mp4'};{single}"])
    assert len(vids) == 2


def test_parse_shard():
    assert SW.parse_shard("") == (0, 1)
    assert SW.parse_shard("2/5") == (2, 5)
    with pytest.raises(SystemExit):
        SW.parse_shard("5/5")
    with pytest.raises(SystemExit):
        SW.parse_shard("nope")


def test_shard_partitions_are_disjoint_and_complete(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    for i in range(5):
        (d / f"v{i}.mp4").write_bytes(b"x")
    vids = SW.expand_videos([str(d)])
    parts = [vids[i::3] for i in range(3)]
    flat = sorted(p for part in parts for p in part)
    assert flat == sorted(vids)
    assert len(set(flat)) == len(flat)


def test_unique_out_dirs_same_stem(tmp_path):
    dirs = SW._unique_out_dirs(str(tmp_path), ["a/v.mp4", "b/v.mp4",
                                               "c/w.mp4"])
    names = [os.path.basename(p) for p in dirs]
    assert names == ["v", "v_2", "w"]


def _make_corpus(tmp_path):
    import cv2

    d = tmp_path / "corpus"
    d.mkdir()
    truths = {}
    for name, span in (("one.mp4", (6, 22)), ("two.mp4", (10, 26))):
        generate_video(str(d / name), width=128, height=128, fps=30.0,
                       total_frames=32, segments=[(*span, 0)], moving=False)
        truths[name] = span
    ref = np.full((128, 128, 3), 60, np.uint8)
    draw_face(ref, FacePlacement(0, 0, (34, 30, 94, 90)))
    ref_path = str(tmp_path / "ref.png")
    cv2.imwrite(ref_path, ref)
    return d, ref_path, truths


_TINY_ARGS = [
    "--face-model", "scrfd_tiny", "--arcface-model", "arcface_tiny",
    "--det-size", "128", "--batch", "8", "--compute-dtype", "float32",
    # random-init tiny ArcFace: loose gates (same rationale as
    # tests/test_e2e_real_models.py)
    "--face-thresh", "0.9", "--face-det-conf", "0.45",
    "--set", "prescan_enable=false",
    "--set", "min_gap_sec=0.0",
    "--set", "min_box_pixels=400",
    "--set", "face_quality_min=0.0",
    "--set", "min_sharpness=0.0",
    "--set", "curate_enable=false",
    "--set", "prescan_cache_mode=off",
    "--set", "compose_crop_enable=false",
    "--set", "compose_detect_person_for_face=false",
    "--set", "smart_crop_enable=false",
]


@pytest.mark.slow
def test_sweep_end_to_end_two_videos(tmp_path):
    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")
    corpus, ref_path, truths = _make_corpus(tmp_path)
    out_root = str(tmp_path / "out")

    rc = SW.main(["--videos", str(corpus), "--ref", ref_path,
                  "--out", out_root] + _TINY_ARGS)
    assert rc == 0

    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["corpus"] == 2 and summary["processed"] == 2
    assert summary["failed"] == 0
    assert all(r["ok"] and r["hits"] > 0 for r in summary["results"])

    for name, (lo, hi) in truths.items():
        stem = os.path.splitext(name)[0]
        index = os.path.join(out_root, stem, "index.csv")
        assert os.path.isfile(index), index
        with open(index) as fh:
            rows = list(csv.DictReader(fh))
        frames = sorted(int(r["frame"]) for r in rows)
        assert frames, f"no hits for {name}"
        in_span = [f for f in frames if lo <= f <= hi]
        assert len(in_span) >= max(2, len(frames) // 2)


@pytest.mark.slow
def test_sweep_continue_on_error_records_failure(tmp_path):
    if bundled_weights_path("scrfd_tiny") is None:
        pytest.skip("bundled tiny weights not present")
    corpus, ref_path, _ = _make_corpus(tmp_path)
    bad = corpus / "aaa_broken.mp4"         # sorts first
    bad.write_bytes(b"this is not a video")
    out_root = str(tmp_path / "out")

    rc = SW.main(["--videos", str(corpus), "--ref", ref_path,
                  "--out", out_root, "--continue-on-error",
                  "--shard", "0/1"] + _TINY_ARGS)
    assert rc == 1                           # a failure is reported...
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["processed"] == 3 and summary["failed"] == 1
    assert summary["results"][0]["ok"] is False
    assert summary["results"][0]["error"]
    assert all(r["ok"] for r in summary["results"][1:])  # ...others ran


def test_sweep_rejects_video_flag(tmp_path):
    with pytest.raises(SystemExit):
        SW.main(["--videos", "x", "--video", "y", "--ref", "r",
                 "--out", str(tmp_path)])


def test_shard_select_stable_hash_disjoint_complete(tmp_path):
    vids = [str(tmp_path / f"v{i}.mp4") for i in range(17)]
    parts = [SW.shard_select(vids, i, 4, stable=True) for i in range(4)]
    flat = sorted(p for part in parts for p in part)
    assert flat == sorted(vids)
    # stability under growth: adding files never reassigns existing ones
    grown = vids + [str(tmp_path / "aaa_new.mp4")]
    for i in range(4):
        before = set(SW.shard_select(vids, i, 4, stable=True))
        after = set(SW.shard_select(grown, i, 4, stable=True))
        assert before <= after
    # plain slicing DOES reshuffle (why watch mode needs the hash)
    slice_before = set(SW.shard_select(vids, 1, 4, stable=False))
    slice_after = set(SW.shard_select(grown, 1, 4, stable=False))
    assert slice_before != slice_after


def _stub_engines(monkeypatch, processed_log):
    """Replace the model runtime with instant stubs: watch-mode tests
    exercise the polling/sharding/settle mechanics, not the models."""
    from types import SimpleNamespace

    import person_capture_tpu.main as M

    monkeypatch.setattr(M, "build_runtime",
                        lambda cfg, args, ap: {"stub": True})

    def fake_make_engine(cfg_v, runtime, status=None, **kw):
        def run():
            processed_log.append(cfg_v.video)
            return SimpleNamespace(
                ok=True, error=None, spans=[(0, 1)],
                mainpass=SimpleNamespace(hits=[1, 2]))

        return SimpleNamespace(run=run)

    monkeypatch.setattr(M, "make_engine", fake_make_engine)


def test_watch_mode_picks_up_new_files(tmp_path, monkeypatch):
    import threading

    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    a = corpus / "a.mp4"
    a.write_bytes(b"x")
    os.utime(a, (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = str(tmp_path / "out")

    log = []
    _stub_engines(monkeypatch, log)

    rc_holder = {}

    def run():
        rc_holder["rc"] = SW.main([
            "--videos", str(corpus), "--ref", str(ref), "--out", out_root,
            "--watch", "0.2", "--watch-max-idle", "6"])

    th = threading.Thread(target=run)
    th.start()
    # wait for the first video, then drop a new (already-settled) file in
    deadline = time.time() + 30
    while len(log) < 1 and time.time() < deadline:
        time.sleep(0.05)
    b = corpus / "b.mp4"
    b.write_bytes(b"x")
    os.utime(b, (old, old))
    th.join(timeout=30)
    assert not th.is_alive(), "watcher did not exit on idle"
    assert rc_holder["rc"] == 0
    assert [os.path.basename(p) for p in sorted(log)] == ["a.mp4", "b.mp4"]

    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["processed"] == 2 and summary["failed"] == 0


def test_classify_error_backend_vs_video():
    from person_capture_tpu.utils.device import classify_error

    assert classify_error(
        "XlaRuntimeError: FAILED_PRECONDITION: device in bad state"
    ) == "backend"
    assert classify_error("RPC stream closed: UNAVAILABLE") == "backend"
    assert classify_error(
        "RuntimeError: Unable to initialize backend 'axon'") == "backend"
    assert classify_error("grpc channel reset by peer") == "backend"
    assert classify_error("FileNotFoundError: no such video") == "video"
    assert classify_error("cv2 could not decode frame 17") == "video"
    assert classify_error(None) == "video"
    assert classify_error("") == "video"


def _stub_flaky_engines(monkeypatch, fail_errors, run_log):
    """Engine stub that fails with fail_errors[i] on the i-th run of each
    video, then succeeds."""
    from types import SimpleNamespace

    import person_capture_tpu.main as M

    monkeypatch.setattr(M, "build_runtime",
                        lambda cfg, args, ap: {"stub": True})
    attempts = {}

    def fake_make_engine(cfg_v, runtime, status=None, **kw):
        def run():
            i = attempts.get(cfg_v.video, 0)
            attempts[cfg_v.video] = i + 1
            run_log.append(cfg_v.video)
            # leave a crop behind like a real partially-complete engine
            # run would (the retry must wipe it — orphan crops otherwise
            # contaminate an ok-marked out_dir)
            crops = os.path.join(cfg_v.out_dir, "crops")
            os.makedirs(crops, exist_ok=True)
            with open(os.path.join(crops, f"attempt{i}.jpg"), "wb") as fh:
                fh.write(b"x")
            if i < len(fail_errors):
                return SimpleNamespace(ok=False, error=fail_errors[i],
                                       spans=[], mainpass=None)
            return SimpleNamespace(ok=True, error=None, spans=[(0, 1)],
                                   mainpass=SimpleNamespace(hits=[1]))

        return SimpleNamespace(run=run)

    monkeypatch.setattr(M, "make_engine", fake_make_engine)


def _corpus_one_file(tmp_path):
    corpus = tmp_path / "c"
    corpus.mkdir()
    (corpus / "v.mp4").write_bytes(b"x")
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    return corpus, ref


def test_backend_failure_retries_until_ok(tmp_path, monkeypatch):
    """VERDICT r3 next #2 acceptance: an engine that raises
    FAILED_PRECONDITION twice then succeeds ends ok=true, retries=2, and
    each retry probed the device first."""
    corpus, ref = _corpus_one_file(tmp_path)
    log, probes = [], []
    _stub_flaky_engines(monkeypatch,
                        ["XlaRuntimeError: FAILED_PRECONDITION: x",
                         "RPC stream UNAVAILABLE"], log)
    monkeypatch.setattr(SW, "_probe_and_wait",
                        lambda status: probes.append(1))
    out_root = str(tmp_path / "out")
    rc = SW.main(["--videos", str(corpus), "--ref", str(ref),
                  "--out", out_root])
    assert rc == 0
    assert len(log) == 3 and len(probes) == 2
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["failed"] == 0
    r = summary["results"][0]
    assert r["ok"] is True and r["retries"] == 2 and r["error_kind"] is None
    # aborted attempts' outputs were wiped: only the succeeding attempt's
    # crop remains (no orphans next to an ok-marked index)
    crops = sorted(os.listdir(os.path.join(r["out_dir"], "crops")))
    assert crops == ["attempt2.jpg"]


def test_backend_failure_budget_exhausts(tmp_path, monkeypatch):
    corpus, ref = _corpus_one_file(tmp_path)
    log = []
    _stub_flaky_engines(monkeypatch,
                        ["FAILED_PRECONDITION"] * 10, log)
    monkeypatch.setattr(SW, "_probe_and_wait", lambda status: None)
    out_root = str(tmp_path / "out")
    rc = SW.main(["--videos", str(corpus), "--ref", str(ref),
                  "--out", out_root, "--backend-max-retries", "2"])
    assert rc == 1
    assert len(log) == 3            # initial + 2 retries
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    r = summary["results"][0]
    assert r["ok"] is False and r["error_kind"] == "backend"
    assert r["retries"] == 2
    assert summary["failed_backend"] == 1 and summary["failed_video"] == 0


def test_video_failure_never_retries_or_probes(tmp_path, monkeypatch):
    corpus, ref = _corpus_one_file(tmp_path)
    log, probes = [], []
    _stub_flaky_engines(monkeypatch,
                        ["could not open video container"] * 5, log)
    monkeypatch.setattr(SW, "_probe_and_wait",
                        lambda status: probes.append(1))
    out_root = str(tmp_path / "out")
    rc = SW.main(["--videos", str(corpus), "--ref", str(ref),
                  "--out", out_root])
    assert rc == 1
    assert len(log) == 1 and not probes
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    r = summary["results"][0]
    assert r["ok"] is False and r["error_kind"] == "video"
    assert r["retries"] == 0
    assert summary["failed_video"] == 1 and summary["failed_backend"] == 0


def test_wait_for_device_backoff_and_deadline(monkeypatch):
    from person_capture_tpu.utils import device as D

    calls = []
    sleeps = []
    monkeypatch.setattr(D.time, "sleep", lambda s: sleeps.append(s))
    # succeeds on third probe
    seq = iter([False, False, True])
    assert D.wait_for_device(deadline_s=None, sleep_s=2.0,
                             probe=lambda b: (calls.append(b),
                                              next(seq))[1]) is True
    assert len(calls) == 3 and sleeps == [2.0, 4.0]
    # forever-mode probes get the FULL per-attempt budget, which must
    # exceed the worst measured relay handshake (>480 s on a slow day:
    # a budget below it makes every fresh-subprocess probe fail forever)
    assert all(b == D._PROBE_BUDGET_S for b in calls)
    assert D._PROBE_BUDGET_S >= 600.0

    # deadline expiry returns False
    t = {"now": 0.0}
    monkeypatch.setattr(D.time, "time", lambda: t["now"])

    def never(budget):
        t["now"] += 100.0
        return False

    monkeypatch.setattr(D.time, "sleep",
                        lambda s: t.__setitem__("now", t["now"] + s))
    assert D.wait_for_device(deadline_s=150.0, sleep_s=2.0,
                             probe=never) is False


def test_watch_settle_guard_defers_fresh_files(tmp_path, monkeypatch):
    """A file younger than one poll interval is not read on that poll
    (mid-copy protection) but is processed once it settles."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    f = corpus / "fresh.mp4"
    f.write_bytes(b"x")          # mtime = now, poll = 0.5s -> deferred
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    log = []
    _stub_engines(monkeypatch, log)
    rc = SW.main(["--videos", str(corpus), "--ref", str(ref),
                  "--out", str(tmp_path / "out"),
                  "--watch", "0.5", "--watch-max-idle", "3"])
    assert rc == 0
    assert len(log) == 1         # deferred at poll 0, processed later


def test_restart_resume_skips_completed(tmp_path, monkeypatch):
    """A restarted sweep seeds its seen-set from done.json markers: only
    NEW corpus entries run (daemon restarts must not re-burn the corpus);
    --no-resume forces a full redo."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    for name in ("a.mp4", "b.mp4"):
        p = corpus / name
        p.write_bytes(b"x")
        os.utime(p, (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = str(tmp_path / "out")
    base = ["--videos", str(corpus), "--ref", str(ref), "--out", out_root]

    log = []
    _stub_engines(monkeypatch, log)
    assert SW.main(base) == 0
    assert sorted(os.path.basename(p) for p in log) == ["a.mp4", "b.mp4"]
    assert os.path.isfile(os.path.join(out_root, "a", "done.json"))

    # restart: nothing new -> engine never runs again
    log.clear()
    assert SW.main(base) == 0
    assert log == []
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["processed"] == 2 and summary["resumed"] == 2
    assert all(r["ok"] for r in summary["results"])

    # restart after the corpus grew -> only the new video runs
    cnew = corpus / "c.mp4"
    cnew.write_bytes(b"x")
    os.utime(cnew, (old, old))
    log.clear()
    assert SW.main(base) == 0
    assert [os.path.basename(p) for p in log] == ["c.mp4"]

    # --no-resume reprocesses everything
    log.clear()
    assert SW.main(base + ["--no-resume"]) == 0
    assert sorted(os.path.basename(p) for p in log) == \
        ["a.mp4", "b.mp4", "c.mp4"]


def test_resume_failed_video_retries_on_restart(tmp_path, monkeypatch):
    """Failures write no marker: a restart retries exactly them."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    for name in ("a.mp4", "b.mp4"):
        p = corpus / name
        p.write_bytes(b"x")
        os.utime(p, (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = str(tmp_path / "out")
    base = ["--videos", str(corpus), "--ref", str(ref), "--out", out_root,
            "--continue-on-error"]

    from types import SimpleNamespace

    import person_capture_tpu.main as M

    monkeypatch.setattr(M, "build_runtime",
                        lambda cfg, args, ap: {"stub": True})
    log = []

    def fake_make_engine(cfg_v, runtime, status=None, **kw):
        def run():
            log.append(cfg_v.video)
            if os.path.basename(cfg_v.video) == "b.mp4":
                return SimpleNamespace(ok=False, spans=[], mainpass=None,
                                       error="cv2 open failed: bad file")
            return SimpleNamespace(ok=True, error=None, spans=[(0, 1)],
                                   mainpass=SimpleNamespace(hits=[1]))

        return SimpleNamespace(run=run)

    monkeypatch.setattr(M, "make_engine", fake_make_engine)

    # Exit-code contract: any failed video -> rc 1, even with
    # --continue-on-error (which only controls whether the loop keeps
    # going; see test_sweep_continue_on_error_records_failure).
    assert SW.main(base) == 1
    assert not os.path.exists(os.path.join(out_root, "b", "done.json"))

    log.clear()
    assert SW.main(base) == 1          # a resumes; b retries (and fails)
    assert [os.path.basename(p) for p in log] == ["b.mp4"]
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["resumed"] == 1 and summary["failed"] == 1
    assert summary["failed_video"] == 1


def test_resume_ignores_other_shards_and_stale_corpus(tmp_path,
                                                      monkeypatch):
    """Shared out_root fleet layout: done.json markers from videos this
    shard does not own (or that left the corpus) must not leak into this
    run's results/summary (round-4 advisor finding)."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    (corpus / "a.mp4").write_bytes(b"x")
    os.utime(corpus / "a.mp4", (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = tmp_path / "out"

    # a foreign shard's completion + one for a video no longer on disk
    for stem, vid in (("zz_other", "zz_other.mp4"),
                      ("gone", "gone.mp4")):
        d = out_root / stem
        d.mkdir(parents=True)
        (d / "done.json").write_text(json.dumps(
            {"video": str(tmp_path / "elsewhere" / vid),
             "hits": 9, "spans": 9, "wall_s": 1.0}))

    log = []
    _stub_engines(monkeypatch, log)
    base = ["--videos", str(corpus), "--ref", str(ref),
            "--out", str(out_root)]
    assert SW.main(base) == 0
    with open(out_root / "sweep_summary.json") as fh:
        summary = json.load(fh)
    assert summary["processed"] == 1 and summary["resumed"] == 0
    assert [os.path.basename(r["video"]) for r in summary["results"]] == \
        ["a.mp4"]


def test_resume_config_fingerprint_invalidates(tmp_path, monkeypatch):
    """A restart with different decision-affecting flags reprocesses
    completed videos instead of resuming stale outputs; perf-only knobs
    do not invalidate."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    (corpus / "a.mp4").write_bytes(b"x")
    os.utime(corpus / "a.mp4", (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = tmp_path / "out"
    base = ["--videos", str(corpus), "--ref", str(ref),
            "--out", str(out_root)]

    log = []
    _stub_engines(monkeypatch, log)
    assert SW.main(base) == 0
    assert [os.path.basename(p) for p in log] == ["a.mp4"]
    marker = json.loads((out_root / "a" / "done.json").read_text())
    assert marker["config"]

    # same decision config, different perf knob -> resumes
    log.clear()
    assert SW.main(base + ["--set", "tpu_decode_workers=3"]) == 0
    assert log == []

    # decision threshold changed -> reprocesses into the SAME dir
    log.clear()
    assert SW.main(base + ["--face-thresh", "0.2"]) == 0
    assert [os.path.basename(p) for p in log] == ["a.mp4"]
    marker2 = json.loads((out_root / "a" / "done.json").read_text())
    assert marker2["config"] != marker["config"]
    assert not (out_root / "a_2").exists()   # no forked suffix dir

    # legacy marker without a config key still resumes (upgrade path)
    m = json.loads((out_root / "a" / "done.json").read_text())
    del m["config"]
    (out_root / "a" / "done.json").write_text(json.dumps(m))
    log.clear()
    assert SW.main(base + ["--face-thresh", "0.2"]) == 0
    assert log == []


def test_daemon_soak_outage_recovery_growth_restart(tmp_path, monkeypatch):
    """VERDICT r4 #9: one test driving the serving daemon's full
    lifecycle — healthy video → multi-probe backend outage (the probe
    BLOCKS until the device answers; the corpus entry is retried, never
    consumed) → recovery → corpus growth → idle exit → restart-resume —
    asserting sweep_summary.json stays consistent across the restart."""
    import threading
    from types import SimpleNamespace

    import person_capture_tpu.main as M

    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    a = corpus / "a.mp4"
    a.write_bytes(b"x")
    os.utime(a, (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = str(tmp_path / "out")

    device = {"down": False}
    probes = []
    run_log = []

    monkeypatch.setattr(M, "build_runtime",
                        lambda cfg, args, ap: {"stub": True})

    def fake_make_engine(cfg_v, runtime, status=None, **kw):
        def run():
            run_log.append(os.path.basename(cfg_v.video))
            if device["down"]:
                return SimpleNamespace(
                    ok=False, spans=[], mainpass=None,
                    error="XlaRuntimeError: FAILED_PRECONDITION: outage")
            return SimpleNamespace(ok=True, error=None, spans=[(0, 1)],
                                   mainpass=SimpleNamespace(hits=[1]))

        return SimpleNamespace(run=run)

    monkeypatch.setattr(M, "make_engine", fake_make_engine)

    def fake_probe(status):
        probes.append(1)
        while device["down"]:           # stall, exactly like the real probe
            time.sleep(0.01)

    monkeypatch.setattr(SW, "_probe_and_wait", fake_probe)

    base = ["--videos", str(corpus), "--ref", str(ref), "--out", out_root,
            "--continue-on-error"]
    rc_holder = {}

    def run_watch():
        rc_holder["rc"] = SW.main(base + ["--watch", "0.1",
                                          "--watch-max-idle", "10"])

    th = threading.Thread(target=run_watch)
    th.start()

    def wait_for(cond, what, timeout=30):
        deadline = time.time() + timeout
        while not cond():
            assert time.time() < deadline, f"timed out waiting for {what}"
            time.sleep(0.02)

    # phase 1: healthy video completes
    wait_for(lambda: os.path.isfile(os.path.join(out_root, "a",
                                                 "done.json")), "a done")
    # phase 2: outage begins; a new video arrives and fails backend
    device["down"] = True
    b = corpus / "b.mp4"
    b.write_bytes(b"x")
    os.utime(b, (old, old))
    wait_for(lambda: "b.mp4" in run_log, "first attempt on b")
    wait_for(lambda: probes, "probe engaged")
    assert not os.path.exists(os.path.join(out_root, "b", "done.json"))
    # phase 3: device recovers mid-probe; the retry completes b
    time.sleep(0.2)
    device["down"] = False
    wait_for(lambda: os.path.isfile(os.path.join(out_root, "b",
                                                 "done.json")), "b done")
    # phase 4: corpus grows
    c = corpus / "c.mp4"
    c.write_bytes(b"x")
    os.utime(c, (old, old))
    wait_for(lambda: os.path.isfile(os.path.join(out_root, "c",
                                                 "done.json")), "c done")
    th.join(timeout=30)
    assert not th.is_alive(), "watcher did not exit on idle"
    assert rc_holder["rc"] == 0

    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary = json.load(fh)
    assert summary["processed"] == 3 and summary["failed"] == 0
    rec_b = [r for r in summary["results"]
             if os.path.basename(str(r["video"])) == "b.mp4"][0]
    assert rec_b["ok"] and rec_b["retries"] >= 1
    assert run_log.count("b.mp4") >= 2      # retried, never consumed

    # phase 5: restart-resume — nothing reruns, summary stays consistent
    run_log.clear()
    assert SW.main(base) == 0
    assert run_log == []
    with open(os.path.join(out_root, "sweep_summary.json")) as fh:
        summary2 = json.load(fh)
    assert summary2["processed"] == 3 and summary2["resumed"] == 3
    assert summary2["failed"] == 0
    assert sorted(os.path.basename(str(r["video"]))
                  for r in summary2["results"]) == \
        ["a.mp4", "b.mp4", "c.mp4"]


def test_heartbeat_status_file(tmp_path, monkeypatch):
    """sweep_status.json: atomic liveness heartbeat for fleet monitors —
    written at phase changes, per-video completion, and exit; never part
    of the resume story (done.json owns that)."""
    corpus = tmp_path / "c"
    corpus.mkdir()
    old = time.time() - 60
    (corpus / "a.mp4").write_bytes(b"x")
    os.utime(corpus / "a.mp4", (old, old))
    ref = tmp_path / "ref.png"
    ref.write_bytes(b"x")
    out_root = tmp_path / "out"

    log = []
    _stub_engines(monkeypatch, log)
    assert SW.main(["--videos", str(corpus), "--ref", str(ref),
                    "--out", str(out_root)]) == 0
    status = json.loads((out_root / "sweep_status.json").read_text())
    assert status["phase"] == "exited"
    assert status["processed"] == 1 and status["failed"] == 0
    assert status["updated"] <= time.time()


def test_heartbeat_during_outage_probe(tmp_path, monkeypatch):
    """A daemon stalling through a backend outage must keep its
    heartbeat fresh (phase names the outage) — a stale timestamp would
    read as a dead process on the monitor."""
    corpus, ref = _corpus_one_file(tmp_path)
    log = []
    _stub_flaky_engines(monkeypatch,
                        ["XlaRuntimeError: FAILED_PRECONDITION: x"], log)
    out_root = tmp_path / "out"
    seen_phases = []

    def fake_probe(status):
        status("device probe failed (attempt 1); retrying")
        seen_phases.append(json.loads(
            (out_root / "sweep_status.json").read_text())["phase"])

    monkeypatch.setattr(SW, "_probe_and_wait", fake_probe)
    assert SW.main(["--videos", str(corpus), "--ref", str(ref),
                    "--out", str(out_root)]) == 0
    assert any("outage" in p for p in seen_phases), seen_phases
