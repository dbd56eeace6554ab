"""`python -m person_capture_tpu.doctor` — environment diagnostics.

The doctor consolidates the operational probes (device health via
hang-proof subprocess matmul, link RTT/bandwidth at real wire shapes,
cv2 decode rate, bundled-weights and compile-cache checks) into one
user-facing command; the reference scatters these across its launcher
env checks (start_person_capture.bat) and provider logs
(person_capture/face_embedder.py session setup).
"""

import json

from person_capture_tpu import doctor


def test_check_host_basics():
    h = doctor.check_host()
    assert h["cores"] >= 1
    assert h["cv2"]


def test_check_weights_bundled_all_present():
    w = doctor.check_weights()
    assert w["ok"], w
    assert w["scrfd_2.5g"].endswith(".npz")


def test_check_cache_resolves_auto(monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    c = doctor.check_cache()
    assert c["dir"] == str(tmp_path / "person_capture_tpu" / "xla")
    assert c["writable"] and c["entries"] == 0


def test_check_decode_small():
    d = doctor.check_decode(seconds=1.0, width=320, height=240)
    assert d["frames"] >= 24 and d["decode_fps"] > 0


def test_check_device_cpu_pinned():
    info = doctor.check_device(probe_budget_s=120.0, reps=2,
                               platform="cpu")
    assert info["ok"], info
    assert info["platform"] == "cpu"
    assert info["upload_mb_s"] > 0 and info["download_mb_s"] > 0
    assert info["mainpass_link_ceiling_x"] > 0


def test_main_json_exit_code(monkeypatch, tmp_path, capsys):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    rc = doctor.main(["--json", "--skip-decode", "--skip-device"])
    out = capsys.readouterr().out
    rep = json.loads(out)
    assert rc == 0 and rep["ok"]
    assert set(rep) >= {"host", "weights", "cache", "ok"}


def test_check_cache_explicit_dir_and_off(tmp_path):
    # doctor must diagnose the directory the REAL run will use, not only
    # the default auto location (round-4 advisor finding)
    d = str(tmp_path / "explicit_cache")
    c = doctor.check_cache(d)
    assert c["dir"] == d and c["writable"]
    c_off = doctor.check_cache("off")
    assert c_off["dir"] is None and not c_off["writable"]


def test_check_cache_unwritable_explicit_dir(tmp_path):
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    c = doctor.check_cache(str(blocker / "sub"))
    assert not c["writable"] and c.get("error")


def test_check_sweep_heartbeat(tmp_path):
    import json as _json
    import time as _time

    # no heartbeat file
    c = doctor.check_sweep(str(tmp_path))
    assert not c["found"] and "error" in c

    # fresh running heartbeat
    (tmp_path / "sweep_status.json").write_text(_json.dumps(
        {"video": "v.mp4", "phase": "running", "progress": 0.4,
         "processed": 2, "failed": 0, "updated": _time.time()}))
    (tmp_path / "sweep_summary.json").write_text(_json.dumps(
        {"corpus": 5, "processed": 2, "failed": 0, "resumed": 1,
         "failed_backend": 0, "failed_video": 0, "results": []}))
    c = doctor.check_sweep(str(tmp_path))
    assert c["found"] and c["alive"] and c["phase"] == "running"
    assert c["summary"]["corpus"] == 5

    # stale + not exited -> dead/wedged
    (tmp_path / "sweep_status.json").write_text(_json.dumps(
        {"video": "v.mp4", "phase": "running", "progress": 0.4,
         "updated": _time.time() - 3600}))
    c = doctor.check_sweep(str(tmp_path))
    assert not c["alive"] and "wedged" in c["error"]

    # old but cleanly exited -> fine
    (tmp_path / "sweep_status.json").write_text(_json.dumps(
        {"video": "", "phase": "exited", "progress": 1.0,
         "updated": _time.time() - 3600}))
    assert doctor.check_sweep(str(tmp_path))["alive"]
