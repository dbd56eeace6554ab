import json
import os
import subprocess
import zipfile

import pytest

from person_capture_tpu import updater as U


def _make_zip(tmp_path, files):
    zp = str(tmp_path / "update.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return zp


def test_current_version_in_repo():
    v = U.current_version("/root/repo")
    assert v and v != "unknown"


def test_stage_and_apply_zip(tmp_path):
    repo = tmp_path / "install"
    repo.mkdir()
    (repo / "keepme.txt").write_text("old")
    (repo / "output").mkdir()
    (repo / "output" / "data.csv").write_text("user data")

    zp = _make_zip(tmp_path, {
        "release-1.2/keepme.txt": "new",
        "release-1.2/newfile.py": "print('hi')",
        "release-1.2/output/should_not_overwrite.txt": "bad",
    })
    ok, root = U.stage_zip_update(str(repo), zp, version="1.2")
    assert ok
    assert U.staged_update_pending(str(repo))

    ok, detail = U.apply_staged_update(str(repo))
    assert ok, detail
    assert (repo / "keepme.txt").read_text() == "new"
    assert (repo / "newfile.py").exists()
    # user data preserved
    assert (repo / "output" / "data.csv").read_text() == "user data"
    assert not (repo / "output" / "should_not_overwrite.txt").exists()
    assert not U.staged_update_pending(str(repo))


def test_apply_without_stage(tmp_path):
    ok, detail = U.apply_staged_update(str(tmp_path))
    assert not ok and detail == "no_staged_update"


def test_stage_missing_zip(tmp_path):
    ok, detail = U.stage_zip_update(str(tmp_path), str(tmp_path / "nope.zip"))
    assert not ok and detail == "zip_missing"


def test_requirements_change_detection(tmp_path):
    repo = tmp_path / "install"
    repo.mkdir()
    (repo / "requirements.txt").write_text("jax==0.9\n")
    zp = _make_zip(tmp_path, {"r/requirements.txt": "jax==1.0\n"})
    U.stage_zip_update(str(repo), zp)
    ok, detail = U.apply_staged_update(str(repo))
    assert ok and detail == "deps_changed"


def test_git_update_not_a_checkout(tmp_path):
    avail, detail = U.git_update_available(str(tmp_path))
    assert not avail and detail == "not_a_git_checkout"


def test_git_ff_refuses_dirty(tmp_path):
    repo = tmp_path / "g"
    repo.mkdir()
    subprocess.run(["git", "init", "-q", str(repo)], check=True)
    (repo / "a.txt").write_text("x")
    subprocess.run(["git", "-C", str(repo), "add", "."], check=True)
    subprocess.run(["git", "-C", str(repo), "-c", "user.email=t@t",
                    "-c", "user.name=t", "commit", "-qm", "init"], check=True)
    (repo / "a.txt").write_text("dirty")
    ok, detail = U.git_fast_forward(str(repo))
    assert not ok and detail == "working_tree_dirty"


def _make_release_zip(tmp_path, reqs="new==2.0\n"):
    import zipfile

    zpath = tmp_path / "rel.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("proj-1.2.3/requirements.txt", reqs)
        zf.writestr("proj-1.2.3/person_capture_tpu/__init__.py", "# v1.2.3\n")
    return str(zpath)


def test_github_zip_check_download_stage_apply_deps(tmp_path):
    """Offline GitHub-path end to end: release check (stubbed fetcher) →
    ZIP download (local path) → stage → apply detects a requirements change
    → pip command issued (stubbed runner) — reference updater.py:209-242,
    348-652."""
    from person_capture_tpu import updater as U

    repo = tmp_path / "install"
    repo.mkdir()
    (repo / "requirements.txt").write_text("old==1.0\n")
    (repo / "output").mkdir()
    (repo / "output" / "keep.txt").write_text("user data")
    zpath = _make_release_zip(tmp_path)

    calls = {}
    mgr = U.UpdateManager(
        repo_dir=str(repo), github_repo="owner/proj",
        fetch_json=lambda url: {"tag_name": "v1.2.3",
                                "zipball_url": zpath, "name": "r"},
        pip_runner=lambda cmd: calls.setdefault("pip", cmd) or
        type("R", (), {"returncode": 0, "stderr": ""})())

    avail, detail = mgr.check()
    assert avail and detail == "github:v1.2.3"
    ok, detail = mgr.perform()
    assert ok and detail == "staged_for_next_start"
    assert U.staged_update_pending(str(repo))

    restart, detail = mgr.apply_on_start(auto_deps=True)
    assert restart
    assert detail.startswith("deps_changed")
    assert "pip" in calls and calls["pip"][-1].endswith("requirements.txt")
    # user data preserved, new code applied
    assert (repo / "output" / "keep.txt").read_text() == "user data"
    assert (repo / "requirements.txt").read_text() == "new==2.0\n"
    assert not U.staged_update_pending(str(repo))


def test_github_zip_same_requirements_no_pip(tmp_path):
    from person_capture_tpu import updater as U

    repo = tmp_path / "install"
    repo.mkdir()
    (repo / "requirements.txt").write_text("same==1.0\n")
    zpath = _make_release_zip(tmp_path, reqs="same==1.0\n")
    ok, _ = U.download_zip(zpath, str(repo / "dl.zip"))
    assert ok
    ok, root = U.stage_zip_update(str(repo), str(repo / "dl.zip"), "v9")
    assert ok
    ok, detail = U.apply_staged_update(str(repo))
    assert ok and detail == "applied"


def test_restart_handshake_prevents_loops(monkeypatch):
    from person_capture_tpu import updater as U

    monkeypatch.delenv(U.RESTART_ENV, raising=False)
    execd = {}

    def fake_execv(exe, argv):
        execd["argv"] = argv

    assert U.restart_process(execv=fake_execv) is None
    assert execd["argv"][0] == U.build_restart_argv()[0]
    # second attempt in the restarted process is refused
    assert U.restart_process(execv=fake_execv) == "already_restarted_once"


def test_github_check_converges_after_apply(tmp_path):
    """An applied release is recorded and no longer reported available —
    otherwise non-git installs re-download the same tag forever."""
    from person_capture_tpu import updater as U

    repo = tmp_path / "install"
    repo.mkdir()
    rel = {"tag_name": "v1.2.3",
           "zipball_url": _make_release_zip(tmp_path), "name": "r"}
    mgr = U.UpdateManager(repo_dir=str(repo), github_repo="o/r",
                          fetch_json=lambda url: rel)
    avail, detail = mgr.check()
    assert avail and detail == "github:v1.2.3"
    ok, _ = mgr.perform()
    assert ok
    ok, _ = U.apply_staged_update(str(repo))
    assert ok
    assert U.installed_release_tag(str(repo)) == "v1.2.3"
    avail, detail = mgr.check()
    assert not avail and detail == "github:v1.2.3"
    # a NEWER tag is available again
    rel["tag_name"] = "v1.3.0"
    avail, _ = mgr.check()
    assert avail


def test_apply_handles_dir_over_file_collision(tmp_path):
    """A release that turns a file into a directory (and vice versa) applies
    cleanly; copy failures report (False, detail) and clear the flag instead
    of raising into a startup crash loop."""
    import zipfile

    from person_capture_tpu import updater as U

    repo = tmp_path / "install"
    repo.mkdir()
    (repo / "plugins").write_text("was a file")
    (repo / "conf").mkdir()
    (repo / "conf" / "x").write_text("1")
    zpath = tmp_path / "rel2.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("proj/plugins/mod.py", "# now a dir\n")
        zf.writestr("proj/conf", "now a file")
    ok, _ = U.stage_zip_update(str(repo), str(zpath), "v2")
    assert ok
    ok, detail = U.apply_staged_update(str(repo))
    assert ok, detail
    assert (repo / "plugins" / "mod.py").is_file()
    assert (repo / "conf").is_file()
    assert not U.staged_update_pending(str(repo))
