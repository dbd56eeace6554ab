"""Self-update manager.

Headless rebuild of the reference's UpdateManager (person_capture/
updater.py:660): prefer a git fast-forward when the install is a clean git
checkout; otherwise stage a release ZIP that is applied on next start,
preserving user data paths; re-run dependency install only when the
requirements file changed. GUI hooks (menu/QObject signals) are replaced by
plain callables; the apply-on-next-start flag file semantics are kept.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

PRESERVE_DIRS = ("output", "prescan_cache", "trt_cache", ".ultralytics")
STAGE_FLAG = ".pc_staged_update.json"


def current_version(repo_dir: str) -> str:
    """Version string: git describe/commit when available, else package."""
    head = _git(repo_dir, "rev-parse", "--short", "HEAD")
    if head:
        dirty = _git(repo_dir, "status", "--porcelain")
        return head + ("+dirty" if dirty else "")
    try:
        from . import __version__
        return __version__
    except ImportError:
        return "unknown"


def _git(repo_dir: str, *args: str) -> Optional[str]:
    try:
        cp = subprocess.run(["git", "-C", repo_dir, *args],
                            capture_output=True, text=True, timeout=60,
                            check=False)
        if cp.returncode != 0:
            return None
        return cp.stdout.strip()
    except (OSError, subprocess.SubprocessError):
        return None


def git_update_available(repo_dir: str, remote: str = "origin",
                         branch: str = "") -> Tuple[bool, str]:
    """Fetch and compare HEAD vs upstream. Returns (available, detail)."""
    if _git(repo_dir, "rev-parse", "--git-dir") is None:
        return False, "not_a_git_checkout"
    if _git(repo_dir, "fetch", remote) is None:
        return False, "fetch_failed"
    upstream = f"{remote}/{branch}" if branch else "@{u}"
    behind = _git(repo_dir, "rev-list", "--count", f"HEAD..{upstream}")
    if behind is None:
        return False, "no_upstream"
    return int(behind) > 0, f"behind_by_{behind}"


def git_fast_forward(repo_dir: str, remote: str = "origin",
                     branch: str = "") -> Tuple[bool, str]:
    """Fast-forward only; refuses on local modifications (stash-safe check,
    reference: updater.py:243-292)."""
    dirty = _git(repo_dir, "status", "--porcelain")
    if dirty:
        return False, "working_tree_dirty"
    target = f"{remote}/{branch}" if branch else "@{u}"
    out = _git(repo_dir, "merge", "--ff-only", target)
    if out is None:
        return False, "ff_merge_failed"
    return True, out.splitlines()[0] if out else "up_to_date"


# ---------------------------------------------------------------------------
# staged ZIP updates
# ---------------------------------------------------------------------------

def stage_zip_update(repo_dir: str, zip_path: str,
                     version: str = "") -> Tuple[bool, str]:
    """Extract a release ZIP into a staging dir + write the apply flag; the
    update is applied by :func:`apply_staged_update` on next start."""
    if not os.path.isfile(zip_path):
        return False, "zip_missing"
    stage_dir = os.path.join(repo_dir, ".pc_update_stage")
    if os.path.isdir(stage_dir):
        shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)
    try:
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(stage_dir)
    except (OSError, zipfile.BadZipFile) as e:
        return False, f"extract_failed:{e}"
    # single top-level folder (GitHub archive layout) → use it as the root
    entries = os.listdir(stage_dir)
    root = stage_dir
    if len(entries) == 1 and os.path.isdir(os.path.join(stage_dir, entries[0])):
        root = os.path.join(stage_dir, entries[0])
    flag = {"root": root, "version": version}
    with open(os.path.join(repo_dir, STAGE_FLAG), "w") as fh:
        json.dump(flag, fh)
    return True, root


def staged_update_pending(repo_dir: str) -> bool:
    return os.path.isfile(os.path.join(repo_dir, STAGE_FLAG))


def apply_staged_update(repo_dir: str) -> Tuple[bool, str]:
    """Copy the staged tree over the install, preserving user data dirs,
    then clear the flag (reference: updater.py:510-594)."""
    flag_path = os.path.join(repo_dir, STAGE_FLAG)
    if not os.path.isfile(flag_path):
        return False, "no_staged_update"
    try:
        with open(flag_path) as fh:
            flag = json.load(fh)
        root = flag["root"]
    except (OSError, json.JSONDecodeError, KeyError) as e:
        os.remove(flag_path)
        return False, f"bad_flag:{e}"
    if not os.path.isdir(root):
        os.remove(flag_path)
        return False, "stage_dir_missing"

    old_requirements = _read(os.path.join(repo_dir, "requirements.txt"))
    for name in os.listdir(root):
        if name in PRESERVE_DIRS or name == STAGE_FLAG:
            continue
        src = os.path.join(root, name)
        dst = os.path.join(repo_dir, name)
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    new_requirements = _read(os.path.join(repo_dir, "requirements.txt"))
    os.remove(flag_path)
    shutil.rmtree(os.path.join(repo_dir, ".pc_update_stage"),
                  ignore_errors=True)
    needs_deps = (old_requirements != new_requirements
                  and new_requirements is not None)
    return True, "deps_changed" if needs_deps else "applied"


def _read(path: str) -> Optional[str]:
    try:
        with open(path) as fh:
            return fh.read()
    except OSError:
        return None


@dataclass
class UpdateManager:
    """Check/perform updates with plain callbacks (GUI-free)."""

    repo_dir: str
    remote: str = "origin"
    branch: str = ""
    status: Callable[[str], None] = lambda msg: None

    def version(self) -> str:
        return current_version(self.repo_dir)

    def check(self) -> Tuple[bool, str]:
        self.status("checking for updates")
        return git_update_available(self.repo_dir, self.remote, self.branch)

    def perform(self) -> Tuple[bool, str]:
        self.status("updating")
        ok, detail = git_fast_forward(self.repo_dir, self.remote, self.branch)
        self.status(f"update {'ok' if ok else 'failed'}: {detail}")
        return ok, detail
