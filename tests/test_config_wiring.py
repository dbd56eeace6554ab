"""Config completeness audit: every SessionConfig field is either consumed
somewhere in the package (grep outside config.py and the generic GUI
binding) or carries a documented no-op rationale in ``NOOP_KEYS`` —
VERDICT r1 weak #4 ("preset-compat theater") made permanent policy."""

import dataclasses
import os
import re

import person_capture_tpu
from person_capture_tpu.config import NOOP_KEYS, SessionConfig

PKG_DIR = os.path.dirname(person_capture_tpu.__file__)
# files whose mention of a key does NOT count as consumption: the schema
# itself and the generic control binding (it binds fields by reflection)
EXCLUDE = {"config.py", "cfgbind.py"}


def _package_source() -> str:
    chunks = []
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py") or f in EXCLUDE:
                continue
            with open(os.path.join(root, f)) as fh:
                chunks.append(fh.read())
    return "\n".join(chunks)


def test_every_key_wired_or_documented():
    src = _package_source()
    silent = []
    for f in dataclasses.fields(SessionConfig):
        if f.name in NOOP_KEYS:
            continue
        if not re.search(r"\b" + re.escape(f.name) + r"\b", src):
            silent.append(f.name)
    assert not silent, (
        f"silently-ignored config keys (wire them or add a NOOP_KEYS "
        f"rationale): {sorted(silent)}")


def test_noop_keys_exist_and_are_not_wired_claims():
    names = {f.name for f in dataclasses.fields(SessionConfig)}
    stale = set(NOOP_KEYS) - names
    assert not stale, f"NOOP_KEYS entries without a config field: {stale}"
    for k, why in NOOP_KEYS.items():
        assert isinstance(why, str) and len(why) >= 12, k
