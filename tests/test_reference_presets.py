"""Load the reference's ACTUAL preset files through the CLI preset path.

The reference ships solidpreset.json (224 keys), preset_face_strict.json
and preset_face_balanced.json; schema compatibility means a reference user
can feed them to --preset unchanged. The files are read from the read-only
mount at test time — no reference content is committed to this repo.
"""

import json
import os
from dataclasses import fields

import pytest

from person_capture_tpu.config import NOOP_KEYS, SessionConfig
from person_capture_tpu.main import build_config, build_parser

REF_PRESETS = [
    "/root/reference/solidpreset.json",
    "/root/reference/preset_face_strict.json",
    "/root/reference/preset_face_balanced.json",
]


def _presets():
    return [p for p in REF_PRESETS if os.path.isfile(p)]


@pytest.mark.skipif(not _presets(), reason="reference mount not present")
@pytest.mark.parametrize("path", _presets(),
                         ids=[os.path.basename(p) for p in REF_PRESETS])
def test_reference_preset_loads_with_full_key_coverage(path):
    with open(path) as fh:
        d = json.load(fh)
    names = {f.name for f in fields(SessionConfig)}
    unknown = sorted(k for k in d if k not in names)
    assert not unknown, f"reference preset keys missing from schema: {unknown}"

    cfg = SessionConfig.from_json(json.dumps(d))
    # every non-path key either lands on the config verbatim (after tuple
    # coercion) or is a documented NOOP that still round-trips
    from person_capture_tpu.config import _PATH_KEYS

    for k, v in d.items():
        if k in _PATH_KEYS:
            continue
        got = getattr(cfg, k)
        if isinstance(got, tuple):
            assert got == tuple(v), k
        else:
            assert got == v, f"{k}: {got!r} != {v!r}"
    # NOOP keys present in the preset survive a save/load round trip
    out = json.loads(cfg.to_json())
    for k in set(d) & set(NOOP_KEYS):
        assert out[k] == getattr(cfg, k), k


@pytest.mark.skipif(not _presets(), reason="reference mount not present")
def test_reference_preset_through_cli_flag(tmp_path):
    """--preset <reference solidpreset.json> parses through the real CLI
    precedence chain (preset < explicit flags < --set)."""
    path = REF_PRESETS[0]
    ap = build_parser()
    args = ap.parse_args(["--video", "v.mp4", "--ref", "r.png",
                          "--out", str(tmp_path), "--preset", path,
                          "--set", "face_thresh=0.3"])
    cfg = build_config(args, ap)
    with open(path) as fh:
        d = json.load(fh)
    # preset values applied where not overridden…
    assert cfg.prescan_stride == d["prescan_stride"]
    assert cfg.match_mode == d["match_mode"]
    # …and --set wins over the preset
    assert cfg.face_thresh == 0.3
