"""Differential parity of the container keyframe parsers vs the
reference's own (AST-extracted) box/EBML walkers.

The rebuild's `video/keyframes.py` is an in-memory moov-buffer / Cues
scanner designed independently of the reference's file-seek walkers
(gui_app.py:3637-3971); both must report the SAME keyframe indexes on
the same real containers — these seeks gate main-pass span jumps and the
r5 seek-sampling cost model, so a parser disagreement would silently
shift which frames get decoded.
"""

import ast
import os
import struct
import textwrap

import numpy as np
import pytest

from person_capture_tpu.video.keyframes import (mkv_read_cues,
                                                mp4_read_stss,
                                                read_keyframes)
from person_capture_tpu.video.synthetic import generate_video

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "person_capture")),
    reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_parsers():
    """Extract Processor._mp4_read_stss / _mkv_read_cues — pure methods
    (no self state) — and bind them as plain functions."""
    from typing import Any, Dict, List, Optional, Tuple

    src = open(os.path.join(REF_ROOT, "person_capture",
                            "gui_app.py")).read()
    tree = ast.parse(src)
    ns = {"np": np, "os": os, "struct": struct, "Optional": Optional,
          "Tuple": Tuple, "List": List, "Dict": Dict, "Any": Any}
    want = {"_mp4_read_stss", "_mkv_read_cues"}
    found = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name in want:
                    exec(compile(
                        textwrap.dedent(ast.get_source_segment(src, item)),
                        f"<ref:{item.name}>", "exec"), ns)
                    found.add(item.name)
    assert found == want, want - found
    return ns


def test_mp4_stss_parity(ref_parsers, tmp_path):
    # total ≡ 1 (mod GOP 12) makes the LAST frame a sync sample, which
    # turns the reference's trailing rescale heuristic into the identity
    # (gui_app.py:3747-3753 scales sample numbers by total/max_sample —
    # see the divergence test below) so the two parsers' box walks can
    # be compared exactly.
    path = str(tmp_path / "t.mp4")
    total = 145
    generate_video(path, width=160, height=120, fps=30.0,
                   total_frames=total, segments=[(20, 60, 0)])
    ours = mp4_read_stss(path, total)
    theirs = ref_parsers["_mp4_read_stss"](None, path, total)
    assert ours, "mp4v writer should emit sync samples"
    assert ours == theirs
    assert read_keyframes(path, 30.0, total) == ours


def test_mp4_stss_truth_where_reference_heuristic_drifts(ref_parsers,
                                                         tmp_path):
    """When the last frame is NOT a keyframe, the reference rescales
    sample numbers by total_frames/max_sample (gui_app.py:3747-3753) —
    but max_sample is the last SYNC sample, not the sample count, so its
    indexes drift off the real GOP grid (harmless there: only a seek
    heuristic). Ours must stay on the encoder's exact grid — the r5
    seek-sampling cost model and span jumps depend on true positions."""
    path = str(tmp_path / "t.mp4")
    total = 180                      # last keyframe at 168 != last frame
    generate_video(path, width=160, height=120, fps=30.0,
                   total_frames=total, segments=[(20, 60, 0)])
    ours = mp4_read_stss(path, total)
    assert ours == list(range(0, total, 12))      # true GOP-12 grid
    theirs = ref_parsers["_mp4_read_stss"](None, path, total)
    assert theirs != ours            # documents the reference's drift


def test_mkv_cues_parity(ref_parsers, tmp_path):
    path = str(tmp_path / "t.webm")
    total = 120
    generate_video(path, width=160, height=120, fps=30.0,
                   total_frames=total, segments=[(10, 40, 0)],
                   fourcc="vp90")
    ours = mkv_read_cues(path, 30.0, total)
    theirs = ref_parsers["_mkv_read_cues"](None, path, 30.0, total)
    if not theirs and not ours:
        pytest.skip("muxer wrote no Cues")
    assert ours == theirs
    assert read_keyframes(path, 30.0, total) == ours
