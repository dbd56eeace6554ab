"""Differential parity vs reference main.py and dataset_curator.py helpers
(AST-extracted; those modules import heavy deps at module level so they are
not importable directly). Skipped when the reference checkout is absent.
"""

import ast
import math
import os
import textwrap

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "person_capture")),
    reason="reference checkout not mounted")


def _extract_functions(path, names, extra_ns=None):
    src = open(path).read()
    tree = ast.parse(src)
    import cv2

    from typing import Any, Dict, List, Optional, Tuple

    ns = {"np": np, "cv2": cv2, "math": math, "Optional": Optional,
          "Tuple": Tuple, "List": List, "Dict": Dict, "Any": Any}
    if extra_ns:
        ns.update(extra_ns)
    found = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                         f"<ref:{node.name}>", "exec"), ns)
            found.add(node.name)
    missing = set(names) - found
    assert not missing, missing
    return ns


@pytest.fixture(scope="module")
def ref_main():
    import sys

    sys.path.insert(0, REF_ROOT)
    from person_capture.utils import parse_ratio

    return _extract_functions(
        os.path.join(REF_ROOT, "person_capture", "main.py"),
        ["combine_scores", "_calc_sharpness", "_enforce_scale_and_margins",
         "_clip_to_frame", "pick_anchor_from_face"],
        extra_ns={"parse_ratio": parse_ratio})


def test_combine_scores_parity(ref_main):
    from person_capture_tpu.core.scoring import combine_scores

    rng = np.random.default_rng(0)
    for _ in range(100):
        fd = float(rng.uniform(0, 1)) if rng.random() < 0.8 else None
        rd = float(rng.uniform(0, 1)) if rng.random() < 0.8 else None
        for mode in ("min", "avg", "face_priority"):
            assert ref_main["combine_scores"](fd, rd, mode) == \
                combine_scores(fd, rd, mode)


def test_calc_sharpness_parity(ref_main):
    from person_capture_tpu.core.scoring import calc_sharpness

    rng = np.random.default_rng(1)
    for _ in range(10):
        h = int(rng.integers(40, 500))
        w = int(rng.integers(40, 500))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        assert ref_main["_calc_sharpness"](img) == \
            pytest.approx(calc_sharpness(img), rel=1e-6)
    assert calc_sharpness(None) == 0.0


@pytest.fixture(scope="module")
def ref_curator():
    return _extract_functions(
        os.path.join(REF_ROOT, "person_capture", "dataset_curator.py"),
        ["phash64", "hamming64", "sharpness_norm", "exposure_score",
         "face_fraction", "yaw_roll_from_5pts"])


def test_curator_phash_parity(ref_curator):
    from person_capture_tpu.curator.core import hamming64, phash64

    rng = np.random.default_rng(2)
    for _ in range(15):
        img = rng.integers(0, 255, (int(rng.integers(40, 300)),
                                    int(rng.integers(40, 300)), 3),
                           dtype=np.uint8)
        assert ref_curator["phash64"](img) == phash64(img)
    assert ref_curator["hamming64"](0xABC, 0xDEF) == hamming64(0xABC, 0xDEF)


def test_curator_feature_parity(ref_curator):
    from person_capture_tpu.curator.core import (exposure_score,
                                                 sharpness_norm,
                                                 yaw_roll_from_5pts)

    rng = np.random.default_rng(3)
    for _ in range(10):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        assert ref_curator["sharpness_norm"](img) == \
            pytest.approx(sharpness_norm(img), rel=1e-6)
        assert ref_curator["exposure_score"](img) == \
            pytest.approx(exposure_score(img), rel=1e-6)
        pts = rng.uniform(0, 100, (5, 2)).astype(np.float32)
        ref_yr = ref_curator["yaw_roll_from_5pts"](pts)
        our_yr = yaw_roll_from_5pts(pts)
        assert ref_yr == pytest.approx(our_yr, abs=1e-5)