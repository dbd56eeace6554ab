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

def _extract_nested_function(path, name, extra_ns=None):
    """Extract a FunctionDef found ANYWHERE in the module (the reference
    nests helpers inside methods); it must be self-contained."""
    src = open(path).read()
    tree = ast.parse(src)
    ns = {"np": np, "math": math}
    if extra_ns:
        ns.update(extra_ns)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                         f"<ref:{name}>", "exec"), ns)
            return ns[name]
    raise AssertionError(f"{name} not found in {path}")


def _ref_gains_from_lut(lut):
    """Recover (pos_gain, neg_gain) from the reference's 256-entry chroma
    LUT (lut = 128 + axis*gain, rounded/clipped). Read at axis ±50 so the
    max gain 2.25 stays inside the uint8 clip (128 + 50*2.25 < 255)."""
    pos = (float(lut[178]) - 128.0) / 50.0
    neg = (float(lut[78]) - 128.0) / -50.0
    return pos, neg


@pytest.mark.parametrize("seed,cast", [(0, 1.0), (1, 1.6), (2, 0.55),
                                       (3, 1.0)])
def test_chroma_side_gain_parity_reference(seed, cast):
    """fit_chroma_side_gains vs the reference's _neutral_chroma_gain_lut
    (gui_app.py:9641-9692) executed directly: same per-side p75 gains
    (deviation-union selection, 256-px side minimum, all-pixel fallback,
    [0.40, 2.25] clip)."""
    from typing import Optional

    import jax.numpy as jnp

    from person_capture_tpu.kernels.colormatch import fit_chroma_side_gains

    ref_fn = _extract_nested_function(
        os.path.join(REF_ROOT, "person_capture", "gui_app.py"),
        "_neutral_chroma_gain_lut", extra_ns={"Optional": Optional})

    rng = np.random.default_rng(seed)
    src = np.clip(rng.normal(128, 22, (120, 160)), 0, 255).astype(np.uint8)
    if seed == 3:
        # sparse positive side: only ~4% of pixels excursion positive
        src = np.clip(rng.normal(118, 6, (120, 160)), 0, 255) \
            .astype(np.uint8)
        src[:5] = 180
    dev = src.astype(np.float32) - 128.0
    dst = np.clip(128.0 + np.where(dev > 0, dev * cast, dev), 0,
                  255).astype(np.uint8)
    mask = np.ones(src.shape, bool)

    lut = ref_fn(src, dst, mask)
    assert lut is not None
    want_pos, want_neg = _ref_gains_from_lut(lut)

    clean_n = (src.astype(np.float32) - 128.0) / 255.0
    ref_n = (dst.astype(np.float32) - 128.0) / 255.0
    pos, neg = fit_chroma_side_gains(jnp.asarray(clean_n),
                                     jnp.asarray(ref_n))
    assert float(pos) == pytest.approx(want_pos, abs=0.03)
    assert float(neg) == pytest.approx(want_neg, abs=0.03)


def test_ratio_and_categorize_parity_reference():
    """ratio_label/categorize vs the reference's nested norm_ratio /
    _categorize executed directly (dataset_curator.py:587-607, 730-744)."""
    from types import SimpleNamespace

    from person_capture_tpu.curator.core import categorize, ratio_label

    path = os.path.join(REF_ROOT, "person_capture", "dataset_curator.py")
    ref_norm = _extract_nested_function(path, "norm_ratio")
    ref_cat = _extract_nested_function(path, "_categorize",
                                       extra_ns={"Item": SimpleNamespace})

    rng = np.random.default_rng(0)
    for _ in range(300):
        w = int(rng.integers(50, 2000))
        h = int(rng.integers(50, 2000))
        assert ratio_label(w, h) == ref_norm(w, h), (w, h)
        f = float(rng.uniform(0.0, 0.6))
        ours = categorize(SimpleNamespace(ratio=ratio_label(w, h),
                                          face_frac=f))
        want = ref_cat(SimpleNamespace(ratio=ref_norm(w, h), face_frac=f))
        assert ours == want, (w, h, f)


def test_closeup_boost_parity_reference():
    """closeup_boosted_quality vs the reference's nested q_for_mmr
    (dataset_curator.py:918-927) executed directly with the closure
    variables supplied as globals."""
    from types import SimpleNamespace

    from person_capture_tpu.curator.core import closeup_boosted_quality

    path = os.path.join(REF_ROOT, "person_capture", "dataset_curator.py")
    src = open(path).read()
    tree = ast.parse(src)
    node = next(n for n in ast.walk(tree)
                if isinstance(n, ast.FunctionDef) and n.name == "q_for_mmr")
    rng = np.random.default_rng(0)
    for _ in range(200):
        boost = float(rng.choice([0.0, 0.25, 1.0, rng.uniform(0, 3)]))
        thr = float(rng.choice([0.0, 0.33, 0.9, rng.uniform(0, 1)]))
        ns = {"np": np, "closeup_boost": boost, "closeup_thr": thr,
              "Item": SimpleNamespace}
        exec(compile(textwrap.dedent(ast.get_source_segment(src, node)),
                     "<ref:q_for_mmr>", "exec"), ns)
        q = float(rng.uniform(-0.2, 1.2))
        frac = float(rng.uniform(0, 1.2))
        it = SimpleNamespace(quality_score=q, face_frac=frac)
        assert ns["q_for_mmr"](it) == pytest.approx(
            closeup_boosted_quality(q, frac, boost, thr), abs=1e-12)


def _extract_methods(path, class_name, names):
    """Extract named (static)methods from a class body; decorators are not
    part of the FunctionDef source segment, so they exec as plain
    functions."""
    import textwrap as _tw
    from typing import Optional

    src = open(path).read()
    tree = ast.parse(src)
    ns = {"np": np, "math": math, "Optional": Optional}
    found = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name in names:
                    seg = " " * sub.col_offset + ast.get_source_segment(
                        src, sub)
                    exec(compile(_tw.dedent(seg), f"<ref:{sub.name}>",
                                 "exec"), ns)
                    found.add(sub.name)
    missing = set(names) - found
    assert not missing, missing
    return ns


def test_canon_5pts_parity_reference():
    """Landmark canonicalization drives every ArcFace alignment: the repo's
    canon_5pts must accept/reject and order EXACTLY like the reference's
    FaceEmbedder._canon_5pts (face_embedder.py:1430-1463) on random point
    sets, valid synthetic faces, and the documented rejection geometries."""
    from person_capture_tpu.ops.align import canon_5pts

    ref = _extract_methods(
        os.path.join(REF_ROOT, "person_capture", "face_embedder.py"),
        "FaceEmbedder", ["_canon_5pts"])["_canon_5pts"]

    rng = np.random.default_rng(11)
    n_valid = 0
    for trial in range(400):
        if trial % 4 == 0:
            # face-like: eyes above nose above mouth, jittered
            base = np.array([[30, 40], [80, 40], [55, 65],
                             [38, 90], [72, 90]], np.float32)
            pts = base + rng.normal(0, 12, (5, 2)).astype(np.float32)
        else:
            pts = rng.uniform(0, 112, (5, 2)).astype(np.float32)
        a = ref(pts.copy())
        b = canon_5pts(pts.copy())
        assert (a is None) == (b is None), (trial, pts, a, b)
        if a is not None:
            n_valid += 1
            np.testing.assert_array_equal(a, b)
    assert n_valid >= 40          # the valid branch was actually exercised

    # shape / NaN / None gates
    assert ref(None) is None and canon_5pts(None) is None
    nan = np.full((5, 2), np.nan, np.float32)
    assert ref(nan.copy()) is None and canon_5pts(nan.copy()) is None
    four = np.zeros((4, 2), np.float32)
    assert ref(four) is None and canon_5pts(four) is None
