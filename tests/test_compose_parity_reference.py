"""Differential parity tests against the REFERENCE implementation.

The reference's crop composer is pure logic buried in a Qt class
(person_capture/gui_app.py). These tests extract the relevant method
sources via AST (no Qt import), execute them in a stub harness, and compare
decisions against our port on randomized scenarios. Skipped when the
reference checkout is absent.
"""

import ast
import math
import os
import textwrap
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
GUI = os.path.join(REF_ROOT, "person_capture", "gui_app.py")

pytestmark = pytest.mark.skipif(not os.path.isfile(GUI),
                                reason="reference checkout not mounted")

_METHODS = [
    "_compose_dataset_crop", "_ratio_crop_containing_box",
    "_choose_best_ratio", "_enforce_scale_and_margins",
    "_containment_deficit_xyxy", "_coerce_box_xyxy", "_union_boxes_xyxy",
    "_pad_box_xyxy", "_face_head_proxy_box", "_clip_to_frame",
    "_shift_crop_to_include_box", "_prefer_lower_face_crop_y",
    "_wide_context_cadence_active", "_effective_wide_context_max_frame_frac",
]


@pytest.fixture(scope="module")
def ref_harness():
    import sys

    sys.path.insert(0, REF_ROOT)
    from person_capture.utils import expand_box_to_ratio, parse_ratio

    src = open(GUI).read()
    tree = ast.parse(src)
    methods = {}
    is_static = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "Processor":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name in _METHODS:
                    seg = ast.get_source_segment(src, item)
                    methods[item.name] = textwrap.dedent(seg)
                    args = [a.arg for a in item.args.args]
                    is_static[item.name] = (not args or args[0] != "self")
    missing = set(_METHODS) - set(methods)
    assert not missing, f"reference methods not found: {missing}"

    from typing import Any, Dict, List, Optional, Tuple

    ns = {"math": math, "np": np, "parse_ratio": parse_ratio,
          "expand_box_to_ratio": expand_box_to_ratio,
          "Optional": Optional, "Tuple": Tuple, "List": List,
          "Dict": Dict, "Any": Any, "staticmethod": staticmethod}
    for name, code in methods.items():
        exec(compile(code, f"<ref:{name}>", "exec"), ns)

    class Harness:
        def __init__(self, cfg):
            self.cfg = cfg

        def _status(self, *a, **kw):
            pass

    for name in _METHODS:
        fn = ns[name]
        # decorators are not part of FunctionDef source segments: restore
        # @staticmethod for self-less reference methods
        setattr(Harness, name, staticmethod(fn) if is_static[name] else fn)
    return Harness


def _our_cfg():
    from person_capture_tpu.config import SessionConfig

    return SessionConfig()


def _random_scenario(rng):
    fw = int(rng.integers(640, 1921))
    fh = int(rng.integers(360, 1081))
    bounds = (0, 0, fw, fh)
    has_face = rng.random() < 0.85
    has_subj = rng.random() < 0.6
    face = None
    subj = None
    if has_face:
        fx = rng.uniform(0, fw * 0.8)
        fy = rng.uniform(0, fh * 0.7)
        fsz = rng.uniform(24, min(fw, fh) * 0.45)
        face = (fx, fy, min(fw - 1.0, fx + fsz), min(fh - 1.0, fy + fsz * 1.2))
    if has_subj:
        sx = rng.uniform(0, fw * 0.6)
        sy = rng.uniform(0, fh * 0.5)
        sw = rng.uniform(60, fw * 0.5)
        sh = rng.uniform(100, fh * 0.8)
        subj = (sx, sy, min(fw - 1.0, sx + sw), min(fh - 1.0, sy + sh))
        if face is not None:
            # place the face inside the subject's upper region when both exist
            fx1, fy1, fx2, fy2 = face
            subj = (min(subj[0], fx1 - 5), min(subj[1], fy1 - 5),
                    max(subj[2], fx2 + 5), max(subj[3], fy2 + 5))
            subj = (max(0.0, subj[0]), max(0.0, subj[1]),
                    min(fw - 1.0, subj[2]), min(fh - 1.0, subj[3]))
    base = face or subj or (fw * 0.25, fh * 0.25, fw * 0.75, fh * 0.75)
    ratio_pool = [["1:1", "2:3", "3:4"], ["2:3"], ["1:1"],
                  ["1:1", "2:3", "3:4", "16:9"], ["3:2", "2:3"]]
    ratios = ratio_pool[int(rng.integers(0, len(ratio_pool)))]
    frame_idx = int(rng.integers(0, 500))
    return bounds, base, subj, face, ratios, frame_idx


def test_ratio_crop_containing_box_parity(ref_harness):
    from person_capture_tpu.core.compose_profiles import \
        ratio_crop_containing_box

    rng = np.random.default_rng(0)
    h = ref_harness(_our_cfg())
    for _ in range(300):
        fw = int(rng.integers(200, 1921))
        fh = int(rng.integers(200, 1081))
        bounds = (0, 0, fw, fh)
        px = sorted(rng.uniform(0, fw, 2))
        py = sorted(rng.uniform(0, fh, 2))
        protect = (px[0], py[0], max(px[0] + 2, px[1]), max(py[0] + 2, py[1]))
        rs = ["1:1", "2:3", "3:4", "16:9"][int(rng.integers(0, 4))]
        anchor = (rng.uniform(0, fw), rng.uniform(0, fh)) \
            if rng.random() < 0.5 else None
        min_size = (rng.uniform(10, 500), rng.uniform(10, 500)) \
            if rng.random() < 0.5 else None
        ref = h._ratio_crop_containing_box(protect, rs, bounds,
                                           anchor=anchor,
                                           min_size_xy=min_size)
        ours = ratio_crop_containing_box(protect, rs, bounds, anchor=anchor,
                                         min_size_xy=min_size)
        assert tuple(ref) == tuple(ours), (protect, rs, anchor, min_size)


def test_enforce_scale_and_margins_parity(ref_harness):
    from person_capture_tpu.core.compose import enforce_scale_and_margins

    rng = np.random.default_rng(1)
    cfg = _our_cfg()
    h = ref_harness(cfg)
    for _ in range(300):
        fw, fh = 1920, 1080
        cx = sorted(rng.uniform(0, fw, 2))
        cy = sorted(rng.uniform(0, fh, 2))
        crop = (int(cx[0]), int(cy[0]),
                int(max(cx[0] + 10, cx[1])), int(max(cy[0] + 10, cy[1])))
        face = None
        if rng.random() < 0.8:
            fx = rng.uniform(0, fw * 0.8)
            fy = rng.uniform(0, fh * 0.8)
            fs = rng.uniform(20, 400)
            face = (int(fx), int(fy), int(min(fw, fx + fs)),
                    int(min(fh, fy + fs)))
        rs = ["1:1", "2:3", "3:4"][int(rng.integers(0, 3))]
        ref = h._enforce_scale_and_margins(crop, rs, fw, fh, face_box=face)
        ours = enforce_scale_and_margins(crop, rs, fw, fh, cfg,
                                         face_box=face)
        assert tuple(ref) == tuple(ours), (crop, rs, face)


def test_choose_best_ratio_parity(ref_harness):
    from person_capture_tpu.core.compose import choose_best_ratio

    rng = np.random.default_rng(2)
    cfg = _our_cfg()
    h = ref_harness(cfg)
    mismatches = 0
    for _ in range(200):
        bounds, base, subj, face, ratios, _ = _random_scenario(rng)
        fw, fh = bounds[2], bounds[3]
        det = subj or base
        anchor = None
        if face is not None and rng.random() < 0.5:
            anchor = (0.5 * (face[0] + face[2]), 0.5 * (face[1] + face[3]))
        ref_crop, ref_rs, ref_tl = h._choose_best_ratio(
            det, ratios, fw, fh, anchor=anchor, face_box=face)
        our_crop, our_rs, our_tl = choose_best_ratio(
            det, ratios, fw, fh, cfg, anchor=anchor, face_box=face)
        if (tuple(ref_crop), ref_rs) != (tuple(our_crop), our_rs):
            mismatches += 1
    assert mismatches == 0


def test_compose_dataset_crop_parity(ref_harness):
    from person_capture_tpu.core.compose_profiles import compose_dataset_crop

    rng = np.random.default_rng(3)
    cfg = _our_cfg()
    h = ref_harness(cfg)
    mismatches = []
    n = 200
    for i in range(n):
        bounds, base, subj, face, ratios, frame_idx = _random_scenario(rng)
        ref = h._compose_dataset_crop(base, list(ratios), bounds,
                                      subject_box=subj, face_box=face,
                                      frame_idx=frame_idx)
        ours = compose_dataset_crop(cfg, base, list(ratios), bounds,
                                    subject_box=subj, face_box=face,
                                    frame_idx=frame_idx)
        if (tuple(ref[0]), ref[1], ref[2]) != (tuple(ours[0]), ours[1],
                                               ours[2]):
            mismatches.append((i, ref, ours))
    assert not mismatches, mismatches[:3]


def test_prefer_lower_face_crop_parity(ref_harness):
    from person_capture_tpu.core.compose_profiles import \
        prefer_lower_face_crop_y
    from person_capture_tpu.core.geometry import face_head_proxy_box

    rng = np.random.default_rng(4)
    cfg = _our_cfg()
    h = ref_harness(cfg)
    for _ in range(200):
        bounds, base, subj, face, ratios, _ = _random_scenario(rng)
        if face is None:
            continue
        fw, fh = bounds[2], bounds[3]
        cx = sorted(rng.uniform(0, fw, 2))
        cy = sorted(rng.uniform(0, fh, 2))
        crop = (cx[0], cy[0], max(cx[0] + 50, cx[1]), max(cy[0] + 50, cy[1]))
        head = face_head_proxy_box(face, fw, fh,
                                   cfg.crop_head_side_pad_frac,
                                   cfg.crop_head_top_pad_frac,
                                   cfg.crop_head_bottom_pad_frac)
        profile = ["close", "upper", "body"][int(rng.integers(0, 3))]
        ref = h._prefer_lower_face_crop_y(crop, face, head, bounds, profile)
        ours = prefer_lower_face_crop_y(crop, face, head, bounds, profile)
        assert tuple(ref) == tuple(ours)

def test_find_person_box_for_face_parity():
    """The owning-person-box scorer (containment priority, top-band bias,
    distance tiebreak, area penalty, plausibility cutoff) must pick the
    SAME box or None as the reference's Processor._find_person_box_for_face
    on randomized face/person layouts."""
    import sys

    sys.path.insert(0, REF_ROOT)
    src = open(GUI).read()
    tree = ast.parse(src)
    ns = {"np": np, "math": math}
    from typing import Any, Dict, List, Optional, Tuple

    ns.update({"Optional": Optional, "Tuple": Tuple, "List": List,
               "Dict": Dict, "Any": Any})
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "Processor":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) \
                        and item.name == "_find_person_box_for_face":
                    exec(compile(textwrap.dedent(
                        ast.get_source_segment(src, item)),
                        "<ref:_find_person_box_for_face>", "exec"), ns)
    ref = ns["_find_person_box_for_face"]

    from person_capture_tpu.core.geometry import find_person_box_for_face

    rng = np.random.default_rng(5)
    n_some = 0
    for trial in range(300):
        W = int(rng.integers(320, 1921))
        H = int(rng.integers(240, 1081))
        fx = rng.uniform(0, W * 0.9)
        fy = rng.uniform(0, H * 0.9)
        fs = rng.uniform(10, min(W, H) * 0.5)
        face = (fx, fy, fx + fs, fy + fs * 1.1)
        persons = []
        for _ in range(int(rng.integers(0, 5))):
            px = rng.uniform(-50, W)
            py = rng.uniform(-50, H)
            pw = rng.uniform(30, W)
            phh = rng.uniform(60, H)
            persons.append({"xyxy": (px, py, px + pw, py + phh)})
        a = ref(face, persons, W, H)
        b = find_person_box_for_face(face, persons, W, H)
        assert (a is None) == (b is None), (trial, face, persons)
        if a is not None:
            n_some += 1
            np.testing.assert_allclose(a, b, rtol=0, atol=0)
        # tuple persons (our internal call shape) must select the same box
        b2 = find_person_box_for_face(
            face, [p["xyxy"] for p in persons], W, H)
        assert (b2 is None) == (b is None)
        if b is not None:
            np.testing.assert_allclose(b2, b)
    assert n_some >= 60
