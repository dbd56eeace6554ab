"""Differential parity vs the reference's utils.py and bank logic.

person_capture/utils.py imports only cv2+numpy and is importable directly;
the bank updater is extracted from gui_app.py via AST like the composer
tests. Skipped when the reference checkout is absent.
"""

import ast
import os
import textwrap

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "person_capture")),
    reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_utils():
    import sys

    sys.path.insert(0, REF_ROOT)
    from person_capture import utils

    return utils


def test_expand_box_to_ratio_parity(ref_utils):
    from person_capture_tpu.core.geometry import expand_box_to_ratio

    rng = np.random.default_rng(0)
    for _ in range(500):
        fw = int(rng.integers(100, 3841))
        fh = int(rng.integers(100, 2161))
        x1 = rng.uniform(-50, fw)
        y1 = rng.uniform(-50, fh)
        x2 = x1 + rng.uniform(1, fw)
        y2 = y1 + rng.uniform(1, fh)
        rw = float(rng.integers(1, 17))
        rh = float(rng.integers(1, 17))
        anchor = ((rng.uniform(0, fw), rng.uniform(0, fh))
                  if rng.random() < 0.5 else None)
        hb = rng.uniform(-1.5, 1.5) if rng.random() < 0.5 else 0.0
        ref = ref_utils.expand_box_to_ratio(x1, y1, x2, y2, rw, rh, fw, fh,
                                            anchor=anchor, head_bias=hb)
        ours = expand_box_to_ratio(x1, y1, x2, y2, rw, rh, fw, fh,
                                   anchor=anchor, head_bias=hb)
        assert tuple(ref) == tuple(ours)


def test_detect_black_borders_parity(ref_utils):
    from person_capture_tpu.core.geometry import detect_black_borders

    rng = np.random.default_rng(1)
    for _ in range(40):
        h = int(rng.integers(30, 400))
        w = int(rng.integers(30, 400))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        t, b, l, r = (int(v) for v in rng.integers(0, 30, 4))
        if t:
            img[:t] = 0
        if b:
            img[-b:] = 0
        if l:
            img[:, :l] = 0
        if r:
            img[:, -r:] = 0
        thr = int(rng.integers(5, 40))
        assert ref_utils.detect_black_borders(img, thr=thr) == \
            detect_black_borders(img, thr=thr)


def test_phash_parity(ref_utils):
    from person_capture_tpu.core.hashing import phash_bits, phash_similarity

    rng = np.random.default_rng(2)
    for _ in range(20):
        img = rng.integers(0, 255, (int(rng.integers(40, 200)),
                                    int(rng.integers(40, 200)), 3),
                           dtype=np.uint8)
        ref = ref_utils._phash_bits(img)
        ours = phash_bits(img)
        # identical DCT backend (cv2) → identical bits; allow a median-tie bit
        assert phash_similarity(ref, ours) >= 63 / 64
    assert ref_utils.phash_similarity(0xF0, 0x0F) == \
        phash_similarity(0xF0, 0x0F)


def test_cosine_distance_parity(ref_utils):
    from person_capture_tpu.core.geometry import cosine_distance

    rng = np.random.default_rng(3)
    for _ in range(50):
        a = rng.normal(size=64)
        b = rng.normal(size=64)
        assert ref_utils.cosine_distance(a, b) == \
            pytest.approx(cosine_distance(a, b), abs=1e-7)


@pytest.fixture(scope="module")
def ref_bank_updater():
    src = open(os.path.join(REF_ROOT, "person_capture", "gui_app.py")).read()
    tree = ast.parse(src)
    wanted = {"_stream_ref_bank_update", "_prescan_weights", "_fd_min"}
    ns = {"np": np}
    from typing import List, Optional, Tuple

    ns.update({"List": List, "Optional": Optional, "Tuple": Tuple,
               "SessionConfig": object, "json": __import__("json"),
               "ast": ast})
    is_static = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "Processor":
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name in wanted:
                    exec(compile(textwrap.dedent(
                        ast.get_source_segment(src, item)),
                        f"<ref:{item.name}>", "exec"), ns)
                    args = [a.arg for a in item.args.args]
                    is_static[item.name] = (not args or args[0] != "self")

    class H:
        pass

    for name in wanted:
        setattr(H, name, staticmethod(ns[name]) if is_static[name]
                else ns[name])
    return H


def test_bank_update_parity(ref_bank_updater):
    from person_capture_tpu.config import SessionConfig
    from person_capture_tpu.core.bank import RefBank, fd_min

    cfg = SessionConfig()
    h = ref_bank_updater()
    rng = np.random.default_rng(4)

    ref_list = []
    ref_feat = None
    ours = RefBank(cap=cfg.prescan_bank_max,
                   dedup_cos=cfg.prescan_diversity_dedup_cos,
                   replace_margin=cfg.prescan_replace_margin,
                   weights=tuple(cfg.prescan_weights))
    # identity-ish stream: base direction + noise, occasional outliers
    base = rng.normal(size=512).astype(np.float32)
    base /= np.linalg.norm(base)
    for i in range(300):
        if rng.random() < 0.1:
            v = rng.normal(size=512).astype(np.float32)
        else:
            v = base + rng.normal(0, 0.2, 512).astype(np.float32)
        q = float(rng.uniform(0, 900))
        ref_feat, ref_action, _ = h._stream_ref_bank_update(
            ref_list, ref_feat, v, q, cfg)
        our_action, _ = ours.update(v, q)
        assert ref_action == our_action, (i, ref_action, our_action)
    assert ours.size == len(ref_list)
    np.testing.assert_allclose(ours.matrix(), np.vstack(ref_list), atol=1e-6)

    # fd parity on the final bank
    for _ in range(20):
        v = rng.normal(size=512).astype(np.float32)
        assert h._fd_min(v, ref_feat) == pytest.approx(
            fd_min(v, ours.matrix()), abs=1e-6)