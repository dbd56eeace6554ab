"""ONNX graph executor parity vs torch functional ops.

ONNX fixture files are authored with tools/onnx_lite.write_onnx (the `onnx`
package is not installed); expected values come from torch, which uses the
same operator semantics the reference's onnxruntime path executes
(person_capture/face_embedder.py:967-1197).
"""

import numpy as np
import pytest

from person_capture_tpu.tools.onnx_lite import OnnxNode, parse_onnx, write_onnx
from person_capture_tpu.tools.onnx_exec import load_onnx_module

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _run_graph(tmp_path, nodes, inits, inputs, outputs, feed, opset=11):
    path = str(tmp_path / "m.onnx")
    write_onnx(path, nodes=nodes, initializers=inits,
               inputs=inputs, outputs=outputs, opset=opset)
    mod = load_onnx_module(path)
    out = mod(mod.params, *feed)
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def test_writer_parser_roundtrip(tmp_path):
    w = np.random.default_rng(0).normal(size=(4, 3, 3, 3)).astype(np.float32)
    nodes = [OnnxNode("Conv", ["x", "w"], ["y"], name="c0",
                      attrs={"strides": [2, 2], "pads": [1, 1, 1, 1],
                             "kernel_shape": [3, 3], "group": 1})]
    path = str(tmp_path / "rt.onnx")
    write_onnx(path, nodes=nodes, initializers={"w": w},
               inputs={"x": (1, 3, 8, 8)}, outputs=["y"], opset=13)
    g = parse_onnx(path)
    assert g.opset == 13
    assert g.input_names == ["x"]
    assert g.input_shapes["x"] == (1, 3, 8, 8)
    assert g.output_names == ["y"]
    assert g.nodes[0].op_type == "Conv"
    assert g.nodes[0].attrs["strides"] == [2, 2]
    assert g.nodes[0].attrs["group"] == 1
    np.testing.assert_array_equal(g.initializers["w"], w)


def test_negative_int_attrs_roundtrip(tmp_path):
    nodes = [OnnxNode("Concat", ["a", "b"], ["y"], attrs={"axis": -1}),
             OnnxNode("Gather", ["y", "i"], ["z"], attrs={"axis": 1})]
    path = str(tmp_path / "neg.onnx")
    write_onnx(path, nodes=nodes,
               initializers={"i": np.asarray([-1], np.int64)},
               inputs={"a": (2, 3), "b": (2, 3)}, outputs=["z"])
    g = parse_onnx(path)
    assert g.nodes[0].attrs["axis"] == -1
    assert g.initializers["i"][0] == -1


def test_conv_variants(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 13, 11)).astype(np.float32)
    for groups, stride, pad, dil, out_ch in [(1, 1, 0, 1, 8), (1, 2, 1, 1, 8),
                                             (2, 1, 2, 2, 8), (6, 1, 1, 1, 6)]:
        w = rng.normal(size=(out_ch, 6 // groups, 3, 3)).astype(np.float32)
        b = rng.normal(size=(out_ch,)).astype(np.float32)
        nodes = [OnnxNode("Conv", ["x", "w", "b"], ["y"], attrs={
            "strides": [stride, stride], "pads": [pad] * 4,
            "dilations": [dil, dil], "group": groups,
            "kernel_shape": [3, 3]})]
        got = _run_graph(tmp_path, nodes, {"w": w, "b": b},
                         {"x": x.shape}, ["y"], [x])
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                        torch.from_numpy(b), stride=stride, padding=pad,
                        dilation=dil, groups=groups).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_same_upper(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 9, 9)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    nodes = [OnnxNode("Conv", ["x", "w"], ["y"], attrs={
        "auto_pad": "SAME_UPPER", "strides": [1, 1],
        "kernel_shape": [3, 3]})]
    got = _run_graph(tmp_path, nodes, {"w": w}, {"x": x.shape}, ["y"], [x])
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batchnorm_prelu(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 7)).astype(np.float32)
    scale = rng.uniform(0.5, 2, 5).astype(np.float32)
    bias = rng.normal(size=5).astype(np.float32)
    mean = rng.normal(size=5).astype(np.float32)
    var = rng.uniform(0.5, 2, 5).astype(np.float32)
    slope = rng.uniform(0.05, 0.3, 5).astype(np.float32)
    for slope_shape in [(5, 1, 1), (1, 5, 1, 1)]:
        nodes = [
            OnnxNode("BatchNormalization",
                     ["x", "scale", "bias", "mean", "var"], ["bn"],
                     attrs={"epsilon": 1e-3}),
            OnnxNode("PRelu", ["bn", "slope"], ["y"]),
        ]
        inits = {"scale": scale, "bias": bias, "mean": mean, "var": var,
                 "slope": slope.reshape(slope_shape)}
        got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
        bn = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                          torch.from_numpy(var), torch.from_numpy(scale),
                          torch.from_numpy(bias), training=False, eps=1e-3)
        want = F.prelu(bn, torch.from_numpy(slope)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pools(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 3, 11, 11)).astype(np.float32)
    # MaxPool with pads + ceil_mode
    nodes = [OnnxNode("MaxPool", ["x"], ["y"], attrs={
        "kernel_shape": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1],
        "ceil_mode": 1})]
    got = _run_graph(tmp_path, nodes, {}, {"x": x.shape}, ["y"], [x])
    want = F.max_pool2d(torch.from_numpy(x), 3, 2, 1, ceil_mode=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # AveragePool, pads, count_include_pad=0
    nodes = [OnnxNode("AveragePool", ["x"], ["y"], attrs={
        "kernel_shape": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1],
        "count_include_pad": 0})]
    got = _run_graph(tmp_path, nodes, {}, {"x": x.shape}, ["y"], [x])
    want = F.avg_pool2d(torch.from_numpy(x), 3, 2, 1,
                        count_include_pad=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # GlobalAveragePool
    nodes = [OnnxNode("GlobalAveragePool", ["x"], ["y"])]
    got = _run_graph(tmp_path, nodes, {}, {"x": x.shape}, ["y"], [x])
    np.testing.assert_allclose(got, x.mean(axis=(2, 3), keepdims=True),
                               rtol=1e-5, atol=1e-5)


def test_gemm_matmul(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.normal(size=(4, 6)).astype(np.float32)
    w = rng.normal(size=(8, 6)).astype(np.float32)
    c = rng.normal(size=(8,)).astype(np.float32)
    nodes = [OnnxNode("Gemm", ["a", "w", "c"], ["y"], attrs={
        "alpha": 1.0, "beta": 1.0, "transB": 1})]
    got = _run_graph(tmp_path, nodes, {"w": w, "c": c},
                     {"a": a.shape}, ["y"], [a])
    np.testing.assert_allclose(got, a @ w.T + c, rtol=1e-4, atol=1e-4)


def test_resize_nearest_and_linear(tmp_path):
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 2, 5, 7)).astype(np.float32)
    # nearest / asymmetric / floor — the FPN upsample in SCRFD exports
    nodes = [OnnxNode("Resize", ["x", "", "scales"], ["y"], attrs={
        "mode": "nearest", "coordinate_transformation_mode": "asymmetric",
        "nearest_mode": "floor"})]
    inits = {"scales": np.asarray([1, 1, 2, 2], np.float32)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # linear / pytorch_half_pixel == torch bilinear align_corners=False
    nodes = [OnnxNode("Resize", ["x", "", "scales"], ["y"], attrs={
        "mode": "linear",
        "coordinate_transformation_mode": "pytorch_half_pixel"})]
    inits = {"scales": np.asarray([1, 1, 1.6, 2.4], np.float32)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    want = F.interpolate(torch.from_numpy(x), scale_factor=(1.6, 2.4),
                         mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # linear / align_corners, via explicit sizes
    nodes = [OnnxNode("Resize", ["x", "", "", "sizes"], ["y"], attrs={
        "mode": "linear", "coordinate_transformation_mode": "align_corners"})]
    inits = {"sizes": np.asarray([1, 2, 10, 14], np.int64)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    want = F.interpolate(torch.from_numpy(x), size=(10, 14),
                         mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tensor_manipulation_ops(tmp_path):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    # Slice with negative step on axis 2, plus Gather negative index
    nodes = [
        OnnxNode("Slice", ["x", "st", "en", "ax", "sp"], ["s"]),
        OnnxNode("Gather", ["s", "gi"], ["g"], attrs={"axis": 1}),
        OnnxNode("Transpose", ["g"], ["t"], attrs={"perm": [1, 0]}),
        OnnxNode("Unsqueeze", ["t"], ["u"], attrs={"axes": [0]}),
        OnnxNode("Concat", ["u", "u"], ["y"], attrs={"axis": 0}),
    ]
    inits = {"st": np.asarray([3], np.int64),
             "en": np.asarray([0], np.int64),
             "ax": np.asarray([2], np.int64),
             "sp": np.asarray([-1], np.int64),
             "gi": np.asarray(-1, np.int64)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    s = x[:, :, 3:0:-1]
    g = s[:, -1]
    t = g.T
    want = np.stack([t, t], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_reshape_zero_and_minus_one(tmp_path):
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = [OnnxNode("Reshape", ["x", "shape"], ["y"])]
    inits = {"shape": np.asarray([0, -1], np.int64)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    assert got.shape == (2, 12)
    np.testing.assert_allclose(got, x.reshape(2, 12))


def test_shape_chain_folds_static_under_jit(tmp_path):
    """Shape → Gather → Unsqueeze → Concat → Reshape must stay static
    (host-folded) so the graph jits with fixed shapes."""
    import jax

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    nodes = [
        OnnxNode("Shape", ["x"], ["sh"]),
        OnnxNode("Gather", ["sh", "i0"], ["d0"], attrs={"axis": 0}),
        OnnxNode("Unsqueeze", ["d0"], ["d0u"], attrs={"axes": [0]}),
        OnnxNode("Concat", ["d0u", "m1"], ["tgt"], attrs={"axis": 0}),
        OnnxNode("Reshape", ["x", "tgt"], ["y"]),
    ]
    inits = {"i0": np.asarray(0, np.int64),
             "m1": np.asarray([-1], np.int64)}
    path = str(tmp_path / "fold.onnx")
    write_onnx(path, nodes=nodes, initializers=inits,
               inputs={"x": x.shape}, outputs=["y"])
    mod = load_onnx_module(path)
    fn = jax.jit(lambda p, a: mod(p, a))
    got = np.asarray(fn(mod.params, x))
    np.testing.assert_allclose(got, x.reshape(2, -1), rtol=1e-6)


def test_softmax_clip_reduce(tmp_path):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    nodes = [OnnxNode("Softmax", ["x"], ["sm"], attrs={"axis": -1}),
             OnnxNode("Clip", ["sm", "lo", "hi"], ["cl"]),
             OnnxNode("ReduceMean", ["cl"], ["y"],
                      attrs={"axes": [1], "keepdims": 0})]
    inits = {"lo": np.float32(0.01), "hi": np.float32(0.8)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x],
                     opset=13)
    sm = torch.softmax(torch.from_numpy(x), dim=-1)
    want = sm.clamp(0.01, 0.8).mean(dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pad_expand_where(tmp_path):
    rng = np.random.default_rng(10)
    x = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    nodes = [OnnxNode("Pad", ["x", "pads"], ["p"],
                      attrs={"mode": "reflect"}),
             OnnxNode("Expand", ["p", "eshape"], ["e"]),
             OnnxNode("Where", ["cond", "e", "zero"], ["y"])]
    inits = {"pads": np.asarray([0, 0, 1, 1, 0, 0, 1, 1], np.int64),
             "eshape": np.asarray([2, 2, 6, 6], np.int64),
             "cond": np.ones((2, 2, 6, 6), bool),
             "zero": np.float32(0)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    p = F.pad(torch.from_numpy(x), (1, 1, 1, 1), mode="reflect").numpy()
    want = np.broadcast_to(p, (2, 2, 6, 6))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_split_and_flatten(tmp_path):
    x = np.arange(24, dtype=np.float32).reshape(2, 12)
    nodes = [OnnxNode("Split", ["x"], ["a", "b", "c"],
                      attrs={"axis": 1, "split": [4, 4, 4]}),
             OnnxNode("Flatten", ["b"], ["y"], attrs={"axis": 1})]
    got = _run_graph(tmp_path, nodes, {}, {"x": x.shape}, ["y"], [x])
    np.testing.assert_allclose(got, x[:, 4:8])


def _build_mini_scrfd_onnx(tmp_path, rng):
    """A structurally SCRFD-like graph: strided conv stem → two levels →
    1x1 lateral convs → Resize-merge → per-level sigmoid score +  bbox
    heads, flattened [N, HW*A, k] exactly like the insightface exports."""
    c = 8
    w_stem = rng.normal(size=(c, 3, 3, 3)).astype(np.float32) * 0.2
    w_s8 = rng.normal(size=(c, c, 3, 3)).astype(np.float32) * 0.2
    w_s16 = rng.normal(size=(c, c, 3, 3)).astype(np.float32) * 0.2
    w_lat = rng.normal(size=(c, c, 1, 1)).astype(np.float32) * 0.2
    w_cls = rng.normal(size=(2, c, 3, 3)).astype(np.float32) * 0.2
    b_cls = rng.normal(size=(2,)).astype(np.float32)
    w_box = rng.normal(size=(8, c, 3, 3)).astype(np.float32) * 0.2
    nodes = [
        OnnxNode("Conv", ["x", "w_stem"], ["s4"], attrs={
            "strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Relu", ["s4"], ["s4r"]),
        OnnxNode("Conv", ["s4r", "w_s8"], ["s8"], attrs={
            "strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Relu", ["s8"], ["s8r"]),
        OnnxNode("Conv", ["s8r", "w_s16"], ["s16"], attrs={
            "strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Relu", ["s16"], ["s16r"]),
        # FPN: lateral 1x1 on s16, nearest-upsample, add into s8
        OnnxNode("Conv", ["s16r", "w_lat"], ["lat"], attrs={
            "kernel_shape": [1, 1]}),
        OnnxNode("Resize", ["lat", "", "up_scales"], ["lat_up"], attrs={
            "mode": "nearest",
            "coordinate_transformation_mode": "asymmetric",
            "nearest_mode": "floor"}),
        OnnxNode("Add", ["s8r", "lat_up"], ["p8"]),
        # heads on p8: cls → Sigmoid → flatten [N, HWA, 1]; box [N, HWA, 4]
        OnnxNode("Conv", ["p8", "w_cls", "b_cls"], ["cls_raw"], attrs={
            "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Sigmoid", ["cls_raw"], ["cls_sig"]),
        OnnxNode("Transpose", ["cls_sig"], ["cls_t"],
                 attrs={"perm": [0, 2, 3, 1]}),
        OnnxNode("Reshape", ["cls_t", "score_shape"], ["score_8"]),
        OnnxNode("Conv", ["p8", "w_box"], ["box_raw"], attrs={
            "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("Transpose", ["box_raw"], ["box_t"],
                 attrs={"perm": [0, 2, 3, 1]}),
        OnnxNode("Reshape", ["box_t", "box_shape"], ["bbox_8"]),
    ]
    inits = {
        "w_stem": w_stem, "w_s8": w_s8, "w_s16": w_s16, "w_lat": w_lat,
        "w_cls": w_cls, "b_cls": b_cls, "w_box": w_box,
        "up_scales": np.asarray([1, 1, 2, 2], np.float32),
        "score_shape": np.asarray([1, -1, 1], np.int64),
        "box_shape": np.asarray([1, -1, 4], np.int64),
    }
    path = str(tmp_path / "mini_scrfd.onnx")
    write_onnx(path, nodes=nodes, initializers=inits,
               inputs={"x": (1, 3, 64, 64)}, outputs=["score_8", "bbox_8"])
    weights = dict(w_stem=w_stem, w_s8=w_s8, w_s16=w_s16, w_lat=w_lat,
                   w_cls=w_cls, b_cls=b_cls, w_box=w_box)
    return path, weights


def _mini_scrfd_torch(x, w):
    t = {k: torch.from_numpy(v) for k, v in w.items()}
    s4 = F.relu(F.conv2d(torch.from_numpy(x), t["w_stem"], stride=2,
                         padding=1))
    s8 = F.relu(F.conv2d(s4, t["w_s8"], stride=2, padding=1))
    s16 = F.relu(F.conv2d(s8, t["w_s16"], stride=2, padding=1))
    lat = F.conv2d(s16, t["w_lat"])
    p8 = s8 + F.interpolate(lat, scale_factor=2, mode="nearest")
    cls = torch.sigmoid(F.conv2d(p8, t["w_cls"], t["b_cls"], padding=1))
    box = F.conv2d(p8, t["w_box"], padding=1)
    score = cls.permute(0, 2, 3, 1).reshape(1, -1, 1)
    bbox = box.permute(0, 2, 3, 1).reshape(1, -1, 4)
    return score.numpy(), bbox.numpy()


def test_mini_scrfd_graph_parity_and_jit(tmp_path):
    import jax

    rng = np.random.default_rng(11)
    path, weights = _build_mini_scrfd_onnx(tmp_path, rng)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    mod = load_onnx_module(path)
    # weights are explicit params (not baked constants); shapes/scales baked
    assert "w_stem" in mod.params
    assert "score_shape" in mod.constants
    assert "up_scales" in mod.constants
    want_score, want_bbox = _mini_scrfd_torch(x, weights)
    fn = jax.jit(lambda p, a: mod(p, a))
    got_score, got_bbox = fn(mod.params, x)
    np.testing.assert_allclose(np.asarray(got_score), want_score,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_bbox), want_bbox,
                               rtol=1e-4, atol=1e-4)


def test_mini_arcface_graph_parity(tmp_path):
    """iresnet-style tail: conv-bn-prelu residual block → flatten → gemm →
    1-D batchnorm (the w600k_r50 output head)."""
    rng = np.random.default_rng(12)
    c = 4
    w1 = rng.normal(size=(c, c, 3, 3)).astype(np.float32) * 0.3
    slope = rng.uniform(0.1, 0.3, c).astype(np.float32).reshape(c, 1, 1)
    scale = rng.uniform(0.5, 2, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 2, c).astype(np.float32)
    wfc = rng.normal(size=(6, c * 8 * 8)).astype(np.float32) * 0.1
    bfc = rng.normal(size=(6,)).astype(np.float32)
    fs = rng.uniform(0.5, 2, 6).astype(np.float32)
    fb = rng.normal(size=6).astype(np.float32)
    fm = rng.normal(size=6).astype(np.float32)
    fv = rng.uniform(0.5, 2, 6).astype(np.float32)
    nodes = [
        OnnxNode("Conv", ["x", "w1"], ["c1"], attrs={
            "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        OnnxNode("BatchNormalization",
                 ["c1", "scale", "bias", "mean", "var"], ["bn1"]),
        OnnxNode("PRelu", ["bn1", "slope"], ["pr1"]),
        OnnxNode("Add", ["pr1", "x"], ["res"]),
        OnnxNode("Flatten", ["res"], ["flat"], attrs={"axis": 1}),
        OnnxNode("Gemm", ["flat", "wfc", "bfc"], ["fc"],
                 attrs={"transB": 1}),
        OnnxNode("BatchNormalization",
                 ["fc", "fs", "fb", "fm", "fv"], ["emb"]),
    ]
    inits = dict(w1=w1, slope=slope, scale=scale, bias=bias, mean=mean,
                 var=var, wfc=wfc, bfc=bfc, fs=fs, fb=fb, fm=fm, fv=fv)
    x = rng.normal(size=(2, c, 8, 8)).astype(np.float32)
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["emb"], [x])
    xt = torch.from_numpy(x)
    bn1 = F.batch_norm(F.conv2d(xt, torch.from_numpy(w1), padding=1),
                       torch.from_numpy(mean), torch.from_numpy(var),
                       torch.from_numpy(scale), torch.from_numpy(bias),
                       training=False)
    res = F.prelu(bn1, torch.from_numpy(slope.reshape(-1))) + xt
    fc = res.flatten(1) @ torch.from_numpy(wfc).T + torch.from_numpy(bfc)
    want = F.batch_norm(fc, torch.from_numpy(fm), torch.from_numpy(fv),
                        torch.from_numpy(fs), torch.from_numpy(fb),
                        training=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unsupported_op_reports_clearly(tmp_path):
    nodes = [OnnxNode("NonZero", ["x"], ["y"])]
    path = str(tmp_path / "bad.onnx")
    write_onnx(path, nodes=nodes, inputs={"x": (2, 2)}, outputs=["y"])
    with pytest.raises(NotImplementedError, match="NonZero"):
        load_onnx_module(path)


def test_split_no_sizes_distributes_remainder(tmp_path):
    """Opset-18 default Split: ceil(dim/n)-sized chunks, only the LAST
    chunk smaller (was floor-division, silently dropping the remainder)."""
    x = np.arange(2 * 11, dtype=np.float32).reshape(2, 11)
    nodes = [OnnxNode("Split", ["x"], ["a", "b", "c"], attrs={"axis": 1})]
    a, b, c = _run_graph(tmp_path, nodes, {}, {"x": x.shape},
                         ["a", "b", "c"], [x])
    assert a.shape == (2, 4) and b.shape == (2, 4) and c.shape == (2, 3)
    np.testing.assert_allclose(np.concatenate([a, b, c], axis=1), x)
    # the case that separates ceil-last-smaller from even distribution:
    # dim 7 into 3 is [3, 3, 1] per spec/onnxruntime, NOT [3, 2, 2]
    x7 = np.arange(7, dtype=np.float32).reshape(1, 7)
    nodes = [OnnxNode("Split", ["x"], ["a", "b", "c"], attrs={"axis": 1})]
    a, b, c = _run_graph(tmp_path, nodes, {}, {"x": x7.shape},
                         ["a", "b", "c"], [x7])
    assert a.shape == (1, 3) and b.shape == (1, 3) and c.shape == (1, 1)
    np.testing.assert_allclose(np.concatenate([a, b, c], axis=1), x7)


def test_cast_unsupported_dtype_reports_clearly(tmp_path):
    """Cast to a dtype code outside _DTYPES must raise NotImplementedError
    naming the node, not a bare KeyError."""
    nodes = [OnnxNode("Cast", ["x"], ["y"], attrs={"to": 16})]  # bfloat16
    path = str(tmp_path / "cast16.onnx")
    write_onnx(path, nodes=nodes, inputs={"x": (2, 2)}, outputs=["y"])
    mod = load_onnx_module(path)
    with pytest.raises(NotImplementedError, match="dtype code 16"):
        mod(mod.params, np.zeros((2, 2), np.float32))


def test_avg_pool_dilations(tmp_path):
    """Opset>=19 AveragePool honors dilations (was silently ignored)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 1, 6, 6)).astype(np.float32)
    nodes = [OnnxNode("AveragePool", ["x"], ["y"],
                      attrs={"kernel_shape": [2, 2], "strides": [1, 1],
                             "dilations": [2, 2]})]
    y = _run_graph(tmp_path, nodes, {}, {"x": x.shape}, ["y"], [x],
                   opset=19)
    # dilated 2x2 window samples offsets {0, 2}: output dim 6-2 = 4
    assert y.shape == (1, 1, 4, 4)
    expect = np.zeros((4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            expect[i, j] = x[0, 0, (i, i + 2), :][:, (j, j + 2)].mean()
    np.testing.assert_allclose(y[0, 0], expect, rtol=1e-5)


def test_resize_opset10_scales_at_input_1(tmp_path):
    # opset-10 Resize signature: (X, scales) — scales sit at input 1, not 2
    rng = np.random.default_rng(16)
    x = rng.normal(size=(1, 2, 4, 5)).astype(np.float32)
    nodes = [OnnxNode("Resize", ["x", "scales"], ["y"], attrs={
        "mode": "nearest", "coordinate_transformation_mode": "asymmetric",
        "nearest_mode": "floor"})]
    inits = {"scales": np.asarray([1, 1, 2, 2], np.float32)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_opset10_defaults_are_asymmetric(tmp_path):
    # opset-10 Resize has NO coordinate attributes: semantics are fixed
    # asymmetric+floor (like Upsample), not the opset-11 half_pixel default
    rng = np.random.default_rng(17)
    x = rng.normal(size=(1, 1, 3, 4)).astype(np.float32)
    nodes = [OnnxNode("Resize", ["x", "scales"], ["y"],
                      attrs={"mode": "linear"})]
    inits = {"scales": np.asarray([1, 1, 2, 2], np.float32)}
    got = _run_graph(tmp_path, nodes, inits, {"x": x.shape}, ["y"], [x])
    # torch upsample_bilinear with align_corners=False+asymmetric == the
    # legacy (pre-1.0) behavior: compare against direct asymmetric math
    want = np.zeros((1, 1, 6, 8), np.float32)
    for i in range(6):
        for j in range(8):
            sy, sx_ = i / 2.0, j / 2.0
            y0, x0 = int(sy), int(sx_)
            y1, x1 = min(y0 + 1, 2), min(x0 + 1, 3)
            fy, fx = sy - y0, sx_ - x0
            want[0, 0, i, j] = (
                x[0, 0, y0, x0] * (1 - fy) * (1 - fx)
                + x[0, 0, y0, x1] * (1 - fy) * fx
                + x[0, 0, y1, x0] * fy * (1 - fx)
                + x[0, 0, y1, x1] * fy * fx)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
