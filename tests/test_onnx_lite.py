"""Dependency-free ONNX initializer reader (tools/onnx_lite.py): wire-format
round trip + converter integration — checkpoint conversion works on TPU
hosts without the onnx package (reference downloads ONNX checkpoints,
face_embedder.py:55-83)."""

import numpy as np

from person_capture_tpu.tools.onnx_lite import (onnx_initializers,
                                                write_minimal_onnx)


def test_roundtrip_initializers(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "backbone.conv1.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),
        "head.bias": rng.normal(size=(16,)).astype(np.float32),
        "bn.running_mean": rng.normal(size=(8,)).astype(np.float32),
        "shape_const": np.asarray([1, 3, 640, 640], np.int64),
        "scalar": np.float32(2.5).reshape(()),
        "half": rng.normal(size=(4, 4)).astype(np.float16),
    }
    path = str(tmp_path / "m.onnx")
    write_minimal_onnx(path, tensors)
    out = onnx_initializers(path)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)
        assert out[k].dtype == v.dtype


def test_convert_weights_cli_without_onnx(tmp_path, monkeypatch):
    """The converter CLI consumes an .onnx through the lite reader even
    when `import onnx` fails."""
    import builtins

    from person_capture_tpu.tools import convert_weights as CW

    rng = np.random.default_rng(1)
    tensors = {"conv.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32)}
    src = str(tmp_path / "m.onnx")
    write_minimal_onnx(src, tensors)

    real_import = builtins.__import__

    def no_onnx(name, *a, **k):
        if name == "onnx" or name.startswith("onnx."):
            raise ImportError("onnx not installed")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_onnx)
    out = str(tmp_path / "w.npz")
    rc = CW.main(["--src", src, "--kind", "scrfd", "--out", out])
    assert rc == 0
    data = np.load(out)
    # conv OIHW → HWIO re-orientation applied
    assert data["src/conv.weight"].shape == (3, 3, 3, 4)


def test_float16_int32_data_bit_patterns(tmp_path):
    """TensorProto float16 stored in int32_data holds raw uint16 bit
    patterns per the ONNX spec — they must be bit-reinterpreted, not
    numerically cast (1.0 is stored as 15360)."""
    from person_capture_tpu.tools.onnx_lite import (_w_field, _w_ld,
                                                    _w_varint)

    vals = np.asarray([1.0, -2.5, 0.0, 65504.0], np.float16)
    bits = vals.view(np.uint16)
    t = b"".join(_w_field(1, 0, _w_varint(d)) for d in (4,))   # dims
    t += _w_field(2, 0, _w_varint(10))                         # FLOAT16
    t += b"".join(_w_field(5, 0, _w_varint(int(b))) for b in bits)
    t += _w_ld(8, b"halfs")                                    # name
    graph = _w_ld(5, t)
    model = _w_field(1, 0, _w_varint(8)) + _w_ld(7, graph)
    path = str(tmp_path / "fp16.onnx")
    with open(path, "wb") as fh:
        fh.write(model)
    out = onnx_initializers(path)
    assert out["halfs"].dtype == np.float16
    np.testing.assert_array_equal(out["halfs"], vals)


def test_opset_ai_onnx_domain_recognized(tmp_path):
    """opset_import with domain "ai.onnx" is the default ONNX domain and
    must set the graph opset (was: silently left at the fallback 11)."""
    from person_capture_tpu.tools.onnx_lite import (_w_field, _w_ld,
                                                    _w_varint, parse_onnx)

    opset_b = _w_ld(1, b"ai.onnx") + _w_field(2, 0, _w_varint(18))
    model = _w_field(1, 0, _w_varint(8)) + _w_ld(8, opset_b) + _w_ld(7, b"")
    path = str(tmp_path / "dom.onnx")
    with open(path, "wb") as fh:
        fh.write(model)
    assert parse_onnx(path).opset == 18
