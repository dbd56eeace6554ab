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
