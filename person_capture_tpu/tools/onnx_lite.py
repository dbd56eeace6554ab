"""Minimal dependency-free ONNX reader (protobuf wire format).

The conversion path for the reference's checkpoints (scrfd_*_bnkps.onnx,
w600k_r50.onnx — face_embedder.py:55-83) needs the graph *initializers*
(name → ndarray), nothing else. The `onnx` package is not installed on TPU
hosts (this image included), so this module parses the protobuf wire
format directly: ModelProto(7: GraphProto) → GraphProto(5: initializer
TensorProto*) → TensorProto {1: dims, 2: data_type, 8: name, 9: raw_data,
4/5/6/7/10/11: typed repeated fields}.

Only what the converter needs is implemented; unknown fields are skipped
per the protobuf spec, so any valid ONNX file parses.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

# ONNX TensorProto.DataType → numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _fields(buf: memoryview) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(buf: memoryview) -> List[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype_code = 1
    name = ""
    raw = b""
    floats: List[float] = []
    ints32: List[int] = []
    ints64: List[int] = []
    doubles: List[float] = []
    for field, wire, val in _fields(buf):
        if field == 1:   # dims (repeated int64; packed or not)
            if wire == 0:
                dims.append(int(val))
            else:
                dims.extend(_packed_varints(val))
        elif field == 2 and wire == 0:
            dtype_code = int(val)
        elif field == 8 and wire == 2:
            name = bytes(val).decode("utf-8", errors="replace")
        elif field == 9 and wire == 2:
            raw = bytes(val)
        elif field == 4:   # float_data
            if wire == 5:
                floats.append(struct.unpack("<f", val)[0])
            elif wire == 2:
                floats.extend(np.frombuffer(bytes(val), "<f4").tolist())
        elif field == 5:   # int32_data
            if wire == 0:
                ints32.append(int(val))
            elif wire == 2:
                ints32.extend(_packed_varints(val))
        elif field == 7:   # int64_data
            if wire == 0:
                ints64.append(int(val))
            elif wire == 2:
                ints64.extend(_packed_varints(val))
        elif field == 10:  # double_data
            if wire == 1:
                doubles.append(struct.unpack("<d", val)[0])
            elif wire == 2:
                doubles.extend(np.frombuffer(bytes(val), "<f8").tolist())
    dtype = _DTYPES.get(dtype_code)
    if dtype is None:
        raise ValueError(f"unsupported tensor dtype {dtype_code} ({name})")
    shape = tuple(dims)
    if raw:
        arr = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder("<"))
    elif floats and dtype == np.float32:
        arr = np.asarray(floats, np.float32)
    elif doubles and dtype == np.float64:
        arr = np.asarray(doubles, np.float64)
    elif ints64 and dtype == np.int64:
        arr = np.asarray(ints64, np.int64)
    elif ints32:
        arr = np.asarray(ints32, np.int64).astype(dtype)
    else:
        arr = np.zeros(shape, dtype)
    return name, arr.reshape(shape) if shape else arr


def onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """name → ndarray for every graph initializer in an .onnx file."""
    with open(path, "rb") as fh:
        model = memoryview(fh.read())
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _fields(model):
        if field == 7 and wire == 2:           # ModelProto.graph
            for gfield, gwire, gval in _fields(val):
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(gval)
                    if name:
                        out[name] = arr
    return out


def write_minimal_onnx(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Produce a minimal valid ONNX file carrying only initializers —
    round-trip oracle for :func:`onnx_initializers` (no onnx dependency)."""
    def varint(v: int) -> bytes:
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def field(num: int, wire: int, payload: bytes) -> bytes:
        return varint((num << 3) | wire) + payload

    def ld(num: int, payload: bytes) -> bytes:
        return field(num, 2, varint(len(payload)) + payload)

    np2code = {np.dtype(np.float32): 1, np.dtype(np.float16): 10,
               np.dtype(np.int64): 7, np.dtype(np.int32): 6,
               np.dtype(np.uint8): 2}
    graph = b""
    for name, arr in tensors.items():
        t = b""
        for d in arr.shape:
            t += field(1, 0, varint(int(d)))
        t += field(2, 0, varint(np2code[arr.dtype]))
        t += ld(8, name.encode("utf-8"))
        t += ld(9, np.ascontiguousarray(arr).tobytes())
        graph += ld(5, t)
    model = field(1, 0, varint(8)) + ld(7, graph)  # ir_version + graph
    with open(path, "wb") as fh:
        fh.write(model)
