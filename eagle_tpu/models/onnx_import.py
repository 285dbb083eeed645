"""ONNX weight ingestion without the onnx package.

The reference's CPU path loads ``detector_medium.onnx`` through ONNX
Runtime (/root/reference/eagle/models/coordinate_model.py:54-57); a user
holding only that published artifact must be able to run this framework.
ONNX files are protobuf; this module implements a minimal wire-format
reader for the subset that matters -- the graph's initializer tensors and
node topology -- and maps the initializers into the YOLOv8 parameter
pytree.

Ultralytics exports call ``model.fuse()`` first, so the ONNX graph
carries BN-fused conv weights named after the torch module tree
("model.0.conv.weight", "model.0.conv.bias", ...); the converter wraps
them in exactly-identity BN parameters (:func:`yolov8.yolov8_from_fused`).
Unfused graphs (plain torch.onnx exports) fall back to the standard
state-dict converter.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

# protobuf wire types
_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5

# TensorProto.DataType -> numpy dtype (the subset seen in model exports)
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message.
    LEN fields yield the raw bytes; varints yield ints; fixed32/64 yield
    the raw 4/8 bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == _VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _LEN:
            size, pos = _read_varint(buf, pos)
            val = buf[pos : pos + size]
            pos += size
        elif wt == _I64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == _I32:
            val = buf[pos : pos + 4]
            pos += 4
        else:  # groups (3/4) do not appear in onnx
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto -> (name, ndarray).  Handles raw_data and the typed
    repeated fields (float_data/int32_data/int64_data/double_data)."""
    dims: list[int] = []
    dtype = None
    name = ""
    raw = None
    floats: list[float] = []
    ints: list[int] = []
    doubles: list[float] = []
    for field, wt, val in _iter_fields(buf):
        if field == 1:  # dims
            if wt == _VARINT:
                dims.append(val)
            else:  # packed
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(v)
        elif field == 2 and wt == _VARINT:
            dtype = val
        elif field == 8 and wt == _LEN:
            name = val.decode("utf-8")
        elif field == 9 and wt == _LEN:
            raw = val
        elif field == 4:  # float_data
            if wt == _I32:
                floats.append(struct.unpack("<f", val)[0])
            else:  # packed
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
        elif field in (5, 7):  # int32_data / int64_data
            if wt == _VARINT:
                ints.append(val)
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(v)
        elif field == 10:  # double_data
            if wt == _I64:
                doubles.append(struct.unpack("<d", val)[0])
            else:
                doubles.extend(struct.unpack(f"<{len(val) // 8}d", val))
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif doubles:
        arr = np.asarray(doubles, np.float64)
    elif ints:
        # int64_data carries two's-complement varints
        arr = np.asarray([v - (1 << 64) if v >= (1 << 63) else v for v in ints]).astype(
            np_dtype
        )
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def _parse_node(buf: bytes) -> dict:
    node = {"input": [], "output": [], "name": "", "op_type": ""}
    for field, wt, val in _iter_fields(buf):
        if field == 1 and wt == _LEN:
            node["input"].append(val.decode("utf-8"))
        elif field == 2 and wt == _LEN:
            node["output"].append(val.decode("utf-8"))
        elif field == 3 and wt == _LEN:
            node["name"] = val.decode("utf-8")
        elif field == 4 and wt == _LEN:
            node["op_type"] = val.decode("utf-8")
    return node


def parse_onnx(path: str) -> tuple[dict[str, np.ndarray], list[dict]]:
    """Read an .onnx file -> (initializers {name: array}, nodes)."""
    with open(path, "rb") as f:
        model = f.read()
    graph = None
    for field, wt, val in _iter_fields(model):
        if field == 7 and wt == _LEN:  # ModelProto.graph
            graph = val
            break
    if graph is None:
        raise ValueError(f"{path}: no graph in ONNX model")
    initializers: dict[str, np.ndarray] = {}
    nodes: list[dict] = []
    for field, wt, val in _iter_fields(graph):
        if field == 5 and wt == _LEN:  # GraphProto.initializer
            name, arr = _parse_tensor(val)
            initializers[name] = arr
        elif field == 1 and wt == _LEN:  # GraphProto.node
            nodes.append(_parse_node(val))
    return initializers, nodes


def load_yolov8_onnx(path: str, prefix: str = "model."):
    """detector .onnx -> YOLOv8 parameter pytree.

    Handles both fused exports (the published ultralytics artifacts:
    conv.bias present, no BN initializers) and unfused graphs."""
    from eagle_tpu.models import yolov8

    init, _nodes = parse_onnx(path)
    # strip any exporter namespace ("/model.0/..." stays in node names;
    # initializers keep parameter names, but some exporters prepend the
    # module path of a wrapper)
    if not any(k.startswith(prefix) for k in init):
        for k in list(init):
            i = k.find(prefix)
            if i > 0:
                init[k[i:]] = init.pop(k)
    fused = any(k.endswith(".conv.bias") for k in init) and not any(
        k.endswith(".bn.weight") for k in init
    )
    if fused:
        return yolov8.yolov8_from_fused(init, prefix=prefix)
    return yolov8.yolov8_from_torch(init, prefix=prefix)
