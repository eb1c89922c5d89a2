"""Frozen TF GraphDef weight extraction — no TensorFlow dependency.

The reference's detector ships as ``frozen_inference_graph.pb``
(``detect_glomus_test.py:419-427``; downloaded per ``example/README.md:20-24``
and absent from the mirror).  This module parses the protobuf wire format
directly and extracts every ``Const`` node's tensor, giving the raw weight
dictionary from which a :class:`..models.faster_rcnn.FasterRCNN` parameter
tree can be assembled.

Wire-format subset handled: GraphDef.node (field 1), NodeDef.name/op/attr
(fields 1/2/5), AttrValue.tensor (field 8), TensorProto dtype/shape/
tensor_content and the repeated typed value fields.
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

# TF DataType enum -> numpy dtype
_TF_DTYPES = {
    1: np.dtype("<f4"),   # DT_FLOAT
    2: np.dtype("<f8"),   # DT_DOUBLE
    3: np.dtype("<i4"),   # DT_INT32
    4: np.dtype("<u1"),   # DT_UINT8
    5: np.dtype("<i2"),   # DT_INT16
    6: np.dtype("<i1"),   # DT_INT8
    9: np.dtype("<i8"),   # DT_INT64
    10: np.dtype("?"),    # DT_BOOL
    19: np.dtype("<f2"),  # DT_HALF
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
            yield field, wire, value
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos: pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos: pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos: pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor_shape(buf: bytes) -> List[int]:
    dims = []
    for field, _, payload in _iter_fields(buf):
        if field == 2:  # Dim
            size = 0
            for f2, _, v2 in _iter_fields(payload):
                if f2 == 1:
                    size = v2 if isinstance(v2, int) else 0
            dims.append(size)
    return dims


def _parse_tensor(buf: bytes) -> np.ndarray:
    dtype_code = 1
    shape: List[int] = []
    content = b""
    typed_values: List = []
    for field, wire, payload in _iter_fields(buf):
        if field == 1:
            dtype_code = payload
        elif field == 2:
            shape = _parse_tensor_shape(payload)
        elif field == 4:
            content = payload
        elif field == 5:  # float_val (packed or single)
            if wire == 2:
                typed_values.extend(struct.unpack(
                    f"<{len(payload) // 4}f", payload))
            else:
                typed_values.append(struct.unpack("<f", payload)[0])
        elif field == 7:  # int_val
            if wire == 2:
                vals, pos = [], 0
                while pos < len(payload):
                    v, pos = _read_varint(payload, pos)
                    vals.append(v)
                typed_values.extend(vals)
            else:
                typed_values.append(payload)
    dtype = _TF_DTYPES.get(dtype_code)
    if dtype is None:
        return np.zeros(shape or 0, np.float32)
    count = int(np.prod(shape)) if shape else 1
    if content:
        arr = np.frombuffer(content, dtype=dtype, count=count)
    elif typed_values:
        arr = np.asarray(typed_values, dtype=dtype)
        if arr.size == 1 and count > 1:  # splat encoding
            arr = np.full(count, arr[0], dtype=dtype)
    else:
        arr = np.zeros(count, dtype=dtype)
    return arr.reshape(shape) if shape else arr.reshape(())


def _parse_node(buf: bytes):
    name = op = ""
    attrs: Dict[str, np.ndarray] = {}
    for field, _, payload in _iter_fields(buf):
        if field == 1:
            name = payload.decode("utf-8")
        elif field == 2:
            op = payload.decode("utf-8")
        elif field == 5:  # attr map entry
            key = None
            value_buf = None
            for f2, _, p2 in _iter_fields(payload):
                if f2 == 1:
                    key = p2.decode("utf-8")
                elif f2 == 2:
                    value_buf = p2
            if key == "value" and value_buf is not None:
                for f3, _, p3 in _iter_fields(value_buf):
                    if f3 == 8:  # AttrValue.tensor
                        attrs["value"] = _parse_tensor(p3)
    return name, op, attrs


def load_frozen_graph_constants(path: str) -> Dict[str, np.ndarray]:
    """Extract {node_name: tensor} for every Const node in a frozen graph."""
    with open(path, "rb") as f:
        buf = f.read()
    consts: Dict[str, np.ndarray] = {}
    for field, _, payload in _iter_fields(buf):
        if field == 1:  # GraphDef.node
            name, op, attrs = _parse_node(payload)
            if op == "Const" and "value" in attrs:
                consts[name] = attrs["value"]
    return consts
