"""Test the TF-free frozen-graph constant extractor on a hand-built GraphDef."""
import struct

import numpy as np

from glomeruli_segmentation_tpu.convert.pb_import import (
    load_frozen_graph_constants,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_proto(arr: np.ndarray, use_content: bool = True) -> bytes:
    dtype_code = {np.float32: 1, np.int32: 3}[arr.dtype.type]
    msg = _field(1, 0, _varint(dtype_code))
    shape = b"".join(
        _len_field(2, _field(1, 0, _varint(d))) for d in arr.shape)
    msg += _len_field(2, shape)
    if use_content:
        msg += _len_field(4, arr.tobytes())
    else:
        if arr.dtype == np.float32:
            msg += _len_field(5, b"".join(struct.pack("<f", v)
                                          for v in arr.reshape(-1)))
        else:
            msg += _len_field(7, b"".join(_varint(int(v))
                                          for v in arr.reshape(-1)))
    return msg


def _const_node(name: str, arr: np.ndarray, use_content=True) -> bytes:
    node = _len_field(1, name.encode())
    node += _len_field(2, b"Const")
    attr_value = _len_field(8, _tensor_proto(arr, use_content))
    entry = _len_field(1, b"value") + _len_field(2, attr_value)
    node += _len_field(5, entry)
    return node


def test_extract_constants(tmp_path):
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.asarray([1, 2, 3], np.int32)
    graph = _len_field(1, _const_node("scope/weights", w))
    graph += _len_field(1, _const_node("scope/biases", b, use_content=False))
    # a non-const node must be ignored
    other = _len_field(1, b"input") + _len_field(2, b"Placeholder")
    graph += _len_field(1, other)
    path = tmp_path / "frozen_inference_graph.pb"
    path.write_bytes(graph)

    consts = load_frozen_graph_constants(str(path))
    assert set(consts) == {"scope/weights", "scope/biases"}
    np.testing.assert_array_equal(consts["scope/weights"], w)
    np.testing.assert_array_equal(consts["scope/biases"], b)


def test_splat_encoding(tmp_path):
    arr = np.full((4, 4), 2.5, np.float32)
    # single float_val splat for a larger shape
    msg = _field_num = _len_field(1, _const_node("splat", np.asarray(
        [2.5], np.float32), use_content=False))
    # craft manually: shape (4,4) but one float_val
    dtype = _field(1, 0, _varint(1))
    shape = _len_field(2, _len_field(2, _field(1, 0, _varint(4)))
                       + _len_field(2, _field(1, 0, _varint(4))))
    tensor = dtype + shape + _len_field(5, struct.pack("<f", 2.5))
    node = (_len_field(1, b"splat") + _len_field(2, b"Const")
            + _len_field(5, _len_field(1, b"value")
                         + _len_field(2, _len_field(8, tensor))))
    path = tmp_path / "g.pb"
    path.write_bytes(_len_field(1, node))
    consts = load_frozen_graph_constants(str(path))
    np.testing.assert_array_equal(consts["splat"], arr)
