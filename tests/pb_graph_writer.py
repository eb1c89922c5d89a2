"""Minimal TF GraphDef writer for tests: serializes {name: ndarray} consts
into the protobuf wire format that convert/pb_import.py parses (the same
subset a real ``frozen_inference_graph.pb`` uses for its weights)."""
import numpy as np


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


def len_field(num: int, payload: bytes) -> bytes:
    return field(num, 2, varint(len(payload)) + payload)


_DTYPE_CODES = {np.float32: 1, np.int32: 3, np.int64: 9}


def tensor_proto(arr: np.ndarray) -> bytes:
    msg = field(1, 0, varint(_DTYPE_CODES[arr.dtype.type]))
    shape = b"".join(len_field(2, field(1, 0, varint(d))) for d in arr.shape)
    msg += len_field(2, shape)
    msg += len_field(4, np.ascontiguousarray(arr).tobytes())
    return msg


def const_node(name: str, arr: np.ndarray) -> bytes:
    node = len_field(1, name.encode())
    node += len_field(2, b"Const")
    attr_value = len_field(8, tensor_proto(arr))
    entry = len_field(1, b"value") + len_field(2, attr_value)
    node += len_field(5, entry)
    return node


def write_graph(consts: dict, path: str) -> None:
    graph = b"".join(len_field(1, const_node(n, np.asarray(a)))
                     for n, a in consts.items())
    with open(path, "wb") as f:
        f.write(graph)
