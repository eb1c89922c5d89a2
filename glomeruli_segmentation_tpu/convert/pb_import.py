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
    count = int(np.prod(shape)) if shape else 1
    # a corrupt shape claim can demand a multi-TB allocation; np.zeros
    # is calloc'd lazy pages on Linux, so that "succeeds" and surfaces
    # later as an OOM kill instead of a clean parse error
    if count < 0 or count > (1 << 31):
        raise ValueError(f"implausible tensor element count {count} "
                         f"(shape {shape}) in frozen graph")
    dtype = _TF_DTYPES.get(dtype_code)
    if dtype is None:
        return np.zeros(shape or 0, np.float32)
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


# ---------------------------------------------------------------------------
# TF Object Detection API export -> parameter tree for ODAPIFasterRCNN
# ---------------------------------------------------------------------------
#
# The reference's download (example/README.md:20-24) is a standard OD-API
# ``export_inference_graph`` Faster R-CNN with the slim inception_v2 feature
# extractor (the upstream jinseikenai/glomeruli_detection training code,
# cloned at docker/gpu.dockerfile:77-80).  Variable layout:
#
#   FirstStageFeatureExtractor/InceptionV2/<layer>/weights + BatchNorm/*
#   Conv/{weights,biases}                          (RPN 3x3 conv, relu6)
#   FirstStageBoxPredictor/{BoxEncodingPredictor,ClassPredictor}/{weights,biases}
#   SecondStageFeatureExtractor/InceptionV2/Mixed_5{a,b,c}/...
#   SecondStageBoxPredictor/{BoxEncodingPredictor,ClassPredictor}/{weights,biases}
#
# Batch norm (no gamma: slim ``scale=False``) is folded into each conv's
# kernel/bias here: inference never updates the moving stats, so the folded
# conv is bit-equivalent math with fewer HBM round-trips on TPU.

_BN_EPSILON = 0.001  # slim batch_norm default epsilon used by the extractor

_FIRST = "FirstStageFeatureExtractor/InceptionV2/"
_SECOND = "SecondStageFeatureExtractor/InceptionV2/"

# conv layer scopes inside each trunk, in forward order (widths come from
# the consts themselves, so any depth_multiplier export works)
_TRUNK_PREFIXES = ("Conv2d_", "Mixed_")


class UnmappedWeightsError(ValueError):
    """A weight-bearing const did not map onto the detector — the graph is
    not the expected OD-API inception_v2 layout."""


def _fold_bn(consts: Dict[str, np.ndarray], scope: str, w: np.ndarray,
             consumed: set, eps: float = _BN_EPSILON):
    """Fold ``<scope>/BatchNorm`` stats (or plain biases) into (w, b)."""
    bn_beta = scope + "/BatchNorm/beta"
    if bn_beta in consts:
        beta = consts[bn_beta].astype(np.float64)
        mean = consts[scope + "/BatchNorm/moving_mean"].astype(np.float64)
        var = consts[scope + "/BatchNorm/moving_variance"].astype(np.float64)
        consumed.update({bn_beta, scope + "/BatchNorm/moving_mean",
                         scope + "/BatchNorm/moving_variance"})
        gamma_name = scope + "/BatchNorm/gamma"
        gamma = 1.0
        if gamma_name in consts:
            gamma = consts[gamma_name].astype(np.float64)
            consumed.add(gamma_name)
        scale = gamma / np.sqrt(var + eps)
        w = (w.astype(np.float64) * scale).astype(np.float32)
        b = (beta - mean * scale).astype(np.float32)
        return w, b
    bias_name = scope + "/biases"
    if bias_name in consts:
        consumed.add(bias_name)
        return w.astype(np.float32), consts[bias_name].astype(np.float32)
    return w.astype(np.float32), np.zeros(w.shape[-1], np.float32)


def _conv_entry(consts, scope, consumed):
    w_name = scope + "/weights"
    if w_name not in consts:
        raise UnmappedWeightsError(f"missing conv weights: {w_name}")
    consumed.add(w_name)
    w, b = _fold_bn(consts, scope, consts[w_name], consumed)
    return {"w": w, "b": b}


def _trunk_params(consts, prefix, consumed):
    """Collect every conv under ``prefix`` into a nested tree keyed by the
    path relative to the trunk (e.g. Mixed_3b/Branch_0/Conv2d_0a_1x1)."""
    tree: Dict = {}
    scopes = set()
    for name in consts:
        if not name.startswith(prefix):
            continue
        rel = name[len(prefix):]
        # strip the variable suffix to recover the conv scope
        for suffix in ("/weights", "/depthwise_weights", "/pointwise_weights",
                       "/biases", "/BatchNorm/beta", "/BatchNorm/gamma",
                       "/BatchNorm/moving_mean", "/BatchNorm/moving_variance"):
            if rel.endswith(suffix):
                scopes.add(rel[: -len(suffix)])
                break
    for rel in sorted(scopes):
        full = prefix + rel
        parts = rel.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        leaf_name = parts[-1]
        if full + "/depthwise_weights" in consts:  # separable stem
            dw = consts[full + "/depthwise_weights"].astype(np.float32)
            pw = consts[full + "/pointwise_weights"]
            consumed.update({full + "/depthwise_weights",
                             full + "/pointwise_weights"})
            pw, b = _fold_bn(consts, full, pw, consumed)
            node[leaf_name] = {"dw": dw, "pw": pw, "b": b}
        else:
            node[leaf_name] = _conv_entry(consts, full, consumed)
    return tree


def assemble_od_api_params(consts: Dict[str, np.ndarray]):
    """Map extracted frozen-graph constants onto the ODAPIFasterRCNN tree.

    Returns ``(params, num_classes)``.  Raises
    :class:`UnmappedWeightsError` when weight-bearing consts exist that the
    mapping did not consume (unexpected architecture), or required pieces
    are missing.
    """
    consumed: set = set()
    params = {
        "first": _trunk_params(consts, _FIRST, consumed),
        "second": _trunk_params(consts, _SECOND, consumed),
        "rpn_conv": _conv_entry(consts, "Conv", consumed),
        "rpn_box": _conv_entry(
            consts, "FirstStageBoxPredictor/BoxEncodingPredictor", consumed),
        "rpn_cls": _conv_entry(
            consts, "FirstStageBoxPredictor/ClassPredictor", consumed),
        "fc_box": _conv_entry(
            consts, "SecondStageBoxPredictor/BoxEncodingPredictor", consumed),
        "fc_cls": _conv_entry(
            consts, "SecondStageBoxPredictor/ClassPredictor", consumed),
    }
    for required in ("Conv2d_1a_7x7", "Mixed_3b", "Mixed_4e"):
        if required not in params["first"]:
            raise UnmappedWeightsError(
                f"first-stage trunk is missing {required}; "
                "not an inception_v2 OD-API export")
    for required in ("Mixed_5a", "Mixed_5b", "Mixed_5c"):
        if required not in params["second"]:
            raise UnmappedWeightsError(
                f"second-stage trunk is missing {required}")

    # coverage: every weight-bearing const must have been consumed
    weight_suffixes = ("/weights", "/biases", "/depthwise_weights",
                       "/pointwise_weights", "/beta", "/gamma",
                       "/moving_mean", "/moving_variance")
    leftover = [n for n in consts
                if n.endswith(weight_suffixes) and n not in consumed]
    if leftover:
        raise UnmappedWeightsError(
            "unmapped weight consts (unexpected architecture): "
            + ", ".join(sorted(leftover)[:20]))

    num_classes = int(params["fc_cls"]["b"].shape[-1]) - 1
    if num_classes < 1:
        raise UnmappedWeightsError("ClassPredictor has no foreground class")
    return params, num_classes


def load_od_api_detector_params(path: str):
    """frozen_inference_graph.pb -> (params, num_classes)."""
    return assemble_od_api_params(load_frozen_graph_constants(path))
