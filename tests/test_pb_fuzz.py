"""Byte-corruption fuzz for the frozen-graph importer.

``convert/pb_import.py`` hand-parses protobuf wire format from an
untrusted download (the reference's ``frozen_inference_graph.pb`` is
fetched over HTTP, /root/reference/example/README.md:20-24).  Any byte
damage must surface as a clean python exception — never a hang, an
unbounded allocation (a corrupt TensorShape can claim multi-TB, which
lazy-zero pages turn into a delayed OOM kill), or a wrong-but-silent
parse that only explodes deep inside the model assembler.
"""
import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def test_corrupt_pb_fails_cleanly(tmp_path):
    from pb_graph_writer import write_graph
    from test_od_api_import import build_od_api_consts

    from glomeruli_segmentation_tpu.convert.pb_import import (
        load_frozen_graph_constants,
    )

    consts, _, _ = build_od_api_consts(seed=7)
    base_path = str(tmp_path / "graph.pb")
    write_graph(consts, base_path)
    base = open(base_path, "rb").read()

    rng = np.random.RandomState(0)
    cases = [("trunc-head", base[:8]),
             ("trunc-quarter", base[: len(base) // 4]),
             ("trunc-3quarter", base[: 3 * len(base) // 4])]
    for k in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        cases.append((f"rand{k}", bytes(buf)))
    # targeted: a varint length/shape field saturated to huge values
    for k, pos in enumerate(rng.randint(0, len(base) - 12, size=12)):
        buf = bytearray(base)
        buf[pos: pos + 10] = b"\xff" * 9 + b"\x7f"  # 63-bit varint
        cases.append((f"hugevarint{k}", bytes(buf)))

    for name, data in cases:
        path = str(tmp_path / name)
        with open(path, "wb") as f:
            f.write(data)
        t0 = time.time()
        try:
            out = load_frozen_graph_constants(path)
            assert isinstance(out, dict)  # parsed-but-different is fine
        except Exception:
            pass  # clean failure is the contract
        # no runaway parse loops / giant lazy allocations being touched
        assert time.time() - t0 < 30, f"parser stalled on {name}"


def test_implausible_tensor_count_rejected():
    """A Const whose TensorShape claims ~2^40 elements with no content
    must raise, not allocate terabytes of lazy pages."""
    from glomeruli_segmentation_tpu.convert.pb_import import _parse_tensor

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def field(num, wire, payload):
        tag = varint(num << 3 | wire)
        if wire == 0:
            return tag + varint(payload)
        return tag + varint(len(payload)) + payload

    dim = field(1, 0, 1 << 40)                # Dim.size = 2^40
    shape = field(2, 2, dim)                  # TensorShape.dim
    tensor = field(1, 0, 1) + field(2, 2, shape)  # dtype=FLOAT, shape
    with pytest.raises(ValueError, match="implausible"):
        _parse_tensor(tensor)
