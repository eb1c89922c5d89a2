"""Byte-corruption fuzz for both slide readers.

Real slides reach the pipeline by download/export, so truncation and bit
rot are routine; the reference leans on OpenSlide's hardened parser
(/root/reference/module/faster-rcnn/detect_glomus_test.py:183-190).  Our
replacement must match that bar: ANY byte damage to a slide file must
surface as a clean python exception (python reader) or error status
(native reader) — never a hang, a crash of the host process, or a
runaway parse loop.

Both readers run over every mutated file inside ONE subprocess with a
hard timeout: a segfault in the C++ reader or an infinite loop in either
parser fails this test without taking the pytest process down with it.
The per-file progress lines are flushed so a crash identifies the exact
mutation (seed + kind) that triggered it.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_ndpi_like_tiff,
    write_pyramidal_tiff,
)

NATIVE_SO = os.path.join(os.path.dirname(__file__), "..",
                         "glomeruli_segmentation_tpu", "wsi", "native",
                         "_ndpi_reader.so")

_DRIVER = r"""
import sys

from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

try:
    from glomeruli_segmentation_tpu.wsi.native_reader import NativeSlide
except Exception:
    NativeSlide = None

paths = sys.argv[1:]
for path in paths:
    for label, cls in (("py", Slide), ("native", NativeSlide)):
        if cls is None:
            continue
        # flush BEFORE the attempt: if the attempt segfaults the
        # process, the parent sees which (file, reader) died
        print(f"TRY {label} {path}", flush=True)
        try:
            s = cls(path)
            dims = s.level_dimensions
            _ = s.properties
            if dims and dims[0][0] > 0 and dims[0][1] > 0:
                w = min(48, dims[0][0])
                h = min(48, dims[0][1])
                s.read_region_array((0, 0), 0, (w, h))
                # also poke the deepest level (exercises per-level
                # index-construction paths)
                lv = len(dims) - 1
                s.read_region_array((0, 0), lv,
                                    (min(16, dims[lv][0]),
                                     min(16, dims[lv][1])))
            if hasattr(s, "close"):
                s.close()
        except Exception as e:
            print(f"OK-ERR {label} {type(e).__name__}", flush=True)
        else:
            print(f"OK {label}", flush=True)
print("DONE", flush=True)
"""


def _mutations(base: bytes, rng: np.random.RandomState, n_random: int):
    """Yield (name, corrupted bytes).  Structured damage first, then
    seeded random byte flips biased toward the structural head."""
    n = len(base)
    yield "trunc-header", base[:6]
    yield "trunc-quarter", base[: n // 4]
    yield "trunc-3quarter", base[: 3 * n // 4]
    zeroed = bytearray(base)
    zeroed[4:8] = b"\xff\xff\xff\x7f"  # first-IFD pointer into the void
    yield "wild-ifd-ptr", bytes(zeroed)
    ff = bytearray(base)
    ff[8:256] = b"\xff" * 248  # saturate the IFD area
    yield "ifd-ff-fill", bytes(ff)
    for k in range(n_random):
        buf = bytearray(base)
        # half the cases damage the structural head, half anywhere
        hi = 4096 if k % 2 == 0 else n
        for _ in range(rng.randint(1, 5)):
            pos = rng.randint(0, min(hi, n))
            buf[pos] = rng.randint(0, 256)
        yield f"rand{k}", bytes(buf)


@pytest.mark.slow
def test_corrupt_slides_fail_cleanly(tmp_path):
    img, _ = pas_like_image(96, 128, seed=7, n_glomeruli=2)

    bases = {}
    p1 = str(tmp_path / "strip.ndpi.tiff")
    write_ndpi_like_tiff(p1, img, levels=2, rows_per_chunk=1,
                         mcu_starts=True)
    bases["strip"] = open(p1, "rb").read()
    p2 = str(tmp_path / "tiled.tiff")
    write_pyramidal_tiff(p2, img, levels=2)
    bases["tiled"] = open(p2, "rb").read()

    rng = np.random.RandomState(0)
    paths = []
    for kind, base in bases.items():
        for name, data in _mutations(base, rng, n_random=24):
            path = str(tmp_path / f"{kind}-{name}")
            with open(path, "wb") as f:
                f.write(data)
            paths.append(path)

    env = dict(os.environ, GSEG_PLATFORM="cpu", GSEG_CPU_DEVICES="1")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, *paths],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, (
        f"reader crashed on a corrupt slide (exit {proc.returncode});\n"
        f"last attempts:\n{tail}\n\nstderr tail:\n{proc.stderr[-2000:]}")
    assert proc.stdout.splitlines()[-1] == "DONE", tail
    if os.path.isfile(NATIVE_SO):
        assert "TRY native" in proc.stdout  # the C++ reader really ran
