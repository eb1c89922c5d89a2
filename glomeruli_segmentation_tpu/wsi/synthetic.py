"""Synthetic pyramidal slide writer (test fixtures and benchmarks).

The reference's sample ``.ndpi`` is stripped from the mirror
(``example/.MISSING_LARGE_BLOBS``), so the framework ships its own
generator: writes a tiled, JPEG- or raw-compressed classic-TIFF pyramid
with known mpp / objective power that both the pure-python and C++ readers
(and any TIFF tool) can open.  Used to test the WSI layer without real
slides and to synthesize PAS-like benchmark slides of arbitrary size.
"""
from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

_TYPE_SHORT, _TYPE_LONG, _TYPE_RATIONAL, _TYPE_FLOAT = 3, 4, 5, 11


class _IfdBuilder:
    def __init__(self):
        self.entries = []  # (tag, type, count, payload_bytes, inline)

    def add(self, tag: int, typ: int, values: Sequence):
        if typ == _TYPE_SHORT:
            payload = struct.pack("<" + "H" * len(values), *values)
        elif typ == _TYPE_LONG:
            payload = struct.pack("<" + "I" * len(values), *values)
        elif typ == _TYPE_RATIONAL:
            flat = [v for pair in values for v in pair]
            payload = struct.pack("<" + "I" * len(flat), *flat)
        elif typ == _TYPE_FLOAT:
            payload = struct.pack("<" + "f" * len(values), *values)
        else:
            raise ValueError(typ)
        self.entries.append((tag, typ, len(values), payload))


def _downsample2(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    h2, w2 = h // 2 * 2, w // 2 * 2
    img = img[:h2, :w2].astype(np.uint16)
    out = (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2]
           + img[1::2, 1::2] + 2) // 4
    return out.astype(np.uint8)


def pas_like_image(height: int, width: int, seed: int = 0,
                   n_glomeruli: int = 8,
                   background=(230, 205, 215),
                   blob_color=(170, 110, 150),
                   inner_color=(140, 80, 120),
                   radius_frac=(1 / 20, 1 / 10)) -> np.ndarray:
    """Generate an RGB image resembling a PAS-stained section with dark
    round 'glomeruli' blobs on a pinkish background.

    ``background``/``blob_color``/``inner_color``/``radius_frac`` vary the
    stain tone, contrast and glomerulus size — used to build slide
    *populations* for detector accuracy tests (vs the reference's per-slide
    recall print, make_seg_data.py:107-111)."""
    rng = np.random.RandomState(seed)
    img = np.full((height, width, 3), background, np.uint8)
    noise = rng.randint(-12, 12, size=img.shape).astype(np.int16)
    img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[:height, :width]
    centers = []
    r_lo = max(8, int(min(height, width) * radius_frac[0]))
    r_hi = max(r_lo + 1, int(min(height, width) * radius_frac[1]))
    for _ in range(n_glomeruli):
        cy = rng.randint(height // 8, height * 7 // 8)
        cx = rng.randint(width // 8, width * 7 // 8)
        r = rng.randint(r_lo, r_hi)
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        img[mask] = blob_color
        inner = ((yy - cy) ** 2 + (xx - cx) ** 2) < (r // 2) ** 2
        img[inner] = inner_color
        centers.append((cx, cy, r))
    return img, centers


def write_pyramidal_tiff(
    path: str,
    base_image: np.ndarray,
    mpp: float = 0.228,
    objective_power: float = 40.0,
    tile_size: int = 256,
    levels: Optional[int] = None,
    compression: str = "jpeg",
    jpeg_quality: int = 90,
) -> None:
    """Write a little-endian classic-TIFF pyramid.

    Level k is the base image downsampled by 2**k.  ``mpp`` is encoded via
    X/YResolution with ResolutionUnit=cm so readers recover it exactly when
    ``10000/mpp`` is rational; objective power goes in the NDPI SourceLens
    tag (65421).
    """
    h, w = base_image.shape[:2]
    if levels is None:
        levels = max(1, int(math.log2(max(h, w) / tile_size)) + 1)
    images = [base_image]
    for _ in range(levels - 1):
        images.append(_downsample2(images[-1]))

    # mpp -> rational pixels-per-cm, with num constrained to u32
    den = 1_000_000
    num = int(round(10000.0 / mpp * den))
    while num >= 2**32:
        den //= 10
        num = int(round(10000.0 / mpp * den))

    chunks: List[bytes] = []  # file payload chunks after header
    header = struct.pack("<2sHI", b"II", 42, 0)  # IFD offset patched later
    pos = len(header)

    def alloc(data: bytes) -> int:
        nonlocal pos
        if pos % 2:
            chunks.append(b"\0")
            pos += 1
        off = pos
        chunks.append(data)
        pos += len(data)
        return off

    ifd_offsets: List[int] = []
    ifd_blobs: List[bytes] = []
    for img in images:
        lh, lw = img.shape[:2]
        tiles_across = math.ceil(lw / tile_size)
        tiles_down = math.ceil(lh / tile_size)
        offsets: List[int] = []
        counts: List[int] = []
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                tile = np.full((tile_size, tile_size, 3), 255, np.uint8)
                sub = img[ty * tile_size: (ty + 1) * tile_size,
                          tx * tile_size: (tx + 1) * tile_size]
                tile[: sub.shape[0], : sub.shape[1]] = sub
                if compression == "jpeg":
                    import cv2

                    ok, enc = cv2.imencode(
                        ".jpg", tile[:, :, ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
                    assert ok
                    data = enc.tobytes()
                elif compression == "none":
                    data = tile.tobytes()
                else:
                    raise ValueError(compression)
                offsets.append(alloc(data))
                counts.append(len(data))

        b = _IfdBuilder()
        b.add(256, _TYPE_LONG, [lw])
        b.add(257, _TYPE_LONG, [lh])
        b.add(258, _TYPE_SHORT, [8, 8, 8])
        b.add(259, _TYPE_SHORT, [7 if compression == "jpeg" else 1])
        b.add(262, _TYPE_SHORT, [6 if compression == "jpeg" else 2])
        b.add(277, _TYPE_SHORT, [3])
        b.add(282, _TYPE_RATIONAL, [(num, den)])
        b.add(283, _TYPE_RATIONAL, [(num, den)])
        b.add(296, _TYPE_SHORT, [3])  # centimetre
        b.add(322, _TYPE_LONG, [tile_size])
        b.add(323, _TYPE_LONG, [tile_size])
        b.add(324, _TYPE_LONG, offsets)
        b.add(325, _TYPE_LONG, counts)
        b.add(65421, _TYPE_FLOAT, [objective_power])

        entries = sorted(b.entries)
        ifd = struct.pack("<H", len(entries))
        deferred: List[Tuple[int, bytes]] = []
        body = b""
        for tag, typ, cnt, payload in entries:
            if len(payload) <= 4:
                value = payload.ljust(4, b"\0")
                body += struct.pack("<HHI", tag, typ, cnt) + value
            else:
                off = alloc(payload)
                body += struct.pack("<HHII", tag, typ, cnt, off)
        ifd += body + struct.pack("<I", 0)  # next-IFD patched later
        ifd_offsets.append(alloc(ifd))
        ifd_blobs.append(ifd)

    payload = b"".join(chunks)
    buf = bytearray(header + payload)
    # patch first-IFD offset and the next-IFD chain
    struct.pack_into("<I", buf, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        # next-IFD pointer sits in the last 4 bytes of the IFD blob
        end = ifd_offsets[i] + len(ifd_blobs[i]) - 4
        struct.pack_into("<I", buf, end, ifd_offsets[i + 1])
    with open(path, "wb") as f:
        f.write(bytes(buf))
