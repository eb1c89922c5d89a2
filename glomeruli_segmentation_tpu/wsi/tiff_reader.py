"""Pure-python TIFF / BigTIFF / NDPI whole-slide reader.

Replaces OpenSlide for the pipeline's slide access (reference usage:
``openslide.open_slide`` / ``read_region`` / ``properties`` /
``level_downsamples`` at e.g. ``module/faster-rcnn/detect_glomus_test.py:183-274``,
``module/espnet/test/eval_wsi_segmentation.py:351-357``).  The API mirrors
openslide so pipeline code is drop-in:

- ``Slide.dimensions`` — level-0 (width, height)
- ``Slide.level_downsamples`` / ``level_dimensions`` / ``level_count``
- ``Slide.properties`` with the openslide property names
  (``openslide.mpp-x``, ``openslide.mpp-y``, ``openslide.objective-power``)
- ``Slide.read_region((x, y), level, (w, h))`` -> RGBA PIL image, with
  ``(x, y)`` in level-0 coordinates.

Format support: classic TIFF and BigTIFF, tiled or striped, compression
none (1), JPEG (7, with shared JPEGTables merging), deflate (8), and the
NDPI flavour of TIFF (objective power / mpp from Hamamatsu private tags).
A C++ fast path with the same API lives in ``wsi/native``; this module is
the portable fallback and the ground truth for its tests.
"""
from __future__ import annotations

import io
import math
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# TIFF tag ids
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_X_RESOLUTION = 282
TAG_Y_RESOLUTION = 283
TAG_RESOLUTION_UNIT = 296
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_JPEG_TABLES = 347
# Hamamatsu NDPI private tags
TAG_NDPI_SOURCELENS = 65421
TAG_NDPI_MPP_X = 65422  # actually XOffsetFromSlideCentre; see notes below
TAG_NDPI_MPP_Y = 65423

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q", 18: "Q"}


@dataclass
class _Page:
    width: int = 0
    height: int = 0
    tile_width: int = 0
    tile_height: int = 0
    rows_per_strip: int = 0
    compression: int = 1
    photometric: int = 2
    samples_per_pixel: int = 3
    offsets: List[int] = field(default_factory=list)
    byte_counts: List[int] = field(default_factory=list)
    jpeg_tables: Optional[bytes] = None
    x_resolution: Optional[float] = None
    y_resolution: Optional[float] = None
    resolution_unit: int = 2
    source_lens: Optional[float] = None

    @property
    def tiled(self) -> bool:
        return self.tile_width > 0


class TiffParseError(Exception):
    pass


def _read_ifds(f) -> Tuple[List[Dict[int, tuple]], str]:
    header = f.read(8)
    if header[:2] == b"II":
        endian = "<"
    elif header[:2] == b"MM":
        endian = ">"
    else:
        raise TiffParseError("not a TIFF file")
    (version,) = struct.unpack(endian + "H", header[2:4])
    big = version == 43
    if big:
        offsize, zero = struct.unpack(endian + "HH", header[4:8])
        if offsize != 8 or zero != 0:
            raise TiffParseError("malformed BigTIFF header")
        (ifd_offset,) = struct.unpack(endian + "Q", f.read(8))
        entry_size, count_fmt, off_fmt = 20, "Q", "Q"
    elif version == 42:
        (ifd_offset,) = struct.unpack(endian + "I", header[4:8])
        entry_size, count_fmt, off_fmt = 12, "H", "I"
    else:
        raise TiffParseError(f"unknown TIFF version {version}")

    ifds = []
    while ifd_offset:
        f.seek(ifd_offset)
        (n_entries,) = struct.unpack(
            endian + count_fmt, f.read(struct.calcsize(count_fmt)))
        raw = f.read(n_entries * entry_size)
        entries: Dict[int, tuple] = {}
        for i in range(n_entries):
            chunk = raw[i * entry_size: (i + 1) * entry_size]
            if big:
                tag, typ, cnt = struct.unpack(endian + "HHQ", chunk[:12])
                value_bytes = chunk[12:20]
            else:
                tag, typ, cnt = struct.unpack(endian + "HHI", chunk[:8])
                value_bytes = chunk[8:12]
            entries[tag] = (typ, cnt, value_bytes)
        (ifd_offset,) = struct.unpack(endian + off_fmt,
                                      f.read(struct.calcsize(off_fmt)))
        ifds.append(entries)
    return ifds, endian


def _tag_values(f, endian: str, entry: tuple):
    typ, cnt, value_bytes = entry
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= len(value_bytes):
        data = value_bytes[:total]
    else:
        fmt = "Q" if len(value_bytes) == 8 else "I"
        (offset,) = struct.unpack(endian + fmt, value_bytes)
        f.seek(offset)
        data = f.read(total)
    if typ == 2:  # ASCII
        return data.split(b"\0")[0].decode("ascii", "replace")
    if typ in (5, 10):  # RATIONAL
        fmt = "i" if typ == 10 else "I"
        pairs = struct.unpack(endian + fmt * (2 * cnt), data)
        return [pairs[2 * i] / pairs[2 * i + 1] if pairs[2 * i + 1] else 0.0
                for i in range(cnt)]
    if typ == 7:  # UNDEFINED
        return data
    fmt = _TYPE_FMT[typ]
    return list(struct.unpack(endian + fmt * cnt, data))


def _parse_page(f, endian: str, entries: Dict[int, tuple]) -> _Page:
    page = _Page()

    def get(tag, default=None):
        if tag not in entries:
            return default
        return _tag_values(f, endian, entries[tag])

    def get1(tag, default=None):
        v = get(tag)
        if v is None:
            return default
        if isinstance(v, (list, tuple)):
            return v[0] if v else default
        return v

    page.width = int(get1(TAG_IMAGE_WIDTH, 0))
    page.height = int(get1(TAG_IMAGE_LENGTH, 0))
    page.compression = int(get1(TAG_COMPRESSION, 1))
    page.photometric = int(get1(TAG_PHOTOMETRIC, 2))
    page.samples_per_pixel = int(get1(TAG_SAMPLES_PER_PIXEL, 3))
    page.tile_width = int(get1(TAG_TILE_WIDTH, 0))
    page.tile_height = int(get1(TAG_TILE_LENGTH, 0))
    page.rows_per_strip = int(get1(TAG_ROWS_PER_STRIP, page.height or 1))
    if page.tiled:
        page.offsets = [int(v) for v in get(TAG_TILE_OFFSETS, [])]
        page.byte_counts = [int(v) for v in get(TAG_TILE_BYTE_COUNTS, [])]
    else:
        page.offsets = [int(v) for v in get(TAG_STRIP_OFFSETS, [])]
        page.byte_counts = [int(v) for v in get(TAG_STRIP_BYTE_COUNTS, [])]
    jt = get(TAG_JPEG_TABLES)
    if jt:
        page.jpeg_tables = bytes(jt)
    page.x_resolution = get1(TAG_X_RESOLUTION)
    page.y_resolution = get1(TAG_Y_RESOLUTION)
    page.resolution_unit = int(get1(TAG_RESOLUTION_UNIT, 2))
    sl = get1(TAG_NDPI_SOURCELENS)
    if sl is not None:
        page.source_lens = float(sl)
    return page


def _decode_jpeg(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return np.asarray(img.convert("RGB"))


class Slide:
    """Pyramidal whole-slide image with openslide-like access."""

    def __init__(self, path: str, tile_cache_size: int = 64):
        self.path = path
        self._f = open(path, "rb")
        ifds, self._endian = _read_ifds(self._f)
        pages = [_parse_page(self._f, self._endian, e) for e in ifds]
        # keep only pyramid pages (full-resolution aspect ratio); NDPI also
        # stores a macro image and a map image with source_lens < 0
        pages = [p for p in pages if p.width > 0 and p.height > 0
                 and (p.source_lens is None or p.source_lens > 0)]
        if not pages:
            raise TiffParseError(f"no image pages in {path}")
        pages.sort(key=lambda p: -(p.width * p.height))
        base = pages[0]
        self._pages = [p for p in pages
                       if abs(p.width / p.height - base.width / base.height)
                       < 0.05]
        self._tile_cache: Dict[Tuple[int, int], np.ndarray] = {}
        self._tile_cache_size = tile_cache_size
        self.properties = self._build_properties()

    # ---------------- openslide-compatible surface ----------------
    @property
    def dimensions(self) -> Tuple[int, int]:
        return (self._pages[0].width, self._pages[0].height)

    @property
    def level_count(self) -> int:
        return len(self._pages)

    @property
    def level_dimensions(self) -> List[Tuple[int, int]]:
        return [(p.width, p.height) for p in self._pages]

    @property
    def level_downsamples(self) -> List[float]:
        w0 = self._pages[0].width
        return [w0 / p.width for p in self._pages]

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, d in enumerate(self.level_downsamples):
            if d <= downsample + 1e-6:
                best = i
        return best

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _build_properties(self) -> Dict[str, str]:
        props: Dict[str, str] = {}
        base = self._pages[0]
        if base.x_resolution:
            unit_um = {2: 25400.0, 3: 10000.0}.get(base.resolution_unit)
            if unit_um:
                props["openslide.mpp-x"] = str(unit_um / base.x_resolution)
                props["openslide.mpp-y"] = str(
                    unit_um / (base.y_resolution or base.x_resolution))
        if base.source_lens is not None:
            props["openslide.objective-power"] = str(int(base.source_lens))
        props["openslide.level-count"] = str(self.level_count)
        for i, (w, h) in enumerate(self.level_dimensions):
            props[f"openslide.level[{i}].width"] = str(w)
            props[f"openslide.level[{i}].height"] = str(h)
            props[f"openslide.level[{i}].downsample"] = str(
                self.level_downsamples[i])
        return props

    # ---------------- pixel access ----------------
    def _read_chunk(self, level: int, index: int) -> np.ndarray:
        key = (level, index)
        cached = self._tile_cache.get(key)
        if cached is not None:
            return cached
        page = self._pages[level]
        self._f.seek(page.offsets[index])
        data = self._f.read(page.byte_counts[index])
        if page.compression == 7:  # JPEG
            if page.jpeg_tables and len(page.jpeg_tables) > 4:
                # merge shared quant/huffman tables: tables stream minus EOI,
                # tile stream minus SOI
                data = page.jpeg_tables[:-2] + data[2:]
            arr = _decode_jpeg(data)
        elif page.compression == 8:  # deflate
            import zlib

            raw = zlib.decompress(data)
            arr = self._raw_to_array(page, index, raw)
        elif page.compression == 1:
            arr = self._raw_to_array(page, index, data)
        else:
            raise TiffParseError(
                f"unsupported compression {page.compression}")
        if len(self._tile_cache) >= self._tile_cache_size:
            self._tile_cache.pop(next(iter(self._tile_cache)))
        self._tile_cache[key] = arr
        return arr

    def _raw_to_array(self, page: _Page, index: int, raw: bytes) -> np.ndarray:
        spp = page.samples_per_pixel
        if page.tiled:
            h, w = page.tile_height, page.tile_width
        else:
            rows = min(page.rows_per_strip,
                       page.height - index * page.rows_per_strip)
            h, w = rows, page.width
        arr = np.frombuffer(raw, dtype=np.uint8, count=h * w * spp)
        arr = arr.reshape(h, w, spp)
        if spp == 1:
            arr = np.repeat(arr, 3, axis=2)
        return arr[:, :, :3]

    def read_region_array(self, location: Tuple[int, int], level: int,
                          size: Tuple[int, int]) -> np.ndarray:
        """RGB uint8 array; out-of-bounds pixels are white (slide background)."""
        x0_l0, y0_l0 = location
        w, h = size
        page = self._pages[level]
        ds = self.level_downsamples[level]
        x0 = int(x0_l0 / ds)
        y0 = int(y0_l0 / ds)
        out = np.full((h, w, 3), 255, dtype=np.uint8)

        ix0, iy0 = max(x0, 0), max(y0, 0)
        ix1, iy1 = min(x0 + w, page.width), min(y0 + h, page.height)
        if ix1 <= ix0 or iy1 <= iy0:
            return out

        if page.tiled:
            tw, th = page.tile_width, page.tile_height
            tiles_across = math.ceil(page.width / tw)
            for ty in range(iy0 // th, (iy1 - 1) // th + 1):
                for tx in range(ix0 // tw, (ix1 - 1) // tw + 1):
                    tile = self._read_chunk(level, ty * tiles_across + tx)
                    sx0 = max(ix0, tx * tw)
                    sy0 = max(iy0, ty * th)
                    sx1 = min(ix1, (tx + 1) * tw)
                    sy1 = min(iy1, (ty + 1) * th)
                    out[sy0 - y0: sy1 - y0, sx0 - x0: sx1 - x0] = tile[
                        sy0 - ty * th: sy1 - ty * th,
                        sx0 - tx * tw: sx1 - tx * tw]
        else:
            rps = page.rows_per_strip
            for strip in range(iy0 // rps, (iy1 - 1) // rps + 1):
                arr = self._read_chunk(level, strip)
                sy0 = max(iy0, strip * rps)
                sy1 = min(iy1, strip * rps + arr.shape[0])
                out[sy0 - y0: sy1 - y0, ix0 - x0: ix1 - x0] = arr[
                    sy0 - strip * rps: sy1 - strip * rps, ix0: ix1]
        return out

    def read_region(self, location: Tuple[int, int], level: int,
                    size: Tuple[int, int]):
        """openslide-compatible: returns an RGBA PIL image."""
        from PIL import Image

        rgb = self.read_region_array(location, level, size)
        rgba = np.dstack([rgb, np.full(rgb.shape[:2], 255, np.uint8)])
        return Image.fromarray(rgba, mode="RGBA")
