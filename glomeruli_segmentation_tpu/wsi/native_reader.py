"""ctypes wrapper over the C++ slide reader (wsi/native/_ndpi_reader.so).

Same surface as :class:`.tiff_reader.Slide`; ``open_slide`` prefers this
implementation when the shared library has been built (wsi/native/build.sh).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "native",
                         "_ndpi_reader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gs_open.restype = ctypes.c_void_p
        lib.gs_open.argtypes = [ctypes.c_char_p]
        lib.gs_close.argtypes = [ctypes.c_void_p]
        lib.gs_level_count.restype = ctypes.c_int
        lib.gs_level_count.argtypes = [ctypes.c_void_p]
        lib.gs_level_dimensions.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        for name in ("gs_mpp_x", "gs_mpp_y", "gs_objective_power"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_double
            fn.argtypes = [ctypes.c_void_p]
        lib.gs_chunk_decodes.restype = ctypes.c_int64
        lib.gs_chunk_decodes.argtypes = [ctypes.c_void_p]
        try:  # newer ABI; a stale .so still loads without it
            lib.gs_ndpi_index_mode.restype = ctypes.c_int
            lib.gs_ndpi_index_mode.argtypes = [ctypes.c_void_p, ctypes.c_int]
        except AttributeError:
            pass
        lib.gs_read_region.restype = ctypes.c_int
        lib.gs_read_region.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    return _lib


class NativeSlide:
    def __init__(self, path: str):
        lib = _load_lib()
        self._lib = lib
        self._handle = lib.gs_open(path.encode())
        if not self._handle:
            raise OSError(f"native reader could not open {path}")
        self.path = path
        self.properties = self._build_properties()

    # ---------------- openslide-compatible surface ----------------
    @property
    def level_count(self) -> int:
        return self._lib.gs_level_count(self._handle)

    @property
    def level_dimensions(self) -> List[Tuple[int, int]]:
        dims = []
        for level in range(self.level_count):
            w = ctypes.c_int64()
            h = ctypes.c_int64()
            self._lib.gs_level_dimensions(self._handle, level,
                                          ctypes.byref(w), ctypes.byref(h))
            dims.append((w.value, h.value))
        return dims

    @property
    def dimensions(self) -> Tuple[int, int]:
        return self.level_dimensions[0]

    @property
    def level_downsamples(self) -> List[float]:
        dims = self.level_dimensions
        return [dims[0][0] / w for w, _ in dims]

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, d in enumerate(self.level_downsamples):
            if d <= downsample + 1e-6:
                best = i
        return best

    def _build_properties(self) -> Dict[str, str]:
        props = {}
        mpp_x = self._lib.gs_mpp_x(self._handle)
        mpp_y = self._lib.gs_mpp_y(self._handle)
        if mpp_x > 0:
            props["openslide.mpp-x"] = str(mpp_x)
            props["openslide.mpp-y"] = str(mpp_y or mpp_x)
        objective = self._lib.gs_objective_power(self._handle)
        if objective > 0:
            props["openslide.objective-power"] = str(int(objective))
        props["openslide.level-count"] = str(self.level_count)
        for i, (w, h) in enumerate(self.level_dimensions):
            props[f"openslide.level[{i}].width"] = str(w)
            props[f"openslide.level[{i}].height"] = str(h)
            props[f"openslide.level[{i}].downsample"] = str(
                self.level_downsamples[i])
        return props

    @property
    def chunk_decodes(self) -> int:
        """Restart-chunk decodes since open (single-strip JPEG levels)."""
        return self._lib.gs_chunk_decodes(self._handle)

    def ndpi_index_mode(self, level: int) -> int:
        """0 = no virtual-tile index, 1 = entropy-stream marker scan,
        2 = indexed from the NDPI McuStarts tag (65426)."""
        try:
            fn = self._lib.gs_ndpi_index_mode
        except AttributeError:
            raise NotImplementedError(
                "stale _ndpi_reader.so: rebuild with wsi/native/build.sh")
        return fn(self._handle, level)

    def read_region_array(self, location, level, size) -> np.ndarray:
        x, y = location
        w, h = size
        out = np.empty((h, w, 3), np.uint8)
        rc = self._lib.gs_read_region(
            self._handle, level, int(x), int(y), int(w), int(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native read_region failed ({rc}) on {self.path}")
        return out

    def read_region(self, location, level, size):
        from PIL import Image

        rgb = self.read_region_array(location, level, size)
        rgba = np.dstack([rgb, np.full(rgb.shape[:2], 255, np.uint8)])
        return Image.fromarray(rgba, mode="RGBA")

    def close(self):
        if self._handle:
            self._lib.gs_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
