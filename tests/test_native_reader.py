"""Native C++ slide reader vs the pure-python reference implementation."""
import os
import subprocess

import numpy as np
import pytest

from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)
from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "glomeruli_segmentation_tpu", "wsi", "native")


@pytest.fixture(scope="module")
def native_slide_cls():
    so = os.path.join(NATIVE_DIR, "_ndpi_reader.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["sh", os.path.join(NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:
            pytest.skip(f"native build unavailable: {e}")
    from glomeruli_segmentation_tpu.wsi.native_reader import NativeSlide

    return NativeSlide


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    img, _ = pas_like_image(1100, 1700, seed=9)
    path = str(tmp / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.23, objective_power=40.0, levels=3)
    return path


def test_native_matches_python(native_slide_cls, slide_path):
    ns = native_slide_cls(slide_path)
    ps = Slide(slide_path)
    assert ns.dimensions == ps.dimensions
    assert ns.level_count == ps.level_count
    assert ns.level_downsamples == ps.level_downsamples
    assert abs(float(ns.properties["openslide.mpp-x"])
               - float(ps.properties["openslide.mpp-x"])) < 1e-9
    rng = np.random.RandomState(0)
    for _ in range(5):
        x, y = rng.randint(0, 1400), rng.randint(0, 900)
        a = ns.read_region_array((x, y), 0, (300, 200))
        b = ps.read_region_array((x, y), 0, (300, 200))
        np.testing.assert_array_equal(a, b)
    # other level + out of bounds + edge straddle
    np.testing.assert_array_equal(ns.read_region_array((100, 100), 1, (64, 64)),
                                  ps.read_region_array((100, 100), 1, (64, 64)))
    oob = ns.read_region_array((10**7, 10**7), 0, (16, 16))
    assert (oob == 255).all()
    edge = ns.read_region_array((1690, 1090), 0, (32, 32))
    np.testing.assert_array_equal(
        edge, ps.read_region_array((1690, 1090), 0, (32, 32)))
    # degenerate (zero-size) regions: success with an empty array in BOTH
    # readers — a w==0 detection crop must not abort only when the
    # native .so is loaded
    for size in ((0, 16), (16, 0), (0, 0)):
        a = ns.read_region_array((100, 100), 0, size)
        b = ps.read_region_array((100, 100), 0, size)
        assert a.shape == b.shape == (size[1], size[0], 3)


def test_open_slide_prefers_native(native_slide_cls, slide_path):
    from glomeruli_segmentation_tpu import wsi

    slide = wsi.open_slide(slide_path)
    assert type(slide).__name__ == "NativeSlide"
    region = slide.read_region((0, 0), 0, (64, 64))
    assert region.mode == "RGBA"
