"""Tests for the WSI layer: synthetic pyramid writer + readers."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.wsi import (
    PROPERTY_NAME_MPP_X,
    PROPERTY_NAME_OBJECTIVE_POWER,
    open_slide,
)
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)
from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide


@pytest.fixture(scope="module")
def synthetic_slide(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wsi")
    img, centers = pas_like_image(1200, 1600, seed=3)
    path = str(tmp / "sample.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, objective_power=40.0,
                         tile_size=256, levels=3, compression="jpeg")
    return path, img, centers


def test_pyramid_structure(synthetic_slide):
    path, img, _ = synthetic_slide
    slide = Slide(path)
    assert slide.dimensions == (1600, 1200)
    assert slide.level_count == 3
    assert slide.level_dimensions[1] == (800, 600)
    np.testing.assert_allclose(slide.level_downsamples, [1.0, 2.0, 4.0])
    assert abs(float(slide.properties[PROPERTY_NAME_MPP_X]) - 0.25) < 1e-6
    assert slide.properties[PROPERTY_NAME_OBJECTIVE_POWER] == "40"


def test_read_region_level0(synthetic_slide):
    path, img, _ = synthetic_slide
    slide = Slide(path)
    region = slide.read_region((300, 200), 0, (257, 129))
    arr = np.asarray(region)
    assert region.mode == "RGBA"
    assert arr.shape == (129, 257, 4)
    want = img[200:329, 300:557]
    # JPEG quality-90 round trip
    err = np.abs(arr[:, :, :3].astype(int) - want.astype(int)).mean()
    assert err < 6.0, err


def test_read_region_other_level_and_oob(synthetic_slide):
    path, img, _ = synthetic_slide
    slide = Slide(path)
    # level-1 read: location is level-0 coords
    arr = np.asarray(slide.read_region((400, 400), 1, (100, 100)))[:, :, :3]
    want = img[400:600, 400:600]
    want_ds = want.reshape(100, 2, 100, 2, 3).mean(axis=(1, 3))
    assert np.abs(arr.astype(float) - want_ds).mean() < 8.0
    # fully out of bounds -> white background
    arr = np.asarray(slide.read_region((10**6, 10**6), 0, (32, 32)))
    assert (arr[:, :, :3] == 255).all()
    # straddling the right edge
    arr = np.asarray(slide.read_region((1590, 0), 0, (20, 20)))[:, :, :3]
    assert (arr[:, 10:] == 255).all()
    assert not (arr[:, :10] == 255).all()


def test_uncompressed_roundtrip(tmp_path):
    img, _ = pas_like_image(300, 500, seed=1)
    path = str(tmp_path / "raw.tiff")
    write_pyramidal_tiff(path, img, mpp=0.5, tile_size=128, levels=2,
                         compression="none")
    slide = Slide(path)
    arr = slide.read_region_array((0, 0), 0, (500, 300))
    np.testing.assert_array_equal(arr, img)


def test_pil_can_open_fixture(synthetic_slide):
    """Cross-validate the writer against an independent TIFF implementation."""
    from PIL import Image

    path, img, _ = synthetic_slide
    with Image.open(path) as im:
        assert im.size == (1600, 1200)
        n = 0
        try:
            while True:
                im.seek(n + 1)
                n += 1
        except EOFError:
            pass
        assert n + 1 == 3


def test_open_slide_dispatch(synthetic_slide):
    path, _, _ = synthetic_slide
    slide = open_slide(path)
    assert slide.dimensions == (1600, 1200)
