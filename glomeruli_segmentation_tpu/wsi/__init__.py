"""Whole-slide I/O with an openslide-compatible surface."""
from .tiff_reader import Slide, TiffParseError  # noqa: F401

# openslide-compatible property-name constants so ported code keeps working
PROPERTY_NAME_MPP_X = "openslide.mpp-x"
PROPERTY_NAME_MPP_Y = "openslide.mpp-y"
PROPERTY_NAME_OBJECTIVE_POWER = "openslide.objective-power"


def open_slide(path: str) -> Slide:
    """Open a pyramidal slide (TIFF/BigTIFF/NDPI).

    Prefers the C++ fast reader when built; falls back to the pure-python
    parser.  API mirrors ``openslide.open_slide``.
    """
    try:
        from .native_reader import NativeSlide  # built extension, optional

        return NativeSlide(path)
    except (ImportError, OSError):
        return Slide(path)
