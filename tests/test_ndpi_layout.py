"""Real-NDPI layout: single-strip JPEG levels with restart markers.

Hamamatsu NDPI stores each pyramid level as ONE JPEG strip
(RowsPerStrip == ImageLength) with a restart marker every R MCUs; levels
wider/taller than JPEG's 65,500 px limit record 0x0 in the SOF and the
true dims live only in the TIFF tags.  The reference reads this format
through ``openslide.read_region``
(/root/reference/module/faster-rcnn/detect_glomus_test.py:274,
/root/reference/module/espnet/test/eval_wsi_segmentation.py:351-357);
these tests pin our replacement's behavior:

- window reads are exact crops of the level (self-consistent virtual
  tiling) and decode only the restart chunks the window touches —
  O(window), independent of slide height;
- vs decoding the whole strip in one pass, per-chunk decoding differs
  only by libjpeg's chroma upsampling at chunk boundary rows (the same
  property OpenSlide's per-chunk NDPI decode has);
- the C++ reader is bit-identical to the pure-python ground truth.
"""
import os
import subprocess

import numpy as np
import pytest

from glomeruli_segmentation_tpu.wsi.synthetic import (
    encode_ndpi_strip,
    pas_like_image,
    write_ndpi_like_tiff,
)
from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide, _decode_jpeg

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
def ndpi_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ndpi")
    img, _ = pas_like_image(530, 700, seed=3, n_glomeruli=4)
    path = str(tmp / "s.ndpi.tiff")
    write_ndpi_like_tiff(path, img, mpp=0.228, objective_power=40.0,
                         levels=2, rows_per_chunk=1)
    return path, img


@pytest.fixture(scope="module")
def wide_path(tmp_path_factory):
    """A level wider than JPEG's 65,500 px limit: SOF dims are 0, chunks
    are horizontal segments of one MCU row (260 MCUs = 4,160 px)."""
    tmp = tmp_path_factory.mktemp("ndpi_wide")
    cols = (np.arange(66560, dtype=np.int64) % 251).astype(np.uint8)
    img = np.tile(cols[None, :, None], (48, 1, 3))
    path = str(tmp / "wide.ndpi.tiff")
    write_ndpi_like_tiff(path, img, levels=1, chunk_mcus_w=260,
                         zero_sof_dims=True)
    return path


def test_virtual_tiling_detected(ndpi_path):
    path, img = ndpi_path
    s = Slide(path)
    idx = s._ndpi_index(0)
    assert idx is not None
    # one chunk per 16-px MCU row at 4:2:0
    assert (idx.tile_w, idx.tile_h, idx.tiles_across) == (700, 16, 1)
    assert idx.n_chunks == len(idx.chunk_spans) == -(-530 // 16)
    assert s.level_dimensions == [(700, 530), (350, 265)]
    assert s.properties["openslide.objective-power"] == "40"


def test_window_is_crop_of_full_and_o_window(ndpi_path):
    path, _ = ndpi_path
    s = Slide(path)
    full = s.read_region_array((0, 0), 0, (700, 530))
    before = s.chunk_decodes
    s2 = Slide(path)
    win = s2.read_region_array((100, 96), 0, (256, 192))
    np.testing.assert_array_equal(win, full[96:288, 100:356])
    # 192 rows / 16-px chunks = 12 decodes, not the 34 of the whole level
    assert s2.chunk_decodes == 12 < before
    # out-of-bounds stays white
    oob = s.read_region_array((-64, 520), 0, (100, 100))
    assert (oob[:, :64] == 255).all() and (oob[20:, :] == 255).all()


def test_decode_count_independent_of_slide_height(tmp_path):
    """The real-NDPI failure mode being fixed: a whole-strip decoder's
    cost for one window scales with slide height; the virtual-tiled
    reader's must not."""
    counts = []
    for height in (256, 2048):
        img, _ = pas_like_image(height, 512, seed=1, n_glomeruli=2)
        path = str(tmp_path / f"h{height}.tiff")
        write_ndpi_like_tiff(path, img, levels=1)
        s = Slide(path)
        s.read_region_array((128, height // 2), 0, (128, 64))
        counts.append(s.chunk_decodes)
    assert counts[0] == counts[1] <= 6


def test_per_chunk_decode_vs_whole_strip(ndpi_path):
    """Per-chunk decode == whole-strip decode except chroma upsampling at
    the 16-px chunk boundary rows (bounded, boundary-only)."""
    path, img = ndpi_path
    s = Slide(path)
    full = s.read_region_array((0, 0), 0, (700, 530)).astype(np.int16)
    whole = _decode_jpeg(encode_ndpi_strip(img, rows_per_chunk=1)).astype(
        np.int16)
    diff = np.abs(full - whole).max(axis=2)
    assert diff.max() <= 8
    bad_rows = np.unique(np.argwhere(diff > 0)[:, 0]) % 16
    assert set(bad_rows.tolist()) <= {0, 15}


def test_multirow_chunks(tmp_path):
    """rows_per_chunk=2: restart interval spans two MCU rows."""
    img, _ = pas_like_image(200, 320, seed=5, n_glomeruli=2)
    path = str(tmp_path / "r2.tiff")
    write_ndpi_like_tiff(path, img, levels=1, rows_per_chunk=2)
    s = Slide(path)
    idx = s._ndpi_index(0)
    assert (idx.tile_w, idx.tile_h) == (320, 32)
    full = s.read_region_array((0, 0), 0, (320, 200))
    win = s.read_region_array((40, 30), 0, (100, 90))
    np.testing.assert_array_equal(win, full[30:120, 40:140])


def test_zero_sof_wide_level(wide_path):
    """Level > 65,500 px wide: geometry comes from the TIFF tags, chunks
    are horizontal row segments; values recoverable anywhere."""
    s = Slide(wide_path)
    assert s.dimensions == (66560, 48)
    idx = s._ndpi_index(0)
    assert (idx.tile_w, idx.tile_h, idx.tiles_across) == (4160, 16, 16)
    win = s.read_region_array((60000, 10), 0, (300, 30))
    expect = np.tile((np.arange(60000, 60300) % 251)[None, :, None],
                     (30, 1, 3))
    # smooth ramp encodes near-losslessly; exactness not required, but the
    # content must be the right part of the slide
    assert np.abs(win.astype(int) - expect).max() <= 12
    assert s.chunk_decodes == 3  # (300 px + alignment) / 4160-px chunks


def test_native_bit_identical(native_slide_cls, ndpi_path, wide_path):
    path, _ = ndpi_path
    for p in (path, wide_path):
        ps = Slide(p)
        ns = native_slide_cls(p)
        assert ns.level_dimensions == ps.level_dimensions
        w, h = ps.dimensions
        cases = [((0, 0), 0, (min(w, 2000), h)),
                 ((w // 3, h // 3), 0, (333, 111)),
                 ((-50, h - 40), 0, (200, 100))]
        if ps.level_count > 1:
            cases.append(((64, 64), 1, (256, 200)))
        for loc, lvl, size in cases:
            np.testing.assert_array_equal(
                ps.read_region_array(loc, lvl, size),
                ns.read_region_array(loc, lvl, size))


def test_native_o_window_counter(native_slide_cls, ndpi_path):
    path, _ = ndpi_path
    ns = native_slide_cls(path)
    ns.read_region_array((100, 96), 0, (256, 192))
    assert ns.chunk_decodes == 12


def test_open_slide_dispatch_on_ndpi_layout(ndpi_path):
    """The pipeline-facing entry point handles the real-NDPI layout."""
    from glomeruli_segmentation_tpu import wsi

    path, _ = ndpi_path
    with wsi.open_slide(path) as slide:
        assert slide.dimensions == (700, 530)
        region = np.asarray(slide.read_region((32, 32), 0, (64, 64)))
        assert region.shape == (64, 64, 4)
        assert (region[:, :, 3] == 255).all()


def test_mcu_starts_tag_bit_identical(tmp_path, native_slide_cls):
    """NDPI McuStarts tag (65426): real Hamamatsu scanners precompute the
    restart-chunk entropy offsets; both readers must consume the tag and
    produce output bit-identical to the scan-indexed file."""
    img, _ = pas_like_image(530, 700, seed=3, n_glomeruli=4)
    plain = str(tmp_path / "plain.ndpi.tiff")
    tagged = str(tmp_path / "tagged.ndpi.tiff")
    write_ndpi_like_tiff(plain, img, levels=2)
    write_ndpi_like_tiff(tagged, img, levels=2, mcu_starts=True)

    s = Slide(tagged)
    assert s._ndpi_index(0).used_mcu_starts is True
    ref = Slide(plain)
    assert ref._ndpi_index(0).used_mcu_starts is False
    for loc, size in [((0, 0), (700, 530)), ((123, 77), (300, 200))]:
        np.testing.assert_array_equal(s.read_region_array(loc, 0, size),
                                      ref.read_region_array(loc, 0, size))

    ns = native_slide_cls(tagged)
    assert ns.ndpi_index_mode(0) == 2  # indexed from the tag
    assert native_slide_cls(plain).ndpi_index_mode(0) == 1  # marker scan
    np.testing.assert_array_equal(
        ns.read_region_array((123, 77), 0, (300, 200)),
        ref.read_region_array((123, 77), 0, (300, 200)))


def test_mcu_starts_gap1_falls_back_in_both_readers(tmp_path,
                                                    native_slide_cls):
    """A McuStarts tag with a sub-RST gap (entries 2 bytes apart are the
    minimum a real file can produce) at an index the RST probe does not
    sample must be rejected at validation in BOTH readers — falling back
    to the marker scan, not surfacing as a garbage decode or a failed
    read."""
    img, _ = pas_like_image(530, 700, seed=3, n_glomeruli=4)
    bad = str(tmp_path / "gap1.ndpi.tiff")
    plain = str(tmp_path / "plain.ndpi.tiff")
    write_ndpi_like_tiff(plain, img, levels=1)

    def plant_gap1(starts):
        assert len(starts) > 5 and len(starts) // 2 != 2
        starts[2] = starts[1] + 1
        return starts

    write_ndpi_like_tiff(bad, img, levels=1, mcu_starts=True,
                         mcu_starts_transform=plant_gap1)

    s = Slide(bad)
    assert s._ndpi_index(0).used_mcu_starts is False  # rejected -> scan
    ref = Slide(plain)
    np.testing.assert_array_equal(
        s.read_region_array((123, 77), 0, (300, 200)),
        ref.read_region_array((123, 77), 0, (300, 200)))

    ns = native_slide_cls(bad)
    assert ns.ndpi_index_mode(0) == 1  # rejected -> marker scan
    np.testing.assert_array_equal(
        ns.read_region_array((123, 77), 0, (300, 200)),
        ref.read_region_array((123, 77), 0, (300, 200)))


def test_mcu_starts_single_chunk_level(tmp_path, native_slide_cls):
    """A level whose MCUs all fit one restart interval (n_chunks == 1 —
    real at the deepest pyramid levels) carries a one-entry McuStarts
    tag.  The RST probe set {1, n//2, n-1} must skip out-of-range
    indices rather than raise — a raise would also skip the scan
    fallback and silently lose the level's virtual-tile index."""
    img, _ = pas_like_image(64, 96, seed=7, n_glomeruli=1)
    tagged = str(tmp_path / "one.ndpi.tiff")
    plain = str(tmp_path / "plain.ndpi.tiff")
    # 64 rows = 8 MCU rows; rows_per_chunk=8 -> single chunk
    write_ndpi_like_tiff(tagged, img, levels=1, rows_per_chunk=8,
                         mcu_starts=True)
    write_ndpi_like_tiff(plain, img, levels=1, rows_per_chunk=8)

    s = Slide(tagged)
    idx = s._ndpi_index(0)
    assert idx.ok and idx.used_mcu_starts is True
    assert idx.n_chunks == 1
    ref = Slide(plain)
    np.testing.assert_array_equal(
        s.read_region_array((8, 8), 0, (80, 48)),
        ref.read_region_array((8, 8), 0, (80, 48)))

    ns = native_slide_cls(tagged)
    assert ns.ndpi_index_mode(0) == 2  # indexed from the tag
    np.testing.assert_array_equal(
        ns.read_region_array((8, 8), 0, (80, 48)),
        ref.read_region_array((8, 8), 0, (80, 48)))


def test_mcu_starts_skips_entropy_scan():
    """With the tag, index construction reads only the JPEG headers plus
    a few 2-byte marker probes — NOT the whole entropy stream (which is
    multi-GB at level 0 of a real slide)."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import _NdpiStripIndex

    img, _ = pas_like_image(2048, 512, seed=2, n_glomeruli=3)
    strip, starts = encode_ndpi_strip(img, return_mcu_starts=True)
    assert len(strip) > 2 * (1 << 16)  # claim below is meaningful

    read_bytes = [0]

    def read(off, size):
        read_bytes[0] += size
        return strip[off: off + size]

    idx = _NdpiStripIndex(read, 0, len(strip), 512, 2048,
                          mcu_starts=starts)
    assert idx.ok and idx.used_mcu_starts
    assert read_bytes[0] <= (1 << 16) + 64
    # and the spans are exactly what the scan derives
    scan = _NdpiStripIndex(read, 0, len(strip), 512, 2048)
    assert not scan.used_mcu_starts
    assert scan.chunk_spans == idx.chunk_spans


def test_mcu_starts_invalid_falls_back_to_scan():
    """A tag that fails validation (entry not preceded by an RST marker)
    must be ignored — the reader falls back to the marker scan and stays
    correct, guarding against files whose 65426 convention deviates."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import _NdpiStripIndex

    img, _ = pas_like_image(256, 320, seed=4, n_glomeruli=2)
    strip, starts = encode_ndpi_strip(img, return_mcu_starts=True)
    read = lambda off, size: strip[off: off + size]  # noqa: E731
    # gap of 1 at an index the RST probe does NOT sample (the probe
    # checks {1, n//2, n-1}): end = next - 2 < start would invert the
    # span arithmetic — the gap>=2 validation must reject it instead of
    # letting it surface as a garbage decode
    assert len(starts) > 5 and len(starts) // 2 != 2
    gap1 = list(starts)
    gap1[2] = gap1[1] + 1
    for bad in ([s + 1 for s in starts],          # first entry mismatch
                starts[:-1],                      # wrong count
                [starts[0]] + [s + 1 for s in starts[1:]],   # probe fails
                gap1):                            # sub-RST gap
        idx = _NdpiStripIndex(read, 0, len(strip), 320, 256, mcu_starts=bad)
        assert idx.ok and not idx.used_mcu_starts
        good = _NdpiStripIndex(read, 0, len(strip), 320, 256,
                               mcu_starts=starts)
        assert good.chunk_spans == idx.chunk_spans


def test_wrapped_offsets_over_4gib(tmp_path, native_slide_cls):
    """Real NDPI stays CLASSIC TIFF past 4 GiB (level 0 of a 40x slide
    routinely is): stored 32-bit offsets are the true positions modulo
    2^32, and readers must reconstruct the high bits — directory offsets
    by forward monotonicity + an IFD probe, data offsets from the
    data-written-before-its-directory layout (the OpenSlide fixup).  The
    fixture pushes every structure past 4 GiB via a sparse hole; both
    readers must match the unpadded file exactly."""
    img, _ = pas_like_image(530, 700, seed=3, n_glomeruli=4)
    plain = str(tmp_path / "plain.ndpi.tiff")
    big = str(tmp_path / "big.ndpi.tiff")
    write_ndpi_like_tiff(plain, img, levels=2, mcu_starts=True)
    write_ndpi_like_tiff(big, img, levels=2, mcu_starts=True,
                         offset_pad=(1 << 32) + 12345)
    assert os.path.getsize(big) > (1 << 32)
    # the hole is sparse: on-disk cost is only the real payload
    assert os.stat(big).st_blocks * 512 < os.path.getsize(plain) + (1 << 20)

    ref = Slide(plain)
    cases = [((0, 0), 0, (700, 530)), ((123, 77), 0, (300, 200)),
             ((64, 64), 1, (256, 200))]
    s = Slide(big)
    assert s.level_dimensions == ref.level_dimensions
    assert (s.properties["openslide.mpp-x"]
            == ref.properties["openslide.mpp-x"])
    assert s.properties["openslide.objective-power"] == "40"
    # the out-of-line McuStarts payload was reconstructed too
    assert s._ndpi_index(0).used_mcu_starts is True
    for loc, lvl, size in cases:
        np.testing.assert_array_equal(s.read_region_array(loc, lvl, size),
                                      ref.read_region_array(loc, lvl, size))

    ns = native_slide_cls(big)
    assert ns.level_dimensions == ref.level_dimensions
    assert abs(float(ns.properties["openslide.mpp-x"])
               - float(ref.properties["openslide.mpp-x"])) < 1e-9
    assert ns.ndpi_index_mode(0) == 2
    for loc, lvl, size in cases:
        np.testing.assert_array_equal(ns.read_region_array(loc, lvl, size),
                                      ref.read_region_array(loc, lvl, size))


def test_offset_pad_below_4gib_is_plain_sparse_tiff(tmp_path):
    """A pad below 4 GiB keeps every offset under 2^32: no wrapping, no
    reader fixup triggered — just a valid sparse classic TIFF."""
    img, _ = pas_like_image(64, 64, seed=0, n_glomeruli=1)
    write_ndpi_like_tiff(str(tmp_path / "ok.tiff"), img, levels=1,
                         offset_pad=1 << 20)
    s = Slide(str(tmp_path / "ok.tiff"))
    assert s.dimensions == (64, 64)


def test_cyclic_ifd_chain_fails_not_hangs(tmp_path, native_slide_cls):
    """A next-IFD pointer that points back at itself (corrupt download)
    must produce a clean failure in both readers, never an infinite
    parse loop."""
    img, _ = pas_like_image(64, 64, seed=0, n_glomeruli=1)
    path = str(tmp_path / "cyclic.tiff")
    write_ndpi_like_tiff(path, img, levels=1)
    data = bytearray(open(path, "rb").read())
    import struct as _struct

    (first_ifd,) = _struct.unpack("<I", data[4:8])
    (n_entries,) = _struct.unpack("<H", data[first_ifd: first_ifd + 2])
    next_ptr = first_ifd + 2 + 12 * n_entries
    _struct.pack_into("<I", data, next_ptr, first_ifd)  # self-cycle
    open(path, "wb").write(bytes(data))

    with pytest.raises(Exception):
        Slide(path)
    with pytest.raises(Exception):
        native_slide_cls(path)


def test_scan_markers_terminates_on_short_reads():
    """StripByteCounts overstating the file (truncated slide) previously
    made the marker scan spin forever on a non-advancing read position;
    it must terminate and mark the index unusable (ok=False -> the reader
    falls back to whole-strip decode or fails loudly)."""
    from glomeruli_segmentation_tpu.wsi.synthetic import encode_ndpi_strip
    from glomeruli_segmentation_tpu.wsi.tiff_reader import _NdpiStripIndex

    img, _ = pas_like_image(128, 192, seed=1, n_glomeruli=1)
    strip = encode_ndpi_strip(img)
    short = strip[: len(strip) // 2]
    idx = _NdpiStripIndex(lambda off, size: short[off: off + size],
                          0, len(strip), 192, 128)
    assert idx.ok is False


def test_truncated_strip_terminates(tmp_path, native_slide_cls):
    """A strip whose StripByteCounts overstates the file (truncated
    download) must fail or degrade CLEANLY — the python marker scan
    previously spun forever on the non-advancing read, and the native
    header parse could read past its buffer."""
    img, _ = pas_like_image(256, 384, seed=9, n_glomeruli=2)
    path = str(tmp_path / "trunc.ndpi.tiff")
    write_ndpi_like_tiff(path, img, levels=1, rows_per_chunk=1)
    data = open(path, "rb").read()
    # chop the tail of the entropy stream (keep the TIFF IFD, which the
    # writer places at the head of this fixture, and the JPEG headers)
    cut = len(data) - (len(data) // 4)
    open(path, "wb").write(data[:cut])

    for opener in (Slide, native_slide_cls):
        try:
            s = opener(path)
            # index build may defer to the first read; either a clean
            # exception or a best-effort decode is acceptable — a hang
            # or a crash is not
            s.read_region_array((0, 0), 0, (64, 64))
        except Exception:
            pass
