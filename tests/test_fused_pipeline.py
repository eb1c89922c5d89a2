"""Fused 5-fold ensemble pipeline tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from glomeruli_segmentation_tpu.pipeline.fused import (
    EnsembleConfig,
    EnsembleSegmenter,
    FusedSlideSegmenter,
    paste_downsampled_max,
)
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)


def test_paste_downsampled_max():
    canvas = jnp.zeros((32, 32), jnp.uint8)
    cmap = jnp.full((16, 24), 2, jnp.uint8)
    canvas = paste_downsampled_max(canvas, cmap, 4, 8)
    out = np.asarray(canvas)
    assert (out[8:10, 4:7] == 2).all()
    assert out.sum() == 2 * 2 * 3
    # max combine keeps the higher class
    cmap2 = jnp.full((16, 24), 1, jnp.uint8)
    canvas = paste_downsampled_max(canvas, cmap2, 4, 8)
    assert (np.asarray(canvas)[8:10, 4:7] == 2).all()


@pytest.fixture(scope="module")
def ensemble(reference_models_dir):
    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in range(1, 6)]
    return EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, batch_size=2, compute_dtype="float32",
        precision="highest"))


def test_ensemble_runs_and_agrees_with_single_fold(ensemble,
                                                   reference_models_dir):
    from glomeruli_segmentation_tpu.pipeline.segment import (
        EspnetSegmenter,
        SegmenterConfig,
    )

    rng = np.random.RandomState(0)
    img = np.full((300, 400, 3), (200, 170, 205), np.uint8)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255).astype(
        np.uint8)
    padded = img[None]
    maps = ensemble.segment_batch_padded(
        np.repeat(padded, 2, axis=0), np.asarray([300, 300], np.int32),
        np.asarray([400, 400], np.int32))
    assert maps.shape == (2, 512, 1024)
    assert maps.max() < 5
    np.testing.assert_array_equal(maps[0], maps[1])

    # ensemble argmax should broadly agree with the fold-1 class map on
    # near-background input
    single = EspnetSegmenter(SegmenterConfig(
        weights=str(reference_models_dir / "espnet_fold1.pth"),
        mean=[204.60071, 170.19359, 199.57469],
        std=[20.61257, 42.92207, 28.401505], batch_size=1))
    one = single.class_maps_net_res([img])[0]
    agreement = (one == maps[0]).mean()
    assert agreement > 0.5, agreement


def test_fused_slide_segmentation(ensemble, tmp_path):
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, centers = pas_like_image(1024, 1536, seed=13, n_glomeruli=2)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1024, 768, 0.9]]
    fused = FusedSlideSegmenter(ensemble)
    canvas = fused.segment_slide(slide, detections)
    assert canvas.shape == (1024 // 8, 1536 // 8)
    assert canvas.max() < 5
    # everything outside detected boxes stays background
    mask = np.zeros_like(canvas, bool)
    for x1, y1, x2, y2, _ in detections:
        mask[y1 // 8: y2 // 8, x1 // 8: x2 // 8] = True
    assert (canvas[~mask] == 0).all()


def test_segment_slide_ds8_matches_full_path(ensemble, tmp_path):
    """The device-side /8 gather (taken when no full-res consumer exists)
    must be byte-identical to the host postprocess_nearest_host stitch."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(1024, 1536, seed=21, n_glomeruli=3)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    # ragged sizes incl. non-multiples of 8 to exercise the index tables
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1021, 763, 0.9],
                  [100, 700, 450, 1000, 0.9]]
    fused = FusedSlideSegmenter(ensemble)
    ds8 = fused.segment_slide(slide, detections)            # gather path
    full = fused.segment_slide(slide, detections,
                               on_crop=lambda box, m: None)  # full-res path
    np.testing.assert_array_equal(ds8, full)


def test_segment_slide_boxes_overhanging_canvas(ensemble, tmp_path):
    """The detect scan's ceil grid pads windows past the slide edge
    (detect_glomus_test.py:286-304), so merged boxes can overhang — or on
    a padded bottom window sit entirely beyond — the /8 canvas.  The
    stitch must paste only the intersection (regression: an origin past
    the edge made the clamp negative and numpy raised on the empty/
    non-empty maximum), on both the ds8-gather and full-res paths."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(1024, 1536, seed=23, n_glomeruli=2)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [
        [256, 256, 640, 640, 0.9],      # in bounds
        [640, 840, 1020, 1180, 0.9],    # overhangs the bottom (H=1024)
        [1200, 128, 1700, 520, 0.9],    # overhangs the right (W=1536)
        [384, 1100, 960, 1420, 0.9],    # entirely below the slide
    ]
    fused = FusedSlideSegmenter(ensemble)
    ds8 = fused.segment_slide(slide, detections)
    assert ds8.shape == (1024 // 8, 1536 // 8)
    full = fused.segment_slide(slide, detections,
                               on_crop=lambda box, m: None)
    np.testing.assert_array_equal(ds8, full)
    # in-bounds-only rerun: the overhanging boxes' in-canvas parts may add
    # pixels, but nothing outside all boxes' intersections may be touched
    mask = np.zeros_like(ds8, bool)
    for x1, y1, x2, y2, _ in detections:
        mask[y1 // 8: min(y2, 1024) // 8, x1 // 8: min(x2, 1536) // 8] = True
    assert (ds8[~mask] == 0).all()


def test_segment_slide_ds8_matches_full_path_packed(reference_models_dir,
                                                    tmp_path):
    """Packed engine: the /8 gather commutes through the classifier
    upconv (PackedEnsembleESPNet.gathered_argmax) — its stitch canvas
    must equal the full-res path's byte for byte."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in range(1, 6)]
    packed = EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, batch_size=2, compute_dtype="float32",
        precision="highest"), engine="packed")
    img, _ = pas_like_image(1024, 1536, seed=21, n_glomeruli=3)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1021, 763, 0.9],
                  [100, 700, 450, 1000, 0.9]]
    fused = FusedSlideSegmenter(packed)
    ds8 = fused.segment_slide(slide, detections)            # gather path
    full = fused.segment_slide(slide, detections,
                               on_crop=lambda box, m: None)  # full-res path
    np.testing.assert_array_equal(ds8, full)


def test_pack_unflatten_roundtrip():
    """unflatten_crops must rebuild exactly the valid region of every crop
    from the ragged flat buffer (padding content is unspecified — the
    resize never reads it)."""
    import jax

    from glomeruli_segmentation_tpu.ops.preprocess import (
        pack_crops_flat,
        unflatten_crops,
    )

    rng = np.random.RandomState(7)
    sizes = [(300, 400), (512, 256), (123, 457)]
    crops = [rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
             for h, w in sizes]
    bs = 4  # one empty slot
    flat, offs, hs, ws = pack_crops_flat(crops, bs, max_w=512)
    assert flat.size % (1 << 21) == 0
    # padded-shape quantization (the production path): buffer lengths are
    # multiples of 1/8 of the padded batch bytes, so at most ~9 distinct
    # compiled programs exist per padded shape
    quantum = bs * 512 * 512 * 3 // 8
    flat_q, _, _, _ = pack_crops_flat(crops, bs, max_w=512, max_h=512)
    assert flat_q.size % quantum == 0
    content = sum(c.size for c in crops)
    assert content <= flat_q.size < content + 2 * quantum
    np.testing.assert_array_equal(hs[:3], [300, 512, 123])
    np.testing.assert_array_equal(ws[:3], [400, 256, 457])
    assert hs[3] == ws[3] == 1
    padded = np.asarray(jax.jit(
        unflatten_crops, static_argnums=(4, 5))(
            flat, offs, hs, ws, 512, 512))
    assert padded.shape == (bs, 512, 512, 3)
    for i, c in enumerate(crops):
        np.testing.assert_array_equal(
            padded[i, : c.shape[0], : c.shape[1]], c)


def test_classmap_pack_roundtrip():
    """Base-`classes` class-map packing must be exact for every class
    count (k=3 at 5 classes, k=8 at 2, k=1 passthrough above 16) and for
    widths not divisible by the pack factor."""
    import jax

    from glomeruli_segmentation_tpu.ops.preprocess import (
        classmap_pack_width,
        pack_classmap,
        unpack_classmap,
    )

    assert classmap_pack_width(5) == 3
    assert classmap_pack_width(2) == 8
    assert classmap_pack_width(16) == 2
    assert classmap_pack_width(17) == 1
    # degenerate class counts must terminate (1**k/0**k never exceed 256)
    assert classmap_pack_width(1) == 1
    assert classmap_pack_width(0) == 1
    rng = np.random.RandomState(3)
    for classes, w in ((5, 1024), (5, 1021), (2, 37), (16, 33), (17, 8)):
        maps = rng.randint(0, classes, (2, 7, w)).astype(np.uint8)
        packed = np.asarray(jax.jit(
            pack_classmap, static_argnums=1)(maps, classes))
        k = classmap_pack_width(classes)
        assert packed.shape == (2, 7, -(-w // k))
        np.testing.assert_array_equal(
            unpack_classmap(packed, classes, w), maps)


def test_pack_output_off_matches_on(ensemble, reference_models_dir):
    """pack_output=True (byte-limited-link opt-in) and the unpacked
    default must produce identical class maps through the real device
    path."""
    import dataclasses

    plain = EnsembleSegmenter(
        dataclasses.replace(ensemble.config, pack_output=True))
    rng = np.random.RandomState(11)
    padded = rng.randint(0, 255, (2, 320, 448, 3)).astype(np.uint8)
    hs = np.asarray([300, 320], np.int32)
    ws = np.asarray([448, 400], np.int32)
    np.testing.assert_array_equal(
        ensemble.segment_batch_padded(padded, hs, ws),
        plain.segment_batch_padded(padded, hs, ws))


def test_flat_transfer_matches_padded(ensemble, tmp_path):
    """transfer='flat' (the single-device default) must be byte-identical
    to the padded layout on both the /8-gather and full-res paths."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(1024, 1536, seed=33, n_glomeruli=3)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1021, 763, 0.9],
                  [100, 700, 450, 1000, 0.9]]
    flat = FusedSlideSegmenter(ensemble, transfer="flat")
    assert flat.transfer == "flat"
    padded = FusedSlideSegmenter(ensemble, transfer="padded")
    np.testing.assert_array_equal(
        flat.segment_slide(slide, detections),
        padded.segment_slide(slide, detections))
    # full-res (on_crop) path: per-crop class maps must match too
    maps_f, maps_p = [], []
    flat.segment_slide(slide, detections,
                       on_crop=lambda box, m: maps_f.append(m))
    padded.segment_slide(slide, detections,
                         on_crop=lambda box, m: maps_p.append(m))
    for a, b in zip(maps_f, maps_p):
        np.testing.assert_array_equal(a, b)


def test_flat_transfer_int32_overflow_falls_back_padded(
        ensemble, tmp_path, monkeypatch):
    """A batch whose crop bytes would exceed the int32 device-offset range
    must ship in the padded layout (int32 flat offsets would wrap and
    silently rebuild garbage crops).  Forced here by shrinking the limit;
    outputs must stay byte-identical on both stitch paths."""
    from glomeruli_segmentation_tpu.pipeline import fused as fused_mod
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(1024, 1536, seed=33, n_glomeruli=3)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1021, 763, 0.9],
                  [100, 700, 450, 1000, 0.9]]
    flat = FusedSlideSegmenter(ensemble, transfer="flat")
    want = flat.segment_slide(slide, detections)
    maps_want = []
    flat.segment_slide(slide, detections,
                       on_crop=lambda box, m: maps_want.append(m))

    calls = []
    orig = fused_mod.pack_crops_flat
    monkeypatch.setattr(fused_mod, "pack_crops_flat",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    monkeypatch.setattr(fused_mod, "FLAT_OFFSET_LIMIT", 1024)
    np.testing.assert_array_equal(
        flat.segment_slide(slide, detections), want)
    maps_got = []
    flat.segment_slide(slide, detections,
                       on_crop=lambda box, m: maps_got.append(m))
    for a, b in zip(maps_got, maps_want):
        np.testing.assert_array_equal(a, b)
    assert not calls, "fallback batch must not be packed flat"

    # the packer itself refuses an over-limit buffer outright
    import glomeruli_segmentation_tpu.ops.preprocess as prep
    monkeypatch.setattr(prep, "FLAT_OFFSET_LIMIT", 1024)
    with pytest.raises(ValueError, match="int32"):
        prep.pack_crops_flat(
            [np.zeros((64, 64, 3), np.uint8)], 1, max_w=64, max_h=64)


def test_host_resize_matches_device_resize(ensemble, tmp_path):
    """host_resize=True (cv2 pre-resize on host, compute-dtype transfer)
    must reproduce the on-device dynamic-resize path: same half-pixel
    sampling, and any sub-ulp float differences vanish under the bf16
    operand truncation of the default path (VERDICT r2 weak 1 lever)."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(1024, 1536, seed=29, n_glomeruli=3)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=3)
    slide = Slide(path)
    detections = [[256, 256, 640, 640, 0.9], [640, 384, 1021, 763, 0.9],
                  [100, 700, 450, 1000, 0.9]]
    device = FusedSlideSegmenter(ensemble).segment_slide(slide, detections)
    host = FusedSlideSegmenter(ensemble, host_resize=True).segment_slide(
        slide, detections)
    assert device.shape == host.shape
    # argmax maps: require (near-)exact agreement — a handful of flipped
    # pixels at probability near-ties is acceptable, any structural
    # difference is not
    mismatch = (device != host).mean()
    assert mismatch <= 1e-3, mismatch
    # and the full-res (on_crop) path also works with host_resize
    seen = []
    host_full = FusedSlideSegmenter(ensemble, host_resize=True).segment_slide(
        slide, detections, on_crop=lambda box, m: seen.append(m.shape))
    assert len(seen) == len(detections)
    assert (host_full != host).mean() <= 1e-3


class _FailingSlide:
    """Slide proxy whose read_region_array fails after N reads — drives
    the producer-thread failure paths."""

    def __init__(self, inner, fail_after: int):
        self._inner = inner
        self._reads = 0
        self._fail_after = fail_after
        self.dimensions = inner.dimensions
        self.properties = getattr(inner, "properties", {})

    def read_region_array(self, *a, **k):
        self._reads += 1
        if self._reads > self._fail_after:
            raise IOError("corrupt tile")
        return self._inner.read_region_array(*a, **k)


def test_producer_failure_propagates(ensemble, tmp_path):
    """A slide-read failure on the staging producer thread must raise out
    of segment_slide, not silently truncate the canvas (round-3 advisor
    finding: a swallowed producer exception let the slide be logged
    complete, --resume skipped it, and gseg-serve filed the ticket under
    done/)."""
    from glomeruli_segmentation_tpu.wsi.tiff_reader import Slide

    img, _ = pas_like_image(512, 768, seed=5, n_glomeruli=1)
    path = str(tmp_path / "s.tiff")
    write_pyramidal_tiff(path, img, mpp=0.25, levels=2)

    slide = _FailingSlide(Slide(path), fail_after=3)
    detections = [[64 * (i % 4), 64, 64 * (i % 4) + 128, 192, 0.9]
                  for i in range(8)]
    fused = FusedSlideSegmenter(ensemble)
    with pytest.raises(IOError, match="corrupt tile"):
        fused.segment_slide(slide, detections)
