"""Fused SegFormer/GTCS slide path (`pipeline/fused_segformer.py`):
bit-parity with the staged per-crop math (feature_extract -> forward ->
upsample_logits -> argmax -> nearest /8 -> max paste) and the
`gseg-e2e --segformer_checkpoint` CLI surface."""
import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_detect_stage import BlobBackend
from test_e2e_fused import _make_slide

from glomeruli_segmentation_tpu.convert.torch_pickle import save_torch_legacy
from glomeruli_segmentation_tpu.data.segformer_dataset import feature_extract
from glomeruli_segmentation_tpu.models.segformer import (
    Segformer,
    SegformerConfig,
    upsample_logits,
)
from glomeruli_segmentation_tpu.ops.preprocess import postprocess_nearest_host
from glomeruli_segmentation_tpu.pipeline.fused_segformer import (
    SegformerSlideConfig,
    SegformerSlideSegmenter,
    load_segformer_checkpoint,
)
from glomeruli_segmentation_tpu.wsi import open_slide

TINY = dict(hidden_sizes=(8, 16, 40, 64), depths=(1, 1, 1, 1),
            sr_ratios=(8, 4, 2, 1), patch_sizes=(7, 3, 3, 3),
            decoder_hidden_size=32)


def _tiny_variables(num_labels=5, seed=0):
    model = Segformer(SegformerConfig(num_labels=num_labels, **TINY))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(jax.random.key(seed), x, train=True)


def _staged_canvas(slide, boxes, segmenter) -> np.ndarray:
    """The staged chain's math, crop by crop: host feature_extract
    (uint8 cv2 resize, segformer_dataset.py), forward, upsample_logits to
    crop size, argmax (segformer_test.py process()), nearest /8, max
    paste (the fused e2e canvas contract)."""
    width, height = slide.dimensions
    canvas = np.zeros((height // 8, width // 8), np.uint8)
    for x1, y1, x2, y2 in boxes:
        crop = slide.read_region_array((x1, y1), 0, (x2 - x1, y2 - y1))
        pix = feature_extract(crop, segmenter.config.input_size)
        logits = segmenter.model.apply(segmenter.variables,
                                       jnp.asarray(pix)[None])
        up = upsample_logits(logits.astype(jnp.float32), y2 - y1, x2 - x1)
        pred = np.asarray(jnp.argmax(up, -1))[0].astype(np.uint8)
        ch, cw = (y2 - y1) // 8, (x2 - x1) // 8
        small = postprocess_nearest_host(pred, ch, cw)
        y0, x0 = y1 // 8, x1 // 8
        ch = max(0, min(ch, canvas.shape[0] - y0))
        cw = max(0, min(cw, canvas.shape[1] - x0))
        if ch == 0 or cw == 0:
            continue
        region = canvas[y0: y0 + ch, x0: x0 + cw]
        np.maximum(region, small[:ch, :cw], out=region)
    return canvas


def test_fused_segformer_matches_staged_math(tmp_path):
    slide_path, _, _ = _make_slide(tmp_path, patient="H16-88888")
    variables = _tiny_variables()
    seg = SegformerSlideSegmenter(
        variables, SegformerSlideConfig(batch_size=2))
    # ragged crop sizes (different gather-table buckets) + an odd size
    boxes = [[64, 128, 576, 640], [700, 200, 1100, 900],
             [100, 900, 1500, 1400], [900, 1000, 1033, 1217]]
    with open_slide(str(slide_path)) as slide:
        staged = _staged_canvas(slide, boxes, seg)
        # device /8 gather path (no per-crop consumer)
        fused = seg.segment_slide(slide, [b + [0.95] for b in boxes])
    assert np.array_equal(fused, staged)
    assert fused.max() >= 0  # canvas materialized


def test_fused_segformer_oncrop_path_matches_gather_path(tmp_path):
    """The full-resolution per-crop path (host numpy upsample twin) and
    the device gather path agree bit-for-bit, and on_crop sees the
    staged-resolution prediction."""
    slide_path, _, _ = _make_slide(tmp_path, patient="H16-88889")
    variables = _tiny_variables(seed=3)
    seg = SegformerSlideSegmenter(
        variables, SegformerSlideConfig(batch_size=2))
    boxes = [[64, 128, 576, 640], [700, 200, 1100, 900],
             [100, 900, 1500, 1400]]
    crops = {}

    def on_crop(box, class_map):
        crops[tuple(box)] = class_map

    dets = [b + [0.95] for b in boxes]
    with open_slide(str(slide_path)) as slide:
        ds8 = seg.segment_slide(slide, dets)
        full = seg.segment_slide(slide, dets, on_crop=on_crop)
    assert np.array_equal(ds8, full)
    assert len(crops) == len(boxes)
    for (x1, y1, x2, y2), m in crops.items():
        assert m.shape == (y2 - y1, x2 - x1)
        assert m.dtype == np.uint8


def test_fused_segformer_data_parallel_matches_single_device(tmp_path):
    """Crop batches sharded over a 4-device 'data' mesh produce the
    byte-identical /8 canvas (params replicated, gather tables sharded
    alongside the batch)."""
    from glomeruli_segmentation_tpu.parallel.mesh import make_data_mesh

    slide_path, _, _ = _make_slide(tmp_path, patient="H16-88890")
    variables = _tiny_variables(seed=5)
    boxes = [[64, 128, 576, 640], [700, 200, 1100, 900],
             [100, 900, 1500, 1400]]
    dets = [b + [0.95] for b in boxes]
    cfg = SegformerSlideConfig(batch_size=4)
    single = SegformerSlideSegmenter(variables, cfg)
    mesh = make_data_mesh(4, cfg.batch_size)
    assert mesh is not None
    sharded = SegformerSlideSegmenter(variables, cfg, mesh=mesh)
    with open_slide(str(slide_path)) as slide:
        a = single.segment_slide(slide, dets)
        b = sharded.segment_slide(slide, dets)
    assert np.array_equal(a, b)


def test_build_pipeline_selects_gtcs_family(tmp_path):
    """The shared CLI pipeline builder (used by both gseg-e2e and
    gseg-serve) wires the SegFormer segmenter, GTCS palette and PNG crop
    artifacts when --segformer_checkpoint is given, and refuses the
    ESPNet path without --segmentation_weights_dir."""
    from glomeruli_segmentation_tpu.cli.e2e import (build_parser,
                                                    build_pipeline)
    from glomeruli_segmentation_tpu.palette import GTCS_PALETTE

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    variables = _tiny_variables(seed=11)
    save_torch_legacy(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray,
                                     variables["batch_stats"]),
         "num_labels": 5},
        str(ckpt_dir / "flax_model.pth"))
    common = ["--model", "x", "--target_list", "t", "--data_dir", "d"]
    args = build_parser().parse_args(
        common + ["--segformer_checkpoint", str(ckpt_dir)])
    pipe = build_pipeline(args, BlobBackend())
    assert isinstance(pipe.segmenter, SegformerSlideSegmenter)
    assert pipe.crop_artifact == "png"
    assert pipe.palette is GTCS_PALETTE

    args = build_parser().parse_args(common)
    with pytest.raises(SystemExit):
        build_pipeline(args, BlobBackend())


@pytest.mark.slow
def test_e2e_cli_segformer(tmp_path, monkeypatch):
    """`gseg-e2e --segformer_checkpoint`: checkpoint loading (dir form),
    GTCS label-PNG crop artifacts, GTCS-palette overlay, --resume skip."""
    slide_path, target_list, patient = _make_slide(tmp_path,
                                                   patient="H16-99999")
    import glomeruli_segmentation_tpu.cli.detect as cli_detect
    from glomeruli_segmentation_tpu.cli.e2e import main as e2e_main

    monkeypatch.setattr(cli_detect, "load_backend",
                        lambda *a, **k: BlobBackend())

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    variables = _tiny_variables(seed=7)
    save_torch_legacy(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray,
                                     variables["batch_stats"]),
         "num_labels": 5},
        str(ckpt_dir / "flax_model.pth"))
    # the loader accepts the dir, the file, and a training output dir
    loaded, n = load_segformer_checkpoint(str(ckpt_dir))
    assert n == 5
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        loaded["params"], variables["params"]))

    out_dir = tmp_path / "cli_out"
    argv = [
        "--model", "unused-by-blob-backend",
        "--target_list", str(target_list),
        "--data_dir", str(tmp_path / "data"),
        "--staining", "OPT_PAS",
        "--output_dir", str(out_dir),
        "--segformer_checkpoint", str(ckpt_dir),
        "--window_size", "100", "--overlap_ratio", "0.5",
        "--conf_threshold", "0.5", "--merge_conf_threshold", "0.9",
        "--seg_batch_size", "2",
    ]
    e2e_main(argv)

    csv_path = out_dir / "OPT_PAS_GlomusMergedList_.csv"
    rows = csv_path.read_text().strip().splitlines()
    assert rows and all(f'"{patient}.tiff"' in r for r in rows)
    pngs = glob.glob(str(out_dir / "json" / patient / "*.PNG"))
    assert len(pngs) == len(rows)
    # mode-'L' grayscale PNG: byte-compatible with the staged chain's
    # save_image (SegFormer/test/test.py; segformer_test.save_triptych)
    from PIL import Image

    im = Image.open(pngs[0])
    assert im.mode == "L"
    assert (out_dir / f"{patient}_pred.jpg").exists()

    # --resume: the completed slide is skipped, artifacts untouched
    before = csv_path.read_text()
    e2e_main(argv + ["--resume"])
    assert csv_path.read_text() == before


def test_segformer_producer_failure_propagates(tmp_path):
    """A slide-read failure on the staging producer thread must raise out
    of segment_slide (round-3 advisor finding — a swallowed producer
    exception silently truncated the canvas and the slide was recorded
    complete)."""
    from test_fused_pipeline import _FailingSlide

    slide_path, _, _ = _make_slide(tmp_path)
    segmenter = SegformerSlideSegmenter(
        _tiny_variables(), SegformerSlideConfig(input_size=64, batch_size=2))
    slide = _FailingSlide(open_slide(str(slide_path)), fail_after=3)
    boxes = [[64 * (i % 4), 64, 64 * (i % 4) + 128, 192, 0.9]
             for i in range(8)]
    with pytest.raises(IOError, match="corrupt tile"):
        segmenter.segment_slide(slide, boxes)
