"""End-to-end whole-slide benchmark (supplementary to bench.py).

Measures the two wall-clock-dominant stages of the pipeline on a synthetic
PAS-like pyramidal slide:

1. detection scan: sliding 1024-px windows through the JAX Faster R-CNN
   (ResNet-50 backbone, randomly initialized — timing is weight-agnostic);
2. fused segmentation: N detected crops through the 5-fold ESPNet ensemble
   with on-device stitching.

Prints one JSON line per stage. The reference publishes no numbers
(BASELINE.md); the denominators that matter are sec/slide.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

SLIDE_W, SLIDE_H = 12288, 9216  # ~113 Mpx at level 0 (small biopsy scale)
WINDOW = 1024
N_CROPS = 48


def make_slide(path: str):
    from glomeruli_segmentation_tpu.wsi.synthetic import (
        pas_like_image,
        write_pyramidal_tiff,
    )

    img, centers = pas_like_image(SLIDE_H, SLIDE_W, seed=0, n_glomeruli=40)
    write_pyramidal_tiff(path, img, mpp=0.23, objective_power=40.0,
                         levels=4, tile_size=512)
    return centers


def bench_detection(slide_path: str) -> dict:
    import jax

    from glomeruli_segmentation_tpu.models.faster_rcnn import (
        FasterRCNN,
        FasterRCNNConfig,
        build_anchors,
    )
    from glomeruli_segmentation_tpu.pipeline.detect import JaxDetectorBackend
    from glomeruli_segmentation_tpu.wsi import open_slide

    config = FasterRCNNConfig(image_size=(WINDOW, WINDOW))
    model = FasterRCNN(config)
    anchors = build_anchors(config)
    x = np.zeros((1, WINDOW, WINDOW, 3), np.float32)
    variables = model.init(jax.random.key(0), x, anchors,
                           method=FasterRCNN.detect)
    backend = JaxDetectorBackend(variables, config, batch_size=4)

    slide = open_slide(slide_path)
    # exclude compile from the steady-state rate
    warm = np.zeros((4, WINDOW, WINDOW, 3), np.uint8)
    backend.detect_batch(warm)

    # drive the REAL production scan path (prefetch thread + batched
    # windows, pipeline/detect.py:348-397) rather than a serial read loop
    import tempfile

    from glomeruli_segmentation_tpu.pipeline.e2e import _CollectingDetector

    def run_scan():
        det = _CollectingDetector(
            "OPT_PAS", target_list="", data_dir=os.path.dirname(slide_path),
            output_dir=tempfile.mkdtemp(prefix="gseg_bench_det_"),
            output_file_ext="_bench", window_size=None, overlap_ratio=None,
            conf_threshold=0.2, batch_size=4)
        # fixed 1024-px windows at the ds-8 level: window µm chosen so the
        # px window matches the compiled geometry
        det.org_slide_width, det.org_slide_height = slide.dimensions
        det.mpp_x = det.mpp_y = 0.23
        det.org_slide_objective_power = 40
        det.STD_SIZE = int(WINDOW * 8 * 0.23)  # µm -> 1024 px at ds 8
        det.OVERLAP_RATIO = 0.0
        det.scan_region(backend, slide, "", "bench",
                        os.path.basename(slide_path), output_file=None)
        return det

    # first scan warms the actual window geometry's compile
    det = run_scan()
    n_windows = None
    t0 = time.perf_counter()
    det = run_scan()
    dt = time.perf_counter() - t0
    wx_org, wy_org, x_split, y_split, _, _ = det.calc_window_size()
    n_windows = x_split * y_split
    return {
        "metric": "detection_scan",
        "windows": n_windows,
        "sec_per_slide": round(dt, 3),
        "windows_per_sec": round(n_windows / dt, 2),
    }


def bench_fused_segmentation(slide_path: str, centers) -> dict:
    from glomeruli_segmentation_tpu.pipeline.fused import (
        EnsembleConfig,
        EnsembleSegmenter,
        FusedSlideSegmenter,
    )
    from glomeruli_segmentation_tpu.wsi import open_slide

    models_dir = "/root/reference/models"
    if os.path.isdir(models_dir):
        ckpts = [os.path.join(models_dir, f"espnet_fold{k}.pth")
                 for k in range(1, 6)]
        folds = (1, 2, 3, 4, 5)
    else:
        return {"metric": "fused_segmentation", "skipped": "no checkpoints"}
    # batch 48 = all crops in one dispatch: the per-dispatch fixed cost
    # (~32 ms/fold, measured) dominates small batches — 10.1 ms/crop at
    # B=48 vs 20.4 ms/crop at B=16 through all five folds
    ensemble = EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, folds=folds, batch_size=N_CROPS), engine="fused")
    fused = FusedSlideSegmenter(ensemble)
    slide = open_slide(slide_path)
    rng = np.random.RandomState(0)
    detections = []
    # centers arrives as an ndarray from the .npy cache: list-repeat, not
    # element-wise scaling
    center_list = [tuple(c) for c in np.asarray(centers).tolist()]
    for cx, cy, r in (center_list * 2)[:N_CROPS]:
        size = int(rng.uniform(350, 500))
        x1 = int(np.clip(cx - size // 2, 0, SLIDE_W - size))
        y1 = int(np.clip(cy - size // 2, 0, SLIDE_H - size))
        detections.append([x1, y1, x1 + size, y1 + size, 0.95])
    # warm up compile on the first batch shapes
    fused.segment_slide(slide, detections[:8])
    t0 = time.perf_counter()
    canvas = fused.segment_slide(slide, detections)
    dt = time.perf_counter() - t0
    return {
        "metric": "fused_5fold_segmentation",
        "crops": len(detections),
        "sec_per_slide": round(dt, 3),
        "crops_per_sec": round(len(detections) / dt, 2),
        "canvas_foreground_px": int((canvas > 0).sum()),
    }


def bench_segformer(batch: int = 32) -> dict:
    """SegFormer (MiT-B0) crop throughput on the chip — the GTCS variant's
    hot loop (pipeline/segformer_test.py runs the reference's per-image
    protocol; this measures the batched bf16 device rate)."""
    import time

    import jax
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.models.segformer import (
        Segformer,
        SegformerConfig,
    )

    model = Segformer(SegformerConfig(num_labels=5))
    x = jax.random.uniform(jax.random.key(0), (batch, 512, 512, 3),
                           jnp.float32)
    variables = model.init(jax.random.key(1), x[:1])

    @jax.jit
    def forward(v, b):
        # scalar output: on this backend block_until_ready can no-op for
        # some buffer states, so timing syncs via a host read of the
        # reduced result (forces the full forward; adds ~nothing itself)
        return jnp.argmax(model.apply(v, b.astype(jnp.bfloat16)),
                          -1).sum()

    for _ in range(3):
        float(forward(variables, x))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        float(forward(variables, x))
    dt = (time.perf_counter() - t0) / iters
    return {"metric": "segformer_crop_segmentation", "batch": batch,
            "crops_per_sec": round(batch / dt, 1),
            "ms_per_batch": round(dt * 1e3, 1)}


def main():
    tmp = os.path.join(tempfile.gettempdir(), "gseg_bench_slide.tiff")
    centers_file = tmp + ".centers.npy"
    if not os.path.isfile(tmp):
        centers = make_slide(tmp)
        np.save(centers_file, np.asarray(centers))
    centers = np.load(centers_file)
    print(json.dumps(bench_detection(tmp)))
    print(json.dumps(bench_fused_segmentation(tmp, centers)))
    print(json.dumps(bench_segformer()))


if __name__ == "__main__":
    main()
