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
    # level-0 scan at downsample 8 equivalent: use level index 3 px directly
    level = slide.get_best_level_for_downsample(8.0)
    lw, lh = slide.level_dimensions[level]
    n_x = lw // WINDOW + 1
    n_y = lh // WINDOW + 1
    windows = []
    for j in range(n_y):
        for i in range(n_x):
            windows.append((i * WINDOW, j * WINDOW))
    t0 = time.perf_counter()
    batch = []
    n_done = 0
    for (x0, y0) in windows:
        region = slide.read_region_array(
            (x0 * int(slide.level_downsamples[level]),
             y0 * int(slide.level_downsamples[level])), level,
            (WINDOW, WINDOW))
        batch.append(region)
        if len(batch) == 4:
            backend.detect_batch(np.stack(batch))
            n_done += len(batch)
            batch = []
    if batch:
        pad = [batch[-1]] * (4 - len(batch))
        backend.detect_batch(np.stack(batch + pad))
        n_done += len(batch)
    dt = time.perf_counter() - t0
    return {
        "metric": "detection_scan",
        "windows": n_done,
        "sec_per_slide": round(dt, 3),
        "windows_per_sec": round(n_done / dt, 2),
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
    ensemble = EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, folds=folds, batch_size=8))
    fused = FusedSlideSegmenter(ensemble)
    slide = open_slide(slide_path)
    rng = np.random.RandomState(0)
    detections = []
    for cx, cy, r in (centers * 2)[:N_CROPS]:
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


def main():
    tmp = os.path.join(tempfile.gettempdir(), "gseg_bench_slide.tiff")
    centers_file = tmp + ".centers.npy"
    if not os.path.isfile(tmp):
        centers = make_slide(tmp)
        np.save(centers_file, np.asarray(centers))
    centers = np.load(centers_file)
    print(json.dumps(bench_detection(tmp)))
    print(json.dumps(bench_fused_segmentation(tmp, centers)))


if __name__ == "__main__":
    main()
