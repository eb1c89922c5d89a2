"""Measure the REFERENCE-side denominator on this host's CPU (torch).

The reference publishes no numbers (BASELINE.md): its pipeline measures
per-slide seconds at runtime (detect_glomus_test.py:152-158,
merge_overlaped_glomus.py:128-132) on hardware we don't have.  This script
runs the reference *math* on the CPU of this machine over the same
synthetic-slide geometry bench_e2e.py uses, producing the "measured
reference" rows committed to BASELINE.md:

1. detection window forward: a torch ResNet-50-C4 Faster R-CNN equivalent
   (conv1+stages1-3 backbone, 512-wide RPN conv + heads, 300 ROI crops
   through block4 + FC heads) per 1024-px window, one window per forward —
   the reference feeds TF one window per sess.run
   (detect_glomus_test.py:270-283,349-352);
2. box merging: the greedy rule set (pure host python, identical
   complexity to merge_overlaped_glomus.py) over a realistic detection set;
3. crop segmentation: the shipped torch ESPNet (module/espnet/*/Model.py)
   at 512x1024, one crop per forward (VisualizeResults_iou.py:100-129),
   with the 5-fold ensemble = 5 forwards per crop.

Prints one JSON line per stage plus a composed end-to-end sec/slide for
the bench_e2e.py synthetic slide (108 windows, 48 crops, 5 folds).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

WINDOW = 1024
N_WINDOWS = 108  # bench_e2e.py slide: 12288x9216 at ds8 -> 4x3 of 1024px? no:
# level-ds8 size is 1536x1152 -> (1536//1024+1)*(1152//1024+1) = 2*2=4... the
# synthetic pyramid has 4 levels (ds 1,2,4,8); bench_e2e scans ds8 -> 4
# windows. Scale-accurate production slides are larger; report per-window
# rates and compose with the same window/crop counts bench_e2e reports.
N_CROPS = 48
N_FOLDS = 5


def bench_torch_detection_window(repeats: int = 3) -> dict:
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * 4
            self.c1 = nn.Conv2d(cin, width, 1, bias=False)
            self.b1 = nn.BatchNorm2d(width)
            self.c2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.b2 = nn.BatchNorm2d(width)
            self.c3 = nn.Conv2d(width, cout, 1, bias=False)
            self.b3 = nn.BatchNorm2d(cout)
            self.sc = (nn.Sequential(nn.Conv2d(cin, cout, 1, stride,
                                               bias=False),
                                     nn.BatchNorm2d(cout))
                       if cin != cout or stride != 1 else nn.Identity())
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            y = self.relu(self.b1(self.c1(x)))
            y = self.relu(self.b2(self.c2(y)))
            y = self.b3(self.c3(y))
            return self.relu(y + self.sc(x))

    def stage(cin, width, blocks, stride):
        mods = [Bottleneck(cin, width, stride)]
        mods += [Bottleneck(width * 4, width) for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    class RefEquivFRCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
            self.s1 = stage(64, 64, 3, 1)
            self.s2 = stage(256, 128, 4, 2)
            self.s3 = stage(512, 256, 6, 2)      # stride-16 C4 features
            self.rpn = nn.Conv2d(1024, 512, 3, 1, 1)
            self.rpn_cls = nn.Conv2d(512, 24, 1)
            self.rpn_box = nn.Conv2d(512, 48, 1)
            self.block4 = stage(1024, 512, 3, 2)  # per-ROI head
            self.fc_cls = nn.Linear(2048, 2)
            self.fc_box = nn.Linear(2048, 4)

        def forward(self, x, n_rois=300):
            feats = self.s3(self.s2(self.s1(self.stem(x))))
            r = torch.relu(self.rpn(feats))
            self.rpn_cls(r), self.rpn_box(r)
            rois = torch.zeros(n_rois, 1024, 14, 14)
            h = self.block4(rois).mean(dim=(2, 3))
            return self.fc_cls(h), self.fc_box(h)

    torch.manual_seed(0)
    model = RefEquivFRCNN().eval()
    x = torch.rand(1, 3, WINDOW, WINDOW)
    with torch.no_grad():
        model(x)  # warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            model(x)
        dt = (time.perf_counter() - t0) / repeats
    return {"metric": "reference_detection_window_torch_cpu",
            "sec_per_window": round(dt, 3),
            "windows_per_sec": round(1.0 / dt, 3)}


def bench_merge(n_detections: int = 500, repeats: int = 5) -> dict:
    from glomeruli_segmentation_tpu.pipeline.merge import BoxMerger

    rng = np.random.RandomState(0)
    cands = []
    for _ in range(n_detections):
        x1 = rng.uniform(0, 100000)
        y1 = rng.uniform(0, 80000)
        w = rng.uniform(400, 1400)
        h = rng.uniform(400, 1400)
        cands.append([x1, y1, x1 + w, y1 + h, rng.uniform(0.9, 1.0),
                      w * h, 0.0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        merged = BoxMerger(0.35).merge_all(cands, 0.23, 0.23)
    dt = (time.perf_counter() - t0) / repeats
    return {"metric": "reference_merge_host", "detections": n_detections,
            "merged": len(merged), "sec_per_slide": round(dt, 3)}


def bench_torch_espnet_crop(repeats: int = 3) -> dict:
    import torch

    sys.path.insert(0, "/root/reference/module/espnet/train")
    try:
        import Model as RefNet
    finally:
        sys.path.pop(0)
    model = RefNet.ESPNet(classes=5, p=2, q=8).eval()
    x = torch.rand(1, 3, 512, 1024)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = model(x)
            out.max(1)
        dt = (time.perf_counter() - t0) / repeats
    return {"metric": "reference_espnet_crop_torch_cpu",
            "sec_per_crop_per_fold": round(dt, 3),
            "crops_per_sec_single_fold": round(1.0 / dt, 2)}


def bench_torch_segformer_crop(repeats: int = 3) -> dict:
    """MiT-B0 512x512 forward, torch CPU — the GTCS variant's reference
    inference math (/root/reference/module/SegFormer/test/test.py:60-74
    runs one crop per session step through HF transformers)."""
    import torch
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    cfg = SegformerConfig(num_labels=5)  # MiT-B0 geometry (HF defaults)
    model = SegformerForSemanticSegmentation(cfg).eval()
    x = torch.rand(1, 3, 512, 512)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = model(x).logits
            out.argmax(1)
        dt = (time.perf_counter() - t0) / repeats
    return {"metric": "reference_segformer_crop_torch_cpu",
            "sec_per_crop": round(dt, 3),
            "crops_per_sec": round(1.0 / dt, 2)}


def main():
    det = bench_torch_detection_window()
    merge = bench_merge()
    crop = bench_torch_espnet_crop()
    try:
        print(json.dumps(bench_torch_segformer_crop()))
    except Exception as e:  # transformers optional
        print(json.dumps({"metric": "reference_segformer_crop_torch_cpu",
                          "error": repr(e)}))
    print(json.dumps(det))
    print(json.dumps(merge))
    print(json.dumps(crop))
    # composed e2e on the bench_e2e slide geometry: 4 ds-8 windows of
    # 1024px + merge + 48 crops x 5 folds
    e2e = (4 * det["sec_per_window"] + merge["sec_per_slide"]
           + N_CROPS * N_FOLDS * crop["sec_per_crop_per_fold"])
    print(json.dumps({
        "metric": "reference_e2e_sec_per_slide_torch_cpu",
        "windows": 4, "crops": N_CROPS, "folds": N_FOLDS,
        "sec_per_slide": round(e2e, 2),
        "slides_per_hour": round(3600.0 / e2e, 3)}))


if __name__ == "__main__":
    main()
