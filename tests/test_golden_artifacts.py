"""Byte-parity golden tests for the report artifacts.

The CSV/TSV/JSON formats are the public API (CLAUDE.md; schemas at
VisualizeResults_iou.py:151-156,232-241, detect_glomus_test.py:306-326,
merge_overlaped_glomus.py:102-124) — these tests diff produced files
against byte-exact expected strings so the contract can't drift.

Predictions are substituted with fixed class maps (the model itself is
covered by the parity tests); every byte below is then deterministic.
"""
import datetime
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

GOLDEN_PIXEL = """\
patient_id, filename, background, glomerulus, crescent, sclerosis, mesangium
P1,cropA.png,384,128,0,0,0
P1,cropB.png,256,0,128,0,128
"""

GOLDEN_ACCURACY = """\
filename,glomerulus, crescent, sclerosis, mesangium, background iou,glomerulus iou,crescent iou,sclerosis iou, mesangium iou,mIoU
P1/cropA.png,1,0,0,0,0.9999999999739583,0.9999999999218749,0.0,0.0,0.0,1.0
P1/cropB.png,0,1,0,1,0.7777777777507716,0.0,0.5999999999625,0.0,0.9999999999218749,0.7925925925925926
"""

GOLDEN_DATASET = """\
patient_id, glomerulus, crescent, sclerosis, mesangium
P1,1,1,0,1
"""

GOLDEN_OVERALL = (
    "overall_acc:0.9374999999908449, "
    "per_class_acc:[0.95 1.   0.75 0.   1.  ], "
    "per_class_iou:[0.9047619 1.        0.6       0.        1.       ], "
    "mIOU:0.7009523809109381")


def test_segment_artifacts_byte_golden(tmp_path, monkeypatch):
    import glomeruli_segmentation_tpu.pipeline.segment as seg_mod
    from glomeruli_segmentation_tpu.cli.segment import build_parser
    from glomeruli_segmentation_tpu.utils.labelme_io import lblsave

    rgb = tmp_path / "org_image" / "P1"
    lbl = tmp_path / "label" / "P1"
    rgb.mkdir(parents=True)
    lbl.mkdir(parents=True)
    H, W = 16, 32
    map_a = np.zeros((H, W), np.uint8)
    map_a[4:12, 8:24] = 1
    map_b = np.zeros((H, W), np.uint8)
    map_b[0:8, 0:16] = 2
    map_b[8:16, 16:32] = 4
    lbl_b = np.zeros((H, W), np.uint8)
    lbl_b[2:10, 0:16] = 2
    lbl_b[8:16, 16:32] = 4
    img = np.full((H, W, 3), 200, np.uint8)
    cv2.imwrite(str(rgb / "cropA.PNG"), img)
    cv2.imwrite(str(rgb / "cropB.PNG"), img)
    lblsave(str(lbl / "cropA.PNG"), map_a)  # pred == GT
    lblsave(str(lbl / "cropB.PNG"), lbl_b)  # partial agreement

    class StubSegmenter:
        def __init__(self, config):
            self.config = config

        def submit_net_res(self, images):
            return np.stack([map_a, map_b])  # glob order: cropA, cropB

        def read_net_res(self, handle):
            return handle

    monkeypatch.setattr(seg_mod, "EspnetSegmenter", StubSegmenter)
    args = build_parser().parse_args([
        "--rgb_data_dir", str(tmp_path / "org_image"),
        "--label_data_dir", str(tmp_path / "label"),
        "--savedir", str(tmp_path / "out"),
        "--weights", "/dev/null",
        "--inWidth", str(W), "--inHeight", str(H),
        "--mean", "0", "0", "0", "--std", "1", "1", "1",
        "--batch_size", "2",
    ])
    seg_mod.run_segment(args)

    out = tmp_path / "out"
    assert (out / "summary_pixel.csv").read_text() == GOLDEN_PIXEL
    assert (out / "summary_accuracy.csv").read_text() == GOLDEN_ACCURACY
    assert (out / "summary_dataset.csv").read_text() == GOLDEN_DATASET
    assert (out / "overall_accuracy.txt").read_text() == GOLDEN_OVERALL
    doc = json.loads((out / "P1" / "cropA.json").read_text())
    assert sorted(doc) == ["fillColor", "flags", "imageData", "imagePath",
                           "lineColor", "shapes"]
    assert doc["imagePath"] == "cropA.PNG"
    assert doc["lineColor"] == [0, 0, 0, 255]


def test_detect_csv_row_byte_golden(tmp_path, monkeypatch):
    """detect_glomus_test.py:306-326 row schema, frozen timestamp."""
    import glomeruli_segmentation_tpu.pipeline.detect as det_mod

    class FrozenDate(datetime.datetime):
        @classmethod
        def today(cls):
            return cls(2026, 1, 2, 3, 4, 5)

    monkeypatch.setattr(det_mod.datetime, "datetime", FrozenDate)
    detector = det_mod.GlomusDetector(
        "OPT_PAS", target_list="", data_dir=str(tmp_path),
        output_dir=str(tmp_path / "out"), output_file_ext="_g",
        window_size=500, overlap_ratio=0.5, conf_threshold=0.5)
    path = tmp_path / "rows.csv"
    with open(path, "w") as f:
        detector.write_detected_result(
            [[10, 20, 110, 220, 0.875]], 1, 2, x_start=4000, y_start=8000,
            output_file=f, site_name="S", specimen_id="P-01",
            file_name="P-01.ndpi", scale=8.0)
    assert path.read_text() == (
        '"S","P-01","P-01.ndpi",new,2026-01-02T03:04:05,'
        "4080.0,8160.0,4880.0,9760.0,0.875\n")


def test_merged_csv_byte_golden(tmp_path):
    """merge_overlaped_glomus.py:102-124 output schema through run_merge."""
    from glomeruli_segmentation_tpu.pipeline.merge import run_merge
    from glomeruli_segmentation_tpu.wsi.synthetic import (
        pas_like_image,
        write_pyramidal_tiff,
    )

    patient = "P-02"
    pdir = tmp_path / "data" / "02_PAS" / patient
    pdir.mkdir(parents=True)
    img, _ = pas_like_image(256, 256, seed=1, n_glomeruli=0)
    write_pyramidal_tiff(str(pdir / f"{patient}.tiff"), img, mpp=0.25,
                         levels=1)
    detect_csv = tmp_path / "det.csv"
    # two overlapping boxes (merge) + one disjoint + one below conf
    detect_csv.write_text(
        f'"S","{patient}","{patient}.tiff",new,2026-01-01T00:00:00,'
        "100,100,300,300,0.95\n"
        f'"S","{patient}","{patient}.tiff",new,2026-01-01T00:00:00,'
        "120,120,320,320,0.97\n"
        f'"S","{patient}","{patient}.tiff",new,2026-01-01T00:00:00,'
        "600,600,700,700,0.91\n"
        f'"S","{patient}","{patient}.tiff",new,2026-01-01T00:00:00,'
        "10,10,50,50,0.5\n")
    merged = run_merge("OPT_PAS", str(detect_csv), str(tmp_path / "out"),
                       "g", 0.9, str(tmp_path / "data"), 0.35)
    assert open(merged).read() == (
        f'S,{patient},"{patient}.tiff",100,100,320,320,0.97\n'
        f'S,{patient},"{patient}.tiff",600,600,700,700,0.91\n')
