"""Full downstream-pipeline integration test on a synthetic slide.

Chains: synthetic detections CSV -> merge -> make_seg_data (crops + GT
labels) -> segment (fold1 ESPNet) -> eval_wsi (stitch + mIoU TSV), mirroring
the reference example flow (example/README.md:27-133) without the detector.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.pipeline.eval_wsi import WsiEvaluator
from glomeruli_segmentation_tpu.pipeline.merge import run_merge
from glomeruli_segmentation_tpu.pipeline.seg_data import SegDataGenerator
from glomeruli_segmentation_tpu.utils.labelme_io import img_arr_to_b64
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)

PATIENT = "H17-02419"
MPP = 0.25
FOLD1_MEAN = [204.60071, 170.19359, 199.57469]
FOLD1_STD = [20.61257, 42.92207, 28.401505]


def _margin_px():
    return int(round(20.0 / MPP))


@pytest.fixture(scope="module")
def pipeline_tree(tmp_path_factory):
    """Build the example-data layout around a synthetic slide."""
    import json

    root = tmp_path_factory.mktemp("pipe")
    img, centers = pas_like_image(1536, 2048, seed=11, n_glomeruli=4)

    wsi_dir = root / "data" / "02_PAS"
    slide_dir = wsi_dir / PATIENT
    slide_dir.mkdir(parents=True)
    write_pyramidal_tiff(str(slide_dir / f"{PATIENT}.tiff"), img, mpp=MPP,
                         objective_power=40.0, tile_size=256, levels=3)

    # GT boxes at level-0, snapped to multiples of 8 so the ds8 XML
    # coordinates and the /8 crop names stay integral
    margin = _margin_px()
    gt_boxes = []
    for cx, cy, r in centers[:2]:
        x1 = (cx - r - 16) // 8 * 8
        y1 = (cy - r - 16) // 8 * 8
        x2 = (cx + r + 16) // 8 * 8
        y2 = (cy + r + 16) // 8 * 8
        if (x1 - margin < 0 or y1 - margin < 0
                or x2 + 2 * margin > 2048 or y2 + 2 * margin > 1536):
            continue
        gt_boxes.append((x1, y1, x2, y2, (cx, cy, r)))
    assert gt_boxes, "fixture produced no usable GT boxes"

    # Pascal-VOC XML at ds8 coordinates
    ann_dir = slide_dir / "annotations"
    ann_dir.mkdir()
    objects = "".join(
        f"""  <object><name>glomerulus</name><bndbox>
        <xmin>{x1 // 8}</xmin><ymin>{y1 // 8}</ymin>
        <xmax>{x2 // 8}</xmax><ymax>{y2 // 8}</ymax></bndbox></object>\n"""
        for x1, y1, x2, y2, _ in gt_boxes)
    (ann_dir / f"OPT_PAS_{PATIENT}_{PATIENT}_pw40_ds8.xml").write_text(
        f"<annotation>\n{objects}</annotation>\n")

    # labelme GT JSONs sized to the margin frame, circle polygon inside
    seg_gt_dir = root / "seg_annotation" / PATIENT
    seg_gt_dir.mkdir(parents=True)
    for x1, y1, x2, y2, (cx, cy, r) in gt_boxes:
        fx1, fy1 = x1 - margin, y1 - margin
        fx2, fy2 = x2 + 2 * margin, y2 + 2 * margin
        frame = img[fy1:fy2, fx1:fx2]
        theta = np.linspace(0, 2 * np.pi, 40)
        points = [[float(cx - fx1 + r * np.cos(t)),
                   float(cy - fy1 + r * np.sin(t))] for t in theta]
        doc = {
            "shapes": [{"label": "glomerulus", "points": points,
                        "line_color": None, "fill_color": None}],
            "imagePath": "frame.png",
            "imageData": img_arr_to_b64(frame),
        }
        name = (f"xmin{x1 // 8}_ymin{y1 // 8}"
                f"_xmax{x2 // 8}_ymax{y2 // 8}.json")
        (seg_gt_dir / name).write_text(json.dumps(doc))

    # detection CSV: the GT boxes slightly grown, plus one clean FP
    detect_csv = root / "OPT_PAS_test1.csv"
    rows = []
    for x1, y1, x2, y2, _ in gt_boxes:
        rows.append(f'"S","{PATIENT}","{PATIENT}.tiff",new,'
                    f"2026-01-01T00:00:00,{x1 - 8},{y1 - 8},{x2 + 8},"
                    f"{y2 + 8},0.97")
    rows.append(f'"S","{PATIENT}","{PATIENT}.tiff",new,'
                f"2026-01-01T00:00:00,8,8,168,168,0.95")
    detect_csv.write_text("\n".join(rows) + "\n")

    target_list = root / "targets.txt"
    target_list.write_text(f"{PATIENT}/{PATIENT}\n")

    return dict(root=root, img=img, wsi_dir=wsi_dir, detect_csv=detect_csv,
                target_list=target_list, gt_boxes=gt_boxes,
                data_dir=root / "data")


def test_full_downstream_pipeline(pipeline_tree, reference_models_dir):
    t = pipeline_tree
    root = t["root"]

    # ---- merge ----
    merged_csv = run_merge("OPT_PAS", str(t["detect_csv"]), str(root / "out"),
                           "test1", conf_threshold=0.9,
                           annotation_dir=str(t["data_dir"]),
                           overlap_threshold=0.35,
                           target_list=str(t["target_list"]))
    merged_rows = open(merged_csv).read().strip().splitlines()
    assert len(merged_rows) >= 2

    # ---- make_seg_data ----
    seg_out = root / "out" / "seg_data"
    gen = SegDataGenerator("OPT_PAS", str(t["data_dir"]),
                           str(t["target_list"]), merged_csv,
                           iou_threshold=0.01, output_dir=str(seg_out),
                           wsi_dir=str(t["wsi_dir"]), gt_png_dir=None,
                           seg_gt_json_dir=str(root / "seg_annotation"))
    gen.read_detected_glomus_list()
    results = gen.scan_files()
    assert len(results) == 1
    name, recall, hits, num_gt, num_det = results[0]
    assert float(recall) == 1.0, results
    crops = sorted((seg_out / "org_image" / PATIENT).glob("*.PNG"))
    labels = sorted((seg_out / "label" / "all" / PATIENT).glob("*.PNG"))
    assert len(crops) == len(t["gt_boxes"]) + 1  # TPs + the FP
    assert len(labels) == len(crops)
    # label PNG matches its crop size and contains glomerulus pixels for TPs
    from PIL import Image
    for crop, label in zip(crops, labels):
        assert crop.name == label.name
        assert Image.open(crop).size == Image.open(label).size

    # ---- segment ----
    from glomeruli_segmentation_tpu.cli.segment import build_parser
    from glomeruli_segmentation_tpu.pipeline.segment import run_segment

    pred_dir = root / "out" / "seg_data_pred"
    args = build_parser().parse_args([
        "--rgb_data_dir", str(seg_out / "org_image"),
        "--label_data_dir", str(seg_out / "label" / "all"),
        "--savedir", str(pred_dir),
        "--weights", str(reference_models_dir / "espnet_fold1.pth"),
        "--decoder", "--cityFormat", "--json_image_data", "classmap",
        "--mean", *[str(m) for m in FOLD1_MEAN],
        "--std", *[str(s) for s in FOLD1_STD],
        "--batch_size", "2",
    ])
    run_segment(args)
    pred_jsons = sorted((pred_dir / PATIENT).glob("*.json"))
    assert len(pred_jsons) == len(crops)

    # ---- eval_wsi ----
    evaluator = WsiEvaluator(
        "OPT_PAS", str(t["data_dir"]), str(t["target_list"]), merged_csv,
        0.01, str(root / "out" / "seg_data_output.tsv"),
        str(root / "out" / "wsi"), str(t["wsi_dir"]), gt_png_dir=None,
        seg_gt_json_dir=str(root / "seg_annotation"), window_size=600,
        seg_pred_json_dir=str(pred_dir), nclasses=5)
    evaluator.read_detected_glomus_list()
    evaluator.scan_files()

    tsv = (root / "out" / "seg_data_output.tsv").read_text().splitlines()
    assert len(tsv) == 2  # one slide row + total row
    assert tsv[0].startswith(PATIENT + "\t")
    assert tsv[1].startswith("total\t")
    # the stitched overlays exist and have the /8 slide size
    gt_jpg = root / "out" / "wsi" / f"{PATIENT}_gt.jpg"
    pred_jpg = root / "out" / "wsi" / f"{PATIENT}_pred.jpg"
    assert gt_jpg.exists() and pred_jpg.exists()
    arr = cv2.imread(str(gt_jpg))
    assert arr.shape == (1536 // 8, 2048 // 8, 3)
    # GT stitching should reproduce the circle: overall acc in the slide row
    overall_acc = float(tsv[0].split("\t")[1])
    assert 0.0 < overall_acc <= 1.0


@pytest.mark.slow
def test_cli_mains_chain(pipeline_tree, reference_models_dir):
    """Drive the public console entry points (merge -> make_seg_data ->
    segment -> eval_wsi) through their ``main(argv)`` functions: the
    reference-mirrored flag names are the compatibility contract
    (README CLI table), so a dest/flag mismatch must fail a test even
    when the programmatic API (covered above) is healthy.  Dispatch rule
    parity: GT-mode eval requires all three GT dirs, exactly as
    ``module/espnet/test/eval_wsi_segmentation.py:429-433``."""
    from glomeruli_segmentation_tpu.cli.eval_wsi import main as eval_main
    from glomeruli_segmentation_tpu.cli.make_seg_data import (
        main as make_seg_main,
    )
    from glomeruli_segmentation_tpu.cli.merge import main as merge_main
    from glomeruli_segmentation_tpu.cli.segment import main as segment_main

    t = pipeline_tree
    root = t["root"]
    out = root / "cli_chain"

    merge_main([
        "--staining", "OPT_PAS",
        "--detected_list", str(t["detect_csv"]),
        "--data_dir", str(t["data_dir"]),
        "--output_dir", str(out),
        "--output_file_ext", "cli",
        "--conf_threshold", "0.9",
        "--overlap_threshold", "0.35",
        "--target_list", str(t["target_list"]),
    ])
    merged_csv = out / "OPT_PAS_GlomusMergedList_cli.csv"
    assert len(merged_csv.read_text().strip().splitlines()) >= 2

    seg_out = out / "seg_data"
    make_seg_main([
        "--staining", "OPT_PAS",
        "--merged_detection_result_csv", str(merged_csv),
        "--target_list", str(t["target_list"]),
        "--wsi_dir", str(t["wsi_dir"]),
        "--segmentation_gt_json_dir", str(root / "seg_annotation"),
        "--object_detection_gt_xml_dir", str(t["data_dir"]),
        "--output_dir", str(seg_out),
    ])
    crops = sorted((seg_out / "org_image" / PATIENT).glob("*.PNG"))
    labels = sorted((seg_out / "label" / "all" / PATIENT).glob("*.PNG"))
    assert crops and len(labels) == len(crops)

    pred_dir = out / "pred"
    segment_main([
        "--rgb_data_dir", str(seg_out / "org_image"),
        "--label_data_dir", str(seg_out / "label" / "all"),
        "--savedir", str(pred_dir),
        "--weights", str(reference_models_dir / "espnet_fold1.pth"),
        # eval_wsi consumes class-map imageData (the reference example's
        # VisualizeResults_iou_pixel.py variant, example/README.md:77)
        "--decoder", "--cityFormat", "--json_image_data", "classmap",
        "--mean", *[str(m) for m in FOLD1_MEAN],
        "--std", *[str(s) for s in FOLD1_STD],
        "--batch_size", "2",
    ])
    assert sorted((pred_dir / PATIENT).glob("*.json"))

    tsv = out / "seg_data_output.tsv"
    eval_main([
        "--staining", "OPT_PAS",
        "--merged_detection_result_csv", str(merged_csv),
        "--target_list", str(t["target_list"]),
        "--wsi_dir", str(t["wsi_dir"]),
        "--segmentation_pred_json_dir", str(pred_dir),
        "--object_detection_gt_xml_dir", str(t["data_dir"]),
        "--segmentation_gt_json_dir", str(root / "seg_annotation"),
        "--segmentation_gt_png_dir", str(seg_out / "label" / "all"),
        "--output_file", str(tsv),
        "--output_dir", str(out / "wsi"),
        "--window_size", "600",
    ])
    rows = tsv.read_text().splitlines()
    assert len(rows) == 2 and rows[1].startswith("total\t")
    assert (out / "wsi" / f"{PATIENT}_pred.jpg").exists()
