"""GTCS WSI evaluator tests (PNG-based stitch + IoU/Dice)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.pipeline.eval_wsi_gtcs import GtcsWsiEvaluator
from glomeruli_segmentation_tpu.utils.labelme_io import lblsave
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)

PATIENT = "H16-33333"
MPP = 0.25
MARGIN = 80  # 20 µm / 0.25


@pytest.fixture(scope="module")
def gtcs_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gtcs")
    img, centers = pas_like_image(1536, 2048, seed=41, n_glomeruli=3)
    slide_dir = root / "wsi" / PATIENT
    slide_dir.mkdir(parents=True)
    write_pyramidal_tiff(str(slide_dir / f"{PATIENT}.tiff"), img, mpp=MPP,
                         levels=3)

    boxes = []
    for cx, cy, r in centers:
        x1, y1 = int(cx - r - 16), int(cy - r - 16)
        x2, y2 = int(cx + r + 16), int(cy + r + 16)
        if (x1 - MARGIN < 0 or y1 - MARGIN < 0 or x2 + MARGIN > 2048
                or y2 + MARGIN > 1536):
            continue
        boxes.append((x1, y1, x2, y2, cx, cy, r))
    assert boxes

    pred_dir = root / "pred" / PATIENT
    gt_dir = root / "gt" / PATIENT
    pred_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rows = []
    for x1, y1, x2, y2, cx, cy, r in boxes:
        # the GTCS PNGs span the margin-extended frame
        fh = (y2 + MARGIN) - (y1 - MARGIN)
        fw = (x2 + MARGIN) - (x1 - MARGIN)
        lbl = np.zeros((fh, fw), np.uint8)
        yy, xx = np.mgrid[:fh, :fw]
        blob = ((yy - (cy - y1 + MARGIN)) ** 2
                + (xx - (cx - x1 + MARGIN)) ** 2) < r ** 2
        lbl[blob] = 1  # glomerulus
        inner = ((yy - (cy - y1 + MARGIN)) ** 2
                 + (xx - (cx - x1 + MARGIN)) ** 2) < (r // 2) ** 2
        lbl[inner] = 2  # tuft
        name = f"xmin{x1}_ymin{y1}_xmax{x2}_ymax{y2}.PNG"
        lblsave(str(gt_dir / name), lbl)
        lblsave(str(pred_dir / name), lbl)  # perfect prediction
        rows.append(f'"S","{PATIENT}","{PATIENT}.tiff",{x1},{y1},{x2},{y2},0.97')
    (root / "merged.csv").write_text("\n".join(rows) + "\n")
    (root / "targets.txt").write_text(f"{PATIENT}/{PATIENT}\n")
    return root


def _make_evaluator(root, out_name):
    ev = GtcsWsiEvaluator(
        "OPT_PAS", None, str(root / "targets.txt"), str(root / "merged.csv"),
        0.01, out_name, str(root / "out"), str(root / "wsi"),
        str(root / "gt"), window_size=600,
        seg_pred_image_dir=str(root / "pred"), nclasses=5)
    ev.read_detected_glomus_list()
    return ev


def test_scan_files_perfect_prediction(gtcs_tree):
    ev = _make_evaluator(gtcs_tree, "scan.tsv")
    ev.scan_files()
    lines = (gtcs_tree / "out" / "scan.tsv").read_text().splitlines()
    assert lines[0].startswith(PATIENT + "\t")
    assert lines[-1].startswith("total\t")
    fields = lines[-1].split("\t")
    assert len(fields) == 7  # name, acc, cls-acc, cls-iou, mIoU, dice, mDice
    # perfect prediction -> overall acc ~1 and finite Dice
    assert float(fields[1]) > 0.999
    assert (gtcs_tree / "out" / f"{PATIENT}_gt.jpg").exists()
    assert (gtcs_tree / "out" / f"{PATIENT}_pred.jpg").exists()


def test_generate_pred_wsi_mode(gtcs_tree):
    ev = _make_evaluator(gtcs_tree, "pred.tsv")
    ev.generate_pred_wsi()
    lines = (gtcs_tree / "out" / "pred.tsv").read_text().splitlines()
    assert lines[-1].startswith("total\t")


def test_cli_main_default_and_evaluate_modes(gtcs_tree):
    """The console entry point: default mirrors the reference (always
    generate_pred_wsi — the reference comments out its own scan_files
    call, eval_wsi_segmentation_gtcs.py:469-477); --evaluate unlocks the
    implemented GT path."""
    from glomeruli_segmentation_tpu.cli.eval_wsi_gtcs import main

    root = gtcs_tree
    base = [
        "--staining", "OPT_PAS",
        "--merged_detection_result_csv", str(root / "merged.csv"),
        "--target_list", str(root / "targets.txt"),
        "--wsi_dir", str(root / "wsi"),
        "--seg_pred_image_dir", str(root / "pred"),
        "--seg_gt_image_dir", str(root / "gt"),
        "--output_dir", str(root / "cli_out"),
        "--window_size", "600",
    ]
    main(base + ["--output_file", "cli_default.tsv"])
    pred_rows = (root / "cli_out" / "cli_default.tsv").read_text().splitlines()
    assert pred_rows[-1].startswith("total\t")

    main(base + ["--output_file", "cli_eval.tsv", "--evaluate"])
    rows = (root / "cli_out" / "cli_eval.tsv").read_text().splitlines()
    assert rows[-1].startswith("total\t")
    assert len(rows[-1].split("\t")) == 7  # incl. per-class Dice + mDice
    assert float(rows[-1].split("\t")[1]) > 0.999
    assert (root / "cli_out" / f"{PATIENT}_gt.jpg").exists()
